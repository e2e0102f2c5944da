"""DuckDB oracle SQL for every oracle-checkable query.

The driver runs each ``__spark_entry__.queries()`` entry AND the matching
SQL here side-by-side and compares row count + schema + order-insensitive
value hash. These builders share their constants (reference instant, fixed
centroids, new-point literal) with the Spark operators so the two sides
can never drift.

Cross-engine float determinism rules (mirrored in the operators):
  * money sums accumulate in DECIMAL(18,2) then cast back to double —
    exact and order-independent;
  * products/differences/sqrt of doubles are bit-identical IEEE ops, left
    unrounded;
  * anything downstream of avg/stddev (z-scores, distances, silhouette,
    percentages) is rounded to 4 decimals, leaving ≥6 orders of magnitude
    of headroom over summation-order error;
  * computed integers are BIGINT on both sides.
"""

from __future__ import annotations

from clusterforge_spark.operators.clustering import FIXED_CENTROIDS
from clusterforge_spark.operators.features import DEFAULT_REF_INSTANT, RFM_COLS

ZCOLS = tuple(f"{c}_z" for c in RFM_COLS)

#: Reference README's --predict example triple ("30,10,500").
DEFAULT_NEW_POINT: tuple[float, float, float] = (30.0, 10.0, 500.0)


# --------------------------------------------------------------------------
# shared CTE fragments
# --------------------------------------------------------------------------

def rfm_cte(ref_instant: str = DEFAULT_REF_INSTANT) -> str:
    return f"""rfm AS (
  SELECT user_id,
         CAST(epoch_us(TIMESTAMP '{ref_instant}') - epoch_us(max(ts::TIMESTAMP)) AS DOUBLE)
           / 86400000000.0 AS recency,
         CAST(count(DISTINCT event_id) AS DOUBLE) AS frequency,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM events
  GROUP BY user_id
  HAVING recency >= 0 AND frequency > 0 AND monetary > 0
)"""


def params_cte() -> str:
    parts = ",\n         ".join(
        f"avg({c}) AS {c}_mean, greatest(stddev_pop({c}), 1e-8) AS {c}_std"
        for c in RFM_COLS
    )
    return f"""params AS (
  SELECT {parts}
  FROM rfm
)"""


def scaled_cte() -> str:
    zs = ",\n         ".join(
        f"({c} - {c}_mean) / {c}_std AS {c}_z" for c in RFM_COLS
    )
    return f"""scaled AS (
  SELECT user_id,
         {zs}
  FROM rfm CROSS JOIN params
)"""


def _dist_sql(cols: tuple[str, ...], centroid: tuple[float, ...]) -> str:
    terms = " + ".join(
        f"({c} - ({v!r})) * ({c} - ({v!r}))" for c, v in zip(cols, centroid)
    )
    return f"sqrt({terms})"


def _argmin_case(k: int) -> str:
    """CASE picking the lowest index among the minima (strict-< tie-break,
    identical to Spark's struct-ordered array_min)."""
    whens = []
    for i in range(k - 1):
        conds = " AND ".join(f"d{i} <= d{j}" for j in range(i + 1, k))
        whens.append(f"WHEN {conds} THEN {i}")
    return "CASE " + " ".join(whens) + f" ELSE {k - 1} END"


def assigned_cte(centroids=FIXED_CENTROIDS, cols: tuple[str, ...] = ZCOLS) -> str:
    k = len(centroids)
    dists = ",\n           ".join(
        f"{_dist_sql(cols, cen)} AS d{i}" for i, cen in enumerate(centroids)
    )
    least = ", ".join(f"d{i}" for i in range(k))
    zsel = ", ".join(cols)
    return f"""assigned AS (
  SELECT user_id, {zsel},
         CAST({_argmin_case(k)} AS BIGINT) AS cluster,
         least({least}) AS dist
  FROM (
    SELECT *,
           {dists}
    FROM scaled
  )
)"""


def _chain(*ctes: str) -> str:
    return "WITH " + ",\n".join(ctes)


# --------------------------------------------------------------------------
# per-query SQL
# --------------------------------------------------------------------------

def q_scan_project() -> str:
    return """SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem"""


def q_filter_conjunctive() -> str:
    return """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem
WHERE l_quantity > 0 AND l_extendedprice > 0
  AND l_orderkey IS NOT NULL AND l_discount < 0.05"""


def q_timestamp_parse(ref_date: str = "2024-07-01") -> str:
    return f"""SELECT event_id,
       CAST(year(ts::TIMESTAMP) AS BIGINT)   AS ts_year,
       CAST(month(ts::TIMESTAMP) AS BIGINT)  AS ts_month,
       CAST(day(ts::TIMESTAMP) AS BIGINT)    AS ts_day,
       CAST(hour(ts::TIMESTAMP) AS BIGINT)   AS ts_hour,
       CAST(minute(ts::TIMESTAMP) AS BIGINT) AS ts_minute,
       CAST(date_diff('day', ts::DATE, DATE '{ref_date}') AS BIGINT) AS day_diff,
       epoch_us(ts::TIMESTAMP) AS epoch_us
FROM events"""


def q_rfm_features() -> str:
    return _chain(rfm_cte()) + "\nSELECT user_id, recency, frequency, monetary FROM rfm"


def q_having_filter() -> str:
    return """SELECT o_custkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       count(*) AS order_count
FROM orders
GROUP BY o_custkey
HAVING total_spend > 100000.0 AND order_count > 1"""


def q_count_distinct_exact() -> str:
    return """SELECT user_id,
       CAST(count(DISTINCT event_id) AS DOUBLE) AS distinct_events,
       count(DISTINCT event_type) AS distinct_types
FROM events
GROUP BY user_id"""


def q_top_k_revenue(k: int = 100) -> str:
    return f"""SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
ORDER BY revenue DESC, l_orderkey, l_linenumber
LIMIT {k}"""


def q_join_enrich() -> str:
    return """SELECT n_name, c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
       count(*) AS lineitem_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment"""


def q_window_sessionize() -> str:
    return """WITH b AS (
  SELECT user_id,
         date_trunc('hour', ts::TIMESTAMP) AS hour_start,
         count(*) AS events_in_hour,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_in_hour
  FROM events
  GROUP BY 1, 2
)
SELECT user_id,
       epoch_us(hour_start) AS hour_start_us,
       events_in_hour,
       value_in_hour,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY events_in_hour DESC, hour_start) AS BIGINT) AS busy_rank
FROM b"""


def q_scaler_params() -> str:
    cols = ", ".join(
        f"round({c}_mean, 4) AS {c}_mean, round({c}_std, 4) AS {c}_std" for c in RFM_COLS
    )
    return _chain(rfm_cte(), params_cte()) + f"\nSELECT {cols} FROM params"


def q_standard_scaler() -> str:
    zs = ", ".join(f"round({c}_z, 4) AS {c}_z" for c in RFM_COLS)
    return _chain(rfm_cte(), params_cte(), scaled_cte()) + f"\nSELECT user_id, {zs} FROM scaled"


def q_centroid_assign() -> str:
    return (
        _chain(rfm_cte(), params_cte(), scaled_cte(), assigned_cte())
        + "\nSELECT user_id, cluster, round(dist, 4) AS dist FROM assigned"
    )


def q_cluster_sizes() -> str:
    return (
        _chain(rfm_cte(), params_cte(), scaled_cte(), assigned_cte())
        + """
SELECT cluster, count(*) AS size,
       round(count(*) * 100.0 / (SELECT count(*) FROM assigned), 4) AS pct
FROM assigned
GROUP BY cluster"""
    )


def q_inertia() -> str:
    return (
        _chain(rfm_cte(), params_cte(), scaled_cte(), assigned_cte())
        + "\nSELECT round(sum(dist * dist), 6) AS inertia FROM assigned"
    )


def q_predict_new_point(point: tuple[float, float, float] = DEFAULT_NEW_POINT) -> str:
    k = len(FIXED_CENTROIDS)
    zpt = ",\n         ".join(
        f"(({v!r}) - {c}_mean) / {c}_std AS {c}_z" for c, v in zip(RFM_COLS, point)
    )
    dists = ",\n         ".join(
        f"{_dist_sql(ZCOLS, cen)} AS d{i}" for i, cen in enumerate(FIXED_CENTROIDS)
    )
    least = ", ".join(f"d{i}" for i in range(k))
    zsel = ", ".join(f"round({c}, 4) AS {c}" for c in ZCOLS)
    return (
        _chain(
            rfm_cte(),
            params_cte(),
            f"zpt AS (\n  SELECT {zpt}\n  FROM params\n)",
            f"zd AS (\n  SELECT *,\n         {dists}\n  FROM zpt\n)",
        )
        + f"""
SELECT {zsel},
       CAST({_argmin_case(k)} AS BIGINT) AS cluster,
       round(least({least}), 4) AS dist
FROM zd"""
    )


def q_silhouette_sample(n: int = 100) -> str:
    pair_d = " + ".join(
        f"(a.{c} - b.{c}) * (a.{c} - b.{c})" for c in ZCOLS
    )
    zsel = ", ".join(ZCOLS)
    return (
        _chain(rfm_cte(), params_cte(), scaled_cte(), assigned_cte())
        + f""",
sample AS (
  SELECT user_id AS id, cluster, {zsel}
  FROM assigned ORDER BY user_id LIMIT {n}
),
pairs AS (
  SELECT a.id AS id, a.cluster AS cluster, b.cluster AS other_cluster,
         sqrt({pair_d}) AS d
  FROM sample a JOIN sample b ON a.id != b.id
),
to_cluster AS (
  SELECT id, cluster, other_cluster, avg(d) AS mean_d
  FROM pairs GROUP BY 1, 2, 3
),
a_i AS (SELECT id, mean_d AS a_dist FROM to_cluster WHERE cluster = other_cluster),
b_i AS (SELECT id, min(mean_d) AS b_dist FROM to_cluster
        WHERE cluster != other_cluster GROUP BY id)
SELECT s.id, s.cluster,
       round(CASE WHEN a_dist IS NULL OR b_dist IS NULL
                    OR greatest(a_dist, b_dist) = 0.0 THEN 0.0
                  ELSE (b_dist - a_dist) / greatest(a_dist, b_dist)
             END, 4) AS silhouette
FROM sample s
LEFT JOIN a_i ON s.id = a_i.id
LEFT JOIN b_i ON s.id = b_i.id"""
    )


def q_silhouette_mean(n: int = 100) -> str:
    inner = q_silhouette_sample(n)
    return f"SELECT round(avg(silhouette), 4) AS mean_silhouette FROM (\n{inner}\n) t"
