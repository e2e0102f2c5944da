"""Relational core: scan/project/filter/aggregate/having/top-k/join/window.

Covers reference operators O1-O12 (SURVEY.md §2.1) re-expressed on the
driver's TPC-H-ish tables, plus the join/sort/window surface the reference
lacks but any engine user needs (SURVEY.md §2.3). Everything here is pure
DataFrame API → Catalyst gets predicate pushdown, column pruning, constant
folding and join planning for free; no UDFs, no collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clusterforge_spark.functions.rounding import round_det


def scan_project(lineitem: DataFrame) -> DataFrame:
    """O1+O4+O11: scan → computed column → pruned projection.

    revenue = l_extendedprice * (1 - l_discount), the TPC-H revenue
    expression (reference analog: TotalAmount = Quantity * UnitPrice,
    data.rs:124). Projecting only 4 columns lets Catalyst prune the parquet
    scan's ReadSchema to exactly these — verified in tests/test_plans.py
    (test_scan_project_prunes_columns).
    """
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )


def filter_conjunctive(lineitem: DataFrame) -> DataFrame:
    """O2: conjunctive predicate, pushed down to the scan.

    Mirrors the reference's row filter Quantity>0 ∧ UnitPrice>0 ∧
    CustomerID IS NOT NULL (data.rs:106-112) on lineitem columns, with one
    extra range predicate so the pushdown is non-trivial.
    """
    return lineitem.filter(
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
        & F.col("l_orderkey").isNotNull()
        & (F.col("l_discount") < 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


def timestamp_parts(events: DataFrame, ref_date: str = "2024-07-01") -> DataFrame:
    """O3+O10: timestamp decomposition + day arithmetic vs a literal.

    All parts are extracted under the session's UTC timezone; day_diff is
    date-granularity (datediff), epoch_us is the µs-truncated epoch — both
    exactly reproducible by the DuckDB oracle.
    """
    # computed ints cast to long so schemas line up with the oracle's BIGINTs
    return events.select(
        "event_id",
        F.year("ts").cast("long").alias("ts_year"),
        F.month("ts").cast("long").alias("ts_month"),
        F.dayofmonth("ts").cast("long").alias("ts_day"),
        F.hour("ts").cast("long").alias("ts_hour"),
        F.minute("ts").cast("long").alias("ts_minute"),
        F.datediff(F.lit(ref_date).cast("date"), F.col("ts").cast("date"))
        .cast("long")
        .alias("day_diff"),
        F.unix_micros("ts").alias("epoch_us"),
    )


def having_filter(orders: DataFrame) -> DataFrame:
    """O6+O12: groupBy → agg → post-aggregation filter (HAVING).

    Catalyst plans this as Filter(Aggregate(...)) with a map-side partial
    aggregate before the shuffle on o_custkey.
    """
    return (
        orders.groupBy("o_custkey")
        .agg(
            # Money sums accumulate in DECIMAL: exact, order-independent
            # (a double sum's low bits depend on partial-agg order — not
            # reproducible across engines or even across runs at scale).
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
            F.count("*").alias("order_count"),
        )
        .filter((F.col("total_spend") > 100000.0) & (F.col("order_count") > 1))
    )


def count_distinct_exact(events: DataFrame) -> DataFrame:
    """O8: exact per-group COUNT(DISTINCT) (cast double, data.rs:158-161).

    Exact distinct is a two-phase shuffle (expand + final agg); fine when
    group cardinality is bounded. The 100 TB-friendly variant is
    :func:`count_distinct_approx`.
    """
    return events.groupBy("user_id").agg(
        F.countDistinct("event_id").cast("double").alias("distinct_events"),
        F.countDistinct("event_type").alias("distinct_types"),
    )


def count_distinct_approx(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """O8 scalable variant: HyperLogLog++ approx_count_distinct.

    One pass, fixed memory per group — the right default at 100 TB where
    exact distinct's expand-shuffle is the bottleneck.
    """
    return events.groupBy("user_id").agg(
        F.approx_count_distinct("event_id", rsd).alias("approx_events")
    )


def top_k(lineitem: DataFrame, k: int = 100) -> DataFrame:
    """Sort/limit/top-k (absent from the reference — SURVEY.md §2.3).

    Deterministic total order (revenue DESC, then keys) so the result set
    is unique. Spark plans orderBy+limit as TakeOrderedAndProject — each
    partition keeps only its top-k, then the driver merges k·p rows; no
    global sort materialization at any scale.
    """
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            # no rounding: a product of two doubles is bit-identical IEEE
            # arithmetic in any engine, so the sort order is reproducible
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(k)
    )


def join_enrich(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Star join + rollup: revenue per nation and market segment.

    lineitem ⋈ orders is the big fact-fact join: both sides shuffle on the
    order key (sort-merge or shuffled-hash, AQE decides; at 100 TB this is
    THE shuffle, so both sides are pre-pruned to join keys + needed
    columns). customer and nation are dimensions → explicit broadcast()
    hints make them map-side joins with no extra shuffle.
    """
    li = lineitem.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    od = orders.select("o_orderkey", "o_custkey")
    cu = customer.select("c_custkey", "c_nationkey", "c_mktsegment")
    na = nation.select("n_nationkey", "n_name")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            # revenue is a computed double (can't be decimal-exact without
            # re-rounding inputs); 2dp output leaves ~7 orders of magnitude
            # of headroom over double-sum reordering error
            round_det(F.sum("revenue"), 2).alias("total_revenue"),
            F.count("*").alias("lineitem_count"),
        )
    )


def sessionize_gap(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """True sessionization by inactivity gap (window-function surface).

    session boundary = gap to previous event (per user, event-time order)
    exceeding ``gap_minutes``; session index = running count of
    boundaries (lag + cumulative sum — the classic formulation). One
    shuffle on user_id serves both window functions and the final
    per-session aggregate. The streaming analog with explicit state is
    streaming/sessionize.sessionize_gap_stream.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60_000_000
    with_gap = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)) > gap_us
        ).cast("int").alias("is_new"),
    )
    with_idx = with_gap.select(
        "user_id",
        "ts",
        "value",
        F.sum(F.coalesce("is_new", F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_idx"),
    )
    return with_idx.groupBy("user_id", "session_idx").agg(
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


def window_sessionize(events: DataFrame) -> DataFrame:
    """Event-time tumbling window + per-user ranking (extension surface).

    Tumbling 1-hour windows via time bucketing (date_trunc) — the batch
    analog of Structured Streaming's window(ts, '1 hour') used in
    streaming/sessionize.py; plus a rank over each user's buckets.

    ONE shuffle total (asserted in tests/test_plans.py): the explicit
    repartition on user_id satisfies both the aggregate's clustered
    distribution on (user_id, hour_start) — a superset of the partition
    key co-locates — and the window's partitionBy(user_id), so neither
    adds an exchange. Trade-off vs letting the agg shuffle on its own
    compound key: this moves raw (narrow) event rows once instead of
    partially-aggregated rows twice; at the ~10:1 events-per-user-hour
    ratio of this data the single exchange wins, and the agg still runs
    as an in-partition hash aggregate.
    """
    from pyspark.sql.window import Window

    bucketed = events.select("user_id", "ts", "value").repartition("user_id").groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count("*").alias("events_in_hour"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_in_hour"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("events_in_hour").desc(), F.col("hour_start")
    )
    return bucketed.select(
        "user_id",
        F.unix_micros("hour_start").alias("hour_start_us"),
        "events_in_hour",
        "value_in_hour",
        F.row_number().over(w).cast("long").alias("busy_rank"),
    )


def window_funcs(events: DataFrame) -> DataFrame:
    """Window-function breadth on one per-user ordered frame: lag / lead
    / running DECIMAL sum / ntile / percent_rank / row_number.

    The order key (ts, event_id) is a total order (event_id unique), so
    every function is deterministic. ONE shuffle on user_id serves all
    six functions — they share the same window spec, and Spark plans a
    single Window operator over a single sort.
    """
    from pyspark.sql.window import Window

    from clusterforge_spark.functions.rounding import round_det

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(running)
        .cast("double")
        .alias("running_value"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        round_det(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


def rollup_revenue(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """ROLLUP aggregation over the star join: revenue at (nation,
    segment), per-nation subtotal, and grand total in one pass (Catalyst
    plans Expand + single aggregate — not three jobs)."""
    li = lineitem.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    od = orders.select("o_orderkey", "o_custkey")
    cu = customer.select("c_custkey", "c_nationkey", "c_mktsegment")
    na = nation.select("n_nationkey", "n_name")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    )
    return joined.rollup("n_name", "c_mktsegment").agg(
        round_det(F.sum("revenue"), 2).alias("total_revenue"),
        F.count("*").alias("lineitem_count"),
    )


def cube_revenue(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """CUBE over the same star join — all four grouping sets
    {(nation, segment), (nation), (segment), ()} in one Expand + one
    aggregate. grouping_id disambiguates the NULL-label rows exactly as
    SQL GROUPING() does (a real NULL group vs a subtotal row)."""
    li = lineitem.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    od = orders.select("o_orderkey", "o_custkey")
    cu = customer.select("c_custkey", "c_nationkey", "c_mktsegment")
    na = nation.select("n_nationkey", "n_name")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    )
    return joined.cube("n_name", "c_mktsegment").agg(
        round_det(F.sum("revenue"), 2).alias("total_revenue"),
        F.count("*").alias("lineitem_count"),
        F.grouping_id().cast("long").alias("gid"),
    )


def set_ops(events: DataFrame) -> DataFrame:
    """Set operations: users segmented by INTERSECT / EXCEPT of their
    event types (distinct semantics, like the SQL operators)."""
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = events.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = purchasers.intersect(erroring).withColumn("segment", F.lit("both"))
    only_p = purchasers.exceptAll(erroring).withColumn("segment", F.lit("purchase_only"))
    return both.unionByName(only_p)


def scalar_funcs(part: DataFrame) -> DataFrame:
    """Scalar-function breadth on one projection: string (upper/substr/
    lpad/trim/concat), math (sqrt/abs/ln/log10), conditional
    (case/coalesce/nullif). All whole-stage-codegen built-ins."""
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_brand"), 12, "_").alias("brand_padded"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.sqrt(F.col("p_retailprice")).alias("price_sqrt"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        round_det(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        round_det(F.log10(F.col("p_retailprice")), 6).alias("price_log10"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#13")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.when(F.col("p_size") < 10, F.lit("small"))
        .when(F.col("p_size") < 30, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("size_class"),
    )


def json_extract_props(events: DataFrame) -> DataFrame:
    """Semi-structured access: pull a typed field out of the JSON-ish
    props column (at scale: get_json_object pushes no scan work to
    Python; for repeated access, from_json to a struct column once)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


def percentiles(events: DataFrame) -> DataFrame:
    """Exact percentiles (sort-based) per event type + global approx
    variant elsewhere; exact form is cross-engine deterministic
    (linear interpolation definition shared with quantile_cont)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        round_det(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        round_det(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        round_det(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.max("value").alias("vmax"),
    )


def semi_anti_join(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi/anti join surface: customers tagged by order activity.

    left_semi and left_anti are the engine-level forms of EXISTS / NOT
    EXISTS — no row multiplication, the probe side never materializes
    matches. One broadcast of the orders keyset serves both.
    """
    keys = orders.select("o_custkey").distinct()
    active = customer.join(
        F.broadcast(keys), customer.c_custkey == keys.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("active").alias("status"))
    inactive = customer.join(
        F.broadcast(keys), customer.c_custkey == keys.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("inactive").alias("status"))
    return active.unionByName(inactive)


def left_join_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Left outer join with null-coalescing aggregate: per-order lineitem
    count, keeping orders with no lineitems at 0."""
    li = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("li_count"))
    return (
        orders.select("o_orderkey")
        .join(li, orders.o_orderkey == li.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("li_count", F.lit(0)).cast("long").alias("lineitem_count"),
        )
    )


def exists_subquery(spark, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Correlated EXISTS through the SQL entry point — Catalyst rewrites
    it to a semi join; exercises the spark.sql surface end-to-end."""
    orders.createOrReplaceTempView("v_orders")
    lineitem.createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus
        FROM v_orders
        WHERE EXISTS (
          SELECT 1 FROM v_lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45
        )
        """
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: manual salting.

    A hot join key concentrates one reducer at 100 TB; salting splits
    each key's rows across ``n_salt`` shuffle partitions by joining on
    (key, salt), with the (smaller) right side replicated once per salt
    value. The salt is a deterministic hash of the whole left row, so
    results are reproducible. AQE's skew-join handles most cases
    automatically — this is the explicit form for when it can't (e.g.
    aggregation states, non-splittable stages).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    salted_left = left.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(
        salted_right,
        (F.col(left_key) == F.col(right_key)) & (salted_left["__salt"] == salted_right["__salt"]),
    )
    return out.drop("__salt")
