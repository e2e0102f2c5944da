"""Streaming source configuration surface.

The reference has no streaming at all; this engine's stream operators
(streaming/sessionize.py) are driven from file and rate sources in the
sandbox. Production deployments front them with Kafka — this module is
the CONFIG surface for that: it builds the exact ``readStream`` spec
(format + options + the value-decode projection) without connecting, so
pipelines are written once against the builder and the broker binding
stays a deployment concern.

The kafka-clients package is not in this container, so ``load()`` on a
Kafka spec raises Spark's data-source-not-found error — the builder and
the decode projection are still real and tested (the same
optional-dependency pattern as the pillow codec path,
operators/multimodal.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class KafkaSourceSpec:
    """Declarative Kafka source: everything Spark's kafka source needs,
    with the safety-relevant defaults made explicit.

    - ``starting_offsets='earliest'`` for backfill-correct pipelines
      (the 'latest' default silently drops history on first deploy).
    - ``fail_on_data_loss=False`` documented per-pipeline: aged-out
      offsets should quarantine, not kill a 1000-executor job, when the
      downstream dedup absorbs replays.
    - ``max_offsets_per_trigger`` bounds a micro-batch: without it the
      FIRST batch after downtime reads the whole backlog into one batch
      and OOMs the stage.
    """

    bootstrap_servers: str
    topics: tuple[str, ...]
    group_id_prefix: str = "clusterforge"
    starting_offsets: str = "earliest"
    fail_on_data_loss: bool = False
    max_offsets_per_trigger: int | None = 1_000_000
    extra: dict = field(default_factory=dict)

    def options(self) -> dict:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": ",".join(self.topics),
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
            "groupIdPrefix": self.group_id_prefix,
        }
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        opts.update(self.extra)
        return opts

    def reader(self, spark: SparkSession):
        """The configured ``DataStreamReader`` (not yet loaded)."""
        r = spark.readStream.format("kafka")
        for k, v in self.options().items():
            r = r.option(k, v)
        return r


def decode_json_value(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka's wire frame → typed rows: the source yields
    (key binary, value binary, topic, partition, offset, timestamp, …);
    real payloads are JSON in ``value``. Schema-pinned ``from_json``
    (never inference on a stream), corrupt records land as NULL structs
    that the caller's quarantine filter sees — the same
    corrupt-quarantine convention as sources/readers.read_jsonl. Carries
    (topic, partition, offset) through as the exactly-once bookkeeping
    columns every downstream dedup keys on.
    """
    return raw.select(
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
    ).select("topic", "partition", "offset", "kafka_ts", "v.*")
