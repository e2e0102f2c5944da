"""Multimodal columns: opaque binary payloads + typed metadata + decode.

Pattern for image/audio/video at 100 TB: the payload travels as an
opaque ``binary`` column next to typed metadata (width/height/frames),
decode/feature-extraction runs as an Arrow-batched pandas iterator over
``mapInPandas`` — executors stream columnar batches into Python, the
schema is declared up front, and the expensive step is map-only with no
shuffle.

The test container has no image/audio libraries, so the *real* decoder
is stubbed behind an import-guard (NotImplementedError), and a
deterministic fake decoder (pure byte statistics via numpy) exercises
the full Spark plumbing — schema, batching, partitioning — for real.
The driver testdata has no binary column either, so
:func:`attach_payload` manufactures one deterministically from
``documents.text`` (utf-8 bytes) with hash-free metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_payload(documents: DataFrame) -> DataFrame:
    """Fake-image rows: payload = utf-8 bytes of text; metadata derived
    from doc_id / n_chars only (no engine-specific hashing)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        (F.lit(64) + F.col("doc_id") % 192).cast("long").alias("width"),
        (F.lit(64) + (F.col("doc_id") * 7) % 128).cast("long").alias("height"),
        (F.lit(1) + F.col("n_chars") % 16).cast("long").alias("n_frames"),
    )


def payload_meta(documents: DataFrame) -> DataFrame:
    """Metadata-only projection (oracle-checkable: byte length + md5).

    Same derivations as attach_payload, computed directly so the plan is
    a single map-only projection over the scan.
    """
    return documents.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("byte_len"),
        (F.lit(64) + F.col("doc_id") % 192).cast("long").alias("width"),
        (F.lit(64) + (F.col("doc_id") * 7) % 128).cast("long").alias("height"),
        (F.lit(1) + F.col("n_chars") % 16).cast("long").alias("n_frames"),
        F.md5("text").alias("content_md5"),
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
        T.StructField("n_frames_sampled", T.LongType()),
    ]
)


def _decode_real(payload: bytes, width: int, height: int):  # pragma: no cover
    """Real image decode — unavailable in this container by design."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires pillow; use the deterministic "
            "fake decoder (decode_features) in this environment"
        ) from exc
    raise NotImplementedError("real decode path not wired in this container")


def decode_features(frames: DataFrame, frame_stride: int = 4) -> DataFrame:
    """Arrow-batched fake decode: per-payload byte statistics.

    Input: (doc_id, payload, width, height, n_frames) — output follows
    DECODE_SCHEMA. Deterministic (pure function of bytes), so tests can
    assert exact values; swap ``_fake_decode_batch``'s body for
    ``_decode_real`` when codecs exist.
    """
    import numpy as np
    import pandas as pd

    from clusterforge_spark.functions.partitioning import spread_partitions

    # spread across cores before entering Python: a single-file scan is
    # one partition, which would serialize the (conceptually expensive)
    # decode step onto one Arrow worker
    frames = spread_partitions(frames, "doc_id")

    import math

    def _round6(x: float) -> float:
        # floor-form rounding (functions/rounding.round_det): identical
        # IEEE ops in any engine, unlike Python's banker's round()
        return math.floor(x * 1e6 + 0.5) / 1e6

    def _fake_decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = int(arr.size)
                counts = np.bincount(arr >> 5, minlength=8)
                # entropy accumulated in FIXED bucket order with
                # math.log2 (glibc, bit-identical to DuckDB's log2) so
                # the SQL oracle reproduces it exactly; zero buckets add
                # an exact 0.0 and do not perturb the chain
                acc = 0.0
                for c in counts:
                    if c > 0:
                        p = float(c) / n
                        acc += p * math.log2(p)
                mean = (float(int(arr.sum())) / n) if n else 0.0
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": n,
                        "mean_byte": _round6(mean),
                        "byte_entropy": _round6(-acc),
                        "histogram": [
                            _round6(float(c) / n if n else 0.0) for c in counts
                        ],
                        "n_frames_sampled": (int(n_frames) + frame_stride - 1)
                        // frame_stride,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODE_SCHEMA.fields])

    return frames.mapInPandas(_fake_decode_batch, DECODE_SCHEMA)
