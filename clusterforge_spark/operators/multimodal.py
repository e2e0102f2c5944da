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



#: bytes of source per Python-boundary task (mapInPandas fan-out sizing;
#: see functions/partitioning.spread_partitions): small corpora stay on
#: few, full Arrow batches instead of paying per-worker dispatch for
#: crumbs; at scale the [1, defaultParallelism] clamp keeps every core
#: busy. 256 KB ≈ the point where one worker's decode outruns the fixed
#: dispatch cost on this family's byte-statistics decode.
ARROW_BYTES_PER_TASK = 256 << 10

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
    """Single-payload real decode (kept for the stub-contract test);
    the batch operator is :func:`decode_real_features`."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires pillow; use the deterministic "
            "fake decoder (decode_features) in this environment"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


REAL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mode", T.StringType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),
    ]
)


def decode_real_features(frames: DataFrame, thumb_size: int = 8) -> DataFrame:
    """Real image decode via pillow — the optional-extra codec path.

    Same Spark shape as :func:`decode_features` (spread → Arrow-batched
    ``mapInPandas``, schema declared up front, map-only); the Python body
    actually decodes each payload as an image, extracts (width, height,
    mode), the grayscale pixel mean, and a ``thumb_size``² grayscale
    thumbnail vector — the standard perceptual-hash precursor. Raises
    NotImplementedError at PLAN TIME when pillow is absent (this test
    container), so callers fail fast rather than per-task.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires pillow; use the deterministic "
            "fake decoder (decode_features) in this environment"
        ) from exc

    import pandas as pd

    from clusterforge_spark.functions.partitioning import spread_partitions

    frames = spread_partitions(frames, "doc_id", bytes_per_task=ARROW_BYTES_PER_TASK)

    def _real_decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import numpy as np
        from PIL import Image

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(bytes(payload)))
                gray = np.asarray(img.convert("L"), dtype=np.float64)
                thumb = np.asarray(
                    img.convert("L").resize((thumb_size, thumb_size)),
                    dtype=np.float64,
                )
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(img.width),
                        "height": int(img.height),
                        "mode": str(img.mode),
                        "mean_pixel": float(gray.mean()),
                        "thumb": [float(v) for v in thumb.ravel()],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in REAL_DECODE_SCHEMA.fields])

    return frames.mapInPandas(_real_decode_batch, REAL_DECODE_SCHEMA)


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

    # spread before entering Python — sized by source bytes, not cores:
    # a single-file scan is one partition (which would serialize the
    # decode onto one Arrow worker), but fanning a small corpus across
    # every core pays per-worker dispatch for crumbs (measured 2× slower
    # at 32 cores than 8 on the sf0.1 594 KB corpus)
    frames = spread_partitions(frames, "doc_id", bytes_per_task=ARROW_BYTES_PER_TASK)

    import math

    def _round6(x: float) -> float:
        # floor-form rounding (functions/rounding.round_det): identical
        # IEEE ops in any engine, unlike Python's banker's round()
        return math.floor(x * 1e6 + 0.5) / 1e6

    def _fake_decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                yield pd.DataFrame(
                    {f.name: [] for f in DECODE_SCHEMA.fields},
                    columns=[f.name for f in DECODE_SCHEMA.fields],
                )
                continue
            # Vectorize the O(total bytes) scan across the WHOLE Arrow
            # batch: one concatenated uint8 view, per-row byte counts via
            # a single bincount over (row*8 + bucket) — C-speed regardless
            # of row count. Integer arithmetic throughout, so results are
            # identical to a per-row pass in any order.
            payloads = [bytes(p) for p in pdf["payload"]]
            lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n_rows)
            big = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
            counts = np.bincount(
                row_ids * 8 + (big >> 5), minlength=n_rows * 8
            ).reshape(n_rows, 8)
            # byte sums per row: float64-weighted bincount is exact here
            # (integer-valued weights, totals far below 2^53)
            sums = np.bincount(row_ids, weights=big.astype(np.float64), minlength=n_rows)
            safe_n = np.maximum(lengths, 1)
            hist = counts / safe_n[:, None]
            hist[lengths == 0] = 0.0
            # floor-form rounding is a fixed IEEE op sequence — vectorizing
            # it is bit-identical to the scalar version
            hist_r = np.floor(hist * 1e6 + 0.5) / 1e6
            mean_r = np.floor(np.where(lengths > 0, sums / safe_n, 0.0) * 1e6 + 0.5) / 1e6
            # entropy stays a SCALAR chain per row, accumulated in FIXED
            # bucket order with math.log2 (glibc, bit-identical to DuckDB's
            # log2) so the SQL oracle reproduces it exactly; np.log2's SIMD
            # path differs by ULPs and would break hash parity. O(8) per
            # row — the O(bytes) work happened above.
            ent = np.empty(n_rows, dtype=np.float64)
            for i in range(n_rows):
                n = int(lengths[i])
                acc = 0.0
                for c in counts[i]:
                    if c > 0:
                        p = float(c) / n
                        acc += p * math.log2(p)
                ent[i] = _round6(-acc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
                    "n_bytes": lengths,
                    "mean_byte": mean_r,
                    "byte_entropy": ent,
                    "histogram": list(hist_r),
                    "n_frames_sampled": (
                        pdf["n_frames"].astype("int64").to_numpy() + frame_stride - 1
                    )
                    // frame_stride,
                },
                columns=[f.name for f in DECODE_SCHEMA.fields],
            )

    return frames.mapInPandas(_fake_decode_batch, DECODE_SCHEMA)


#: every FRAME_STRIDE-th frame is sampled (video keyframe thinning)
FRAME_STRIDE = 4

#: square target for the resize plan (the usual vision-model input side)
RESIZE_TARGET = 224


def frame_sample(frames: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Video-frame sampling plumbing: one row per SAMPLED frame with the
    byte window that frame owns inside the payload — the partition-of-
    work a real decoder consumes (the codec itself is the stubbed step;
    see decode_real_features for the import-guard pattern).

    Frame k of n over B payload bytes owns bytes [⌊k·B/n⌋, ⌊(k+1)·B/n⌋);
    sampling keeps k = 0, stride, 2·stride, …. Exact BIGINT division
    (div/`//`) everywhere, map-only sequence-explode — no shuffle, no
    UDF, linear at any scale, oracle-exact.
    """
    if stride <= 0:
        raise ValueError(f"stride ({stride}) must be positive")
    b = F.octet_length("payload").cast("long")
    # n_frames <= 0 rows are dropped, not aborted: sequence(0, -1, +s)
    # raises an Illegal-sequence-boundaries runtime error in Spark (and
    # the byte-window division hits /0), while a zero-frame payload
    # simply has no frames to sample — matching DuckDB's empty range()
    return (
        frames.filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            b.alias("n_bytes"),
            F.col("n_frames"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("n_frames") - 1,
                    F.lit(stride).cast("long"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            "n_frames",
            F.expr("div(frame_idx * n_bytes, n_frames)").alias("byte_start"),
            (
                F.expr("div((frame_idx + 1) * n_bytes, n_frames)")
                - F.expr("div(frame_idx * n_bytes, n_frames)")
            ).alias("byte_len"),
        )
    )


def resize_plan(frames: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Aspect-preserving resize + letterbox plan per image: output dims,
    padding, and whether the image is upscaled — the geometry a resize
    kernel executes (the kernel itself is the stubbed codec step).

    out = max(1, ⌊side·target/long_side⌋) per side, centered padding.
    Pure BIGINT arithmetic in one map-only projection; oracle-exact.
    """
    if target <= 0:
        raise ValueError(f"target ({target}) must be positive")
    long_side = F.greatest("width", "height")
    out_w = F.greatest(F.lit(1).cast("long"), F.expr(f"div(width * {target}, greatest(width, height))"))
    out_h = F.greatest(F.lit(1).cast("long"), F.expr(f"div(height * {target}, greatest(width, height))"))
    return frames.select(
        "doc_id",
        "width",
        "height",
        out_w.alias("out_width"),
        out_h.alias("out_height"),
        F.expr(f"div({target} - greatest(1L, div(width * {target}, greatest(width, height))), 2)").alias("pad_x"),
        F.expr(f"div({target} - greatest(1L, div(height * {target}, greatest(width, height))), 2)").alias("pad_y"),
        (long_side < target).alias("is_upscaled"),
    )


#: audio-window geometry: fake PCM metadata derived deterministically
#: from doc_id; window/hop in samples. Sized for the testdata corpus
#: (payloads are utf-8 text bytes, up to ~580 B → ≤290 mono samples):
#: real corpora with real PCM would use 4096/2048 — the geometry is
#: parameterized, only the default is corpus-realistic.
AUDIO_WIN = 64
AUDIO_HOP = 32


def audio_window_plan(
    documents: DataFrame, win: int = AUDIO_WIN, hop: int = AUDIO_HOP
) -> DataFrame:
    """Audio STFT/feature-window plumbing: one row per analysis window
    with its exact byte range inside a fake PCM payload — the partition
    of work a real audio featurizer (mel/STFT) consumes. The codec
    itself is the stubbed step, exactly like the image/video family;
    the Spark-side geometry (sample-rate/channel metadata, half-
    overlapping windows, tail drop) is real and oracle-checked.

    Metadata derives deterministically from doc_id (sample_rate ∈
    {8k, 16k, 44.1k}, channels ∈ {1, 2}, 16-bit samples); n_samples =
    payload bytes div (2·channels). Window k covers samples
    [k·hop, k·hop + win) — emitted only while fully inside the clip
    (the standard center=False STFT convention). Map-only sequence
    explode, integer byte math — no shuffle, no UDF.
    """
    if win <= 0 or hop <= 0:
        raise ValueError(f"win ({win}) and hop ({hop}) must be positive")
    rate = F.expr(
        "cast(element_at(array(8000, 16000, 44100), "
        "cast(doc_id % 3 as int) + 1) as bigint)"
    )
    channels = (F.lit(1) + F.col("doc_id") % 2).cast("long")
    base = documents.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        rate.alias("sample_rate"),
        channels.alias("channels"),
    ).withColumn("n_samples", F.expr("div(n_bytes, 2 * channels)"))
    windowed = base.filter(F.col("n_samples") >= win).select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_samples",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"div(n_samples - {win}, {hop})"),
            )
        ).alias("win_idx"),
    )
    return windowed.select(
        "doc_id",
        "sample_rate",
        "channels",
        "win_idx",
        F.expr(f"win_idx * {hop}").alias("sample_start"),
        F.expr(f"win_idx * {hop} * 2 * channels").alias("byte_start"),
        F.lit(win * 2).cast("long").alias("byte_len_per_channel"),
    )


AUDIO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def _audio_backend() -> str:
    """'soundfile' (any libsndfile format) > 'wave' (stdlib, PCM WAV) >
    NotImplementedError — resolved at PLAN time so a missing codec fails
    fast on the driver, not per-task (same contract as
    :func:`decode_real_features`)."""
    try:
        import soundfile  # noqa: F401

        return "soundfile"
    except ImportError:
        pass
    try:
        import wave  # noqa: F401

        return "wave"
    except ImportError as exc:  # pragma: no cover — wave is stdlib
        raise NotImplementedError(
            "real audio decode requires soundfile or the stdlib wave "
            "module; use audio_window_plan's geometry-only planning in "
            "codec-free environments"
        ) from exc


def decode_real_audio(clips: DataFrame) -> DataFrame:
    """Real audio decode — the working codec path of the audio family
    (:func:`audio_window_plan` stays the geometry-only planner).

    Same Spark shape as :func:`decode_real_features`: spread →
    Arrow-batched ``mapInPandas`` with the schema declared up front,
    map-only. Input rows are (doc_id, payload) where payload is a
    complete audio container (WAV in the stdlib-wave fallback; anything
    libsndfile reads when soundfile is installed). Per clip it emits
    stream metadata (rate/channels/sample count/duration) and the basic
    energy features a curation pipeline filters on: RMS, peak amplitude
    and zero-crossing rate, computed on the channel-mean mono signal
    normalized to [-1, 1].
    """
    backend = _audio_backend()

    import pandas as pd

    from clusterforge_spark.functions.partitioning import spread_partitions

    clips = spread_partitions(
        clips.select("doc_id", "payload"), "doc_id", bytes_per_task=ARROW_BYTES_PER_TASK
    )

    def _decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = io.BytesIO(bytes(payload))
                if backend == "soundfile":
                    import soundfile as sf

                    data, rate = sf.read(buf, dtype="float64", always_2d=True)
                    channels = data.shape[1]
                else:
                    import wave

                    with wave.open(buf, "rb") as w:
                        rate = w.getframerate()
                        channels = w.getnchannels()
                        width = w.getsampwidth()
                        raw = w.readframes(w.getnframes())
                    if width == 2:
                        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
                    elif width == 1:  # 8-bit WAV is unsigned
                        arr = (
                            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
                        ) / 128.0
                    elif width == 3:  # 24-bit PCM: widen to i4 via zero-pad LSB
                        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
                        wide = np.zeros((len(b), 4), dtype=np.uint8)
                        wide[:, 1:] = b
                        arr = (
                            wide.view("<i4").ravel().astype(np.float64) / 2147483648.0
                        )
                    elif width == 4:
                        arr = (
                            np.frombuffer(raw, dtype="<i4").astype(np.float64)
                            / 2147483648.0
                        )
                    else:
                        raise ValueError(f"unsupported WAV sample width {width}")
                    data = arr.reshape(-1, channels)
                mono = data.mean(axis=1)
                n = len(mono)
                zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": int(rate),
                        "channels": int(channels),
                        "n_samples": int(n),
                        "duration_sec": float(n / rate) if rate else 0.0,
                        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
                        "peak": float(np.max(np.abs(mono))) if n else 0.0,
                        "zcr": float(zc / (n - 1)) if n > 1 else 0.0,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_DECODE_SCHEMA.fields])

    return clips.mapInPandas(_decode_batch, AUDIO_DECODE_SCHEMA)


AUDIO_SYNTH_RATE = 8000


def attach_wav_payload(documents: DataFrame) -> DataFrame:
    """Deterministic WAV synthesis: each doc's utf-8 bytes become 16-bit
    mono PCM samples ((byte − 128)·256) in a complete RIFF/WAV container
    at ``AUDIO_SYNTH_RATE`` Hz — the audio twin of
    :func:`attach_payload`'s fake-image bytes, but a REAL container the
    codec path actually parses. Arrow-batched mapInPandas after a spread
    (the synthesis is the CPU step), one row per doc: (doc_id, payload).
    """
    import pandas as pd

    from clusterforge_spark.functions.partitioning import spread_partitions

    docs = spread_partitions(
        documents.select("doc_id", "text"), "doc_id", bytes_per_task=ARROW_BYTES_PER_TASK
    )

    def _synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave as wavemod

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                pcm = ((b.astype(np.int16) - 128) * 256).astype("<i2")
                buf = io.BytesIO()
                with wavemod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(AUDIO_SYNTH_RATE)
                    w.writeframes(pcm.tobytes())
                out.append({"doc_id": int(doc_id), "payload": buf.getvalue()})
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return docs.mapInPandas(_synth, "doc_id long, payload binary")


def audio_decode_meta(documents: DataFrame) -> DataFrame:
    """End-to-end audio codec query: synthesize a WAV per doc
    (:func:`attach_wav_payload`), decode it back
    (:func:`decode_real_audio`), and emit the stream metadata. The
    oracle derives the same values from the SOURCE text (n_samples =
    utf-8 byte count, duration = n/rate), so a header, framing, or
    sample-count bug anywhere in the synth→container→decode chain is an
    oracle failure. The energy features (rms/peak/zcr) are covered by
    the closed-form WAV pytests — byte-level math is not expressible in
    the SQL oracle.
    """
    decoded = decode_real_audio(attach_wav_payload(documents))
    return decoded.select(
        "doc_id", "sample_rate", "channels", "n_samples", "duration_sec"
    )
