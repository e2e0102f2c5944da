"""Multimodal plumbing: payload schema, Arrow decode correctness, stub."""

from __future__ import annotations

import numpy as np
import pytest

from clusterforge_spark.operators.multimodal import (
    DECODE_SCHEMA,
    _decode_real,
    attach_payload,
    decode_features,
    payload_meta,
)


def test_payload_schema_and_meta(documents):
    framed = attach_payload(documents)
    assert dict(framed.dtypes)["payload"] == "binary"
    meta = {r.doc_id: r for r in payload_meta(documents.limit(10)).collect()}
    docs = documents.limit(10).collect()
    for d in docs:
        m = meta[d.doc_id]
        assert m.byte_len == len(d.text.encode("utf-8"))
        assert 64 <= m.width < 256
        assert 64 <= m.height < 192
        assert 1 <= m.n_frames <= 16


def test_decode_features_match_numpy(documents):
    framed = attach_payload(documents.limit(5))
    out = {r.doc_id: r for r in decode_features(framed).collect()}
    docs = documents.limit(5).collect()
    assert set(out[docs[0].doc_id].asDict()) == {f.name for f in DECODE_SCHEMA.fields}
    for d in docs:
        payload = d.text.encode("utf-8")
        arr = np.frombuffer(payload, dtype=np.uint8)
        r = out[d.doc_id]
        assert r.n_bytes == len(payload)
        assert r.mean_byte == pytest.approx(float(arr.mean()), abs=1e-6)
        assert len(r.histogram) == 8
        assert sum(r.histogram) == pytest.approx(1.0, abs=1e-3)
        assert r.byte_entropy >= 0


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_real(b"xx", 4, 4)


def test_real_decode_batch_raises_without_pillow(documents):
    """Plan-time failure contract when the optional codec dep is absent."""
    PIL = None
    try:
        import PIL  # noqa: F401
    except ImportError:
        pass
    if PIL is not None:
        pytest.skip("pillow installed; covered by test_real_decode_with_pillow")
    from clusterforge_spark.operators.multimodal import decode_real_features

    with pytest.raises(NotImplementedError):
        decode_real_features(attach_payload(documents.limit(1)))


def test_real_decode_with_pillow(spark):
    """Exercises the REAL codec path end-to-end when pillow is present
    (skipped in this container): encode a 2-color PNG, run it through the
    mapInPandas decode, check dimensions and grayscale mean."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from clusterforge_spark.operators.multimodal import (
        REAL_DECODE_SCHEMA,
        decode_real_features,
    )

    buf = io.BytesIO()
    img = Image.new("L", (16, 16), color=0)
    for x in range(8):
        for y in range(16):
            img.putpixel((x, y), 255)
    img.save(buf, format="PNG")
    frames = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), 16, 16, 1)],
        "doc_id long, payload binary, width long, height long, n_frames long",
    )
    out = decode_real_features(frames).collect()
    assert len(out) == 1
    r = out[0]
    assert set(r.asDict()) == {f.name for f in REAL_DECODE_SCHEMA.fields}
    assert r.width == 16 and r.height == 16 and r.mode == "L"
    assert abs(r.mean_pixel - 127.5) < 1e-9
    assert len(r.thumb) == 64


def test_frame_sample_windows_tile_payload(documents):
    import pytest as _pytest

    from clusterforge_spark.operators.multimodal import attach_payload, frame_sample

    sub = attach_payload(documents.limit(50))
    rows = frame_sample(sub, stride=1).collect()  # every frame
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    meta = {r.doc_id: r for r in sub.collect()}
    for doc_id, frames in by_doc.items():
        frames.sort(key=lambda r: r.frame_idx)
        m = meta[doc_id]
        n_bytes = len(bytes(m.payload))
        assert len(frames) == m.n_frames
        # full tiling: windows are contiguous and cover [0, n_bytes)
        assert frames[0].byte_start == 0
        assert sum(f.byte_len for f in frames) == n_bytes
        for a, b in zip(frames, frames[1:]):
            assert a.byte_start + a.byte_len == b.byte_start
        # exact integer windows
        for f in frames:
            assert f.byte_start == f.frame_idx * n_bytes // m.n_frames
    # sampled variant is the stride subset
    sampled = frame_sample(sub, stride=3).collect()
    assert all(r.frame_idx % 3 == 0 for r in sampled)
    with _pytest.raises(ValueError):
        frame_sample(sub, stride=0)


def test_resize_plan_geometry(documents):
    import pytest as _pytest

    from clusterforge_spark.operators.multimodal import (
        RESIZE_TARGET,
        attach_payload,
        resize_plan,
    )

    sub = attach_payload(documents.limit(100))
    for r in resize_plan(sub).collect():
        long_side = max(r.width, r.height)
        assert r.out_width == max(1, r.width * RESIZE_TARGET // long_side)
        assert r.out_height == max(1, r.height * RESIZE_TARGET // long_side)
        # aspect preserved within integer truncation; no side exceeds target
        assert max(r.out_width, r.out_height) <= RESIZE_TARGET
        assert r.pad_x == (RESIZE_TARGET - r.out_width) // 2
        assert r.pad_y == (RESIZE_TARGET - r.out_height) // 2
        assert r.is_upscaled == (long_side < RESIZE_TARGET)
    with _pytest.raises(ValueError):
        resize_plan(sub, target=0)


def test_audio_window_plan_geometry(spark):
    """Hand-sized clip: 256-byte stereo payload = 64 samples -> exactly
    one window; 320-byte mono = 160 samples -> starts 0/32/64/96; byte
    offsets are sample_start*2*channels."""
    from clusterforge_spark.operators.multimodal import (
        AUDIO_WIN,
        audio_window_plan,
    )

    docs = spark.createDataFrame([(3, "x" * 256)], "doc_id long, text string")
    rows = audio_window_plan(docs).collect()
    # doc_id=3 -> sample_rate 8000, channels 2 -> n_samples 64 -> 1 window
    assert len(rows) == 1
    r = rows[0]
    assert (r["sample_rate"], r["channels"]) == (8000, 2)
    assert r["win_idx"] == 0 and r["sample_start"] == 0 and r["byte_start"] == 0
    mono = spark.createDataFrame([(4, "x" * 320)], "doc_id long, text string")
    rows = audio_window_plan(mono).collect()
    # doc_id=4 -> channels 1 -> 160 samples -> win starts 0,32,64,96
    starts = sorted(r["sample_start"] for r in rows)
    assert starts == [0, 32, 64, 96]
    for r in rows:
        assert r["byte_start"] == r["sample_start"] * 2
        assert r["byte_len_per_channel"] == AUDIO_WIN * 2


def test_audio_window_plan_short_clip_dropped(spark):
    from clusterforge_spark.operators.multimodal import audio_window_plan

    docs = spark.createDataFrame([(4, "tiny")], "doc_id long, text string")
    assert audio_window_plan(docs).count() == 0


def test_real_audio_decode_wav_end_to_end(spark):
    """The audio codec path actually decodes: synthesize two PCM WAV
    clips with the stdlib wave module (a full-scale square wave — known
    RMS/peak/ZCR in closed form — and a stereo silence clip), run them
    through decode_real_audio, and assert exact metadata plus the energy
    features to float tolerance."""
    import io
    import struct
    import wave as wavemod

    import pytest as _pytest

    from clusterforge_spark.operators.multimodal import decode_real_audio

    def wav_bytes(rate, channels, samples):
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
        return buf.getvalue()

    # mono square wave alternating ±16384 (=±0.5 normalized): rms=0.5,
    # peak=0.5, every consecutive pair crosses zero → zcr=1.0
    square = wav_bytes(8000, 1, [16384, -16384] * 50)
    # stereo silence, 25 frames at 16 kHz
    silence = wav_bytes(16000, 2, [0, 0] * 25)
    df = spark.createDataFrame(
        [(1, bytearray(square)), (2, bytearray(silence))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_real_audio(df).collect()}

    sq = rows[1]
    assert (sq["sample_rate"], sq["channels"], sq["n_samples"]) == (8000, 1, 100)
    assert sq["duration_sec"] == _pytest.approx(100 / 8000)
    assert sq["rms"] == _pytest.approx(0.5, abs=1e-9)
    assert sq["peak"] == _pytest.approx(0.5, abs=1e-9)
    assert sq["zcr"] == _pytest.approx(1.0)

    sil = rows[2]
    assert (sil["sample_rate"], sil["channels"], sil["n_samples"]) == (16000, 2, 25)
    assert sil["rms"] == 0.0 and sil["peak"] == 0.0 and sil["zcr"] == 0.0


def test_real_audio_decode_24bit_wav(spark):
    """24-bit PCM — the common studio WAV width the first fallback cut
    missed (it routed width-3 frames to a 4-byte frombuffer): a ±half-
    scale square wave at sampwidth 3 must decode to the same closed-form
    rms/peak/zcr as its 16-bit twin under EITHER backend (soundfile and
    the wave fallback both normalize half scale to 0.5)."""
    import io
    import struct
    import wave as wavemod

    import pytest as _pytest

    from clusterforge_spark.operators.multimodal import decode_real_audio

    half = 1 << 22  # 2^23 / 2 → 0.5 normalized
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(
            b"".join(struct.pack("<i", s)[:3] for s in [half, -half] * 50)
        )
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    row = decode_real_audio(df).collect()[0]
    assert (row["sample_rate"], row["channels"], row["n_samples"]) == (8000, 1, 100)
    assert row["rms"] == _pytest.approx(0.5, abs=1e-9)
    assert row["peak"] == _pytest.approx(0.5, abs=1e-9)
    assert row["zcr"] == _pytest.approx(1.0)
