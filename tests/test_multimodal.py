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
