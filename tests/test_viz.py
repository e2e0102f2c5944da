"""PNG visualization: file creation + valid PNG structure + CLI e2e
(parity with viz.rs:268-302's file-creation tests)."""

from __future__ import annotations

import struct
import zlib

from clusterforge_spark import viz
from clusterforge_spark.operators import features as FE
from clusterforge_spark.pipeline import run_full_pipeline
from clusterforge_spark.sources.readers import load_table

from tests.conftest import SF_DIR


def _assert_valid_png(path: str, width: int, height: int) -> bytes:
    """Check signature + IHDR dims and return the decoded raw RGB bytes."""
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (width, height)
    # locate IDAT and decompress — valid zlib stream of the right size
    i = data.index(b"IDAT")
    (length,) = struct.unpack(">I", data[i - 4 : i])
    raw = zlib.decompress(data[i + 4 : i + 4 + length])
    assert len(raw) == h * (w * 3 + 1)
    return raw


def test_create_cluster_visualization(tmp_path):
    out = str(tmp_path / "test_plot.png")
    pts = [(-1.0, -1.0), (1.0, 1.0), (0.5, -0.5), (0.5, 0.5), (0.0, 0.0), (0.8, -0.8)]
    labels = [0, 1, 2, 1, 0, 2]
    cens = [(-0.5, -0.5), (0.9, 0.9), (0.6, -0.6)]
    viz.create_cluster_visualization(pts, labels, cens, out)
    raw = _assert_valid_png(out, 800, 600)
    # a red cluster-0 point must have painted some red pixels
    assert b"\xff\x00\x00" in raw


def test_create_cluster_size_chart(tmp_path):
    out = str(tmp_path / "test_sizes.png")
    viz.create_cluster_size_chart([3, 2, 1], out)
    raw = _assert_valid_png(out, 600, 400)
    assert b"\x00\x00\xff" in raw  # blue bar for cluster 1


def test_generate_visualization_report(spark, tmp_path):
    res = run_full_pipeline(
        spark, FE.compute_rfm(load_table(spark, SF_DIR, "events")),
        n_rows=-1, k=4, seed=42,
    )
    base = str(tmp_path / "test_report.png")
    main_path, sizes_path = viz.generate_visualization_report(res, base)
    assert main_path == base
    assert sizes_path == str(tmp_path / "test_report_sizes.png")
    _assert_valid_png(main_path, 800, 600)
    _assert_valid_png(sizes_path, 600, 400)


def test_cli_full_mode_writes_both_pngs(spark, tmp_path, monkeypatch):
    # CLI e2e: --output p.png produces p.png AND p_sizes.png (main.rs:155-158)
    import clusterforge_spark.session as S
    from clusterforge_spark import cli

    # the CLI stops its session on exit; hand it the shared test session
    # with a no-op stop so the rest of the suite keeps its JVM
    monkeypatch.setattr(spark, "stop", lambda: None, raising=False)
    monkeypatch.setattr(S, "get_spark", lambda *a, **k: spark)

    out = str(tmp_path / "p.png")
    model = str(tmp_path / "m")
    rc = cli.main([
        "--input", SF_DIR, "--output", out, "--model", model,
    ])
    assert rc == 0
    _assert_valid_png(out, 800, 600)
    _assert_valid_png(str(tmp_path / "p_sizes.png"), 600, 400)
    # --model in full mode saved a loadable model
    from clusterforge_spark import model_store as MS

    assert MS.model_exists(spark, model)
