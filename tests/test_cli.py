"""CLI argument semantics (cli.rs:69-95 parse tests)."""

from __future__ import annotations

import pytest

from clusterforge_spark.cli import build_parser, parse_rfm_values


def test_parse_rfm_happy_path():
    assert parse_rfm_values("30,10,500.0") == (30.0, 10.0, 500.0)
    assert parse_rfm_values(" 30 , 10 , 500 ") == (30.0, 10.0, 500.0)


def test_parse_rfm_wrong_arity():
    with pytest.raises(ValueError, match="expected 3"):
        parse_rfm_values("30,10")
    with pytest.raises(ValueError, match="expected 3"):
        parse_rfm_values("1,2,3,4")


def test_parse_rfm_bad_field_named():
    with pytest.raises(ValueError, match="invalid frequency"):
        parse_rfm_values("30,abc,500")
    with pytest.raises(ValueError, match="invalid monetary"):
        parse_rfm_values("30,10,xyz")


def test_parser_defaults():
    args = build_parser().parse_args(["--input", "x.csv"])
    assert args.clusters == 4
    assert args.max_iters == 300
    assert args.tolerance == 1e-4
    assert args.seed == 42
    assert args.predict is None
