"""Temporal join operators: as-of (union-tag + window) and chunk-bucketed
range join, checked against hand-computed micro-fixtures and pandas
merge_asof."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from giranking_spark.operators.joins import asof_join, bucket_range_join


def _left(spark):
    return spark.createDataFrame(
        [("u1", 100, "p1"), ("u1", 205, "p2"), ("u2", 50, "p3"), ("u3", 10, "p4")],
        "user STRING, lt BIGINT, pid STRING",
    )


def _right(spark):
    return spark.createDataFrame(
        [("u1", 100, "c1"), ("u1", 90, "c0"), ("u1", 201, "c2"), ("u2", 60, "c3")],
        "user STRING, rt BIGINT, cid STRING",
    )


def test_asof_backward_inclusive(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["user"], left_ts="lt", right_ts="rt"
    )
    got = {r["pid"]: (r["cid"], r["rt"]) for r in out.collect()}
    assert got["p1"] == ("c1", 100)  # inclusive: rt == lt matches
    assert got["p2"] == ("c2", 201)  # latest at-or-before, not first
    assert got["p3"] == (None, None)  # u2 click is AFTER the purchase
    assert got["p4"] == (None, None)  # u3 has no clicks at all


def test_asof_tolerance(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        on=["user"],
        left_ts="lt",
        right_ts="rt",
        tolerance=3,
    )
    got = {r["pid"]: r["cid"] for r in out.collect()}
    assert got["p1"] == "c1"  # age 0 <= 3
    assert got["p2"] is None  # age 4 > 3


def test_asof_matches_pandas_merge_asof(spark):
    lp = _left(spark).toPandas().sort_values("lt")
    rp = _right(spark).toPandas().sort_values("rt")
    expect = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="user")
    out = (
        asof_join(_left(spark), _right(spark), ["user"], "lt", "rt")
        .toPandas()
        .sort_values("lt")
    )
    for c in ("user", "lt", "cid"):
        assert list(out[c].fillna("-")) == list(expect[c].fillna("-"))


def test_bucket_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [("u1", 0), ("u1", 10), ("u1", 25), ("u1", 26), ("u1", 99), ("u2", 10)],
        "user STRING, t BIGINT",
    )
    iv = spark.createDataFrame(
        [("u1", 10, 25, "A"), ("u1", 90, 130, "B")],
        "user STRING, lo BIGINT, hi BIGINT, iid STRING",
    )
    # chunk smaller than interval → multi-chunk explode path exercised
    out = bucket_range_join(pts, iv, ["user"], "t", "lo", "hi", chunk=7)
    got = sorted((r["t"], r["iid"]) for r in out.collect())
    # inclusive bounds; u2's t=10 must NOT match u1's interval
    assert got == [(10, "A"), (25, "A"), (99, "B")]


def test_bucket_range_join_no_duplicate_pairs(spark):
    pts = spark.createDataFrame([("u", 50)], "user STRING, t BIGINT")
    iv = spark.createDataFrame([("u", 0, 100, "A")], "user STRING, lo BIGINT, hi BIGINT, iid STRING")
    out = bucket_range_join(pts, iv, ["user"], "t", "lo", "hi", chunk=10)
    assert out.count() == 1  # interval spans 11 chunks, pair still appears once
