"""HBase adapter contract tests (SURVEY.md §4.2 #4) — no live HBase.

The adapter's pivot schemas are the contract: cells
(row_key, family, qualifier, value) <-> mirror (sources/nutch.py). These
tests lock the conversions, the reference's family/qualifier configuration
surface (Nutch2WebpageOutputFormat.java:94-99), and that a cells-sourced
mirror is interchangeable with a Parquet mirror for the scan operators.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from giranking_spark.sources.hbase import (
    CELLS_SCHEMA,
    MIRROR_SCHEMA,
    HBaseConnectorUnavailable,
    cells_to_mirror,
    mirror_to_cells,
    read_webpage_hbase,
    write_webpage_hbase,
)
from giranking_spark.sources.nutch import scores_to_webpage_mirror, webpage_edges


def _cells(spark):
    rows = [
        ("com.google.www:http/", "ol", "http://www.yahoo.com/", ""),
        ("com.google.www:http/", "ol", "http://www.bing.com/", ""),
        ("com.google.www:http/", "mtdt", "_tf_", "1"),
        ("com.google.www:http/", "s", "score", "0.25"),
        ("com.yahoo.www:http/", "ol", "http://www.google.com/", ""),
    ]
    return spark.createDataFrame(rows, CELLS_SCHEMA)


def test_cells_to_mirror_shape_and_values(spark):
    m = cells_to_mirror(_cells(spark))
    assert [f.simpleString() for f in m.schema.fields] == [
        f.simpleString()
        for f in spark.createDataFrame([], MIRROR_SCHEMA).schema.fields
    ]
    rows = {r["row_key"]: r for r in m.collect()}
    g = rows["com.google.www:http/"]
    assert set(g["outlinks"]) == {"http://www.yahoo.com/", "http://www.bing.com/"}
    assert g["metadata"] == {"_tf_": "1"}
    assert g["score_legacy"] == pytest.approx(0.25)
    y = rows["com.yahoo.www:http/"]
    assert set(y["outlinks"]) == {"http://www.google.com/"}
    assert y["metadata"] == {} and y["score_legacy"] is None


def test_cells_mirror_cells_roundtrip(spark):
    cells = _cells(spark)
    back = mirror_to_cells(cells_to_mirror(cells))
    want = {
        (r["row_key"], r["family"], r["qualifier"], r["value"])
        for r in cells.collect()
        # the legacy score family normalizes to qualifier 'score'
        if r["family"] != "s"
    } | {("com.google.www:http/", "s", "score", "0.25")}
    assert {
        (r["row_key"], r["family"], r["qualifier"], r["value"])
        for r in back.collect()
    } == want


def test_cells_sourced_mirror_feeds_scans(spark):
    """A cells-sourced mirror drives webpage_edges identically to a Parquet
    mirror — the interchangeability the adapter exists for."""
    e = webpage_edges(cells_to_mirror(_cells(spark)))
    assert {(r["src"], r["dst"]) for r in e.collect()} == {
        ("http://www.google.com/", "http://www.yahoo.com/"),
        ("http://www.google.com/", "http://www.bing.com/"),
        ("http://www.yahoo.com/", "http://www.google.com/"),
    }


def test_write_cells_shape_and_config_surface(spark):
    """The write path produces (row_key, family, qualifier, value) puts with
    the reference's configurable family/qualifier (defaults mtdt/_lr_,
    Nutch2WebpageOutputFormat.java:94-99) and a re-reversed row key."""
    scores = spark.createDataFrame(
        [("http://www.google.com/", 9.25)], "id string, score double"
    )
    cells = mirror_to_cells(
        scores_to_webpage_mirror(scores, qualifier="_lr_")
        .withColumn("outlinks", F.lit(None).cast("map<string,string>"))
        .withColumn("score_legacy", F.lit(None).cast("double")),
        family_metadata="mtdt",
    )
    assert [(r["row_key"], r["family"], r["qualifier"], r["value"]) for r in cells.collect()] == [
        ("com.google.www:http/", "mtdt", "_lr_", "9.25")
    ]
    # custom family parity with giraph.linkRank.family
    custom = mirror_to_cells(
        scores_to_webpage_mirror(scores, qualifier="_tr_")
        .withColumn("outlinks", F.lit(None).cast("map<string,string>"))
        .withColumn("score_legacy", F.lit(None).cast("double")),
        family_metadata="f2",
    )
    assert custom.collect()[0]["family"] == "f2"
    assert custom.collect()[0]["qualifier"] == "_tr_"


def test_connector_gated_with_clear_error(spark):
    """Without the optional hbase-connectors jars both directions fail with
    the adapter's actionable error, not a raw py4j stack."""
    with pytest.raises(HBaseConnectorUnavailable, match="hbase-connectors"):
        read_webpage_hbase(spark, "webpage")
    scores = spark.createDataFrame(
        [("http://www.google.com/", 1.0)], "id string, score double"
    )
    with pytest.raises(HBaseConnectorUnavailable, match="hbase-connectors"):
        write_webpage_hbase(scores, "webpage")


def test_connector_config_golden_snapshot():
    """Golden-config contract (no HBase needed): the EXACT format string,
    option map, cells schema and score-cell coordinates emitted for the
    webpage and host tables. Any connector-side drift — a renamed option
    key, a changed default family/qualifier, a schema reorder — fails this
    test before it could fail against a live cluster. Reference parity:
    giraph.linkRank.family/qualifier defaults "mtdt"/"_lr_"
    (Nutch2WebpageOutputFormat.java:94-99), host qualifier "_hr_"
    (Nutch2HostOutputFormat.java:79-130)."""
    from giranking_spark.sources.hbase import connector_config, connector_options

    assert connector_config(
        "webpage", family="mtdt", qualifier="_lr_"
    ) == {
        "format": "org.apache.hadoop.hbase.spark",
        "options": {"hbase.table": "webpage"},
        "cells_schema": (
            "row_key string, family string, qualifier string, value string"
        ),
        "score_family": "mtdt",
        "score_qualifier": "_lr_",
    }
    assert connector_config("host", family="mtdt", qualifier="_hr_") == {
        "format": "org.apache.hadoop.hbase.spark",
        "options": {"hbase.table": "host"},
        "cells_schema": (
            "row_key string, family string, qualifier string, value string"
        ),
        "score_family": "mtdt",
        "score_qualifier": "_hr_",
    }
    # caller options pass through; the reserved table key cannot be hijacked
    assert connector_options(
        "webpage", {"hbase.spark.pushdown.columnfilter": "true", "hbase.table": "evil"}
    ) == {
        "hbase.table": "webpage",
        "hbase.spark.pushdown.columnfilter": "true",
    }


# ---------------------------------------------------------------------------
# Happy-path connector drive (VERDICT r8 item 5): the registered cells_file
# datasource (sources/cells_file.py) serves a golden cells export and
# records puts, so _load_cells/_save_cells execute their REAL reader/writer
# code paths — format().options().load()/save() — end-to-end with no HBase.
# The flow mirrors the reference's mini-cluster test
# (LinkRankHBaseTest.java:89-233): scan webpage table -> derive edges ->
# run LinkRank -> put scores back.

import glob
import json
import os

from giranking_spark.sources.cells_file import register_cells_file_source

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "hbase_webpage_cells.jsonl"
)


@pytest.fixture(scope="module")
def cells_file_format(spark):
    return register_cells_file_source(spark)


def test_connector_read_rank_write_e2e(spark, cells_file_format, tmp_path):
    """Read the golden webpage cells export through the datasource API,
    run LinkRank on the derived edges, write scores back through the same
    API, and assert the recorded puts (LinkRankHBaseTest.java:89-233 flow).
    """
    from giranking_spark.operators.linkrank import run_linkrank
    from giranking_spark.sources.hbase import write_webpage_hbase

    mirror = read_webpage_hbase(
        spark, "webpage", connector_format=cells_file_format,
        options={"mock.path": FIXTURE},
    )
    rows = {r["row_key"]: r for r in mirror.collect()}
    assert len(rows) == 4
    g = rows["com.google.www:http/"]
    assert set(g["outlinks"]) == {"http://www.yahoo.com/", "http://www.bing.com/"}
    assert g["metadata"] == {"_csh_": "1.0"}  # the 'f' family never leaks in
    assert g["score_legacy"] == pytest.approx(1.0)

    edges = webpage_edges(mirror)
    scores = run_linkrank(None, edges)
    outdir = tmp_path / "puts"
    outdir.mkdir()
    write_webpage_hbase(
        scores, "webpage", connector_format=cells_file_format,
        options={"mock.dir": str(outdir)},
    )
    puts = [
        json.loads(line)
        for p in glob.glob(str(outdir / "puts-*.jsonl"))
        for line in open(p)
    ]
    # one put per ranked vertex, score under mtdt:_lr_, re-reversed row key
    assert {p["row_key"] for p in puts} == {
        "com.google.www:http/",
        "com.yahoo.www:http/",
        "com.bing.www:http/",
        "com.example.www:http/page?ref=1",
    }
    assert all(p["family"] == "mtdt" and p["qualifier"] == "_lr_" for p in puts)
    assert all(float(p["value"]) > 0 for p in puts)
    # deterministic rank: google is the best-linked page
    by_key = {p["row_key"]: float(p["value"]) for p in puts}
    assert by_key["com.google.www:http/"] == max(by_key.values())
