"""HBase connectivity adapter for the Nutch 2.x tables (SURVEY.md §4.2 #4).

The reference reads/writes live HBase tables through Giraph's HBase formats
(io/Nutch2WebpageInputFormat.java:47-211, Nutch2WebpageOutputFormat.java:46-133).
This repo computes on the Parquet *mirror* schema (sources/nutch.py); this
module is the bridge that keeps the two interchangeable:

    live HBase table  <-- connector -->  cells  <-- this module -->  mirror

The pivot point is the CELLS relation ``(row_key, family, qualifier, value)``
— the shape every public HBase access path yields (hbase-connectors' Spark
datasource, TableInputFormat, a CDC export). It is the ONLY representation
that can carry Nutch's dynamic-qualifier families (`ol` holds one qualifier
per outlink URL — a fixed hbase.columns.mapping cannot express that), and it
keeps this adapter connector-agnostic.

What is real and tested here (no HBase needed): cells -> mirror -> cells
conversions, family/qualifier configuration parity with the reference
(``giraph.linkRank.family`` / ``giraph.linkRank.qualifier`` defaults
"mtdt" / "_lr_", Nutch2WebpageOutputFormat.java:94-99), and the score sink
shapes. What is gated behind the optional connector: the 5-line load/save of
the cells relation itself (raises :class:`HBaseConnectorUnavailable` with
setup guidance when the jars aren't on the classpath).

Scale note: cells -> mirror is ONE groupBy(row_key) with map_from_entries —
the same shuffle an HBase scan already implies; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.sources.nutch import (
    QUAL_HOSTRANK,
    QUAL_LINKRANK,
    scores_to_host_mirror,
    scores_to_webpage_mirror,
)

#: mirror-side schema (FIXTURES.md §2) — what sources/nutch.py scans consume
MIRROR_SCHEMA = (
    "row_key string, outlinks map<string,string>, "
    "metadata map<string,string>, score_legacy double"
)
#: connector-side schema — one row per HBase cell
CELLS_SCHEMA = "row_key string, family string, qualifier string, value string"

FAMILY_OUTLINKS = "ol"    # Nutch2WebpageInputFormat.java:64 OUTLINKS_FAMILY
FAMILY_METADATA = "mtdt"  # Nutch2WebpageOutputFormat.java:78,94-95
FAMILY_SCORE = "s"        # legacy score family — parsed, IGNORED by scans
                          # (Nutch2HostInputFormat.java:155-157)

#: the Apache hbase-connectors Spark datasource short name
DEFAULT_CONNECTOR_FORMAT = "org.apache.hadoop.hbase.spark"


class HBaseConnectorUnavailable(RuntimeError):
    """The optional HBase connector is not on the classpath."""


def cells_to_mirror(
    cells: DataFrame,
    family_outlinks: str = FAMILY_OUTLINKS,
    family_metadata: str = FAMILY_METADATA,
    family_score: str = FAMILY_SCORE,
) -> DataFrame:
    """Pivot a cells relation into the mirror schema: one row per row key,
    each dynamic-qualifier family gathered into a map column.

    ``collect_list`` drops the null structs produced for other families, so
    each map holds exactly its family's qualifiers; the legacy ``s`` family
    is surfaced as ``score_legacy`` for schema parity but (matching the
    reference) never consumed by the scans."""
    def fam_map(fam: str):
        return F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("family") == fam, F.struct("qualifier", "value")
                )
            )
        )

    return cells.groupBy("row_key").agg(
        fam_map(family_outlinks).alias("outlinks"),
        fam_map(family_metadata).alias("metadata"),
        F.max(
            F.when(F.col("family") == family_score, F.col("value").cast("double"))
        ).alias("score_legacy"),
    )


def mirror_to_cells(
    mirror: DataFrame,
    family_outlinks: str = FAMILY_OUTLINKS,
    family_metadata: str = FAMILY_METADATA,
    family_score: str = FAMILY_SCORE,
) -> DataFrame:
    """Inverse pivot: mirror rows -> one row per cell (write-side shape).
    Null/absent maps contribute no cells, mirroring HBase's sparse puts."""
    def explode_fam(col: str, fam: str) -> DataFrame:
        return mirror.select(
            "row_key",
            F.lit(fam).alias("family"),
            F.explode(F.coalesce(F.col(col), F.create_map())).alias(
                "qualifier", "value"
            ),
        )

    score = mirror.filter(F.col("score_legacy").isNotNull()).select(
        "row_key",
        F.lit(family_score).alias("family"),
        F.lit("score").alias("qualifier"),
        F.col("score_legacy").cast("string").alias("value"),
    )
    return (
        explode_fam("outlinks", family_outlinks)
        .unionByName(explode_fam("metadata", family_metadata))
        .unionByName(score)
    )


def connector_options(table: str, options: dict | None = None) -> dict:
    """The EXACT option map handed to the connector datasource, load and
    save side alike — a single construction point so tests can pin it
    (golden-config contract) and drift between read/write paths is
    impossible. Caller options override nothing reserved: ``hbase.table``
    is ours."""
    out = {"hbase.table": table}
    out.update(options or {})
    out["hbase.table"] = table
    return out


def connector_config(
    table: str,
    connector_format: str = DEFAULT_CONNECTOR_FORMAT,
    options: dict | None = None,
    family: str | None = None,
    qualifier: str | None = None,
) -> dict:
    """Full config snapshot for one connector interaction: format + options
    (+ score cell coordinates on the write side). Pure — safe to golden-pin
    in tests with no HBase anywhere."""
    cfg = {
        "format": connector_format,
        "options": connector_options(table, options),
        "cells_schema": CELLS_SCHEMA,
    }
    if family is not None:
        cfg["score_family"] = family
    if qualifier is not None:
        cfg["score_qualifier"] = qualifier
    return cfg


def _load_cells(
    spark: SparkSession,
    table: str,
    connector_format: str,
    options: dict | None,
) -> DataFrame:
    reader = spark.read.format(connector_format)
    for k, v in connector_options(table, options).items():
        reader = reader.option(k, v)
    try:
        return reader.load().select(
            F.col("row_key").cast("string"),
            F.col("family").cast("string"),
            F.col("qualifier").cast("string"),
            F.col("value").cast("string"),
        )
    except Exception as ex:  # connector jar absent / misconfigured
        raise HBaseConnectorUnavailable(
            f"cannot load HBase table {table!r} via {connector_format!r}: {ex}. "
            "Add the Apache hbase-connectors (hbase-spark) jars and an "
            "hbase-site.xml to the Spark classpath, or read a Parquet mirror "
            "with the same schema instead (sources/nutch.py)."
        ) from ex


def read_webpage_hbase(
    spark: SparkSession,
    table: str = "webpage",
    connector_format: str = DEFAULT_CONNECTOR_FORMAT,
    options: dict | None = None,
) -> DataFrame:
    """Live-table counterpart of a webpage Parquet mirror: returns the mirror
    schema, consumable by webpage_vertices/webpage_edges unchanged."""
    return cells_to_mirror(_load_cells(spark, table, connector_format, options))


def read_host_hbase(
    spark: SparkSession,
    table: str = "host",
    connector_format: str = DEFAULT_CONNECTOR_FORMAT,
    options: dict | None = None,
) -> DataFrame:
    """Live-table counterpart of a host Parquet mirror (trust flag rides in
    the metadata map exactly as in the mirror)."""
    return cells_to_mirror(_load_cells(spark, table, connector_format, options))


def _save_cells(
    cells: DataFrame,
    table: str,
    connector_format: str,
    options: dict | None,
) -> None:
    # HBase writes are puts (row-level upserts): append is the one save
    # mode with those semantics — ErrorIfExists/Overwrite are table-level
    # concepts a live table never wants from a rank refresh
    writer = cells.write.format(connector_format).mode("append")
    for k, v in connector_options(table, options).items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as ex:
        raise HBaseConnectorUnavailable(
            f"cannot write HBase table {table!r} via {connector_format!r}: {ex}. "
            "Add the Apache hbase-connectors (hbase-spark) jars to the Spark "
            "classpath, or write the mirror DataFrame to Parquet instead."
        ) from ex


def write_webpage_hbase(
    scores: DataFrame,
    table: str = "webpage",
    qualifier: str = QUAL_LINKRANK,
    family: str = FAMILY_METADATA,
    connector_format: str = DEFAULT_CONNECTOR_FORMAT,
    options: dict | None = None,
) -> None:
    """Write (id, score) back into the live webpage table: re-reversed row
    key, score under ``family:qualifier`` — the configuration surface of
    ``giraph.linkRank.family`` / ``giraph.linkRank.qualifier``
    (Nutch2WebpageOutputFormat.java:94-99, defaults "mtdt" / "_lr_")."""
    mirror = scores_to_webpage_mirror(scores, qualifier)
    cells = mirror_to_cells(
        mirror.withColumn("outlinks", F.lit(None).cast("map<string,string>"))
        .withColumn("score_legacy", F.lit(None).cast("double")),
        family_metadata=family,
    )
    _save_cells(cells, table, connector_format, options)


def write_host_hbase(
    scores: DataFrame,
    table: str = "host",
    qualifier: str = QUAL_HOSTRANK,
    family: str = FAMILY_METADATA,
    connector_format: str = DEFAULT_CONNECTOR_FORMAT,
    options: dict | None = None,
) -> None:
    """Write (id, score) back into the live host table
    (Nutch2HostOutputFormat.java:79-130)."""
    mirror = scores_to_host_mirror(scores, qualifier)
    cells = mirror_to_cells(
        mirror.withColumn("outlinks", F.lit(None).cast("map<string,string>"))
        .withColumn("score_legacy", F.lit(None).cast("double")),
        family_metadata=family,
    )
    _save_cells(cells, table, connector_format, options)
