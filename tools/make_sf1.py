"""Build an sf1 scale-evidence dataset: 10 key-offset copies of sf0.1.

The driver ships sf{0.001,0.01,0.1}; the 100 TB design claims (checkpoint
cadence, broadcast fallbacks, banded joins) deserve at least one measured
decade above the biggest shipped fixture. This tool replicates sf0.1 ten
times into ``$SPARK_GRAFT_SF1_DIR`` (default /tmp/spark_graft_sf1) with
every key domain offset per copy, so:

* the TPC-H-ish join graph (orders ⋈ lineitem -> customer/supplier edges)
  becomes 10 disjoint copies — 10x vertices and edges, identical diameter:
  exactly the shape that measures rows-per-superstep scaling of the
  fixpoint operators without confounding it with iteration-count changes;
* events get offset user/event/page ids — the navigation graph also
  scales 10x;
* documents/embeddings replicate with offset ids and IDENTICAL payloads —
  every document becomes a 10-member duplicate cluster, which is the
  HARD case for the dedup/LSH family (every band bucket 10-deep) and for
  IVF (every cell 10x denser).

Pure DuckDB; no Spark needed. Dims (region, nation) stay single-copy.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))

#: key-offset strata: strictly above each domain's sf0.1 max, and a round
#: power of ten so offset keys stay human-readable in debug output
OFF = {
    "custkey": 100_000,
    "orderkey": 1_000_000,
    "suppkey": 10_000,
    "partkey": 100_000,
    "user_id": 10_000,
    "event_id": 1_000_000,
    "page_k": 1_000,
    "doc_id": 100_000,
    "emb_id": 100_000,
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS c")

    def build(table: str, select_sql: str) -> None:
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select_sql} FROM '{src}', copies) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"# {table}: {n} rows")

    build("customer", f"c_custkey + c * {OFF['custkey']} AS c_custkey, "
          "* EXCLUDE (c_custkey)")
    build("orders", f"o_orderkey + c * {OFF['orderkey']} AS o_orderkey, "
          f"o_custkey + c * {OFF['custkey']} AS o_custkey, "
          "* EXCLUDE (o_orderkey, o_custkey)")
    build("lineitem", f"l_orderkey + c * {OFF['orderkey']} AS l_orderkey, "
          f"l_partkey + c * {OFF['partkey']} AS l_partkey, "
          f"l_suppkey + c * {OFF['suppkey']} AS l_suppkey, "
          "* EXCLUDE (l_orderkey, l_partkey, l_suppkey)")
    build("supplier", f"s_suppkey + c * {OFF['suppkey']} AS s_suppkey, "
          "* EXCLUDE (s_suppkey)")
    build("part", f"p_partkey + c * {OFF['partkey']} AS p_partkey, "
          "* EXCLUDE (p_partkey)")
    build("events", f"event_id + c * {OFF['event_id']} AS event_id, ts, "
          f"user_id + c * {OFF['user_id']} AS user_id, event_type, value, "
          "'{\"k\": ' || (json_extract(props, '$.k')::BIGINT + c * "
          f"{OFF['page_k']}) || '}}' AS props")
    build("documents", f"doc_id + c * {OFF['doc_id']} AS doc_id, "
          "* EXCLUDE (doc_id)")
    build("embeddings", f"vec_id + c * {OFF['emb_id']} AS vec_id, "
          "* EXCLUDE (vec_id)")
    for dim in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{DST}/{dim}.parquet' (FORMAT PARQUET)"
        )
        print(f"# {dim}: single copy")


if __name__ == "__main__":
    main()
