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
* documents/embeddings replicate with offset ids and — by default —
  IDENTICAL payloads: every document becomes a COPIES-member duplicate
  cluster, which is the ADVERSARIAL case for the dedup/LSH family (every
  band bucket COPIES-deep, within-bucket pair join quadratic in depth)
  and for IVF (every cell COPIES× denser with exact-duplicate points).

Payload mutate modes (round 10 — the second-decade measurement for the
text/embedding families needs a REALISTIC scale-up too, where corpus rows
grow 100× but duplicate-cluster depth stays what it was at sf0.1):

* ``SPARK_GRAFT_SF1_TEXT=cipher`` — per-copy substitution cipher over
  a-z via ``translate`` (copy 0 = identity). Token structure, lengths and
  character distributions are preserved; the shingle/vocabulary sets of
  different copies are DISJOINT, so cross-copy Jaccard ≈ 0 and the dedup
  pair graph scales linearly with copies instead of quadratically.
* ``SPARK_GRAFT_SF1_EMB=signflip`` — per-copy deterministic ±1 mask on
  the embedding dims (copy 0 = identity). Norms and within-copy geometry
  are exactly preserved; different copies land in different orthants, so
  IVF cells / kNN graphs don't degenerate into exact-duplicate piles.

Defaults stay ``dup``/``dup`` (back-compat: the recorded sf1 invariance
sweeps and the r9 graph-family sf10 runs used identical payloads).

Pure DuckDB; no Spark needed. Dims (region, nation) stay single-copy.
"""

from __future__ import annotations

import os
import random
import string
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))
TEXT_MODE = os.environ.get("SPARK_GRAFT_SF1_TEXT", "dup")
EMB_MODE = os.environ.get("SPARK_GRAFT_SF1_EMB", "dup")
assert TEXT_MODE in ("dup", "cipher") and EMB_MODE in ("dup", "signflip")

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
    # optional thread cap so dataset generation can share the box with a
    # concurrent test run (default: all cores, as before)
    thr = os.environ.get("SPARK_GRAFT_SF1_THREADS")
    if thr:
        con.execute(f"PRAGMA threads={int(thr)}")
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS c")

    def build(table: str, select_sql: str) -> None:
        # every '* EXCLUDE (..., c)' below must also exclude the copies
        # column: DuckDB's star expands over ALL from-clause tables, so a
        # bare '*' would leak the copy index into the replicated schema
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select_sql} FROM '{src}', copies) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"# {table}: {n} rows")

    build("customer", f"c_custkey + c * {OFF['custkey']} AS c_custkey, "
          "* EXCLUDE (c_custkey, c)")
    build("orders", f"o_orderkey + c * {OFF['orderkey']} AS o_orderkey, "
          f"o_custkey + c * {OFF['custkey']} AS o_custkey, "
          "* EXCLUDE (o_orderkey, o_custkey, c)")
    build("lineitem", f"l_orderkey + c * {OFF['orderkey']} AS l_orderkey, "
          f"l_partkey + c * {OFF['partkey']} AS l_partkey, "
          f"l_suppkey + c * {OFF['suppkey']} AS l_suppkey, "
          "* EXCLUDE (l_orderkey, l_partkey, l_suppkey, c)")
    build("supplier", f"s_suppkey + c * {OFF['suppkey']} AS s_suppkey, "
          "* EXCLUDE (s_suppkey, c)")
    build("part", f"p_partkey + c * {OFF['partkey']} AS p_partkey, "
          "* EXCLUDE (p_partkey, c)")
    build("events", f"event_id + c * {OFF['event_id']} AS event_id, ts, "
          f"user_id + c * {OFF['user_id']} AS user_id, event_type, value, "
          "'{\"k\": ' || (json_extract(props, '$.k')::BIGINT + c * "
          f"{OFF['page_k']}) || '}}' AS props")
    if TEXT_MODE == "cipher":
        # one LOWERCASE letter-permutation per copy, seeded by the copy
        # index so the dataset is reproducible; copy 0 is the identity so
        # the original sf0.1 rows appear verbatim. Scope note: translate
        # covers a-z only, so uppercase/digit-heavy tokens survive the
        # cipher unchanged and the cross-copy "disjoint vocabularies"
        # property holds only to the extent tokens are lowercase (true of
        # the synthetic fixture's word generator).
        alpha = string.ascii_lowercase
        perms = []
        for c in range(COPIES):
            letters = list(alpha)
            if c:
                random.Random(c).shuffle(letters)
            perms.append((c, "".join(letters)))
        con.execute("CREATE TABLE perms (c BIGINT, perm VARCHAR)")
        con.executemany("INSERT INTO perms VALUES (?, ?)", perms)
        # '* EXCLUDE (doc_id, text, c, perm)' keeps the projection tracking
        # the source schema (dup mode uses the same EXCLUDE form) — a
        # column added to the sf0.1 documents fixture must not be silently
        # dropped in cipher mode only
        con.execute(
            f"COPY (SELECT doc_id + c * {OFF['doc_id']} AS doc_id, "
            f"translate(text, '{alpha}', perm) AS text, "
            "* EXCLUDE (doc_id, text, c, perm) "
            f"FROM '{SRC}/documents.parquet', copies "
            "JOIN perms USING (c)) "
            f"TO '{DST}/documents.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/documents.parquet'"
        ).fetchone()[0]
        print(f"# documents: {n} rows (cipher mode)")
    else:
        build("documents", f"doc_id + c * {OFF['doc_id']} AS doc_id, "
              "* EXCLUDE (doc_id, c)")
    if EMB_MODE == "signflip":
        # deterministic per-(copy, dim) ±1 mask via an LCG-style bit mix;
        # c = 0 keeps every sign so the original vectors appear verbatim
        con.execute(
            f"COPY (SELECT vec_id + c * {OFF['emb_id']} AS vec_id, "
            "list_transform(embedding, (x, i) -> CASE WHEN c > 0 AND "
            "((c * 2654435761 + i * 40503) // 64) % 2 = 0 THEN -x ELSE x "
            "END)::FLOAT[] AS embedding, label "
            f"FROM '{SRC}/embeddings.parquet', copies) "
            f"TO '{DST}/embeddings.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/embeddings.parquet'"
        ).fetchone()[0]
        print(f"# embeddings: {n} rows (signflip mode)")
    else:
        build("embeddings", f"vec_id + c * {OFF['emb_id']} AS vec_id, "
              "* EXCLUDE (vec_id, c)")
    for dim in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{DST}/{dim}.parquet' (FORMAT PARQUET)"
        )
        print(f"# {dim}: single copy")


if __name__ == "__main__":
    main()
