"""Build a hub-skewed edge fixture for load-testing the skew mitigations.

VERDICT r8 item 4: the salted paths (operators/skew.py, linkrank
salt_buckets) were plan-shape-tested but never *triggered by data*. This
tool writes a power-law-ish graph whose two hubs are each ~20x a median
shuffle partition at 32 partitions, so an unsalted exchange on the edge key
demonstrably concentrates work on one reducer:

* background: BG_EDGES uniform edges over N_VERTS vertices (out-deg ~20)
* out-hub:    vertex 'SRCHUB' -> HUB_OUT distinct targets (join-skew on
              the src-keyed exchange every rank superstep performs)
* in-hub:     HUB_IN distinct sources -> vertex 'INHUB' (agg-skew on the
              per-target message sum -- the case map-side partial
              aggregation is supposed to absorb)

Deterministic (hash-derived endpoints, no RNG). Pure DuckDB; writes
``$SPARK_GRAFT_SKEW_DIR`` (default /tmp/spark_graft_skew)/edges.parquet.
"""

from __future__ import annotations

import os

import duckdb

DST = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew")
N_VERTS = int(os.environ.get("SPARK_GRAFT_SKEW_VERTS", "100000"))
BG_EDGES = int(os.environ.get("SPARK_GRAFT_SKEW_BG", "2000000"))
HUB_OUT = int(os.environ.get("SPARK_GRAFT_SKEW_OUT", "2000000"))
HUB_IN = int(os.environ.get("SPARK_GRAFT_SKEW_IN", "1000000"))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT 'v' || (hash(range)  % {N_VERTS}) AS src,
                 'v' || (hash(range + 7777777) % {N_VERTS}) AS dst
          FROM range({BG_EDGES})
          UNION ALL
          SELECT 'SRCHUB' AS src, 'w' || range AS dst FROM range({HUB_OUT})
          UNION ALL
          SELECT 'u' || range AS src, 'INHUB' AS dst FROM range({HUB_IN})
        ) TO '{DST}/edges.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(f"SELECT count(*) FROM '{DST}/edges.parquet'").fetchone()[0]
    print(f"# edges: {n} rows -> {DST}/edges.parquet "
          f"(bg={BG_EDGES}, out-hub={HUB_OUT}, in-hub={HUB_IN})")


if __name__ == "__main__":
    main()
