"""Third-decade (sf100-mut) spot check for the dedup / ANN / text families.

sf100-mut = 1000 cipher/signflip-mutated copies of sf0.1 (5M docs, 2M
vectors, 100M events — tools/make_sf1.py with SPARK_GRAFT_SF1_COPIES=1000):
two decades above the biggest shipped fixture, one above the round-10
measurements. The families spot-checked here are the ones whose r10/r11
scale fixes claim linear-in-corpus candidate volume; a third decade either
confirms the wall ratio regime (~4-7x per 10x rows, fixed-overhead
amortization) or exposes the next cliff the way sf10 exposed the GEMM one.

Usage: python tools/sf100_spot.py [sf_dir] [key...]
Prints one JSON line per query: wall seconds + result row count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giranking_spark.queries import QUERIES
from giranking_spark.session import get_spark

DEFAULT_KEYS = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simsearch_ivf",
    "simsearch_ivf_scaled",
    "simsearch_lsh",
    "simsearch_lsh_scaled",
    "text_tfidf",
]


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    # first positional is the fixture dir only if it actually is one —
    # a key-only invocation then keeps the default dir
    if pos and os.path.isdir(pos[0]):
        sf_dir, keys = pos[0], pos[1:]
    else:
        sf_dir, keys = "/tmp/sg_sf100_mut", pos
    keys = keys or DEFAULT_KEYS
    unknown = [k for k in keys if k not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown registry keys: {unknown}")
    spark = get_spark()
    # warm the scan cache so the first query's wall is not fixture IO
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    for key in keys:
        t0 = time.time()
        # one failing query must not abort the sweep: a decade row that
        # says "died: <why>" is evidence too (r14 — components_star OOM'd
        # the default 8g heap at sf10 and killed the whole run)
        try:
            n = QUERIES[key](spark, sf_dir).count()
            rec = {"query": key, "wall_s": round(time.time() - t0, 2), "rows": n}
        except Exception as exc:  # noqa: BLE001
            rec = {
                "query": key,
                "wall_s": round(time.time() - t0, 2),
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }
            spark.catalog.clearCache()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
