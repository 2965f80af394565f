"""Recall-vs-decade evidence for the scaled ANN operating points.

The r12 verdict: "a scaled ANN row without its recall is half a
measurement." This tool measures recall@5 of the two production ANN
shapes — corpus-scaled multi-probe sign-LSH (LSH_PROBE_FLIPS) and
corpus-scaled multi-probe IVF (IVF_SCALE_NPROBE) — against the exact
brute-force top-5 on any fixture or derived-decade directory, and prints
one JSON line per method: recall, perfect fraction, wall seconds.

``--qmod`` subsamples the query set (vec_id % qmod == 0; default 50 =
the registry's own query rule). The exact ground truth is |Q|x|C| work,
so at sf100-mut (2M vectors) pass --qmod 5000: 400 queries keep the
exact side tractable while recall over a uniform query subsample is an
unbiased estimate of recall over all queries.

Usage: python tools/ann_recall.py [sf_dir] [--qmod N] [--only lsh,ivf]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from giranking_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--qmod", type=int, default=50)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else {"lsh", "ivf"}

    from giranking_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        scaled_lsh_rows,
    )
    from giranking_spark.queries.simq import (
        IVF_CELLS,
        IVF_SCALE_NPROBE,
        IVF_SCALE_TARGET,
        LSH_BANDS,
        LSH_DIM,
        LSH_PROBE_FLIPS,
        LSH_ROWS,
        LSH_ROWS_MAX,
        LSH_SCALE_TARGET,
        LSH_SEED,
        TOPK,
    )

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    corpus = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        .repartition(width, F.col("vec_id"))
    )
    queries = corpus.filter(F.col("vec_id") % args.qmod == 0)
    n = corpus.count()
    nq = queries.count()
    print(f"# corpus={n} queries={nq}", file=sys.stderr)

    t0 = time.time()
    exact = (
        brute_force_topk(corpus, queries, k=TOPK)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    exact_wall = round(time.time() - t0, 2)
    print(f"# exact ground truth: {n_exact} rows, {exact_wall}s",
          file=sys.stderr)

    def measure(name, ann_df):
        t = time.time()
        ann = ann_df.select("query_id", "neighbor_id").localCheckpoint(
            eager=True
        )
        wall = round(time.time() - t, 2)
        hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi").count()
        per_q = (
            exact.groupBy("query_id").count().withColumnRenamed("count", "ne")
            .join(
                ann.join(exact, ["query_id", "neighbor_id"], "left_semi")
                .groupBy("query_id").count().withColumnRenamed("count", "nh"),
                "query_id", "left")
        )
        n_perfect = per_q.filter(F.col("nh") == F.col("ne")).count()
        print(json.dumps({
            "method": name, "sf_dir": args.sf_dir, "corpus": n,
            "n_queries": nq, "k": TOPK, "qmod": args.qmod,
            "recall": round(hits / n_exact, 4),
            "perfect_frac": round(n_perfect / nq, 4),
            "ann_wall_s": wall, "exact_wall_s": exact_wall,
        }))

    if "lsh" in only:
        rows = scaled_lsh_rows(n, LSH_ROWS, LSH_ROWS_MAX, LSH_SCALE_TARGET)
        measure("lsh_scaled_multiprobe", lsh_topk(
            corpus, queries, bands=LSH_BANDS, rows=rows, k=TOPK, dim=LSH_DIM,
            seed=LSH_SEED, stride=LSH_ROWS_MAX, corpus_count=n,
            flips=LSH_PROBE_FLIPS,
        ))
    if "ivf" in only:
        c = max(IVF_CELLS, n // IVF_SCALE_TARGET)
        measure("ivf_scaled_multiprobe", ivf_topk(
            corpus, queries, c=c, nprobe=IVF_SCALE_NPROBE, k=TOPK,
            corpus_count=n,
        ))


if __name__ == "__main__":
    main()
