"""Partition-invariance sweep: same value hash under different parallelism.

VERDICT r8 item 3: the components / minhash families have no sf1 DuckDB
oracle (the recursive-CTE / unnest oracles blow up past ~30 min / 48 GB),
so their sf1 evidence was bench-only. This closes the gap WITHOUT DuckDB:
a query whose result value-hash is identical under local[5]/4 shuffle
partitions and local[32]/32 shuffle partitions cannot depend on partition
count, task scheduling, or aggregation tree shape — the failure modes a
wrong-at-scale implementation exhibits.

Usage: python tools/sweep_invariance.py <cpus> [sf_dir] [keys...]
Prints one JSON line per query: {"name", "cpus", "rows", "hash", "wall_s"}.
Run once per parallelism level and diff the hashes (the driver-gate hash
discipline applies: sorted columns by name, sorted rows, 6-decimal rounding
already inside each query).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

import __spark_entry__ as entrymod
from giranking_spark.session import get_spark

DEFAULT_KEYS = [
    "graph_components",
    "graph_components_star",
    "graph_component_sizes",
    "dedup_minhash_sig",
    "dedup_minhash_lsh",
    "dedup_minhash_estimate",
    "dedup_clusters",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"
    )
    keys = sys.argv[3:] or DEFAULT_KEYS
    spark = get_spark("invariance", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in keys:
        t0 = time.time()
        pdf = queries[name](spark, sf_dir).toPandas()
        print(json.dumps({
            "name": name, "cpus": cpus, "rows": len(pdf),
            "hash": value_hash(pdf), "wall_s": round(time.time() - t0, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
