"""Session-aging attribution probe (r14, VERDICT #5).

The r13 round measured warm ~1.6 s queries costing ~9 s at 224-query
session depth and rejected heap scaling as the fix. This tool isolates the
aging curve: run a cheap PROBE query, then batches of FILLER queries, and
re-time the probe at increasing session depth — all in one session, same
clearCache+GC hygiene as bench.py between timings.

Usage:
  python tools/aging_probe.py [probe_key] [n_batches] [fillers_per_batch]

Environment:
  SPARK_GRAFT_SF_DIR       fixture dir (default sf0.1)
  SPARK_GRAFT_DRIVER_JAVA  extra driver JVM options (e.g.
                           "-XX:ReservedCodeCacheSize=512m") — the A/B arm
                           knob; applied via spark.driver.extraJavaOptions
                           before session creation.

Prints one JSON line per probe sample: {"depth": N, "probe_s": ..., "mf": ...}
plus a final summary with the JVM code-cache / metaspace telemetry readable
from java.lang.management (local mode: driver == executor).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

extra = os.environ.get("SPARK_GRAFT_DRIVER_JAVA")
if extra:
    # must be set before the JVM launches
    prev = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f'--driver-java-options "{extra}" ' + prev
    )

from giranking_spark.queries import QUERIES  # noqa: E402
from giranking_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _hygiene(spark):
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def _mem_pools(spark):
    """Code-cache / metaspace usage from the driver JVM (MB)."""
    jvm = spark.sparkContext._jvm
    out = {}
    it = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        name = b.getName()
        if "CodeHeap" in name or "Metaspace" in name or "Code Cache" in name:
            u = b.getUsage()
            out[name] = round(u.getUsed() / 1048576.0, 1)
    return out


def main() -> None:
    probe_key = sys.argv[1] if len(sys.argv) > 1 else "text_char_entropy"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("aging-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # deterministic filler order: registry order minus the probe itself and
    # the priciest loop queries (the curve should measure SESSION state, not
    # spend its wall on 15 s fixpoints)
    skip = {
        probe_key, "graph_components_star", "graph_components", "corpus_pipeline",
        "dedup_clusters", "linkrank_scores", "rank_warm_restart", "graph_ppr",
        "graph_walks", "rank_topk", "graph_wcc_bfs_layers", "graph_ecc_sample",
    }
    fillers = [k for k in QUERIES if k not in skip]
    depth = 0

    def probe():
        _hygiene(spark)
        t0 = time.perf_counter()
        _force(QUERIES[probe_key](spark, SF))
        w = round(time.perf_counter() - t0, 3)
        print(json.dumps({"depth": depth, "probe_s": w, "pools_mb": _mem_pools(spark)}), flush=True)

    probe()
    fi = 0
    for _ in range(n_batches):
        for _ in range(per_batch):
            k = fillers[fi % len(fillers)]
            fi += 1
            try:
                _force(QUERIES[k](spark, SF))
            except Exception as exc:  # noqa: BLE001 — keep the curve going
                print(f"# filler {k} failed: {exc}", file=sys.stderr)
            depth += 1
            _hygiene(spark)
        probe()


if __name__ == "__main__":
    main()
