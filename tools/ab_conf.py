"""Interleaved A/B of runtime SQL confs on bench queries (guide §1).

Runs each named query 2*reps times alternating conf A/B per rep (A,B,A,B,...)
in ONE session, noop-sink timing, reporting per-arm medians. Interleaving
cancels box drift that poisons sequential A/B on a noisy VM.

Usage:
  python tools/ab_conf.py "conf1=val1,conf2=val2" q1,q2,... [reps_per_arm]
Env: SPARK_GRAFT_SF_DIR (default sf0.1)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giranking_spark.session import get_spark


def main() -> None:
    confs = dict(kv.split("=", 1) for kv in sys.argv[1].split(","))
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("giranking-ab")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    base = {k: spark.conf.get(k, None) for k in confs}
    print(f"# base values: {base}", file=sys.stderr)

    # warmup
    qs["graph_vertices"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in names:
        samples: dict[str, list[float]] = {"A": [], "B": []}
        for r in range(2 * reps):
            arm = "B" if r % 2 else "A"
            for k, v in confs.items():
                if arm == "B":
                    spark.conf.set(k, v)
                elif base[k] is not None:
                    spark.conf.set(k, base[k])
                else:
                    spark.conf.unset(k)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[arm].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        med = {
            arm: round(sorted(v)[len(v) // 2], 3) for arm, v in samples.items()
        }
        out[name] = {
            "A_base": med["A"],
            "B_conf": med["B"],
            "ratio": round(med["B"] / med["A"], 3),
            "A_all": [round(x, 2) for x in samples["A"]],
            "B_all": [round(x, 2) for x in samples["B"]],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
