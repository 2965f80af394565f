"""Attribute Spark event-log time to bench queries (guide §1 measurement).

Reads a Spark event log (JSON lines) produced by a bench run with
``SPARK_GRAFT_EVENTLOG_DIR`` set, plus the bench's ``bench_full*.json``
sidecar (per-query epoch spans), and prints for each query:

* jobs / stages / tasks launched inside the query's wall span
* summed task time vs wall time (parallelism efficiency)
* scheduler-ish dead time: wall - sum(per-job wall)
* top stages by wall

Usage: python tools/evlog_report.py <eventlog-file> <bench_full.json> [query ...]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    ev_path, bench_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    bench = json.load(open(bench_path))
    spans = bench["query_spans_epoch"]

    jobs = {}       # jobId -> dict(start, end, stages)
    stages = {}     # stageId -> dict(start, end, ntasks, tasktime)
    with open(ev_path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"] / 1000.0,
                    "end": None,
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                }
            elif t == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"] / 1000.0
            elif t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {})
                st["start"] = (si.get("Submission Time") or 0) / 1000.0
                st["end"] = (si.get("Completion Time") or 0) / 1000.0
                st["ntasks"] = si.get("Number of Tasks", 0)
                st["name"] = si.get("Stage Name", "")
            elif t == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                ti = e.get("Task Info", {})
                d = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                st = stages.setdefault(sid, {})
                st["tasktime"] = st.get("tasktime", 0.0) + d
                st["ntasks_done"] = st.get("ntasks_done", 0) + 1

    for q, (t0, t1) in spans.items():
        if only and q not in only:
            continue
        qjobs = {
            j: info for j, info in jobs.items()
            if info["end"] and t0 <= info["start"] and info["end"] <= t1 + 0.5
        }
        qstages = set()
        for info in qjobs.values():
            qstages |= set(info["stages"])
        jw = sum(i["end"] - i["start"] for i in qjobs.values())
        ntasks = sum(stages.get(s, {}).get("ntasks_done", 0) for s in qstages)
        ttime = sum(stages.get(s, {}).get("tasktime", 0.0) for s in qstages)
        wall = t1 - t0
        print(
            f"{q}: wall={wall:.2f}s jobs={len(qjobs)} job_wall={jw:.2f}s "
            f"gap={wall - jw:.2f}s stages={len(qstages)} tasks={ntasks} "
            f"tasktime={ttime:.1f}s"
        )
        top = sorted(
            (
                (stages[s].get("end", 0) - stages[s].get("start", 0), s)
                for s in qstages
                if s in stages and stages[s].get("end")
            ),
            reverse=True,
        )[:8]
        for dur, s in top:
            st = stages[s]
            print(
                f"    stage {s}: {dur:.2f}s tasks={st.get('ntasks_done', 0)} "
                f"tasktime={st.get('tasktime', 0.0):.2f}s "
                f"{st.get('name', '')[:80]}"
            )


if __name__ == "__main__":
    main()
