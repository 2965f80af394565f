"""Streaming scale evidence (VERDICT r9 item 5).

The 13 ``stream_*`` registry keys verify CORRECTNESS on bounded replays at
sf0.001/0.01; this tool measures the SCALE claims of the two stateful
shapes a production cluster actually runs — the watermarked tumbling
window aggregation and the watermarked stream-stream interval join — over
the sf1/sf10 events relation as a bounded-rate, event-time-ordered
microbatch replay:

* splits events into ``--files`` time-ordered parquet slices (a file
  stream replays them oldest-first: monotone mtimes + lexicographic
  names), so the watermark advances the way it does against a live source
  and state actually EXPIRES — an unordered replay never expires anything
  and measures a state store the production query would never build;
* runs each query with ``maxFilesPerTrigger`` bounding the per-batch row
  rate, through the noop sink (all rows computed, none collected);
* prints one JSONL row per micro-batch: input rows, trigger wall,
  state-store rows/bytes, current watermark — the numbers that show
  whether state is bounded by the WATERMARK (flat across batches, the
  100 TB survival property) or by the CORPUS (grows with replay, a leak).

Usage: python tools/stream_scale.py [sf_dir] [--files N] [--per-trigger K]
Env:   SPARK_GRAFT_STREAM_STATE_PARTS (default 8) sizes the state shuffle.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r12 ADVICE: the previous hand-rolled flag scan dropped a positional
# SF_DIR that textually equaled any flag VALUE and IndexError'd on a
# trailing valueless flag; argparse removes both failure modes. Parsing
# happens in _parse_args(), called only under __main__ — tests import this
# module for split_time_ordered/drive and must not have pytest's argv
# parsed (module-level parse_args() aborted the whole suite on -x -q).
SF_DIR = "/tmp/sg_sf1_mut"
N_FILES = 40
PER_TRIGGER = 4
ONLY: set[str] | None = None
STATE_PARTS = int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS", "8"))


def _parse_args() -> None:
    global SF_DIR, N_FILES, PER_TRIGGER, ONLY
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default=SF_DIR)
    ap.add_argument("--files", type=int, default=N_FILES)
    ap.add_argument(
        "--per-trigger", type=int, default=PER_TRIGGER, dest="per_trigger"
    )
    #: --only a,b,c selects which shapes run (default: all) — the r12
    #: user-state throughput comparison reruns just that trio without
    #: paying the window/join replays again
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    SF_DIR = args.sf_dir
    N_FILES = args.files
    PER_TRIGGER = args.per_trigger
    ONLY = set(args.only.split(",")) if args.only else None


def split_time_ordered(src_parquet: str, dst_dir: str, n_files: int) -> int:
    """Write events as n_files parquet slices in event-time order with
    monotone mtimes — the shape a tailing file source sees. Pure pyarrow."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(src_parquet)
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    os.makedirs(dst_dir, exist_ok=True)
    per = (n + n_files - 1) // n_files
    now = time.time() - n_files * 2
    for i in range(n_files):
        sl = t.slice(i * per, per)
        if sl.num_rows == 0:
            break
        p = os.path.join(dst_dir, f"part-{i:05d}.parquet")
        pq.write_table(sl, p)
        os.utime(p, (now + 2 * i, now + 2 * i))
    return n


def drive(sdf, mode: str, label: str, planned: int | None = None) -> dict:
    """Run a streaming DataFrame to completion through the noop sink;
    emit one JSONL row per micro-batch, return the summary.

    Progress comes from ``recentProgress``, which Spark caps at
    ``spark.sql.streaming.numRecentProgressUpdates`` — main() raises that
    cap above the planned batch count, and the hard assert below turns a
    silent undercount (missing batches = wrong total_rows/max_state_rows,
    i.e. corrupted scale evidence) into a loud failure. The checkpoint
    temp dir is removed once the run's progress is harvested."""
    spark = sdf.sparkSession
    cap = int(spark.conf.get("spark.sql.streaming.numRecentProgressUpdates"))
    ckpt = tempfile.mkdtemp(prefix="gr_scale_ckpt_")
    q = (
        sdf.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = list(q.recentProgress)
    shutil.rmtree(ckpt, ignore_errors=True)
    # ``planned`` = the caller's expected batch count, ceil(files /
    # files-per-trigger). Comparing against the PLAN is the unambiguous
    # completeness check — len == cap alone cannot distinguish
    # exactly-cap-with-nothing-dropped from cap-retained-some-dropped.
    # Callers that don't know their plan (planned=None) get the
    # conservative cap check only.
    if (planned is not None and len(progress) < planned) or len(progress) >= cap:
        raise AssertionError(
            f"{label}: harvested {len(progress)} progress updates "
            f"(planned >={planned}, retention cap {cap}) — fewer than "
            "planned means batches were dropped from recentProgress and "
            "totals undercount; at/over the cap the drop is merely "
            "possible. Raise spark.sql.streaming.numRecentProgressUpdates "
            "or lower --files/--per-trigger."
        )
    rows = []
    for p in progress:
        if not isinstance(p, dict):  # StreamingQueryProgress object
            p = json.loads(p.json)
        st = p.get("stateOperators") or [{}]
        rows.append(
            {
                "query": label,
                "batch": p["batchId"],
                "input_rows": p.get("numInputRows", 0),
                "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in st),
                "state_bytes": sum(s.get("memoryUsedBytes", 0) for s in st),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    # flatness is judged on the steady-state tail: batches that still had
    # input (the final availableNow drain batch legitimately empties state)
    fed = [r for r in rows if r["input_rows"] > 0]
    mid = [r["state_rows"] for r in fed[len(fed) // 2 :]]
    return {
        "query": label,
        "batches": len(rows),
        "total_rows": sum(r["input_rows"] for r in rows),
        "wall_s": round(sum(r["trigger_ms"] or 0 for r in rows) / 1000.0, 2),
        "max_state_rows": max((r["state_rows"] for r in rows), default=0),
        "last_state_rows": rows[-1]["state_rows"] if rows else 0,
        "state_flat_tail": (max(mid) <= 2 * max(1, min(mid))) if mid else None,
    }


def _with_rocksdb(spark, fn):
    """Run ``fn`` with the RocksDB state store provider (required by
    transformWithState), restoring the prior provider after."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        return fn()
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def main() -> None:
    from pyspark.sql import functions as F

    from giranking_spark.session import get_spark
    from giranking_spark.streaming.ops import (
        EVENTS_SCHEMA,
        stream_session_window,
        stream_stream_join,
        stream_user_state,
        stream_user_state_jvm,
        stream_user_state_tws,
        stream_window_agg,
    )

    spark = get_spark()
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTS))
    # availableNow with maxFilesPerTrigger yields ~N_FILES/PER_TRIGGER
    # batches per query; keep ALL progress updates or totals undercount
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(N_FILES // max(1, PER_TRIGGER) + 32),
    )
    src = tempfile.mkdtemp(prefix="gr_stream_src_")
    n = split_time_ordered(f"{SF_DIR}/events.parquet", src, N_FILES)
    print(f"# {n} events -> {N_FILES} time-ordered files, "
          f"{PER_TRIGGER}/trigger, {STATE_PARTS} state partitions",
          file=sys.stderr)

    def read():
        ev = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(PER_TRIGGER))
            .parquet(src)
        )
        return ev.withColumn(
            "ts2",
            F.timestamp_seconds(
                F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
            ),
        )

    planned = (N_FILES + max(1, PER_TRIGGER) - 1) // max(1, PER_TRIGGER)
    shapes = {
        "window_agg": lambda: drive(
            stream_window_agg(read()), "append", "window_agg", planned
        ),
        "stream_join": lambda: drive(
            stream_stream_join(
                read().filter(F.col("event_type") == "click"),
                read().filter(F.col("event_type") == "purchase"),
            ),
            "append",
            "stream_join",
            planned,
        ),
        # r11: the session-window aggregation (watermark-expired merging
        # state) and the arbitrary-state per-user operator
        # (applyInPandasWithState, NoTimeout — state rows = distinct keys
        # by design; the replay measures that bound, not a leak)
        "session_window": lambda: drive(
            stream_session_window(read()), "append", "session_window", planned
        ),
        "user_state": lambda: drive(
            stream_user_state(read()), "update", "user_state", planned
        ),
        # r12 throughput comparison: the same running per-user totals as a
        # JVM streaming aggregation and as the Spark 4 TWS per-key API
        "user_state_jvm": lambda: drive(
            stream_user_state_jvm(read()), "update", "user_state_jvm", planned
        ),
        "user_state_tws": lambda: _with_rocksdb(
            spark, lambda: drive(
                stream_user_state_tws(read()), "update", "user_state_tws",
                planned,
            )
        ),
    }
    summaries = []
    for name, fn in shapes.items():
        if ONLY is not None and name not in ONLY:
            continue
        try:
            summaries.append(fn())
        except Exception as ex:  # noqa: BLE001 — e.g. user_state_tws needs
            # protobuf for the TWS python state server (absent here); a
            # crashed shape must not sink the rest of the sweep's evidence
            summaries.append({"query": name, "error": str(ex)[:300]})
    for s in summaries:
        print(json.dumps(s), flush=True)
    shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    _parse_args()
    main()
