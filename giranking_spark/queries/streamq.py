"""Streaming queries run to completion (availableNow) and compared against
the same DuckDB oracles as their batch twins — the streaming plan must
reproduce the batch answer on a bounded replay.

stream_user_state is the custom stateful operator (applyInPandasWithState);
its single-replay emission equals a plain per-user aggregate, so it is
oracle-checkable too.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from giranking_spark.streaming import (
    stream_hll_daily,
    read_documents_stream,
    read_edge_text_stream,
    read_events_stream,
    run_to_table,
    stream_dedup,
    stream_rank_refresh,
    stream_session_window,
    stream_sliding_window,
    stream_static_enrich,
    stream_stream_join,
    stream_user_state,
    stream_user_state_jvm,
    stream_window_agg,
)


def _scratch(spark: SparkSession, sf_dir: str, name: str) -> str:
    return os.path.join(
        "/tmp/giranking_spark_stream",
        spark.sparkContext.applicationId,
        os.path.basename(os.path.normpath(sf_dir)),
        name,
    )


def q_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(stream_window_agg(ev), mode="complete")


def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows on the stream (width 1 h, slide 30 min): a complete
    replay must equal the batch 2-fan-out formulation, which is the oracle
    (shared with events_sliding_window)."""
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(stream_sliding_window(ev), mode="complete")


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(stream_session_window(ev), mode="complete")


def q_stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    out = run_to_table(stream_user_state(ev), mode="update")
    # update-mode sinks append one emission per key per micro-batch; the
    # final state per user is the emission with the highest running count
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
    )


def q_stream_user_state_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM throughput twin of stream_user_state (streaming/ops.py): the
    same per-user running totals as a built-in update-mode streaming
    aggregation — the production path when the per-key state is SQL-
    expressible. Same update-mode collapse, same oracle."""
    ev = read_events_stream(spark, sf_dir)
    out = run_to_table(stream_user_state_jvm(ev), mode="update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup: distinct content hashes over a bounded
    replay equal the batch DISTINCT (arrival-order-independent contract)."""
    docs = read_documents_stream(spark, sf_dir)
    return run_to_table(stream_dedup(docs), mode="append")


STREAM_JOIN_WITHIN_S = 1800


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click→purchase attribution). Two
    independent file-source streams over the same events table, filtered to
    the two event types; inner join emissions over a bounded replay equal
    the batch interval join, which is the oracle."""
    clicks = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    return run_to_table(
        stream_stream_join(clicks, purchases, STREAM_JOIN_WITHIN_S), mode="append"
    )


def q_stream_sink_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FILE sink (append-mode parquet + checkpoint), the
    production sink next to the test-side memory sink: an availableNow
    replay through the file sink must land exactly the batch projection."""
    ev = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    out = _scratch(spark, sf_dir, "sink_files_out")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="gr_sinkfiles_ckpt_")
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def q_stream_rank_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch rank refresh: edge lines stream in, each micro-batch
    appends to the edge store and re-runs the FULL LinkRank fixpoint over
    the accumulated graph (streaming ingest + batch iterative compute —
    the lambda-architecture join point). The final scores table must equal
    the batch linkrank_scores oracle on the same derived graph."""
    from giranking_spark.sources.tables import derive_edges

    edges_txt = _scratch(spark, sf_dir, "rank_refresh_in")
    edges_store = _scratch(spark, sf_dir, "rank_refresh_edges")
    scores_path = _scratch(spark, sf_dir, "rank_refresh_scores")
    derive_edges(spark, sf_dir).select(
        F.concat_ws("\t", "src", "dst").alias("value")
    ).write.mode("overwrite").text(edges_txt)
    stream_rank_refresh(
        read_edge_text_stream(spark, edges_txt), edges_store, scores_path
    )
    return spark.read.parquet(scores_path).select(
        "id", F.round("score", 6).alias("score")
    )


def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: the events stream picks up the
    customer's market segment per micro-batch (no join state), then a
    running aggregate per (segment, type).  A complete replay must equal
    the plain batch join+aggregate, which is the oracle."""
    from giranking_spark.sources.tables import load_table

    ev = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return run_to_table(stream_static_enrich(ev, dim), mode="complete")


def q_stream_restart_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-recovery / exactly-once drive: generation 1 of the input
    streams through an availableNow run into a parquet file sink; the query
    STOPS; generation 2 arrives; a NEW query starts from the SAME
    checkpoint + sink path.  The restarted query recovers the file-source
    offsets from the checkpoint, processes ONLY the unseen files, and the
    sink's commit log keeps the output atomic — so the sink holds every
    event exactly once across the two runs.  This is the property that
    lets a production ingest pipeline crash or deploy mid-stream without
    double-writing any of 100 TB.

    All three paths (input, checkpoint, sink) live under one per-app
    scratch root that is WIPED at call start, so repeated calls replay the
    whole protocol from clean state without accumulating /tmp copies."""
    import shutil

    from giranking_spark.sources.tables import load_table

    base = _scratch(spark, sf_dir, "restart_resume")
    shutil.rmtree(base, ignore_errors=True)
    src, out, ckpt = base + "/in", base + "/out", base + "/ckpt"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    schema = "event_id BIGINT, user_id BIGINT, event_type STRING, cents BIGINT"

    def run_once() -> None:
        s = spark.readStream.schema(schema).json(src)
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").json(src)
    run_once()
    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").json(src)
    run_once()
    return spark.read.parquet(out)


def q_stream_hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming daily distinct-user estimation with bounded state: the
    stream maintains ONLY the (day, register) -> max(rho) HLL registers
    (256 rows per day — a state store a 100 TB stream cannot blow up);
    the batch epilogue collapses the replayed registers into estimates.
    The oracle recomputes the identical sketch per day in SQL, so even the
    float estimates hash-match."""
    from giranking_spark.operators.sketches import hll_finalize

    ev = read_events_stream(spark, sf_dir)
    regs = run_to_table(stream_hll_daily(ev), mode="complete")
    return hll_finalize(regs, "window_start")


QUERIES = {
    "stream_sink_files": q_stream_sink_files,
    "stream_restart_resume": q_stream_restart_resume,
    "stream_static_enrich": q_stream_static_enrich,
    "stream_rank_refresh": q_stream_rank_refresh,
    "stream_join": q_stream_join,
    "stream_dedup": q_stream_dedup,
    "stream_window_agg": q_stream_window_agg,
    "stream_sliding_window": q_stream_sliding_window,
    "stream_session_window": q_stream_session_window,
    "stream_user_state": q_stream_user_state,
    "stream_user_state_jvm": q_stream_user_state_jvm,
    "stream_hll_daily": q_stream_hll_daily,
}

from giranking_spark.functions.hashing import md5_u60_sql_duckdb  # noqa: E402
from giranking_spark.operators.sketches import hll_sql_duckdb  # noqa: E402

# per-day portable HLL, mirrored register-for-register via the shared
# operators/sketches.py SQL builder (same constants as the Spark side)
_HLL_DAILY_SQL = hll_sql_duckdb(
    "SELECT epoch(date_trunc('day', ts))::BIGINT AS window_start, "
    f"{md5_u60_sql_duckdb('user_id::VARCHAR')} AS h FROM events",
    keys=("window_start",),
)

from giranking_spark.queries.graph import ORACLES as _GRAPH_ORACLES  # noqa: E402

ORACLES = {
    "stream_sink_files": (
        "SELECT event_id, user_id, event_type, value FROM events"
    ),
    # exactly-once across the restart: the two generations together are the
    # whole table, each row landing once
    "stream_restart_resume": (
        "SELECT event_id, user_id, event_type, "
        "round(value * 100)::BIGINT AS cents FROM events"
    ),
    "stream_static_enrich": (
        "SELECT c.c_mktsegment, e.event_type, count(*) AS n_events, "
        "round(sum(e.value), 6) AS sum_value FROM events e "
        "JOIN customer c ON e.user_id = c.c_custkey "
        "GROUP BY c.c_mktsegment, e.event_type"
    ),
    # the refresh loop's final state is the batch fixpoint on the full graph
    "stream_rank_refresh": _GRAPH_ORACLES["linkrank_scores"],
    # ts2 floors event time to whole seconds (matching the streaming reader),
    # so the oracle compares on floor(epoch(ts)) too
    "stream_join": (
        "WITH ev AS (SELECT event_id, user_id, event_type, "
        "floor(epoch(ts))::BIGINT AS t FROM events), "
        "c AS (SELECT event_id AS click_id, user_id, t FROM ev WHERE event_type = 'click'), "
        "p AS (SELECT event_id AS purchase_id, user_id, t FROM ev WHERE event_type = 'purchase') "
        "SELECT c.click_id, p.purchase_id, c.user_id, p.t - c.t AS delay_s "
        "FROM c JOIN p ON c.user_id = p.user_id "
        f"AND p.t >= c.t AND p.t <= c.t + {STREAM_JOIN_WITHIN_S}"
    ),
    "stream_dedup": "SELECT DISTINCT md5(text) AS content_hash FROM documents",
    "stream_hll_daily": _HLL_DAILY_SQL,
    "stream_window_agg": (
        "SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start, event_type, "
        "count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    # shared with the batch twin events_sliding_window (queries/analyticsq.py)
    "stream_sliding_window": (
        "WITH ev AS (SELECT event_type, floor(epoch(ts))::BIGINT AS t, value "
        "FROM events), "
        "x AS (SELECT event_type, t, value, unnest([0, 1]) AS k FROM ev) "
        "SELECT (t // 1800 - k) * 1800 AS window_start, event_type, "
        "count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM x GROUP BY 1, 2"
    ),
    # session_window semantics: new session when t - prev >= gap
    # (window = [first, last+gap); an event landing exactly at the previous
    # window's end starts a NEW session)
    "stream_session_window": (
        "WITH ev AS (SELECT user_id, floor(epoch(ts))::BIGINT AS t, value FROM events), "
        "flagged AS (SELECT user_id, t, value, "
        "CASE WHEN lag(t) OVER w IS NULL THEN 1 "
        "WHEN t - lag(t) OVER w >= 1800 THEN 1 ELSE 0 END AS new_sess "
        "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)), "
        "sess AS (SELECT user_id, t, value, "
        "sum(new_sess) OVER (PARTITION BY user_id ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS sess_id FROM flagged) "
        "SELECT user_id, min(t) AS sess_start, count(*) AS n_events, "
        "round(sum(value), 6) AS sum_value "
        "FROM sess GROUP BY user_id, sess_id"
    ),
    "stream_user_state": (
        "SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY user_id"
    ),
    "stream_user_state_jvm": (
        "SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY user_id"
    ),
}


# ---- streaming Count-Min daily frequency sketch ----------------------------

SCM_TOPK = 5


def q_stream_countmin_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-day Count-Min frequency estimation with bounded state:
    the stream maintains ONLY the (day, hash-row, counter) -> count cells
    (depth x width = 1024 rows per day — constant state at any stream
    volume); the batch epilogue probes every observed (day, user) against
    the replayed counters and keeps the SCM_TOPK hottest users per day
    (estimate DESC, user ASC — integer-deterministic).  The oracle
    recomputes the identical counters per day in SQL, so the estimates
    hash-match exactly."""
    from giranking_spark.functions.hashing import cm_cells, md5_u32
    from giranking_spark.sources.tables import load_table
    from giranking_spark.streaming import stream_countmin_daily
    from giranking_spark.streaming.ops import SCM_DEPTH, SCM_WIDTH

    ev = read_events_stream(spark, sf_dir)
    counters = run_to_table(stream_countmin_daily(ev), mode="complete")

    cells = cm_cells(
        md5_u32(F.col("user_id").cast("string")), SCM_DEPTH, SCM_WIDTH
    )
    probes = (
        load_table(spark, sf_dir, "events")
        .select(
            F.unix_timestamp(F.date_trunc("DAY", F.col("ts"))).alias("window_start"),
            "user_id",
        )
        .distinct()
        .select("window_start", "user_id", F.explode(cells).alias("cell"))
        .select(
            "window_start", "user_id",
            F.col("cell.d").alias("d"), F.col("cell.c").alias("c"),
        )
    )
    est = (
        probes.join(F.broadcast(counters), ["window_start", "d", "c"])
        .groupBy("window_start", "user_id")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("cm_estimate"), F.asc("user_id")
    )
    return (
        est.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= SCM_TOPK)
        .select("window_start", "user_id", "cm_estimate", "rank")
    )


def _stream_countmin_sql() -> str:
    from giranking_spark.functions.hashing import (
        HASH_FAMILY,
        MERSENNE_P,
        md5_u32_sql_duckdb,
    )
    from giranking_spark.streaming.ops import SCM_DEPTH, SCM_WIDTH

    fam = ", ".join(
        f"({d}, {HASH_FAMILY[d][0]}, {HASH_FAMILY[d][1]})"
        for d in range(SCM_DEPTH)
    )
    h = md5_u32_sql_duckdb("user_id::VARCHAR")
    return f"""
WITH fam(d, a, b) AS (SELECT * FROM (VALUES {fam})),
ev AS (SELECT epoch(date_trunc('day', ts))::BIGINT AS window_start, user_id
       FROM events),
cells AS (SELECT window_start, d,
                 ((a * {h} + b) % {MERSENNE_P}) % {SCM_WIDTH} AS c
          FROM ev CROSS JOIN fam),
counters AS (SELECT window_start, d, c, count(*) AS cnt
             FROM cells GROUP BY window_start, d, c),
probes AS (SELECT DISTINCT window_start, user_id FROM ev),
pc AS (SELECT p.window_start, p.user_id, f.d,
              ((f.a * {h} + f.b) % {MERSENNE_P}) % {SCM_WIDTH} AS c
       FROM probes p CROSS JOIN fam f),
est AS (SELECT pc.window_start, pc.user_id, min(k.cnt) AS cm_estimate
        FROM pc JOIN counters k
          ON pc.window_start = k.window_start AND pc.d = k.d AND pc.c = k.c
        GROUP BY pc.window_start, pc.user_id)
SELECT window_start, user_id, cm_estimate, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY window_start
                  ORDER BY cm_estimate DESC, user_id ASC) AS INT) AS rank
    FROM est) WHERE rank <= {SCM_TOPK}
"""


QUERIES["stream_countmin_daily"] = q_stream_countmin_daily
ORACLES["stream_countmin_daily"] = _stream_countmin_sql()


def q_stream_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming EWMA (applyInPandasWithState) replayed to
    completion: the final emission per type equals the batch closed-form
    q_events_ewma at its last observed day — streaming/batch parity for an
    order-sensitive statistic, made order-insensitive by keeping the
    horizon-bounded day→count map as state."""
    from giranking_spark.streaming import read_events_stream, stream_ewma_state

    ev = read_events_stream(spark, sf_dir)
    out = run_to_table(stream_ewma_state(ev), mode="update")
    # one emission per key per micro-batch; pick the latest by n_events,
    # which strictly increases per emission (n_days can tie between batches
    # that only add events to already-seen days, and max_by tie-breaks
    # nondeterministically).
    return out.groupBy("event_type").agg(
        F.max_by("last_day", "n_events").alias("last_day"),
        F.max_by("n_days", "n_events").cast("long").alias("n_days"),
        F.max_by("ewma", "n_events").alias("ewma"),
    )


QUERIES["stream_ewma_state"] = q_stream_ewma_state

from giranking_spark.queries.analyticsq import EWMA_ALPHA as _EWMA_A  # noqa: E402

ORACLES["stream_ewma_state"] = (
    "WITH c AS (SELECT event_type, floor(epoch(ts))::BIGINT // 86400 AS day, "
    "count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2), "
    "f AS (SELECT event_type, min(day) AS day0, count(*)::BIGINT AS n_days, "
    "max(day) AS last_day FROM c GROUP BY event_type) "
    "SELECT c.event_type, f.last_day, f.n_days, "
    f"round(sum(pow({1.0 - _EWMA_A}, c.day - p.day) "
    f"* CASE WHEN p.day = f.day0 THEN 1.0 ELSE {_EWMA_A} END "
    "* p.cnt), 6) AS ewma "
    "FROM c JOIN c p ON c.event_type = p.event_type AND p.day <= c.day "
    "JOIN f ON f.event_type = c.event_type "
    "WHERE c.day = f.last_day "
    "GROUP BY c.event_type, f.last_day, f.n_days"
)
