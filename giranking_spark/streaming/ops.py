"""Structured Streaming operators (SURVEY.md §7 phase E — extension surface;
the reference is batch-only, §1.4/§2.11).

Streaming re-uses the batch transformations over ``readStream``:

* ``stream_window_agg``       — watermarked tumbling-window aggregate
* ``stream_session_window``   — gap-based sessions via ``F.session_window``
* ``stream_user_state``       — custom stateful operator
                                (``applyInPandasWithState``)

Every operator is a plain DataFrame->DataFrame function, so the same logic
runs over a batch frame in tests/oracles and over a stream in production.
``run_to_table`` executes a streaming DataFrame to completion with the
``availableNow`` trigger into a memory sink — bounded replay of everything
already in the source, which makes streaming results directly comparable to
the DuckDB batch oracle (the driver contract's correctness gate).

Scale posture: file sources list + split like batch parquet scans; state
stores are per-partition RocksDB/HDFS-backed on a cluster (memory locally);
watermarks bound state growth for append sinks. The window/session aggs
shuffle once on the grouping key — identical to their batch plans.
"""

from __future__ import annotations

import itertools
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_run_ids = itertools.count()

# events.parquet stores TIMESTAMP(MICROS) with isAdjustedToUTC=false (see
# queries/relational.py); the streaming reader needs an explicit schema, and
# the matching Spark type is TIMESTAMP_NTZ.
EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table with a proper event-time
    column ``ts2`` (TIMESTAMP, floored to seconds like the batch path;
    the NTZ value is interpreted as UTC — session tz pinned in session.py)."""
    # the file source requires a directory basePath; select just the events
    # file(s) within the sf dir via glob filter
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return ev.withColumn(
        "ts2",
        F.timestamp_seconds(F.expr("unix_micros(cast(ts as timestamp)) div 1000000")),
    )


def stream_window_agg(
    ev: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time windows per event_type. The watermark bounds
    late-data state for append-mode sinks; complete-mode replays emit every
    window (what the oracle comparison uses)."""
    return (
        ev.withWatermark("ts2", watermark)
        .groupBy(F.window("ts2", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_window(
    ev: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Hopping (sliding) event-time windows per event_type: each event lands
    in ``window/slide`` overlapping windows whose starts align to slide
    boundaries. Same watermark/state posture as the tumbling agg — state per
    open window, expired by the watermark; the fan-out is bounded by the
    overlap factor (2 here), not the data volume."""
    return (
        ev.withWatermark("ts2", watermark)
        .groupBy(F.window("ts2", window, slide), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_window(
    ev: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based session windows per user (F.session_window): a session
    extends while consecutive events are < gap apart; window = [first,
    last+gap). Emits per-session stats comparable to the batch
    sessionization."""
    return (
        ev.withWatermark("ts2", watermark)
        .groupBy(F.session_window("ts2", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("sess_start"),
            "n_events",
            "sum_value",
        )
    )


def _user_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user aggregate: event count + value sum, emitted once per
    micro-batch with the accumulated totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
    )


def stream_user_state(ev: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals that survive across micro-batches. Arrow-batched; state is a
    (count, sum) tuple per key — constant size, watermark-free.

    Throughput caveat (measured sf10-mut, r11): the per-(key, batch)
    Python invocation floors this shape at ~9k rows/s on local[32] —
    each key's group is a tiny pandas frame, so interpreter dispatch
    dominates. When the per-key logic is expressible as SQL aggregates —
    as this running (count, sum) is — use :func:`stream_user_state_jvm`
    (identical emissions, JVM state store, no Python in the loop); keep
    this operator for logic that genuinely needs per-key Python."""
    return ev.groupBy("user_id").applyInPandasWithState(
        _user_state_fn,
        outputStructType="user_id BIGINT, n_events BIGINT, sum_value DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_user_state_jvm(ev: DataFrame) -> DataFrame:
    """JVM throughput twin of :func:`stream_user_state`: the same running
    per-user (count, sum) as a built-in streaming aggregation — state
    lives in the JVM state store, partials combine map-side, and no row
    crosses into Python. In update mode each micro-batch emits the keys it
    touched with their accumulated totals — emission-for-emission the
    contract of the custom operator (which also emits once per touched key
    per batch). This is the production path for any per-key state
    expressible as SQL aggregates; the applyInPandasWithState shape is two
    orders slower at the same scale (BASELINE.md round-12 measurement)."""
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


try:  # Spark 4 arbitrary-state API (SPARK-49564); absent on older runtimes
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover — shipped runtime has it
    StatefulProcessor = object  # type: ignore[assignment,misc]


class _UserTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor for the same per-user running
    (count, sum) — module-level (the processor is pickled to the TWS
    Python worker; a dynamically built class cannot be). Logic mirrors
    :func:`_user_state_fn`; used to measure whether the newer per-key API
    lifts the Python floor of applyInPandasWithState."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

    def handleInputRows(self, key, rows, timerValues):
        n, total = (
            self._state.get() if self._state.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def stream_user_state_tws(ev: DataFrame) -> DataFrame:
    """Per-user running totals on ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API with typed value state. Same emissions as
    :func:`stream_user_state`; exists to measure the new API's per-key
    Python dispatch cost against the applyInPandasWithState floor.

    Runtime requirements (capability gate, like the lossy-VP8 decode):
    the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) AND the ``protobuf``
    Python package — TWS runs a driver-side Python state server speaking
    protobuf, and without the package the query fails at first batch with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (observed in this
    container, which cannot install packages). Plan construction and the
    processor protocol are real and unit-tested; execution is verified
    only where protobuf exists."""
    return ev.groupBy("user_id").transformWithStateInPandas(
        _UserTotalsProcessor(),
        outputStructType="user_id BIGINT, n_events BIGINT, sum_value DOUBLE",
        outputMode="update",
        timeMode="none",
    )


def stream_stream_join(
    clicks: DataFrame, purchases: DataFrame, within_s: int = 1800
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to the
    click(s) by the same user within ``within_s`` seconds before it.

    Both sides carry watermarks and the join condition bounds purchase time
    to ``[click, click + within_s]`` — that pair of constraints is what lets
    Spark expire buffered rows from the join state store instead of keeping
    both streams forever (the canonical bounded-state stream-stream join).
    Inner-join emissions are exactly the batch join's rows, so a bounded
    availableNow replay is oracle-comparable to the batch interval join.

    Scale posture: state is partitioned by user_id (the equi-key); each
    partition buffers only rows younger than watermark + within_s.
    """
    c = (
        clicks.withWatermark("ts2", f"{within_s} seconds")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts2").alias("c_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts2", f"{within_s} seconds")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts2").alias("p_ts"),
        )
    )
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within_s} SECONDS")),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("delay_s"),
    )


def read_edge_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of sources/text.py:read_edge_text — line-oriented
    ``<src>[\\t ]<dst>`` files arriving in a directory. Same single-char
    separator semantics as the batch reader (Pattern.compile("[\\t ]"),
    LinkRankEdgeInputFormat.java:45)."""
    parts = F.split(F.col("value"), r"[\t ]")
    return spark.readStream.text(path).select(
        parts.getItem(0).alias("src"), parts.getItem(1).alias("dst")
    )


DOCUMENTS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (ingestion-shaped)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_dedup(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup at ingestion: each distinct content hash is
    emitted exactly once (first arrival wins), duplicates arriving in any
    later micro-batch are dropped. State = one row per distinct hash —
    bound it in production with ``dropDuplicatesWithinWatermark`` once the
    source carries event time; the documents fixture has none, so this is
    the unbounded-key variant (still per-partition state store, no driver
    state). Output is the hash set alone, which makes the result
    arrival-order-independent and hence batch-oracle-comparable."""
    return docs.select(F.md5(F.col("text")).alias("content_hash")).dropDuplicates(
        ["content_hash"]
    )


def stream_static_enrich(
    ev: DataFrame,
    dim: DataFrame,
    key: str | None = None,
    stream_key: str = "user_id",
) -> DataFrame:
    """Stream-static enrichment join + running aggregate over events
    (value-bearing rows grouped by the dim's ``c_mktsegment`` attribute and
    the event type).

    Each micro-batch joins against the STATIC dimension as a plain batch
    relation — broadcast, no state store, re-planned per batch (so a dim
    refresh between batches is picked up).  This is how a 100 TB event
    stream gets its user/account attributes attached without keeping any
    join state: only the downstream aggregate is stateful.  The join key
    defaults to ``dim``'s first column and is resolved through ``dim[key]``
    explicitly, so an identically-named column on the event stream can
    never make the condition ambiguous.
    """
    key = key or dim.columns[0]
    enriched = ev.join(F.broadcast(dim), ev[stream_key] == dim[key]).drop(dim[key])
    return enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def stream_hll_daily(ev: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming distinct-user estimation per day with BOUNDED state: the
    portable HyperLogLog registers (operators/sketches.py) maintained as a
    single watermarked streaming aggregate.

    A naive streaming COUNT(DISTINCT user_id) would keep every seen key in
    the state store — unbounded on a 100 TB stream.  Register maintenance
    keeps exactly (days-in-watermark x 256) rows: groupBy(day-window,
    register-index) -> max(rho) is an algebraic max-aggregate the state
    store holds in constant space per window, and register-wise max is
    exactly the HLL merge, so late data folds in correctly.  The estimate
    epilogue (hll_finalize) runs batch-side over the replayed registers —
    streaming holds the sketch, not the answer."""
    from giranking_spark.operators.sketches import hll_register_rows

    regs = hll_register_rows(
        ev.withWatermark("ts2", watermark).select(
            F.window("ts2", "1 day").alias("win"), "user_id"
        ),
        "user_id",
        "win",
    )
    return (
        regs.groupBy("win", "idx")
        .agg(F.max("rho").alias("r"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "idx",
            "r",
        )
    )


#: streaming Count-Min geometry — shared CONTRACT with the oracle
SCM_DEPTH = 4
SCM_WIDTH = 256


def stream_countmin_daily(
    ev: DataFrame,
    watermark: str = "1 day",
    depth: int = SCM_DEPTH,
    width: int = SCM_WIDTH,
) -> DataFrame:
    """Streaming per-day frequency sketch with BOUNDED state: Count-Min
    counters (Cormode & Muthukrishnan 2005) maintained as one watermarked
    streaming aggregate.

    A naive streaming per-key count keeps one state row per distinct key —
    unbounded on a 100 TB stream.  Counter maintenance keeps exactly
    (days-in-watermark x depth x width) rows: each event increments ``depth``
    counters (one per hash row), and groupBy(day-window, d, c) -> count is an
    algebraic sum-aggregate the state store holds in constant space per
    window; counter-wise SUM is exactly the Count-Min merge, so late data
    folds in correctly.  Point-query estimation (min across rows) runs
    batch-side over the replayed counters — streaming holds the sketch, not
    the answer (same division of labor as stream_hll_daily)."""
    from giranking_spark.functions.hashing import cm_cells, md5_u32

    cells = cm_cells(md5_u32(F.col("user_id").cast("string")), depth, width)
    return (
        ev.withWatermark("ts2", watermark)
        .select(F.window("ts2", "1 day").alias("win"), F.explode(cells).alias("cell"))
        .groupBy("win", F.col("cell.d").alias("d"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "d",
            "c",
            "cnt",
        )
    )


def stream_rank_refresh(
    edge_stream: DataFrame,
    edges_path: str,
    scores_path: str,
    cfg=None,
) -> None:
    """Windowed rank refresh (SURVEY.md §7 phase E): each micro-batch of new
    edges is appended to the accumulated edge store, then LinkRank recomputes
    over the full graph and atomically replaces the scores table.

    foreachBatch is the right tool because the rank fixpoint is iterative —
    not expressible as an incremental streaming aggregate; the batch engine
    (and all its optimizations) runs inside the sink. At scale the edge
    store is a partitioned table and the refresh can run every N triggers;
    here it runs availableNow-to-completion for deterministic tests."""
    from giranking_spark.config import LinkRankConfig
    from giranking_spark.operators.linkrank import run_linkrank

    cfg = cfg or LinkRankConfig()

    def refresh(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch.write.mode("append").parquet(edges_path)
        all_edges = spark.read.parquet(edges_path).distinct()
        scores = run_linkrank(None, all_edges, cfg)
        scores.write.mode("overwrite").parquet(scores_path)

    q = (
        edge_stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gr_rank_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_table(
    sdf: DataFrame, mode: str = "complete", state_partitions: int | None = 8
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the final result as a batch DataFrame.

    ``state_partitions`` sizes the stateful shuffle for the query (a
    streaming query binds ``spark.sql.shuffle.partitions`` into its
    checkpoint at first start, so this is THE sizing knob for state
    stores). Every state partition pays a per-micro-batch store commit
    regardless of how little data it holds — oversizing a small stream 4×
    was measured 3-4× slower wall-clock. Production streams size this to
    peak volume; pass None to inherit the session setting."""
    spark = sdf.sparkSession
    name = f"stream_result_{next(_run_ids)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(state_partitions)))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="gr_stream_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _ewma_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Order-insensitive stateful EWMA: the state is the per-type day→count
    map (bounded by the calendar horizon, not event volume), so late or
    out-of-order micro-batches fold in exactly; the gap-aware EWMA is a
    deterministic function of that state, recomputed per emission — same
    recursion q_events_ewma's closed form equals."""
    from giranking_spark.queries.analyticsq import EWMA_ALPHA

    acc: dict[int, int] = {}
    if state.exists:
        days, cnts = state.get
        acc = dict(zip(days, cnts))
    for pdf in pdfs:
        for d, c in pdf.groupby("day").size().items():
            acc[int(d)] = acc.get(int(d), 0) + int(c)
    days = sorted(acc)
    state.update((days, [acc[d] for d in days]))
    ewma, prev = 0.0, None
    for d in days:
        x = float(acc[d])
        ewma = (
            x
            if prev is None
            else EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) ** (d - prev) * ewma
        )
        prev = d
    # n_events is strictly increasing across emissions (every micro-batch
    # routed to this key adds >= 1 event), unlike n_days which ties when a
    # batch only touches already-seen days — downstream "latest emission"
    # picks must max_by on n_events, never n_days.
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "last_day": [days[-1]],
            "n_days": [len(days)],
            "n_events": [int(sum(acc.values()))],
            "ewma": [round(ewma, 6)],
        }
    )


def stream_ewma_state(ev: DataFrame) -> DataFrame:
    """Stateful streaming EWMA of daily event counts per type
    (applyInPandasWithState): the streaming twin of the batch
    q_events_ewma — state survives micro-batches and restarts, emissions
    carry the smoothed value as of all data seen."""
    days = ev.select(
        "event_type",
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 1000000 div 86400"
        ).alias("day"),
    )
    return days.groupBy("event_type").applyInPandasWithState(
        _ewma_state_fn,
        outputStructType=(
            "event_type STRING, last_day BIGINT, n_days BIGINT, "
            "n_events BIGINT, ewma DOUBLE"
        ),
        stateStructType="days ARRAY<BIGINT>, cnts ARRAY<BIGINT>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
