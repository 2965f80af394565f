"""Structured Streaming behavior tests (the oracle-parity suite already
covers replay == batch for the three streaming queries; these cover the
append-mode/watermark semantics the oracle can't express)."""

from __future__ import annotations

from giranking_spark.streaming import (
    read_events_stream,
    run_to_table,
    stream_user_state,
    stream_window_agg,
)
from tests.conftest import SF_SMALL


def test_append_mode_emits_closed_windows_only(spark):
    """Append mode emits only windows the watermark has passed: a subset of
    the complete-mode result, missing at least the stream-tail window."""
    complete = run_to_table(
        stream_window_agg(read_events_stream(spark, SF_SMALL)), mode="complete"
    ).toPandas()
    appended = run_to_table(
        stream_window_agg(read_events_stream(spark, SF_SMALL)), mode="append"
    ).toPandas()

    ckeys = set(map(tuple, complete[["window_start", "event_type"]].values))
    akeys = set(map(tuple, appended[["window_start", "event_type"]].values))
    assert akeys <= ckeys
    assert len(akeys) < len(ckeys)  # the tail window stays open
    # every emitted (window, type) row agrees with the complete result
    merged = appended.merge(
        complete, on=["window_start", "event_type"], suffixes=("_a", "_c")
    )
    assert (merged["n_events_a"] == merged["n_events_c"]).all()
    assert (merged["sum_value_a"] == merged["sum_value_c"]).all()


def test_user_state_single_replay_equals_batch(spark):
    """The stateful operator's replay emission equals the batch aggregate."""
    out = run_to_table(
        stream_user_state(read_events_stream(spark, SF_SMALL)), mode="update"
    ).toPandas()
    batch = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("user_id")
        .count()
        .toPandas()
    )
    got = out.groupby("user_id")["n_events"].max()
    want = batch.set_index("user_id")["count"]
    assert got.sort_index().equals(want.sort_index().astype(got.dtype))


def test_stream_rank_refresh_reaches_goldens(spark, tmp_path):
    """foreachBatch rank refresh: streaming in the G1 triangle edge file
    yields the reference's golden scores over the accumulated graph."""
    import pytest

    from giranking_spark.streaming import read_edge_text_stream, stream_rank_refresh

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "batch1.txt").write_text("a\tb\nb\tc\n")
    (incoming / "batch2.txt").write_text("a\tc\n")
    edges_path = str(tmp_path / "edges_store")
    scores_path = str(tmp_path / "scores")

    stream_rank_refresh(
        read_edge_text_stream(spark, str(incoming)), edges_path, scores_path
    )

    got = {r["id"]: r["score"] for r in spark.read.parquet(scores_path).collect()}
    expected = {
        "a": 1.3515060339386287,
        "b": 4.144902009567587,
        "c": 9.06389778197704,
    }  # LinkRankComputationTest.java:81-83
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-3)
