"""Personalized PageRank: power iteration with restart to a seed set.

Third iterative ranking family next to LinkRank (reference semantics,
operators/linkrank.py) and HITS (operators/hits.py) — the standard
"similarity to these nodes" primitive for crawl analysis and
recommendation. Differences from LinkRank: teleport mass goes ONLY to the
seed set (as does dangling mass), scores start as a distribution over the
seeds, and arithmetic is plain float64 (no float32-teleport compat — this
is extension surface, not reference parity).

Per iteration (d = damping, S = seed set, D = dangling mass):

    r'(v) = (1-d)·1_S(v)/|S| + d·( Σ_{u→v} r(u)/outdeg(u) + D·1_S(v)/|S| )

Scale shape is the rank loop's: one fused union-aggregate shuffle per
iteration (fused_message_state), dangling mass and |S| ride as broadcast
single-row cross joins, lineage checkpoint-truncated per iteration. The
iteration count is a contract with the unrolled-CTE oracle in
queries/compq.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.operators.linkrank import (
    _checkpoint,
    _gc_nudge,
    _probe_checkpointed_state,
    dangling_mass,
    edges_with_outdeg,
    initial_state_ext,
)

PPR_ITERATIONS = 5
PPR_DAMPING = 0.85
#: deterministic seed predicate over vertex ids (shared with the oracle)
PPR_SEED_PRED = "(id LIKE 'c%' AND CAST(substr(id, 2) AS BIGINT) % 7 = 3)"


def ppr_scores(
    edges: DataFrame,
    seed_pred: str = PPR_SEED_PRED,
    iterations: int = PPR_ITERATIONS,
    damping: float = PPR_DAMPING,
) -> DataFrame:
    """(id, score) after ``iterations`` PPR updates, rounded to 6 decimals.

    Vertices are implicit (every id appearing as src or dst). The restart
    vector is uniform over vertices matching ``seed_pred`` (a SQL boolean
    expression over ``id``, evaluated identically by the oracle)."""
    teleport = 1.0 - damping  # float64, embedded verbatim in the oracle SQL
    e = edges.select("src", "dst").persist()
    seed = F.when(F.expr(seed_pred), 1.0).otherwise(0.0)
    # vertex set + out-degrees in ONE shuffle (initial_state_ext) instead of
    # the union-distinct + degree-aggregate + join chain; the seed flag is a
    # projection over the result. The checkpointed base is the run's only
    # |V| materialization — the previous shape executed the base relation
    # twice (once for the seed-count aggregate, once for state0).
    base = _checkpoint(
        initial_state_ext(None, e).select(
            "id", "outdeg", "indeg", seed.alias("seed")
        )
    )
    # n, the broadcast decision and the seed count ride ONE 1-row aggregate
    n, bcast, _, row = _probe_checkpointed_state(
        base, None, extras=[F.sum("seed").alias("_sns")]
    )
    ns = float(row["_sns"] or 0.0)
    # seed mass share, 0/0-safe: on a seedless graph every seed is 0, the
    # when() never evaluates the division, and the share is exactly 0.0
    # (mirrored in the oracle). ns is an exact small-integer-valued double,
    # so the literal divides bit-identically to the former column.
    share = F.when(F.col("seed") > 0, F.col("seed") / F.lit(ns)).otherwise(0.0)
    state = base.select("id", share.alias("score"), "outdeg", "seed")
    ex = edges_with_outdeg(e).persist()
    from giranking_spark.operators.linkrank import fused_message_state

    for _ in range(iterations):
        msgst = fused_message_state(
            ex, state, carry=["outdeg", "seed"], broadcast_state=bcast
        )
        d_mass = dangling_mass(state)
        state = _checkpoint(
            msgst.crossJoin(F.broadcast(d_mass)).select(
                "id",
                (
                    F.lit(teleport) * share
                    + F.lit(damping) * (F.col("msg") + F.col("dangling") * share)
                ).alias("score"),
                "outdeg",
                "seed",
            )
        )
        # same dead-shuffle lifecycle as linkrank_raw — see _gc_nudge
        _gc_nudge(state, n)
    e.unpersist()
    ex.unpersist()
    return state.select("id", F.round("score", 6).alias("score"))
