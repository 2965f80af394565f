"""Deterministic behavior tests for the banded sign-LSH near-dup operator in
the REALISTIC regime (high threshold, many rows per band) — complementing the
fixture-scale oracle parity that runs at the low 0.30 threshold.

With fixed pseudo-random planes (seed pinned), bucket assignments are
deterministic, so these assert hard properties:
  * exact duplicates share every sign bucket → always candidates (recall 1.0
    for identical vectors, by construction not by luck);
  * an antipodal vector flips every nonzero dot → lands in a different
    bucket in every band (true candidate pruning, asserted on the buckets
    themselves, not just absence from the output).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from giranking_spark.operators.similarity import (
    lsh_buckets,
    lsh_neardup_pairs,
    random_hyperplanes,
)

DIM = 8
BANDS = 2
ROWS = 8
SEED = 7


def _vectors(spark):
    rng = random.Random(3)
    v1 = [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]
    v2 = [-x for x in v1]
    rows = [(i, v1, "g") for i in range(1, 5)] + [(i, v2, "g") for i in range(5, 9)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label string"
    ), v1, v2


def test_exact_dups_always_candidates_antipodes_pruned(spark):
    df, v1, v2 = _vectors(spark)
    planes = random_hyperplanes(BANDS * ROWS, DIM, SEED)
    # precondition: no plane is exactly orthogonal to v1 (sign flip is total)
    assert all(sum(a * b for a, b in zip(p, v1)) != 0 for p in planes)

    got = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in lsh_neardup_pairs(
            df, threshold=0.9, bands=BANDS, rows=ROWS, dim=DIM, seed=SEED
        ).collect()
    }
    # every within-copy pair, nothing across the antipodal groups
    want = {(a, b, 1.0) for g in ((1, 2, 3, 4), (5, 6, 7, 8))
            for a in g for b in g if a < b}
    assert got == want

    # the pruning is structural: antipodal copies occupy DIFFERENT buckets in
    # EVERY band, so no cross-group pair ever reaches the cosine re-rank
    bk = lsh_buckets(df, planes, BANDS, ROWS)
    buckets = {(r["id"], r["band"]): r["bucket"] for r in bk.collect()}
    for band in range(BANDS):
        assert buckets[(1, band)] != buckets[(5, band)]
