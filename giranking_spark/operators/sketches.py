"""Distributed sketches with engine-portable determinism.

KMV (k-minimum-values) distinct-count estimation: hash every value with the
portable 60-bit md5 hash (functions/hashing.py), keep the k smallest distinct
hashes, estimate ``D ≈ (k-1) * M / h_(k)`` where M is the hash-space size.
KMV is a pure order statistic — Spark and DuckDB produce bit-identical
sketches, so the estimate itself is oracle-checkable, not just "close".

HyperLogLog (Flajolet et al. 2007) is here too, built portable the same way:
registers come from the SAME md5 hash (index = low p bits, rank = leading
zeros of the remaining word via integer bit ops), register contributions
2^(-rho) are accumulated as EXACT integers scaled by 2^53, and the bias
constant is a shared Python literal — so even the float estimate is
bit-reproducible across engines. Native engine HLLs (approx_count_distinct /
approx_distinct) differ in hash and register layout; this one is the
mergeable, oracle-checkable formulation.

Scale notes:
- The k smallest distinct hashes are computed as distinct → sort → limit k;
  Spark plans the tail as TakeOrderedAndProject (per-partition top-k, then a
  single k-row merge at the driver) — no global sort materializes.
- The distinct is the only shuffle, on the 60-bit hash (uniformly
  distributed, skew-free by construction).
- Heavy hitters run as a plain count aggregation with map-side partial
  aggregation; the ``min_count`` filter applies post-agg, so the shuffle
  carries one row per distinct key (the same cost profile a SpaceSaving
  sketch merge would have at much higher implementation risk).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.functions.hashing import md5_u60

#: size of the 60-bit hash space (15 md5 hex digits)
KMV_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int) -> DataFrame:
    """1-row (k_used, kth_min, est_distinct) KMV distinct-count estimate.

    ``k_used`` < k means the exact distinct count was below k and
    ``est_distinct`` is exact (= k_used).
    """
    hashes = (
        df.select(md5_u60(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(int(k))
    )
    return hashes.agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth_min"),
        F.round(
            F.when(
                F.count("*") < F.lit(int(k)), F.count("*").cast("double")
            ).otherwise((F.lit(float(k - 1)) * F.lit(KMV_SPACE)) / F.max("h")),
            6,
        ).alias("est_distinct"),
    )


def heavy_hitters(df: DataFrame, col: str, min_count: int) -> DataFrame:
    """(value, cnt) for values occurring at least ``min_count`` times,
    heaviest first (value as tiebreak for determinism)."""
    return (
        df.groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
    )


def kmv_distinct_by(
    df: DataFrame, group_col: str, col: str, k: int
) -> DataFrame:
    """Per-group KMV distinct-count estimate: for every value of
    ``group_col``, the k smallest distinct 60-bit hashes of ``col`` and the
    order-statistic estimate — (grp, k_used, kth_min, est_distinct).

    The sketch state is k hashes per group, mergeable by min-merge — the
    per-segment cardinality primitive (distinct users per event type,
    distinct tokens per domain) where one global estimate isn't enough.

    Scale shape: ONE data-sized shuffle. The explicit ``repartition(grp)``
    is the only exchange — hash-partitioning on ``grp`` already satisfies
    the clustering the (grp, h) dedup aggregate and the per-grp rank window
    both require, so Catalyst inserts no further shuffle (CI-asserted in
    test_scale_plans); dedup and the rank-k cut ride the same partitioning,
    and the window sort spills rather than buffering a hot group."""
    from pyspark.sql import Window

    h = (
        df.select(
            F.col(group_col).alias("grp"),
            md5_u60(F.col(col).cast("string")).alias("h"),
        )
        .repartition("grp")
        .dropDuplicates(["grp", "h"])
    )
    w = Window.partitionBy("grp").orderBy("h")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.lit(int(k))
    )
    return topk.groupBy("grp").agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth_min"),
        F.round(
            F.when(
                F.count("*") < F.lit(int(k)), F.count("*").cast("double")
            ).otherwise((F.lit(float(k - 1)) * F.lit(KMV_SPACE)) / F.max("h")),
            6,
        ).alias("est_distinct"),
    )


# --- HyperLogLog -----------------------------------------------------------

#: register-count exponent: m = 2^p registers; p=8 gives ~6.5% std error in
#: ~2 KB of state — the classic monitoring-grade configuration
HLL_P = 8
HLL_M = 1 << HLL_P
#: bias-corrected constant alpha_m * m^2 (Flajolet et al. 2007, table for
#: m >= 128: alpha = 0.7213 / (1 + 1.079/m)); shared literal with the oracle
HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
#: the 60-bit hash minus the p index bits leaves a 52-bit rank word; rho is
#: (leading zeros in that word) + 1, so rho ∈ [1, 53] and every register
#: contribution 2^(-rho) scaled by 2^53 is an EXACT integer 2^(53-rho)
HLL_W_BITS = 60 - HLL_P
HLL_SCALE = 1 << (HLL_W_BITS + 1)  # 2^53
#: small-range correction M*ln(M/zeros) for every possible zeros ∈ [1, M]
#: (z = M is exactly 0.0 — an empty register set estimates 0 distinct, so
#: the lookup can never index out of range even for a degenerate group),
#: precomputed ONCE in Python and embedded as the same double literal on both
#: the Spark and DuckDB sides — runtime ln is gone, so a 1-ulp libm
#: divergence between JVM Math.log and DuckDB's ln can no longer flip the
#: 6th decimal at a rounding boundary (the failure class commit 78d696e
#: eliminated for histogram quantiles)
HLL_SMALL_EST = [HLL_M * math.log(HLL_M / z) for z in range(1, HLL_M + 1)]


def hll_register_rows(df: DataFrame, col: str, *keys: str) -> DataFrame:
    """(keys..., idx, rho) register-update rows for every input row — the
    map-side half of the sketch, shared by the batch and streaming paths."""
    h = md5_u60(F.col(col).cast("string"))
    w = F.shiftright(h, HLL_P)  # the (60-p)-bit rank word
    return df.select(
        *keys,
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
        F.when(w > 0, F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)))
        .otherwise(F.lit(HLL_W_BITS + 1))
        .alias("rho"),
    )


def hll_finalize(byreg: DataFrame, *keys: str) -> DataFrame:
    """Collapse grouped registers (keys..., idx, r) into
    (keys..., m_used, n_zero, est_distinct) — the estimate half, shared by
    the batch sketch and streaming register maintenance (where the
    streaming query keeps ONLY the bounded register state and this batch
    epilogue runs over the replayed result)."""
    contrib = F.pow(F.lit(2.0), F.lit(HLL_W_BITS + 1) - F.col("r")).cast("long")
    agg = byreg.groupBy(*keys).agg(
        F.count("*").cast("long").alias("m_used"),
        F.sum(contrib).alias("s_used"),
    )
    zeros = (F.lit(HLL_M) - F.col("m_used")).cast("long")
    s_total = (F.col("s_used") + zeros * F.lit(HLL_SCALE)).cast("double")
    raw = F.lit(HLL_ALPHA_M2 * float(HLL_SCALE)) / s_total
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        # literal lookup (1-indexed by zeros), not runtime log — see
        # HLL_SMALL_EST: both engines read the identical double
        F.element_at(
            F.array(*[F.lit(v) for v in HLL_SMALL_EST]), zeros.cast("int")
        ),
    ).otherwise(raw)
    return agg.select(
        *keys,
        "m_used",
        zeros.alias("n_zero"),
        F.round(est, 6).alias("est_distinct"),
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """1-row (m_used, n_zero, est_distinct) portable-HyperLogLog estimate.

    Register index = low p bits of the 60-bit md5 hash (bitwise AND),
    rank word = the remaining 52 bits (arithmetic shift — the hash is
    non-negative), rho = 53 - bit_length(word) (bit_length via the base-2
    string, exact in both engines; word 0 → rho 53). Register contributions
    sum as exact integers (Σ 2^(53-rho) ≤ m·2^53 < 2^62), so the only float
    steps are the final division and (in the small-range regime) one ln —
    both IEEE-deterministic cross-engine.

    Scale shape: groupBy(register) with map-side partial max — the shuffle
    carries at most m rows per map task; the final reduce is m rows total.
    The sketch is mergeable by register-wise max, the property that lets a
    100 TB scan keep 2 KB of state per segment."""
    byreg = (
        hll_register_rows(df, col).groupBy("idx").agg(F.max("rho").alias("r"))
    )
    return hll_finalize(byreg)


def hll_sql_duckdb(h_select: str, keys: tuple[str, ...] = ()) -> str:
    """The DuckDB mirror of hll_register_rows + hll_finalize, built from
    the same HLL_* constants so the two oracle call sites (global sketch in
    queries/pipelineq.py, per-day streaming sketch in queries/streamq.py)
    can never drift from each other or from the Spark side.

    ``h_select`` is a SELECT producing (keys..., h) with ``h`` the portable
    60-bit hash; ``keys`` are the grouping columns carried through."""
    ks = "".join(f"{k}, " for k in keys)
    grp = ("GROUP BY " + ", ".join(keys) + " ") if keys else ""
    grp_reg = "GROUP BY " + ", ".join([*keys, "idx"])
    # 'e0' suffix forces DuckDB to parse each literal directly as DOUBLE
    # (a bare many-digit literal becomes DECIMAL, whose double conversion
    # is not guaranteed correctly-rounded)
    small_list = "[" + ", ".join(
        (s if "e" in s else s + "e0")
        for s in (repr(v) for v in HLL_SMALL_EST)
    ) + "]"
    est = (
        f"round(CASE WHEN {HLL_ALPHA_M2 * float(HLL_SCALE)!r} / "
        f"(s_used + ({HLL_M} - m_used) * {HLL_SCALE})::DOUBLE <= {2.5 * HLL_M!r} "
        f"AND m_used < {HLL_M} "
        f"THEN ({small_list})[({HLL_M} - m_used)::INT] "
        f"ELSE {HLL_ALPHA_M2 * float(HLL_SCALE)!r} / "
        f"(s_used + ({HLL_M} - m_used) * {HLL_SCALE})::DOUBLE END, 6)"
    )
    return (
        f"WITH h AS ({h_select}), "
        f"r AS (SELECT {ks}h & {HLL_M - 1} AS idx, h >> {HLL_P} AS w FROM h), "
        f"b AS (SELECT {ks}idx, max(CASE WHEN w > 0 "
        f"THEN {HLL_W_BITS + 1} - length(bin(w)) "
        f"ELSE {HLL_W_BITS + 1} END) AS r FROM r {grp_reg}), "
        f"a AS (SELECT {ks}count(*)::BIGINT AS m_used, "
        f"sum(power(2, {HLL_W_BITS + 1} - r)::BIGINT)::BIGINT AS s_used "
        f"FROM b {grp}) "
        f"SELECT {ks}m_used, ({HLL_M} - m_used)::BIGINT AS n_zero, "
        f"{est} AS est_distinct FROM a"
    )
