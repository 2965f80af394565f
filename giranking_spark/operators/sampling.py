"""Deterministic hash-based sampling for training-data pipelines.

A 100 TB corpus pipeline needs samples that are (a) reproducible across runs
and engines, (b) computable without a shuffle, and (c) stable under
repartitioning — which rules out ``df.sample`` (seeded per-partition RNG:
the rows chosen change whenever the partitioning does). Every operator here
keys off the engine-portable md5 hash of a row id
(functions/hashing.py), so the SAME rows are selected in Spark, in the
DuckDB oracle, and on any cluster layout.

Scale notes:
- ``hash_sample`` / ``train_test_split`` are pure narrow filters/projections —
  no shuffle, fully pushed into the scan stage, trivially parallel.
- ``stratified_sample`` needs one shuffle (window over the stratum key) —
  unavoidable for exact per-stratum counts; hot strata are bounded because
  the window computes only row_number (streaming, no buffering of the frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from giranking_spark.functions.hashing import md5_u32

#: denominator for rate buckets: rate is expressed in parts-per-million so
#: the threshold compare is exact integer arithmetic in both engines.
PPM = 1_000_000


def _bucket(id_col: str) -> F.Column:
    """Stable per-row bucket in [0, PPM) from the portable md5 hash."""
    return md5_u32(F.col(id_col).cast("string")) % F.lit(PPM)


def hash_sample(df: DataFrame, id_col: str, rate_ppm: int) -> DataFrame:
    """Keep rows whose hash bucket < rate_ppm (deterministic ~rate sample).

    Unlike ``DataFrame.sample`` this is a pure row-local predicate: the
    sample is identical regardless of partitioning, task retries, or engine.
    """
    return df.filter(_bucket(id_col) < F.lit(int(rate_ppm)))


def train_test_split(df: DataFrame, id_col: str, test_ppm: int) -> DataFrame:
    """Append a ``split`` column ('test' for the hash-selected fraction,
    'train' otherwise). Row-local; no shuffle; stable across runs."""
    return df.withColumn(
        "split",
        F.when(_bucket(id_col) < F.lit(int(test_ppm)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def weighted_sample(df: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    """Deterministic Bernoulli sample with per-row keep probability
    ``weight_col`` ∈ [0,1] — quality-weighted corpus curation: a doc with
    quality 0.9 is kept 9× as often as one at 0.1, yet the decision is a
    pure function of the row (hash(id) uniform vs weight), so the sample is
    identical across runs, engines, and partitionings. Row-local filter —
    no shuffle. The weight must be rounded to 6 decimals (both engines then
    compute the identical ppm threshold via floor(w*PPM + 0.5))."""
    thresh = F.floor(F.col(weight_col) * F.lit(PPM) + F.lit(0.5)).cast("long")
    return df.filter(_bucket(id_col) < thresh)


def domain_token_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    tokens_col: str,
    quality_col: str,
    budget: int,
) -> DataFrame:
    """Per-domain token budget (data-mixing cap): within each domain, keep
    the highest-quality documents while the running token total stays within
    ``budget`` — the standard way to stop one crawl domain from dominating a
    training mix.

    One shuffle on the domain key; the window computes only a running sum
    (streaming frame, no buffering), so a hot domain costs I/O, not memory.
    Ordering is (quality DESC, id ASC) — fully deterministic."""
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        "cum_tokens", F.sum(tokens_col).over(w).cast("long")
    ).filter(F.col("cum_tokens") <= F.lit(int(budget)))


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic top-n-by-hash rows per stratum.

    Ordering inside a stratum is (hash, id) — the id tiebreak keeps the
    selection total even if two ids collide in the 32-bit hash space.
    One shuffle on the stratum key; row_number streams, so a skewed stratum
    costs I/O but not memory.
    """
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(n_per_stratum)))
        .drop("__rn")
    )


def weighted_reservoir(
    df: DataFrame, group_col: str, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Fixed-SIZE weighted sample per group — the A-ES scheme (Efraimidis &
    Spirakis 2006): each row gets priority key -ln(u)/w with u a
    hash-derived uniform in (0, 1], and the k smallest keys per group win.
    Inclusion probability is proportional to weight, but unlike
    ``weighted_sample`` (Bernoulli, proportional SIZE) the output is exactly
    k rows per group — the shape data-mixing recipes specify ("10k docs per
    language, longer docs preferred").

    Determinism: u comes from the portable md5 bucket, so the selection is
    a pure function of the rows — identical across runs, engines,
    partitionings, and task retries. One shuffle on the group key; the
    row_number window streams (no frame buffering on a hot group)."""
    u = (_bucket(id_col) + F.lit(1)) / F.lit(PPM)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_aes_key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_aes_key", -F.log(u) / F.col(weight_col))
        .withColumn("_aes_rn", F.row_number().over(w))
        .filter(F.col("_aes_rn") <= F.lit(int(k)))
        .drop("_aes_key", "_aes_rn")
    )
