"""Skew-mitigation aggregation: two-phase salted sums.

A single hot key (spam hub, viral document, null-ish default) turns a
one-phase ``groupBy(key).sum()`` into one overloaded reducer at 100 TB.
The standard fix is salting: partial-aggregate on (key, salt) so the hot
key's mass spreads across N reducers, then a cheap final sum on key over
at most N rows per key.

The salt here is ``spark_partition_id()`` — the map-side task id. That is
the strongest possible salt for a commutative aggregate: it costs nothing
to compute, it is uniform by construction (each map task contributes one
partial row per key), and phase 1 becomes a pure map-side combine (the
partial agg groups by something constant within each task). The final
result is salt-independent for commutative+associative aggregates, which
is why the DuckDB oracle is the PLAIN one-phase GROUP BY.

Float caveat: addition order differs from the one-phase plan, so float
sums can drift in the last bits — use exact types (BIGINT / cents /
decimal) for oracle-checked salted sums (queries/analyticsq.py does).

The rank loop has its own specialized variant keyed on hash(src)
(operators/linkrank.py:message_sums salt_buckets); this one is the
general-purpose surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, keys: list[str], value: Column | str, out: str = "total"
) -> DataFrame:
    """Two-phase sum of ``value`` per ``keys``, hot-key safe.

    Phase 1 groups by (keys…, map-task id) — executed entirely map-side as
    a partial aggregate; phase 2 sums the ≤ num_tasks partials per key.
    """
    val = F.col(value) if isinstance(value, str) else value
    partial = (
        df.withColumn("_salt", F.spark_partition_id())
        .groupBy(*keys, "_salt")
        .agg(F.sum(val).alias("_psum"))
    )
    return partial.groupBy(*keys).agg(F.sum("_psum").alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    row_salt: Column | None = None,
) -> DataFrame:
    """Hot-key-safe equi-join of a skewed fact side against a small dim.

    A plain ``big.join(small, key)`` shuffles every occurrence of a hot key
    into ONE reducer partition; with web-scale skew (a viral URL, a default
    id) that reducer becomes the job. Salting splits each hot key across
    ``salts`` reducers: the small side is replicated once per salt value
    (explode — its size grows ×salts, fine for a dim), the big side routes
    each ROW to one replica via a uniform per-row salt, and the join key
    becomes (key, salt). Result rows are identical to the unsalted join —
    which is exactly why the DuckDB oracle for any query built on this is
    the PLAIN join.

    ``row_salt`` defaults to ``spark_partition_id() % salts`` — free to
    compute and uniform across map tasks. Pass an explicit hash-based salt
    (e.g. ``pmod(xxhash64(row_id), salts)``) when the downstream needs
    partition-layout-independent routing. Spark's AQE skew-join handles
    sort-merge cases adaptively; this operator is the explicit form that
    also covers hash joins and documents the technique for plans AQE can't
    rewrite (e.g. when the skewed side feeds a co-partitioned reuse)."""
    if row_salt is None:
        row_salt = F.spark_partition_id() % salts
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    # shuffle_hash hint: salting only matters for SHUFFLE joins — if the dim
    # were broadcast-able there would be no reducer hotspot to begin with.
    # The hint models the medium-dim case (too big to broadcast) on the small
    # fixture so the salted shuffle is what actually executes and what the
    # plan tests lock.
    return (
        big.withColumn("_salt", row_salt.cast("int"))
        .join(replicated.hint("shuffle_hash"), [key, "_salt"])
        .drop("_salt")
    )
