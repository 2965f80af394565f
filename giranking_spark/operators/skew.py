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
