"""Sequence packing for LLM training-data preparation.

The concatenate-and-chunk recipe: every document's tokens are laid head to
tail in a deterministic order (the id), and the resulting token stream is cut
into fixed-size context windows. Per document we report its global token
offset and which chunks it spans — the metadata a downstream packer /
data-loader needs to materialize training sequences.

The hard part at scale is the GLOBAL running offset: the naive
``Window.orderBy(id)`` with no partition key funnels the whole table through
one task. This module computes the same prefix sum in two phases instead:

1. rows are assigned to ``n_buckets`` order-preserving id ranges; per-bucket
   token totals (one tiny shuffle, ``n_buckets`` rows) are prefix-summed with
   a window whose input size is BOUNDED BY THE PARAMETER, then broadcast;
2. a within-bucket window (partitioned on the bucket — parallel) adds the
   per-row exclusive cumsum to the bucket's broadcast prior.

Total cost: one scalar aggregate, one ``n_buckets``-row aggregate, one
partitioned window — no single-task pass over the data at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_offset(
    df: DataFrame,
    id_col: str,
    value_col: str,
    out_col: str = "start_off",
    n_buckets: int = 1024,
) -> DataFrame:
    """Append ``out_col`` = exclusive prefix sum of ``value_col`` in
    ``id_col`` order, computed with the two-phase bucketed plan above.

    ``id_col`` must be unique; ids may be sparse (bucketing only needs a
    monotone map from id to bucket, which the min/max-scaled floor gives).
    """
    bounds = df.agg(
        F.min(id_col).cast("long").alias("__lo"), F.max(id_col).cast("long").alias("__hi")
    )
    # subtract in double too: a long __hi - __lo overflows when ids span
    # more than int64 range (e.g. signed packed sort keys straddling zero)
    span = F.col("__hi").cast("double") - F.col("__lo").cast("double") + F.lit(1.0)
    # bucket map in DOUBLE: ids near int64 range (e.g. packed sort keys)
    # would overflow (id - lo) * n_buckets in long arithmetic — ANSI throws,
    # legacy silently wraps and breaks monotonicity.  Double rounding keeps
    # the id→bucket map monotone (that's all the prefix sum needs); the
    # least() guard pins the hi edge into bucket n-1 against round-up.
    with_b = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "__b",
            F.least(
                F.floor(
                    (F.col(id_col).cast("double") - F.col("__lo").cast("double"))
                    * F.lit(float(n_buckets))
                    / span
                ).cast("long"),
                F.lit(int(n_buckets) - 1),
            ),
        )
        .drop("__lo", "__hi")
    )
    # phase 1: per-bucket totals (≤ n_buckets rows) + single-task prefix
    # window over that bounded relation
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    priors = (
        with_b.groupBy("__b")
        .agg(F.sum(value_col).alias("__bt"))
        .select(
            "__b",
            F.coalesce(F.sum("__bt").over(wb), F.lit(0)).cast("long").alias("__prior"),
        )
    )
    # phase 2: within-bucket exclusive cumsum, parallel across buckets
    ww = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_b.join(F.broadcast(priors), "__b")
        .withColumn(
            out_col,
            (
                F.col("__prior")
                + F.coalesce(F.sum(value_col).over(ww), F.lit(0))
            ).cast("long"),
        )
        .drop("__b", "__prior")
    )


def pack_offsets(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    ctx: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, n_tokens, start_off, chunk_first, chunk_last, n_chunks) —
    concatenate-and-chunk packing metadata for context size ``ctx``.

    ``chunk_first``/``chunk_last`` are the first/last ``ctx``-token training
    sequences this document contributes to (documents may straddle chunk
    boundaries — the GPT-style packing that wastes zero tokens); both are
    null and ``n_chunks`` is 0 for empty documents.
    """
    out = global_running_offset(df, id_col, tokens_col, "start_off", n_buckets)
    n = F.col(tokens_col)
    last_tok = F.col("start_off") + n - F.lit(1)
    nonempty = n > F.lit(0)
    # integer DIV on the long column; the within-expression floor(double)
    # variant for last_tok stays exact while offsets < 2^53 (comfortably
    # beyond a 100T-token corpus)
    first = F.expr(f"start_off DIV {int(ctx)}")
    return out.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        "start_off",
        F.when(nonempty, first).cast("long").alias("chunk_first"),
        F.when(nonempty, F.floor(last_tok / F.lit(int(ctx)))).cast("long").alias(
            "chunk_last"
        ),
        F.when(
            nonempty, F.floor(last_tok / F.lit(int(ctx))) - first + F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )
