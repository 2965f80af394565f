"""Temporal join operators the reference lacks (SURVEY.md §2.4 "range /
as-of joins: not present") — first-class citizens of a training-data
pipeline (event attribution, feature look-back windows).

Both are expressed so the big-big case stays shuffle-bounded:

* :func:`asof_join` — union-tag + window ``last(ignorenulls)``: ONE shuffle
  on the equi-keys, no inequality join, no per-key blowup. This is the
  scalable formulation (an inequality join is O(|L|·|R|) per key and falls
  over on hot keys at 100 TB; the window scan is O((|L|+|R|) log) per key).
* :func:`bucket_range_join` — interval/point join via time-chunk bucketing:
  intervals explode to the chunks they overlap, points map to exactly one
  chunk, so the join is a plain equi-join on (keys, chunk) with a residual
  BETWEEN filter. Each qualifying pair meets in exactly one chunk (the
  point's), so no dedup pass is needed. Chunk size tunes the explode factor
  vs join selectivity; Catalyst/AQE handles skewed chunks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` keys (backward as-of,
    inclusive — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

    Right payload columns come back NULL when no match exists (left join).
    ``tolerance`` (same unit as the ts columns) drops matches older than
    ``left_ts - tolerance``.

    If several right rows share the same (keys, right_ts), the LAST one in
    the union sort order wins — pre-dedup the right side for deterministic
    results (the query layer does).

    Raises ValueError when an input uses one of the internal helper names
    (_t/_r/_side/_m) or when left and right payload column names overlap —
    either would silently produce wrong/ambiguous output otherwise.
    """
    reserved = {"_t", "_r", "_side", "_m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join: column name(s) {sorted(clash)} are reserved; "
            "rename them before joining"
        )
    r_payload = [c for c in right.columns if c not in on]
    overlap = set(r_payload) & {c for c in left.columns if c not in on}
    if overlap:
        raise ValueError(
            f"asof_join: payload column(s) {sorted(overlap)} exist on both "
            "sides; rename one side before joining"
        )
    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_r", F.lit(None).cast(right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType)
    ).withColumn("_side", F.lit(1))
    r_tagged = (
        right.withColumn("_t", F.col(right_ts))
        .select(*on, "_t", F.struct(*r_payload).alias("_r"), F.lit(0).alias("_side"))
    )
    l_cols = [c for c in left.columns]
    unioned = l_tagged.select(
        *on, "_t", "_r", "_side", *[c for c in l_cols if c not in on]
    ).unionByName(r_tagged, allowMissingColumns=True)
    # right rows (_side=0) sort before left rows at equal _t -> inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_m").isNotNull()
                & (F.col("_t") - F.col(f"_m.{right_ts}") <= tolerance),
                F.col("_m"),
            ),
        )
    out = matched.select(
        *on,
        *[c for c in l_cols if c not in on],
        *[F.col(f"_m.{c}").alias(c) for c in r_payload],
    )
    return out


def bucket_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    pt: str,
    lo: str,
    hi: str,
    chunk: int,
) -> DataFrame:
    """Join points to the intervals containing them:
    ``points.pt BETWEEN intervals.lo AND intervals.hi`` (plus equi-keys),
    executed as an equi-join on (keys, time-chunk).

    ``chunk`` should be ≥ the typical interval length so most intervals
    explode to ≤2 chunk rows.
    """
    ch = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(chunk)), F.floor(F.col(hi) / F.lit(chunk))
            )
        ),
    )
    pts = points.withColumn("_chunk", F.floor(F.col(pt) / F.lit(chunk)))
    joined = pts.join(ch, [*on, "_chunk"]).filter(
        F.col(pt).between(F.col(lo), F.col(hi))
    )
    return joined.drop("_chunk")
