"""Data profiling: per-column statistics in a single pass.

The pipeline-health primitive a 100 TB ingest needs before anything else
runs: null fractions, distinct cardinalities and value ranges per column,
computed in ONE aggregate over the table (no per-column rescans). The
per-column distinct counts expand the aggregate (Spark's Expand operator
emits one stream per distinct-aggregation) — that is still a single scan;
for very wide tables at extreme scale, pass ``approx=True`` to swap the
exact distinct counts for HyperLogLog ``approx_count_distinct`` and keep
the aggregate expansion-free. Min/max are computed on the NATIVE column
type (numeric/temporal ordering) and cast to string afterwards so one tidy
schema covers heterogeneous columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_val, max_val) — one row per
    profiled column, one scan over the data."""
    cols = cols or df.columns
    nd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args: list[str] = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"cast(__n - __nn_{c} as bigint)",
            f"cast(__nd_{c} as bigint)",
            f"__min_{c}",
            f"__max_{c}",
        ]
    return row.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) as "
        "(col_name, n_nulls, n_distinct, min_val, max_val)"
    )
