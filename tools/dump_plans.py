"""Dump explain("formatted") for declared queries + named sub-plans.

Usage: python tools/dump_plans.py <outdir> <suffix> q1,q2,...
Writes <outdir>/<query>_<suffix>.txt. Special names:
  rank_state0      — initial_state(None, derived edges) plan
  ppr_base         — the PPR base/state0 construction plan
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from giranking_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_PLANS_NO_CHECKPOINT"):
        # r14: queries that eagerly localCheckpoint their output (unpersist
        # discipline) explain() as a bare Scan ExistingRDD — neuter the
        # checkpoint so the dump shows the honest pipeline plan the
        # checkpoint would otherwise hide (dump-only; never the library)
        # Spark 4: sessions hand out pyspark.sql.classic.dataframe.DataFrame,
        # which overrides the abstract base — patch the concrete class
        from pyspark.sql.classic.dataframe import DataFrame as _DF

        _DF.localCheckpoint = lambda self, eager=True: self
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        if name == "rank_state0":
            from giranking_spark.operators.linkrank import initial_state
            from giranking_spark.sources.tables import derive_edges

            df = initial_state(None, derive_edges(spark, SF))
        elif name == "lpa_round":
            # one synchronous LPA round WITHOUT the per-round checkpoint
            # (which collapses explain() to a Scan ExistingRDD) — the
            # honest in-loop plan the fixpoint repeats every round
            import giranking_spark.operators.labelprop as lp
            from giranking_spark.sources.tables import derive_edges

            orig = lp._checkpoint
            lp._checkpoint = lambda df: df
            try:
                df = lp.label_propagation(derive_edges(spark, SF), rounds=1)
            finally:
                lp._checkpoint = orig
        elif name in ("katz_round", "opic_round"):
            # one superstep WITHOUT the per-round checkpoint — the honest
            # in-loop plan (same rationale as lpa_round)
            import giranking_spark.operators.katz as kz
            import giranking_spark.operators.opic as op
            from giranking_spark.sources.tables import derive_edges

            mod = kz if name == "katz_round" else op
            orig = mod._checkpoint
            mod._checkpoint = lambda df: df
            try:
                fn = kz.katz_scores if name == "katz_round" else op.opic_scores
                df = fn(derive_edges(spark, SF), iterations=1)
            finally:
                mod._checkpoint = orig
        else:
            df = qs[name](spark, SF)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_text(df))
        print(path)


if __name__ == "__main__":
    main()
