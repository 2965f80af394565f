"""Timed local replica of the driver's correctness gate at sf0.01.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet, in registry order (the order the driver sees), and
prints per-query wall time + match status as one JSON line per query.

Usage: python tools/sweep_sf001.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from giranking_spark.session import get_spark
from giranking_spark.sources.tables import TABLES


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind_mismatch(s: pd.DataFrame, o: pd.DataFrame) -> str | None:
    """Type-strict check replicating the driver's typed value hash: an
    integer column on one side vs a float on the other (e.g. an uncast
    DuckDB SUM returning HUGEINT, rendered as float64) must FAIL locally,
    exactly as it fails the driver's hash. Only int-width differences are
    tolerated (the driver hashes values, not widths)."""
    for c in s.columns:
        ks = s[c].dtype.kind
        ko = o[c].dtype.kind if c in o.columns else "?"
        ks = "i" if ks == "u" else ks
        ko = "i" if ko == "u" else ko
        if ks != ko:
            return f"dtype kind mismatch col={c}: spark={ks} oracle={ko}"
    return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    total = {"spark": 0.0, "oracle": 0.0, "fail": 0}
    for i, (name, q) in enumerate(queries.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        rec = {"i": i, "name": name}
        t0 = time.time()
        try:
            sdf = q(spark, sf_dir).toPandas()
            rec["spark_s"] = round(time.time() - t0, 2)
            rec["rows"] = len(sdf)
            if name in oracles:
                t1 = time.time()
                odf = con.execute(oracles[name]).df()
                rec["oracle_s"] = round(time.time() - t1, 2)
                s, o = _normalize(sdf), _normalize(odf)
                rec["cols_match"] = list(s.columns) == list(o.columns)
                rec["rows_match"] = len(s) == len(o)
                kind_err = _dtype_kind_mismatch(s, o) if rec["cols_match"] else None
                try:
                    if kind_err:
                        raise AssertionError(kind_err)
                    pd.testing.assert_frame_equal(
                        s, o, check_dtype=False, check_exact=True
                    )
                    rec["values_match"] = True
                except AssertionError as e:
                    rec["values_match"] = False
                    rec["err"] = str(e)[:200]
            else:
                rec["oracle_s"] = 0.0
                rec["values_match"] = None
        except Exception as e:  # noqa: BLE001
            rec["spark_s"] = round(time.time() - t0, 2)
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["values_match"] = False
        total["spark"] += rec.get("spark_s", 0.0)
        total["oracle"] += rec.get("oracle_s", 0.0) or 0.0
        if rec.get("values_match") is False:
            total["fail"] += 1
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"TOTAL": total}), flush=True)


if __name__ == "__main__":
    main()
