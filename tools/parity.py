"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
a given scale factor; compare row count, column names, and
order-insensitive values.

Usage: python tools/parity.py [--full] [sf_dir] [query_name ...]

``--full`` runs the complete master registry (including entries retired
from the ≤50-entry driver catalog — see ``catalog.py``); the default
mirrors exactly what the driver sees.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from event_to_lakehouse_spark.session import get_spark  # noqa: E402
from event_to_lakehouse_spark.tables import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    full = "--full" in args
    if full:
        args.remove("--full")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    if full:
        from event_to_lakehouse_spark.operators.relational import ORACLES, QUERIES

        qs, oracles = dict(QUERIES), dict(ORACLES)
    else:
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
    spark = get_spark("parity")
    con = duck_con(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(sdf) != len(ddf):
            ok, msgs = False, msgs + [f"rowcount spark={len(sdf)} duck={len(ddf)}"]
        if sorted(sdf.columns) != sorted(ddf.columns):
            ok = False
            msgs.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if ok:
            cs, cd = canon(sdf), canon(ddf)
            if not cs.equals(cd):
                ok = False
                diff = (cs != cd) if cs.shape == cd.shape else None
                if diff is not None:
                    bad_cols = [c for c in cs.columns if diff[c].any()]
                    first = diff.any(axis=1).idxmax()
                    msgs.append(
                        f"values differ in cols {bad_cols}; first bad row "
                        f"spark={cs.loc[first].to_dict()} duck={cd.loc[first].to_dict()}"
                    )
                else:
                    msgs.append("shape mismatch after canon")
        if ok:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
