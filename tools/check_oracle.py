"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given SF against its oracle_sql() via
DuckDB and compares row count, column names, and order-insensitive
values (exact match, plus a float-tolerance diagnostic when exact
fails). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from feature_store_2_spark.session import get_spark
from feature_store_2_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def unhashable_cols(df: pd.DataFrame) -> list[str]:
    """Columns the DRIVER's hash gate cannot process. The driver sorts
    then factorizes raw values, so any list/dict/ndarray-valued column
    (Spark ArrayType/MapType/StructType output) crashes its _canon with
    'unhashable type' even when values are correct (CORRECTNESS_r07
    func_array_set_ops). Flag them here so the local replica can no
    longer pass an entry the driver will error on."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            head = df[c].dropna().head(50)
            if any(isinstance(v, (list, dict, set)) or hasattr(v, "__array__")
                   and not isinstance(v, (str, bytes)) for v in head):
                bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort RAW values — the driver's _canon order (it sorts before any
    rendering; r7 verdict ask #2). The old stringify-before-sort both
    masked crashes the driver hits (unhashable cells — now pre-flagged
    by unhashable_cols) and could false-pass NULL vs the literal string
    'None' / false-fail numerically-equal Decimals ('3.50' vs '3.5').
    Nulls sort last on both frames, and compare() is already NaN-aware,
    so no rendering is needed at all."""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(series: pd.Series) -> str:
    """Coarse dtype class: the driver hashes rendered values, so an
    integer column on one side and float on the other ('26' vs '26.0')
    hash-mismatches even when numerically equal. Pandas upcasts
    nulls-in-int to float, so columns containing nulls are classified
    'nullable' (kind check skipped) to avoid false alarms."""
    if series.isna().any():
        return "nullable"
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        return [f"rowcount spark={len(spark_df)} duck={len(duck_df)}"]
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        return [f"columns spark={s_cols} duck={d_cols}"]
    bad = unhashable_cols(spark_df)
    if bad:
        return [
            f"driver-unhashable columns {bad}: complex-typed output "
            "(array/map/struct) crashes the driver's hash gate — render "
            "to string (array_join / array_to_string) in the entry"
        ]
    s, d = canon(spark_df), canon(duck_df)
    for c in s.columns:
        sk, dk = _dtype_kind(s[c]), _dtype_kind(d[c])
        if "nullable" not in (sk, dk) and sk != dk:
            problems.append(
                f"col {c}: dtype-kind drift spark={sk}({s[c].dtype}) "
                f"duck={dk}({d[c].dtype}) — driver value-hash WILL mismatch"
            )
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            import numpy as np

            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                sa = sv.astype(float).to_numpy()
                da = dv.astype(float).to_numpy()
                exact = (sa == da) | (pd.isna(sa) & pd.isna(da))
                if not exact.all():
                    close = np.isclose(sa, da, rtol=1e-9, equal_nan=True)
                    n_bad = int((~exact).sum())
                    problems.append(
                        f"col {c}: {n_bad} inexact values"
                        + ("" if close.all() else " (BEYOND 1e-9 rtol!)")
                        + f" e.g. {[(x, y) for x, y, e in zip(sa, da, exact) if not e][:3]}"
                    )
            else:
                eq = (sv == dv) | (sv.isna() & dv.isna())
                if not eq.all():
                    bad = [
                        (sv.iloc[i], dv.iloc[i]) for i in range(len(sv)) if not eq.iloc[i]
                    ][:3]
                    problems.append(f"col {c}: {int((~eq).sum())} mismatches e.g. {bad}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        # Memory hygiene for the 331-entry single-process sweep: query
        # fns persist() intermediates by design (the session owns
        # them), so drop the accumulated cache between entries, and
        # rotate the DuckDB connection every few entries so its buffer
        # pool never competes with a full Spark JVM late in the sweep
        # (observed: heavy brute-force oracles hitting 'bad allocation'
        # ~240 entries in at sf0.1, green in isolation).
        spark.catalog.clearCache()
        n_run += 1
        if n_run % 10 == 0:
            con.close()
            con = duck_connection(sf_dir)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
