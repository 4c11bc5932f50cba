"""Source-layer invariants: timestamp normalization + local-gate parity.

Round-2 regression pinned here: pyspark 4.1.2 reads the events
parquet's ``Timestamp(isAdjustedToUTC=false)`` as TIMESTAMP_NTZ, which
crashes instant functions (``unix_micros``, numeric casts) at analysis
time. ``load_table`` must normalize ``ts`` to an instant TIMESTAMP at
every scale factor, on every runtime.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.sources.tables import load_table  # noqa: E402

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_events_ts_is_instant_timestamp(spark, sf):
    df = load_table(spark, "events", sf)
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{sf}: events.ts must normalize to TIMESTAMP (instant); "
        f"got {dict(df.dtypes)['ts']} — unix_micros/range frames would crash"
    )


def test_events_ts_cast_preserves_values(spark):
    # UTC session tz makes the NTZ->instant cast value-identical: the
    # wall-clock rendering of min/max must match the raw parquet field.
    import duckdb

    df = load_table(spark, "events", SF_DIRS[0])
    got = df.selectExpr(
        "date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS lo",
        "date_format(max(ts), 'yyyy-MM-dd HH:mm:ss') AS hi",
    ).collect()[0]
    want = (
        duckdb.connect()
        .execute(
            "SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S'), "
            "strftime(max(ts), '%Y-%m-%d %H:%M:%S') "
            f"FROM read_parquet('{SF_DIRS[0]}/events.parquet')"
        )
        .fetchone()
    )
    assert (got.lo, got.hi) == want


def test_checker_flags_int_float_drift():
    """tools/check_oracle.py must catch the exact bug class the r2
    driver hash caught locally-green code on: integer on one side,
    float on the other, numerically equal ('26' vs '26.0')."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from check_oracle import compare

    spark_side = pd.DataFrame({"k": [1, 2], "v": [26, 27]})
    duck_side = pd.DataFrame({"k": [1, 2], "v": [26.0, 27.0]})
    problems = compare("drift", spark_side, duck_side)
    assert any("dtype-kind drift" in p for p in problems), problems
    # identical-kind frames stay clean
    assert compare("same", spark_side, spark_side.copy()) == []


def test_checker_canon_sorts_raw_not_rendered():
    """canon must sort RAW values, the driver's order (r7 verdict ask
    #2). The old stringify-before-sort false-passed a real NULL against
    the literal string 'None' and false-failed numerically-equal
    Decimals whose renderings differ ('3.50' vs '3.5')."""
    from decimal import Decimal

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from check_oracle import compare

    # a real NULL is NOT the string 'None' — must mismatch
    spark_side = pd.DataFrame({"k": ["a", "b"], "v": [None, "x"]})
    duck_side = pd.DataFrame({"k": ["a", "b"], "v": ["None", "x"]})
    assert compare("null-vs-none", spark_side, duck_side), (
        "NULL vs literal 'None' must not compare equal"
    )

    # numerically-equal Decimals with different renderings must PASS
    spark_side = pd.DataFrame({"k": [1, 2], "v": [Decimal("3.50"), Decimal("4")]})
    duck_side = pd.DataFrame({"k": [1, 2], "v": [Decimal("3.5"), Decimal("4.0")]})
    assert compare("decimal-render", spark_side, duck_side) == []

    # rows that differ only pre-sort order still canonicalize equal
    spark_side = pd.DataFrame({"k": ["b", "a"], "v": [2, 1]})
    duck_side = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    assert compare("order", spark_side, duck_side) == []
