"""Scalar numeric helpers shared across query families."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_finite(c: Column) -> Column:
    """True iff the double is non-null, non-NaN, and non-infinite —
    Spark's spelling of DuckDB's isfinite(). Distribution/CDF operators
    (KS, quantile normalization, histograms, conformal residuals,
    means) admit only finite measurements: engines place NaN/Inf at
    different ranks BY DESIGN (r9 non-finite fixture class), and a
    non-finite measurement is garbage for those statistics anyway."""
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) < F.lit(float("inf")))


def is_exact_value(c: Column) -> Column:
    """True iff the double is finite AND representable in the repo's
    DECIMAL(18,6) micro-unit intake (|v| < 1e12) — the r10
    hostile-magnitude gate. A finite value beyond the envelope passes
    isfinite() but its micro-unit form is NULL on both engines
    (try_cast/TRY_CAST overflow), and NULL ranks/joins diverge between
    engines; distribution operators therefore exclude it at intake,
    exactly like NaN/Inf. SQL twin: ``isfinite(value) AND
    TRY_CAST(value AS DECIMAL(18,6)) IS NOT NULL``."""
    return is_finite(c) & c.try_cast("decimal(18,6)").isNotNull()
