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
