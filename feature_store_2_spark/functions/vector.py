"""Vector math over array<float> embedding columns — built-in expressions
only (zip_with / aggregate / transform), no UDFs, fully codegen'd and
row-local (no shuffle, no explode).

Determinism design: IEEE float summation is order-dependent and
float->DECIMAL casts are engine-specific (DuckDB converts FLOAT through
its shortest decimal representation), so cross-engine float folds can
never hash-match. Instead we quantize each component to 24-bit fixed
point: ``floor(x * 2^24)`` is a pure exponent shift — exact in float32,
float64, and any engine — and every downstream dot/norm is exact BIGINT
arithmetic (|x|<16 keeps 64-sum products under 2^63). Cosine then comes
out of sqrt/divide on identical integers -> bit-identical doubles
everywhere, while staying within ~6e-8 of the true float cosine. The
same trick is how you'd bucket/shard vectors reproducibly across a
1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 1 << 24


def quantize(arr: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<bigint> fixed-point; exact in any engine."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(arr, lambda x: F.floor(x * F.lit(scale)))


def qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def qnorm2(a: Column) -> Column:
    """Exact integer squared L2 norm of a quantized vector."""
    return qdot(a, a)


def cosine_from_parts(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """cosine = dot / (|a|*|b|) — single sqrt/mul/div chain on exact
    integers, so the double result is engine-independent. The
    denominator is nullif-guarded: a zero-norm vector makes DuckDB's
    double x/0 yield NULL where Spark's ANSI `/` throws — both engines
    must agree on NULL (and NULL cosines drop out of >=threshold
    filters identically in both)."""
    return dot.cast("double") / F.nullif(
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double")),
        F.lit(0.0),
    )


# Per-vector envelope for exact quantized math (r10 non-finite /
# hostile-magnitude embeddings class): sum(x^2) < 8191 guarantees
# EVERY quantized BIGINT accumulator in the operator surface stays
# under 2^63 — norms sum(floor(x*2^24)^2) < 2^61, dots by
# Cauchy-Schwarz, and squared DISTANCES sum((qa_i-qb_i)^2) <=
# 2*(|qa|^2+|qb|^2) < 2^63 (the distance form is the binding
# constraint — a 2^15 norm-only bound still let the kNN/hard-negative
# dist2 overflow, found by that fixture class). The bound is 8191,
# ONE unit under the real-math 2^13 limit, to absorb floor()
# quantization slop (r10 ADVICE): floor(x*2^24) errs by < 1 per
# component, so a quantized distance can exceed its real-math value
# by < 4*2^24*sum|a_i - b_i| + 4*dim <= ~1e11 at dim 64 — two
# antipodal vectors both at norm^2 = 8192-epsilon could push the
# real-math bound's zero margin past 2^63. At 8191 the margin is
# 2*(2^13 - 8191)*2*2^48 = 4*2^48 ~ 1.1e15 >> the slop, so the
# strict-inequality guarantee genuinely covers rounding. A vector
# that violates the envelope — or carries a NULL / NaN / +-Inf
# component, which floor(x * 2^24) turns into an ANSI crash — does
# not exist for vector math, exactly like the r8 NULL-embedding
# contract. SQL twin (DuckDB): ``embedding IS NOT NULL AND
# len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0
# AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) *
# CAST(x AS DOUBLE))) < 8191.0``. The norm gate sums in DOUBLE with
# per-component double squares on both engines (exact for the
# integer/half-valued component magnitudes real encoders emit near
# the boundary; IEEE-identical fold order left-to-right).
VEC_NORM2_BOUND = 8191.0


def vector_exact(arr: Column | str) -> Column:
    """True iff the vector exists and is usable for exact quantized
    math: non-NULL, every component non-NULL and finite, and squared
    L2 norm inside the slop-shaved 2^13 envelope (VEC_NORM2_BOUND)."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    bad = F.exists(
        arr,
        lambda x: x.isNull()
        | F.isnan(x)
        | (F.abs(x) == F.lit(float("inf"))),
    )
    n2 = F.aggregate(
        F.transform(arr, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return arr.isNotNull() & ~bad & (n2 < F.lit(VEC_NORM2_BOUND))
