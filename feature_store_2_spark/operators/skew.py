"""Skew-handling join utilities.

AQE's skew-join split (on by default, session.py) handles most skew for
sort-merge joins at runtime. Salting is the explicit fallback for the
cases AQE can't fix: a handful of ultra-hot keys in a shuffle join where
one key's rows exceed a single executor's memory, or hash-partitioned
stateful ops. The pattern: deterministically shard the skewed side into
``n_salts`` sub-keys, replicate the other (small-ish) side once per
salt, join on (key, salt), drop the salt.

Determinism: the salt is a hash of a unique column (never rand()), so
retried tasks re-produce identical rows — a lost-executor retry with
rand() salts would corrupt the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_src: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with the skewed
    side sharded ``n_salts`` ways by a hash of ``salt_src`` (a unique or
    high-cardinality column of the skewed side). ``other`` is replicated
    n_salts times — keep it the smaller side.

    Only join types that preserve the *skewed* side are allowed: for
    ``right``/``full``, an unmatched row of the replicated side would be
    emitted once per salt (n_salts duplicates), silently corrupting the
    result. Put the replicated side's outer semantics on the skewed side
    (swap the inputs) or use a plain join for those.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_equi_join: how={how!r} would duplicate unmatched rows "
            f"of the replicated side; allowed: {sorted(allowed)}"
        )
    salt_col = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salts)).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, [on, "__salt"], how).drop("__salt")
