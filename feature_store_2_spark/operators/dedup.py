"""Deduplication operators for training-data pipelines (north-star
extension): exact, n-gram Jaccard, MinHash+LSH banding, SimHash.

Everything is built-in expressions (md5/conv/bit ops/array lambdas) —
no Python row path — and every hash is md5-derived so signatures are
engine-reproducible (the DuckDB oracles compute the identical values).

Scale shapes:
  * exact dedup        — one hash-shuffle on the fingerprint.
  * shingle Jaccard    — exact but self-joins on shingle: quadratic on
                         hot shingles; use ONLY on LSH candidates at scale.
  * MinHash + banding  — the 100 TB path: fixed-width signature per doc
                         (one agg), candidates via band-key equi-join.
  * SimHash            — one 32-bit signature per doc; near-dups cluster
                         by signature prefix or small hamming radius.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_2_spark.operators.text import tokens

N_MINHASHES = 16
N_BANDS = 4  # 4 rows per band


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>); empty when the
    document has fewer than n words."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dupes, canonical_id): md5 groups; canonical =
    lowest id. The degenerate (all-unique) case still exercises the
    hash+shuffle pipeline."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dupes"), F.min(id_col).alias("canonical_id"))
    )


def shingle_exploded(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    # Repartition by doc id BEFORE the explode: a compact documents
    # parquet often scans as few partitions, which would serialize the
    # shingle/hash work onto a handful of cores; hashing the narrow doc
    # rows across the cluster first is one cheap shuffle. The explicit
    # partition count matters: compressed docs look tiny to AQE, which
    # would coalesce a bare repartition(col) back to ~1 partition even
    # though the post-explode CPU work is large.
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle sets, keeping
    pairs >= threshold. Jaccard = |∩| / (|A|+|B|-|∩|) — one integer
    division, engine-exact."""
    # Persisted: the shingle table feeds the pair self-join twice plus
    # the per-doc size aggregate (three scans of one explode).
    sh = shingle_exploded(docs, text_col, id_col, n).persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc1"), F.col(f"b.{id_col}").alias("doc2")
        )
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col(id_col).alias("doc1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("doc2"), F.col("n_sh").alias("n2"))
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    ).cast("double")
    return (
        common.join(s1, "doc1")
        .join(s2, "doc2")
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# 2^61 - 1 (Mersenne): modulus for the double-hashing permutation family.
MERSENNE_61 = (1 << 61) - 1


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc: id, h0..h{15}, band0..band3 (band = '_'-joined
    group of 4 consecutive minhashes). Single explode + single agg.

    Hashing: ONE md5 per shingle, split into two 56-bit halves (h1, h2);
    permutation i is (h1 + i*h2) mod (2^61-1) — Kirsch-Mitzenmacher
    double hashing, the published standard for simulating k independent
    hash functions from two. 16x less hash work than k independent
    digests, integer (not 32-char string) min-aggregation, and every
    step is engine-portable so the DuckDB oracle reproduces it exactly.
    h1 + 15*h2 < 2^60, so the arithmetic never overflows a BIGINT.
    """
    sh = shingle_exploded(docs, text_col, id_col)
    m = F.md5(F.col("shingle").cast("binary"))
    halves = sh.select(
        F.col(id_col),
        F.conv(F.substring(m, 1, 14), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 15, 14), 16, 10).cast("long").alias("h2"),
    )
    sig = halves.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.col("h1") + F.lit(seed) * F.col("h2"), F.lit(MERSENNE_61))
            ).alias(f"h{seed}")
            for seed in range(N_MINHASHES)
        ]
    )
    rows_per_band = N_MINHASHES // N_BANDS
    for band in range(N_BANDS):
        parts = [f"h{band * rows_per_band + r}" for r in range(rows_per_band)]
        sig = sig.withColumn(f"band{band}", F.concat_ws("_", *parts))
    return sig


def minhash_lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc1, doc2, n_shared_bands): pairs whose signatures collide in
    >=1 LSH band. The equi-join on (band_idx, band_key) is the scale
    path — no quadratic shingle join."""
    sig = minhash_signatures(docs, text_col, id_col)
    # Persist the banded signature table: the candidate self-join reads
    # it twice (broadcast + streamed side), and without this each side
    # re-runs the whole shingle+minhash pipeline — 2x the dominant cost.
    # At 100 TB this materialization is a real signature table written
    # to storage once and joined thereafter (4 narrow rows per doc).
    bands = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias(
            "band_idx", "band_key"
        ),
    ).persist()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc1"), F.col(f"b.{id_col}").alias("doc2")
        )
        .agg(F.count("*").cast("long").alias("n_shared_bands"))
    )


SIMHASH_BITS = 32


def _token_hash32(tok: Column) -> Column:
    """First 8 hex chars of md5 as a 32-bit int — portable across
    engines (DuckDB mirrors it with a digit-fold)."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10).cast("long")


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Frequency-weighted 32-bit SimHash per document: explode tokens,
    one grouped agg summing +/-1 per bit, recombine. Bit b of the
    signature is 1 iff Σ_tokens (2*bit_b(h)-1) > 0."""
    # Same pre-explode spread as shingle_exploded (explicit count so AQE
    # doesn't coalesce the small compressed input back to one partition).
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    tok = docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    h = _token_hash32(F.col("tok"))
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long"),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return bit_sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc1, doc2, hamming) with hamming(simhash) <= max_hamming.
    Gate-scale uses the direct pairwise form; at 100 TB, pre-bucket by
    signature bytes (each <=k-hamming pair shares >=1 exact byte for
    k<8) and join within buckets."""
    # Persisted: both sides of the pairwise join read the signatures.
    sig = simhash(docs, text_col, id_col).persist()
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc1"),
            F.col(f"b.{id_col}").alias("doc2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
