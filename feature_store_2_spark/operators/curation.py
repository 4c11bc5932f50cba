"""Corpus-curation operators for training-data pipelines (north-star
extension beyond the reference's feature-store surface): benchmark
contamination checks, repetition/quality heuristics (Gopher-style),
TF-salience term extraction, and sub-document (chunk-level) dedup.

Scale shapes (the 100 TB contract):
  * contamination: the benchmark shingle set is bounded (benchmarks are
    small by definition) -> broadcast join against it; one shuffle to
    re-group per document.
  * repetition: chunk/gram construction is a pure codegen projection;
    the only shuffles are the (doc, gram) count and the per-doc rollup.
  * salience: explode -> (doc, term) agg with map-side partial combine,
    term-level df agg, per-doc top-k window. Three narrow shuffles.
  * chunk dedup: chunking via slice() is codegen (no explode of words);
    global dedup is one groupBy on the chunk hash, rollup is one more.

No row-at-a-time UDFs anywhere — every expression is a built-in, so
whole-stage codegen applies and DuckDB can reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_store_2_spark.operators.dedup import shingle_exploded
from feature_store_2_spark.operators.text import tokens


def contamination_vs_benchmark(
    docs: DataFrame,
    bench_mod: int = 13,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct word-``n``-gram shingles that also occur in the benchmark
    slice (here: ``doc_id % bench_mod == 0`` stands in for an eval set).

    At 100 TB the benchmark shingle set stays small (eval suites are
    ~MBs), so it is broadcast; the corpus side streams through the join
    map-side and re-groups once per doc. Columns: (doc_id, n_shingles,
    n_contaminated, contamination, is_contaminated).
    """
    sh = shingle_exploded(docs, id_col=id_col, n=n)
    is_bench = F.col(id_col) % bench_mod == 0
    bench = (
        sh.filter(is_bench).select("shingle").distinct().withColumn("hit", F.lit(1))
    )
    train = sh.filter(~is_bench)
    joined = train.join(F.broadcast(bench), "shingle", "left")
    frac = F.count("hit").cast("double") / F.count("*")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("hit").alias("n_contaminated"),
        frac.alias("contamination"),
        (frac >= threshold).alias("is_contaminated"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_frac_threshold: float = 0.1,
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and most-frequent-2-gram coverage (Rae et al. 2021 use the
    same family of filters for MassiveText).

    Gram construction happens inside a codegen'd projection; the only
    shuffles are the (doc, gram) count and the per-doc argmax window.
    Tie-break for the top gram: highest count, then lexicographic gram.
    """
    toks = tokens(text_col)
    # Guard <2-token docs: Spark's sequence(1, 0) DESCENDS ([1, 0]) where
    # DuckDB's generate_series(1, 0) is EMPTY — unguarded, a 1-token doc
    # indexes element_at(toks, 2) and ANSI throws. NULL grams make
    # explode drop the doc, matching the oracle's no-grams behavior.
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    )
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_words"),
        (
            (F.size(toks) - F.size(F.array_distinct(toks))).cast("double")
            / F.size(toks)
        ).alias("dup_word_frac"),
        F.explode(grams).alias("gram"),
    )
    counts = base.groupBy(id_col, "n_words", "dup_word_frac", "gram").agg(
        F.count("*").alias("gram_n")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("gram_n"), F.asc("gram"))
    top_frac = F.col("gram_n").cast("double") / (F.col("n_words") - 1)
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            "n_words",
            "dup_word_frac",
            F.col("gram").alias("top_2gram"),
            F.col("gram_n").alias("top_2gram_n"),
            top_frac.alias("top_2gram_frac"),
            (top_frac > top_frac_threshold).alias("is_repetitive"),
        )
    )


def tf_salient_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` salient terms per document, scored tf * N / df — a
    TF-IDF with *linear* inverse document frequency. Linear (not log)
    idf keeps every arithmetic step exact: tf*N is integer math and the
    single division is IEEE-exact, so ranks reproduce bit-for-bit on
    any engine; ln() is only within-1-ulp and would make the gate
    hash-unstable.

    Shape: explode -> (doc, term) tf agg (map-side combine), term df agg
    off the tf table (no second scan), broadcast the one-row corpus
    count, per-doc top-k window. At 100 TB the df table is vocabulary-
    sized -> still a fine shuffle key; skew on stopwords is bounded
    because df is an agg, not a join fan-out.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score", (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def chunk_text(text_col: str, chunk_words: int) -> Column:
    """array<string> of ``chunk_words``-word chunks (stride = size, no
    overlap; trailing partial chunk kept) — built with slice() inside
    codegen, so chunking costs zero shuffles."""
    toks = tokens(text_col)
    n_chunks = F.floor((F.size(toks) + chunk_words - 1) / F.lit(chunk_words))
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_words + 1, chunk_words), " "
        ),
    )


def chunk_dedup_stats(
    docs: DataFrame,
    chunk_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document dedup (line/paragraph-level dedup a la CCNet /
    RefinedWeb, applied to fixed word-count chunks since the synthetic
    corpus has no newlines): every chunk is deduped corpus-wide, the
    canonical copy being the (lowest doc_id, lowest chunk_idx)
    occurrence; per document report how many of its chunks survive.

    Columns: (doc_id, n_chunks, n_kept, kept_frac).
    """
    chunks = docs.select(
        F.col(id_col),
        F.posexplode(chunk_text(text_col, chunk_words)).alias("chunk_idx", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy(id_col, "chunk_idx")
    kept = chunks.withColumn("rn", F.row_number().over(w))
    frac = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast(
        "double"
    ) / F.count("*")
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
        frac.alias("kept_frac"),
    )


GOPHER_STOPWORDS = ("the", "and", "of", "to", "in", "a", "is")


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style document quality rule battery (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", appendix A1.1 — the
    MassiveText filter set; also the core of Dolma/RefinedWeb recipes).
    Reference analog: the reference has no corpus ops — this is part of
    the commissioned LLM-curation surface (SURVEY.md Part B).

    Rules, re-expressed in INTEGER arithmetic only so both engines agree
    bit-for-bit (no division anywhere — each published ratio threshold
    becomes a cross-multiplied integer comparison):

    * ``wc_ok``       50 <= n_words <= 100,000 (published bounds);
    * ``mean_len_ok`` mean word length in [3, 10] chars ->
                      ``3*n_words <= tot_chars <= 10*n_words``;
    * ``rep_ok``      most frequent word < 20% of tokens ->
                      ``5*max_tf < n_words``;
    * ``stop_ok``     >= 2 occurrences drawn from a 7-word stopword
                      list (the paper's "contains >= 2 stop words");
    * ``alpha_ok``    >= 80% of words purely alphabetic ->
                      ``5*n_alpha >= 4*n_words``;
    * ``keep``        AND of all five.

    The paper's line-shape rules (bullet/ellipsis line fractions) are
    omitted: the synthetic corpus is single-line (no newlines), so the
    rules would be constant-true and untestable here.

    Shape at 100 TB: one explode -> (doc, word) tf agg (map-side
    combine) -> per-doc agg; both shuffles key on doc_id (second one
    pre-combined), no joins except the left join back to `docs` to keep
    zero-word documents. All flag math is codegen'd integer compares.
    """
    words = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy(id_col, "word").agg(F.count("*").alias("c"))
    per = tf.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.length("word") * F.col("c")).cast("long").alias("tot_chars"),
        F.max("c").cast("long").alias("max_tf"),
        F.coalesce(
            F.sum(F.when(F.col("word").isin(*GOPHER_STOPWORDS), F.col("c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_stop"),
        F.coalesce(
            # \A..\z, not ^..$ (r11 multi-line-token fixture find):
            # Java's $ also matches BEFORE a final line terminator, so
            # a space-delimited token like 'beta\n' counted as
            # alphabetic in Spark while DuckDB's regexp_full_match
            # (RE2, true full-text) said no. \A/\z anchor to the text
            # ends in both engines.
            F.sum(F.when(F.col("word").rlike("\\A[a-z]+\\z"), F.col("c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_alpha"),
    )
    base = docs.select(id_col).join(per, id_col, "left").select(
        id_col,
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n_words", "tot_chars", "max_tf", "n_stop", "n_alpha")
        ],
    )
    n, tot, mtf = F.col("n_words"), F.col("tot_chars"), F.col("max_tf")
    flags = base.select(
        "*",
        (n.between(50, 100000)).alias("wc_ok"),
        ((3 * n <= tot) & (tot <= 10 * n)).alias("mean_len_ok"),
        (5 * mtf < n).alias("rep_ok"),
        (F.col("n_stop") >= 2).alias("stop_ok"),
        (5 * F.col("n_alpha") >= 4 * n).alias("alpha_ok"),
    )
    return flags.select(
        "*",
        (
            F.col("wc_ok")
            & F.col("mean_len_ok")
            & F.col("rep_ok")
            & F.col("stop_ok")
            & F.col("alpha_ok")
        ).alias("keep"),
    )
