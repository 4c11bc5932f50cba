"""Training-data assembly query family — the operators that sit between
a curated corpus and the actual training job: deterministic sampling
(per-group reservoir, temperature-weighted language mixing), batch
construction (length-bucketed batching), vocabulary induction (one BPE
merge step), vocabulary-id tokenization, retrieval-index build
(segmented inverted index), per-domain corpus profiling, Arrow-batched
model scoring (mapInPandas + mapInArrow + a lateral UDTF), and JSONL
export.

Reference scope analog: the reference's pipeline ends at feature
serving (`/root/reference/services/user_feature.py`); these extend the
same engine surface to the data-loading side of an LLM training
pipeline, the north-star workload for the 100 TB deployment.

Every entry carries an exact DuckDB oracle. Determinism recipe shared
by the family: all sampling/sharding decisions come from md5(id)
buckets (never rand()), ratios are single IEEE-exact divisions of
integer aggregates (sqrt/div are correctly rounded on both engines),
and counts stay integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.operators.cache import track_persist as _track_persist
from feature_store_2_spark.operators.sizing import adaptive_partitions
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

_HEX = "0123456789abcdef"


def _md5_bucket(col, mod: int):
    """Deterministic uniform bucket in [0, mod): the first two md5 hex
    DIGITS parsed to a value in 0..255 (position() is 1-based and
    identical on both engines), then mod. Uniform for any mod dividing
    256. The earlier ascii(hex char) idiom was NOT uniform — ascii
    values span 48..102, so mod 32 collapsed to 16 classes (r5 review
    finding); hex-digit parsing fixes the distribution without losing
    cross-engine determinism."""
    assert 256 % mod == 0, "uniformity requires mod | 256"
    m = F.md5(col.cast("string").cast("binary"))

    def v(i: int):
        return F.position(F.substring(m, i, 1), F.lit(_HEX)).cast("long") - 1

    return (v(1) * 16 + v(2)) % mod


def _md5_order(col):
    """Full md5 hex string — a deterministic uniform shuffle key for
    order-based sampling (rank by hash == uniform without replacement)."""
    return F.md5(col.cast("string").cast("binary"))


_MD5_BUCKET_SQL = (
    "(((CAST(position(substr(md5(CAST({id} AS VARCHAR)), 1, 1) IN "
    "'0123456789abcdef') AS BIGINT) - 1) * 16"
    " + (CAST(position(substr(md5(CAST({id} AS VARCHAR)), 2, 1) IN "
    "'0123456789abcdef') AS BIGINT) - 1)) % {mod})"
)


@register(
    "sample_group_reservoir",
    """
WITH r AS (
    SELECT user_id, event_id, event_type,
           CAST(row_number() OVER (
               PARTITION BY user_id
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
           ) AS BIGINT) AS sample_rank
    FROM events)
SELECT user_id, event_id, event_type, sample_rank
FROM r WHERE sample_rank <= 3
""",
    doc="deterministic per-group reservoir sample: exactly min(k, n) "
    "events per user, k=3, chosen uniformly by ranking on md5(event_id) "
    "— rank-by-hash IS a uniform sample without replacement, but unlike "
    "reservoir state or rand() it is reproducible across engines, "
    "retries, and partitionings. One window over user_id (high-"
    "cardinality key — no skew funnel) and the rank<=k filter cuts "
    "output to k rows/group before anything downstream.",
)
def sample_group_reservoir(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(_md5_order(F.col("event_id")), "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= 3)
    )


@register(
    "doc_length_bucket_batches",
    f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           {_MD5_BUCKET_SQL.format(id="doc_id", mod=4)} AS shard
    FROM documents),
b AS (
    SELECT doc_id, n_tokens, shard,
           (n_tokens + 31) // 32 AS bucket,
           CAST(row_number() OVER (
               PARTITION BY (n_tokens + 31) // 32, shard
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS rn
    FROM t)
SELECT bucket, shard, (rn - 1) // 8 AS batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(n_tokens) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(*) * bucket * 32 - sum(n_tokens) AS BIGINT) AS pad_waste
FROM b GROUP BY bucket, shard, (rn - 1) // 8
""",
    doc="length-bucketed batch construction — the padding-efficiency "
    "step of a training data loader: docs are bucketed by "
    "ceil(tokens/32), sharded 4 ways by md5(doc_id), deterministically "
    "ordered within (bucket, shard) by md5, and grouped into batches of "
    "8; per batch the pad waste vs the bucket cap is exact integer "
    "arithmetic. The shard key is the scale design: window partitions "
    "are (bucket x shard), so no low-cardinality bucket ever funnels "
    "through one task (the doc_corpus_curation r4 lesson), and batch "
    "ids are local to a shard exactly as a distributed loader numbers "
    "them. Everything is integers — the oracle hashes bit-for-bit.",
)
def doc_length_bucket_batches(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    t = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        _md5_bucket(F.col("doc_id"), 4).alias("shard"),
    ).withColumn("bucket", F.floor((F.col("n_tokens") + 31) / 32).cast("long"))
    w = Window.partitionBy("bucket", "shard").orderBy(
        _md5_order(F.col("doc_id")), "doc_id"
    )
    b = t.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "batch_id", F.floor((F.col("rn") - 1) / 8).cast("long")
    )
    return b.groupBy("bucket", "shard", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.count("*") * F.col("bucket") * 32 - F.sum("n_tokens"))
        .cast("long")
        .alias("pad_waste"),
    )


# Uniform fraction in [0, 1) from the first 4 md5 hex digits: each digit
# parsed via position() (1-based, identical on both engines) -> a value
# in 0..65535 over a power-of-two denominator, so the division is exact.
_MD5_FRAC_SQL = (
    "(((CAST(position(substr(md5(CAST({id} AS VARCHAR)), 1, 1) IN '{hx}') AS BIGINT) - 1) * 4096"
    " + (CAST(position(substr(md5(CAST({id} AS VARCHAR)), 2, 1) IN '{hx}') AS BIGINT) - 1) * 256"
    " + (CAST(position(substr(md5(CAST({id} AS VARCHAR)), 3, 1) IN '{hx}') AS BIGINT) - 1) * 16"
    " + (CAST(position(substr(md5(CAST({id} AS VARCHAR)), 4, 1) IN '{hx}') AS BIGINT) - 1)"
    ") / 65536.0)"
)


def _md5_frac(col):
    """Spark twin of _MD5_FRAC_SQL: uniform [0, 1) fraction of an id."""
    m = F.md5(col.cast("string").cast("binary"))

    def v(i: int):
        return F.position(F.substring(m, i, 1), F.lit(_HEX)).cast("long") - 1

    val = ((v(1) * 16 + v(2)) * 16 + v(3)) * 16 + v(4)
    return val / F.lit(65536.0)


@register(
    "doc_mixture_temperature_sample",
    f"""
WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
mn AS (SELECT min(n_lang) AS n_min FROM c),
h AS (
    SELECT doc_id, lang,
           {_MD5_FRAC_SQL.format(id="doc_id", hx=_HEX)} AS frac
    FROM documents)
SELECT doc_id, h.lang, n_lang,
       sqrt(CAST(n_min AS DOUBLE)) / sqrt(CAST(n_lang AS DOUBLE)) AS keep_rate
FROM h JOIN c USING (lang) CROSS JOIN mn
WHERE frac < sqrt(CAST(n_min AS DOUBLE)) / sqrt(CAST(n_lang AS DOUBLE))
""",
    doc="temperature-weighted language mixing (alpha=0.5), the data-"
    "mixture step every multilingual training run applies (Conneau et "
    "al. 2019 XLM-R): per-language keep-rate sqrt(n_min/n_lang) "
    "rebalances the expected mixture toward n_lang^0.5 — the dominant "
    "language downsampled hardest, the smallest kept whole (the "
    "synthetic corpus is source-balanced but language-SKEWED, so the "
    "cut genuinely fires). Keep decisions are uniform md5(doc_id) "
    "fractions (4 hex digits over a power-of-two denominator — exact) "
    "vs a rate built from two integer counts by IEEE-correctly-rounded "
    "sqrt/div, so both engines keep the IDENTICAL set and the double "
    "column itself hashes exactly. Shape: one per-language count agg "
    "(bounded domain), a 1-row n_min broadcast, an equi-join back on "
    "lang — the corpus scan itself never shuffles.",
)
def doc_mixture_temperature_sample(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    c = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    mn = c.agg(F.min("n_lang").alias("n_min"))
    rate = F.sqrt(F.col("n_min").cast("double")) / F.sqrt(
        F.col("n_lang").cast("double")
    )
    h = d.select(
        "doc_id",
        "lang",
        _md5_frac(F.col("doc_id")).alias("frac"),
    )
    return (
        h.join(c, "lang")
        .crossJoin(F.broadcast(mn))
        .filter(F.col("frac") < rate)
        .select("doc_id", "lang", "n_lang", rate.alias("keep_rate"))
    )


@register(
    "search_inverted_index",
    """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
dtok AS (SELECT DISTINCT doc_id, term FROM tok)
SELECT term, doc_id // 100 AS segment,
       CAST(count(*) AS BIGINT) AS seg_df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM dtok GROUP BY term, doc_id // 100
""",
    doc="inverted-index build (term -> sorted posting list) — the "
    "retrieval-side dual of doc-side tokenization and the core of a "
    "corpus search/contamination service. Posting lists are emitted as "
    "doc-range SEGMENTS (doc_id div 100): every output row is bounded "
    "by the segment width BY CONSTRUCTION, so a stop-word's corpus-"
    "sized posting list can never materialize as one giant row/task — "
    "the same segmented layout Lucene/Sparrow-style distributed "
    "indexes persist, and segment ranges make index MERGES and "
    "incremental re-index of a doc-id range embarrassingly parallel. "
    "One shuffle on (term, segment); list construction is sort_array + "
    "concat_ws codegen, no Python.",
)
def search_inverted_index(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    dtok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).distinct()
    return dtok.groupBy(
        "term", F.expr("doc_id DIV 100").alias("segment")
    ).agg(
        F.count("*").alias("seg_df"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )


@register(
    "vocab_bpe_merge_step",
    """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
wc AS (SELECT word, count(*) AS c FROM tok
       WHERE len(word) >= 2 GROUP BY word),
-- split each word to a char LIST once and build the pair list with
-- an inline list_transform + unnest (the shingle-CTE idiom): cs[i] is
-- O(1) while substr(word, i, 1) re-scans the prefix per position
-- (O(len^2) per word — the r11 1M-char-token fixture hung Spark's
-- UTF8String on exactly this shape), and a LATERAL unnest would carry
-- the full cs list on every exploded row (61 GB on the same fixture).
-- Both engines' split==substr semantics probed cross-engine in the
-- r11 BENCH_NOTES, incl. astral/NFD chars.
wcs AS (SELECT word, c, string_split(word, '') AS cs FROM wc),
pairs AS (
    SELECT unnest(list_transform(generate_series(1, len(cs) - 1),
                  i -> cs[i] || '|' || cs[i + 1])) AS pair, c
    FROM wcs),
agg AS (SELECT pair, CAST(sum(c) AS BIGINT) AS pair_n
        FROM pairs GROUP BY pair)
SELECT pair, pair_n FROM agg
ORDER BY pair_n DESC, pair LIMIT 20
""",
    doc="one BPE merge step — the corpus-wide statistic tokenizer "
    "training iterates (Sennrich et al. 2016): count every adjacent "
    "symbol pair inside every word occurrence (weighted by word "
    "frequency) and take the top candidates. The scale trick is "
    "aggregating to the WORD VOCABULARY first (one hash agg), then "
    "expanding pairs over vocab entries — pair work scales with "
    "distinct words, not corpus tokens, exactly how production BPE "
    "trainers precompute word counts. Pure integer counts; top-20 is "
    "TakeOrderedAndProject (tie-break on pair), never a global sort.",
)
def vocab_bpe_merge_step(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    wc = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    # Split to a char array ONCE and zip adjacent slices: element
    # access is O(1), where per-position substr(word, i, 1) re-scans
    # the prefix (UTF8String.substring is O(i)) — O(len^2) per word,
    # an hour on the 11b fixture's 1M-char single token.
    chars = F.split(F.col("word"), "")
    pair_arr = F.zip_with(
        F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0))),
        F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
        lambda a, b: F.concat_ws("|", a, b),
    )
    pairs = wc.select(F.explode(pair_arr).alias("pair"), "c")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("pair_n"))
        .orderBy(F.desc("pair_n"), "pair")
        .limit(20)
    )


@register(
    "doc_domain_quality_profile",
    """
WITH tot AS (SELECT count(*) AS n_total FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*)
           AS dup_frac,
       CAST(count(*) AS DOUBLE) / n_total AS corpus_share
FROM documents CROSS JOIN tot
GROUP BY source, n_total
""",
    doc="per-domain corpus profile — the C4/RefinedWeb-style source "
    "scorecard that decides per-domain curation policy: doc count, "
    "language spread, mean length, exact-duplicate fraction (md5 "
    "fingerprints), and corpus share. One hash agg over source "
    "(bounded domain) with a 1-row total broadcast; ratios are single "
    "divisions of exact integer counts, so the doubles hash "
    "identically on both engines. At 100 TB this is the dashboard "
    "query that runs after every crawl snapshot.",
)
def doc_domain_quality_profile(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    tot = d.agg(F.count("*").alias("n_total"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("source", "n_total")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            F.countDistinct(F.md5(F.col("text").cast("binary"))).alias(
                "n_unique_texts"
            ),
            (
                (F.count("*") - F.countDistinct(F.md5(F.col("text").cast("binary"))))
                .cast("double")
                / F.count("*")
            ).alias("dup_frac"),
            (F.count("*").cast("double") / F.col("n_total")).alias("corpus_share"),
        )
        .drop("n_total")
    )


@register(
    "udf_model_score_linear",
    """
WITH f AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq,
           n_chars
    FROM documents)
SELECT doc_id, n_words, n_uniq,
       CAST(50 * n_words + 30 * n_uniq - 2 * n_chars AS BIGINT) AS score,
       50 * n_words + 30 * n_uniq - 2 * n_chars > 2000 AS keep
FROM f
""",
    doc="Arrow-batched model inference — the batch-scoring surface every "
    "curation pipeline runs (quality classifiers, fastText-style "
    "filters): featurize + score each document inside ONE mapInPandas "
    "pass (vectorized pandas/numpy per Arrow batch, never per-row "
    "Python), here a fixed integer-weight linear model so the oracle "
    "reproduces the scores bit-for-bit — the real model swaps into the "
    "same batch function without touching the Spark plan. Zero "
    "shuffles: inference is embarrassingly parallel over batches, "
    "which is exactly why the Arrow path (not row UDFs) is the only "
    "acceptable shape at 100 TB.",
)
def udf_model_score_linear(spark, sf_dir):
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, "documents", sf_dir)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            # nullable: a NULL text scores NULL (len(string_split(
            # NULL)) is NULL on the oracle side too) — round-8
            # NULL-text fixture find.
            T.StructField("n_words", T.LongType(), True),
            T.StructField("n_uniq", T.LongType(), True),
            T.StructField("score", T.LongType(), True),
            T.StructField("keep", T.BooleanType(), True),
        ]
    )

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            words = pdf["text"].str.split(" ")
            # nullable Int64 end-to-end: a NULL text yields NULL
            # features/score/keep (pandas NA comparison stays NA,
            # where float NaN > 2000 would silently give False).
            n_words = words.map(
                lambda w: len(w) if isinstance(w, list) else None
            ).astype("Int64")
            n_uniq = words.map(
                lambda w: len(set(w)) if isinstance(w, list) else None
            ).astype("Int64")
            n_chars = pdf["n_chars"].astype("Int64")
            score = 50 * n_words + 30 * n_uniq - 2 * n_chars
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_uniq": n_uniq,
                    "score": score,
                    "keep": score > 2000,
                }
            )

    return d.select("doc_id", "text", "n_chars").mapInPandas(score_batches, schema)


@register(
    "udf_map_in_arrow_tokens",
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(text) AS BIGINT) AS n_chars_m
FROM documents
""",
    doc="mapInArrow surface — the zero-copy tier of the Arrow UDF "
    "family (below mapInPandas: raw pyarrow RecordBatches, no pandas "
    "conversion): token and character counts computed with "
    "pyarrow.compute kernels (count_substring / utf8_length), which "
    "run vectorized C++ over Arrow buffers. The oracle recomputes "
    "both counts relationally, pinning the kernel semantics (split on "
    "single space == substring count + 1; ASCII corpus pins "
    "utf8_length == len). Completes the UDF-surface inventory: "
    "applyInPandasWithState, grouped-map applyInPandas, GROUPED_AGG, "
    "mapInPandas, mapInArrow — and still zero row-at-a-time Python.",
)
def udf_map_in_arrow_tokens(spark, sf_dir):
    from typing import Iterator

    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql import types as T

    d = load_table(spark, "documents", sf_dir)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            # nullable: pyarrow kernels PROPAGATE a NULL text to NULL
            # counts; the non-null schema made the Arrow exchange
            # throw 'Value at index is null' (round-8 fixture find).
            T.StructField("n_tokens", T.LongType(), True),
            T.StructField("n_chars_m", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            text = rb.column(rb.schema.get_field_index("text"))
            n_tokens = pc.add(pc.count_substring(text, " "), 1)
            n_chars = pc.utf8_length(text)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("doc_id")),
                    pc.cast(n_tokens, pa.int64()),
                    pc.cast(n_chars, pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_chars_m"],
            )

    return d.select("doc_id", "text").mapInArrow(batches, schema)


@register(
    "udtf_word_positions",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE doc_id < 50)
SELECT doc_id,
       u.word,
       CAST(u.pos - 1 AS INTEGER) AS pos
FROM t JOIN LATERAL (
    SELECT generate_subscripts(w, 1) AS pos, unnest(w) AS word) u
  ON true
""",
    doc="Python UDTF (user-defined TABLE function, new Spark 4 "
    "surface, Arrow-optimized): a lateral table function expanding "
    "each document into (word, position) rows — the extension point "
    "for tokenizers/segmenters that genuinely need imperative Python "
    "per input row yet return a TABLE, not a scalar. Registered with "
    "useArrow=True so the plan shows ArrowEvalPythonUDTF (batched "
    "Arrow transfer), keeping the repo's no-BatchEvalPython policy "
    "intact. Oracle = LATERAL unnest with subscripts; restricting to "
    "doc_id < 50 keeps the rehearsal cheap while exercising the full "
    "surface.",
)
def udtf_word_positions(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int", useArrow=True)
    class _WordPositions:
        def eval(self, text: str):
            if text is None:
                # NULL text expands to zero rows — the oracle's
                # LATERAL unnest over string_split(NULL) is empty too.
                return
            for i, w in enumerate(text.split(" ")):
                yield (w, i)

    spark.udtf.register("fs2_word_positions", _WordPositions)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.pos
        FROM documents d JOIN LATERAL fs2_word_positions(d.text) s
        WHERE d.doc_id < 50
        """
    )


@register(
    "doc_tokenize_to_ids",
    """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
vocab AS (
    SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS tok_id
    FROM (SELECT DISTINCT unnest(w) AS term FROM tok)),
flat AS (
    SELECT t.doc_id, generate_subscripts(t.w, 1) AS pos, unnest(t.w) AS term
    FROM tok t),
ids AS (
    SELECT f.doc_id, f.pos, v.tok_id
    FROM flat f JOIN vocab v ON f.term = v.term)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(CAST(tok_id AS VARCHAR), ',' ORDER BY pos) AS token_ids
FROM ids GROUP BY doc_id
""",
    doc="vocabulary-id tokenization — the LAST hop before a training "
    "job: every document rendered as its token-id sequence. The vocab "
    "assigns dense ids by sorted term (deterministic across engines, "
    "growth-stable ordering would use frozen-vocab ids in production); "
    "the id lookup is a vocabulary-keyed equi-join (AQE-chosen "
    "strategy, NEVER force-broadcast — vocabulary is the canonical "
    "unbounded-cardinality side, the r4 tfidf lesson), and sequences "
    "reassemble with an order-pinned aggregation. The vocab-build "
    "window runs over distinct terms (vocabulary-scale metadata, and "
    "id assignment at 100 TB is a one-time artifact, not per-query).",
)
def doc_tokenize_to_ids(spark, sf_dir):
    from pyspark.sql import Window as W

    d = load_table(spark, "documents", sf_dir)
    flat = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "term"),
    ).withColumn("pos", F.col("pos0") + 1)
    vocab = (
        flat.select("term")
        .distinct()
        .withColumn(
            "tok_id", F.row_number().over(W.orderBy("term")).cast("long")
        )
    )
    ids = flat.join(vocab, "term")
    return (
        ids.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok_id"))
                    ),
                    lambda s: s.tok_id.cast("string"),
                ),
            ).alias("token_ids"),
        )
    )


@register(
    "doc_export_jsonl",
    """
SELECT doc_id,
       '{"doc_id":' || doc_id
           || ',"lang":' || coalesce(to_json(lang)::VARCHAR, 'null')
           || ',"text":' || coalesce(to_json(text)::VARCHAR, 'null')
           || '}' AS record
FROM documents
""",
    doc="JSONL export — the wire format training corpora actually ship "
    "in: each document rendered as one compact JSON record via "
    "to_json(struct(...)). The oracle builds the byte-exact expected "
    "string by concatenation, so Spark's JSON rendering itself is "
    "pinned (field order, compact separators, no stray whitespace) — "
    "the guarantee an export job needs before a downstream tokenizer "
    "consumes the files. String fields go through each engine's native "
    "JSON renderer (Spark Jackson vs DuckDB to_json) — measured "
    "byte-identical escaping across newline/quote/backslash/tab/"
    "control-\\u00XX/raw-unicode (r11: the multi-line fixture doc "
    "retired the old no-escaping-needed concatenation oracle, which "
    "emitted raw newlines). Zero shuffles, pure codegen projection.",
)
def doc_export_jsonl(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    # ignoreNullFields=false: a NULL lang/text renders as a JSON null
    # literal (the oracle coalesces to 'null' identically) instead of
    # silently DROPPING the field — field-set stability is part of the
    # export contract (round-8 NULL-text fixture find).
    return d.select(
        "doc_id",
        F.to_json(
            F.struct("doc_id", "lang", "text"),
            {"ignoreNullFields": "false"},
        ).alias("record"),
    )


@register(
    "doc_curriculum_order",
    f"""
WITH scored AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           {_MD5_BUCKET_SQL.format(id="doc_id", mod=8)} AS shard
    FROM documents),
staged AS (
    SELECT doc_id, n_tokens, shard,
           CASE WHEN n_tokens < 40 THEN 0
                WHEN n_tokens < 70 THEN 1
                ELSE 2 END AS stage
    FROM scored)
SELECT doc_id, n_tokens, shard, CAST(stage AS BIGINT) AS stage,
       CAST(row_number() OVER (
           PARTITION BY stage, shard
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS order_in_shard
FROM staged
""",
    doc="curriculum data ordering — the easy-to-hard schedule "
    "curriculum-learning runs feed the trainer (Bengio et al. 2009), "
    "staged here by document length (short -> long, the classic "
    "difficulty proxy): each doc gets a stage and a deterministic "
    "md5-shuffled position WITHIN its (stage, md5-shard) — random "
    "order inside a stage, stages consumed in sequence. Window "
    "partitions are (stage x shard), the skew-safe shape (order "
    "indices are per data-loader shard exactly as distributed training "
    "consumes them); all keys and positions are integers so the "
    "oracle hashes exactly.",
)
def doc_curriculum_order(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    scored = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        _md5_bucket(F.col("doc_id"), 8).alias("shard"),
    )
    stage = (
        F.when(F.col("n_tokens") < 40, 0)
        .when(F.col("n_tokens") < 70, 1)
        .otherwise(2)
        .cast("long")
    )
    staged = scored.withColumn("stage", stage)
    w = Window.partitionBy("stage", "shard").orderBy(
        _md5_order(F.col("doc_id")), "doc_id"
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        "shard",
        "stage",
        F.row_number().over(w).cast("long").alias("order_in_shard"),
    )


_BM25_S = 10_000  # idf fixed-point scale
_BM25_NQ = 5  # single-term queries: the NQ most frequent terms


@register(
    "search_bm25_topk",
    f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       FROM tok GROUP BY 1),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scal AS (SELECT CAST(sum(dl) AS BIGINT) AS l_total,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM dl),
qterms AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT {_BM25_NQ}),
scored AS (
    SELECT q.term, t.doc_id, t.tf, d.dl,
           CAST(((2 * s.n_docs - 2 * q.df + 1) * {_BM25_S} // (2 * q.df + 1))
                * 22 * t.tf * s.l_total
                // (10 * t.tf * s.l_total + 3 * s.l_total
                    + 9 * d.dl * s.n_docs) AS BIGINT) AS score_scaled
    FROM qterms q
    JOIN tf t ON t.term = q.term
    JOIN dl d ON d.doc_id = t.doc_id
    CROSS JOIN scal s)
SELECT term, doc_id, tf, dl, score_scaled, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY term
                   ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS rank
    FROM scored)
WHERE rank <= 5
""",
    doc=f"BM25 top-k retrieval (Robertson/Sparck-Jones) over the "
    f"inverted tf table, in EXACT integer fixed-point: the rational "
    f"Robertson idf (N-df+0.5)/(df+0.5) is cross-multiplied to "
    f"(2N-2df+1)/(2df+1) and scaled by {_BM25_S}, and the k1=1.2 "
    f"b=0.75 saturation denominator tf + k1(1-b+b*dl/avgdl) is "
    f"cleared of BOTH divisions by multiplying through by 10*L "
    f"(avgdl = L/N): score = idf_s*22*tf*L DIV "
    f"(10*tf*L + 3*L + 9*dl*N). Every engine-divergent float op is "
    f"gone — ranking AND scores hash bit-for-bit (int64-safe to "
    f"~50k docs x 3e6 tokens; beyond that, rescale {_BM25_S} or go "
    f"DECIMAL(38)). Queries = the {_BM25_NQ} highest-df terms "
    f"(deterministic spine); per-query cost is that term's posting "
    f"list + a top-k window — the 1-row (L, N) scalar and the "
    f"{_BM25_NQ}-row query spine broadcast, never the corpus.",
)
def search_bm25_topk(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    # Spread the explode (size-derived), persist the inverted tf table
    # (it feeds the df agg, the doc-length derivation AND the scoring
    # join), and derive dl FROM tf — per-doc token count == sum of its
    # term frequencies, exactly — instead of a second explode pass.
    tok = d.repartition(adaptive_partitions(d), F.col("doc_id")).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .transform(_track_persist)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scal = dl.agg(
        F.sum("dl").cast("long").alias("l_total"),
        F.count("*").cast("long").alias("n_docs"),
    )
    qterms = df.orderBy(F.desc("df"), "term").limit(_BM25_NQ)
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            F.expr(
                f"CAST(((2 * n_docs - 2 * df + 1) * {_BM25_S} "
                f"DIV (2 * df + 1)) * 22 * tf * l_total "
                f"DIV (10 * tf * l_total + 3 * l_total "
                f"+ 9 * dl * n_docs) AS BIGINT)"
            ).alias("score_scaled"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score_scaled"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


@register(
    "udf_cogrouped_asof_join",
    """
WITH p AS (SELECT user_id, event_id AS purchase_id,
                  min(CAST(epoch_us(ts) AS BIGINT)) AS purchase_ts_us
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1, 2),
s AS (SELECT user_id, event_id AS version_id,
             min(CAST(epoch_us(ts) AS BIGINT)) AS st, min(value) AS attr
      FROM events WHERE event_type = 'signup'
      GROUP BY 1, 2),
best AS (
    SELECT p.user_id, p.purchase_id, p.purchase_ts_us,
           s.version_id, s.attr,
           row_number() OVER (PARTITION BY p.user_id, p.purchase_id
                              ORDER BY s.st DESC, s.version_id DESC) AS rn
    FROM p LEFT JOIN s ON s.user_id = p.user_id
                      AND s.st <= p.purchase_ts_us)
SELECT user_id, purchase_id, purchase_ts_us,
       version_id AS signup_version, attr AS signup_attr
FROM best WHERE rn = 1
""",
    doc="cogrouped applyInPandas as-of enrichment — the remaining "
    "Pandas-UDF API surface (CoGroupedData.applyInPandas): purchases "
    "and signups are SEPARATELY grouped by user and handed to ONE "
    "Arrow-batched pandas function per key, which runs "
    "pd.merge_asof(direction='backward') inside the group — the "
    "pattern for per-key logic that needs BOTH relations at once "
    "where a join would materialize the cross product first "
    "(per-entity model state + events, bid/ask books). Ties resolve "
    "to the highest version at the max qualifying timestamp on both "
    "engines (right side sorted (ts, version) so merge_asof keeps the "
    "last). Timestamps travel as BIGINT micros: no pandas tz/ns "
    "semantics can leak into the result. Equivalent all-JVM plan: "
    "join_asof_purchase_last_signup — this entry exists to pin the "
    "cogroup API against the same exact oracle.",
)
def udf_cogrouped_asof_join(spark, sf_dir):
    import pandas as pd

    ev = load_table(spark, "events", sf_dir)
    # uuid-dedup BOTH relations first (per-column min — the A5/A7
    # survivor rule): a replayed event_id is one logical purchase /
    # signup version, not two as-of probes (r9 replay fixture find —
    # the oracle's rn=1 collapsed replays while merge_asof emitted one
    # row per raw input row).
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("event_id").alias("purchase_id"))
        .agg(F.min(F.unix_micros("ts")).alias("purchase_ts_us"))
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.col("event_id").alias("version_id"))
        .agg(
            F.min(F.unix_micros("ts")).alias("st"),
            F.min("value").alias("attr"),
        )
    )

    def merge(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if left.empty:
            return pd.DataFrame(
                columns=[
                    "user_id", "purchase_id", "purchase_ts_us",
                    "signup_version", "signup_attr",
                ]
            )
        left = left.sort_values(["purchase_ts_us", "purchase_id"])
        right = right.sort_values(["st", "version_id"])
        if right.empty:
            out = left.copy()
            out["version_id"] = pd.Series(dtype="Int64")
            out["attr"] = pd.Series(dtype="Float64")
        else:
            out = pd.merge_asof(
                left,
                right.drop(columns=["user_id"]),
                left_on="purchase_ts_us",
                right_on="st",
                direction="backward",
                allow_exact_matches=True,
            )
        out = out.rename(
            columns={"version_id": "signup_version", "attr": "signup_attr"}
        )
        out["signup_version"] = out["signup_version"].astype("Int64")
        out["signup_attr"] = out["signup_attr"].astype("Float64")
        return out[
            ["user_id", "purchase_id", "purchase_ts_us",
             "signup_version", "signup_attr"]
        ]

    return p.groupBy("user_id").cogroup(s.groupBy("user_id")).applyInPandas(
        merge,
        "user_id long, purchase_id long, purchase_ts_us long, "
        "signup_version long, signup_attr double",
    )
