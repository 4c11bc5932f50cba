"""Corpus-curation query family over `documents` (north-star LLM
training-data extensions beyond the reference's surface): benchmark
contamination, Gopher-style repetition filters, TF-salience term
extraction, and sub-document chunk dedup.

Every entry carries an exact DuckDB oracle — scores avoid ln()
(within-1-ulp, engine-dependent) in favor of single IEEE-exact
divisions, so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.operators.curation import (
    chunk_dedup_stats,
    contamination_vs_benchmark,
    repetition_stats,
    tf_salient_terms,
)
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

_SHINGLES = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
    FROM tok)
"""


@register(
    "doc_contamination_check",
    _SHINGLES
    + """
, bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0),
train AS (SELECT * FROM sh WHERE doc_id % 13 <> 0),
j AS (
    SELECT t.doc_id, CASE WHEN b.shingle IS NOT NULL THEN 1 END AS hit
    FROM train t LEFT JOIN bench b USING (shingle))
SELECT doc_id, count(*) AS n_shingles, count(hit) AS n_contaminated,
       CAST(count(hit) AS DOUBLE) / count(*) AS contamination,
       CAST(count(hit) AS DOUBLE) / count(*) >= 0.5 AS is_contaminated
FROM j GROUP BY doc_id
""",
    doc="benchmark contamination: fraction of each training doc's "
    "distinct 3-gram shingles that occur in the benchmark slice "
    "(doc_id % 13 == 0 stands in for an eval set); benchmark shingle "
    "set is broadcast — the corpus never shuffles on shingle",
)
def doc_contamination_check(spark, sf_dir):
    return contamination_vs_benchmark(load_table(spark, "documents", sf_dir))


@register(
    "doc_repetition_stats",
    """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
base AS (
    SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w)
               AS dup_word_frac,
           unnest(list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i+1])) AS gram
    FROM tok),
counts AS (
    SELECT doc_id, n_words, dup_word_frac, gram, count(*) AS gram_n
    FROM base GROUP BY 1, 2, 3, 4)
SELECT doc_id, n_words, dup_word_frac, gram AS top_2gram,
       gram_n AS top_2gram_n,
       CAST(gram_n AS DOUBLE) / (n_words - 1) AS top_2gram_frac,
       CAST(gram_n AS DOUBLE) / (n_words - 1) > 0.1 AS is_repetitive
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY gram_n DESC, gram) AS rn
      FROM counts)
WHERE rn = 1
""",
    doc="Gopher-style repetition filters (Rae et al. 2021): duplicate-"
    "word fraction + most-frequent-2-gram coverage per doc; gram "
    "construction is codegen, shuffles only on (doc, gram) and doc",
)
def doc_repetition_stats(spark, sf_dir):
    return repetition_stats(load_table(spark, "documents", sf_dir))


@register(
    "doc_salient_terms",
    """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, score, rank FROM (
    SELECT t.doc_id, t.term, t.tf, d.df,
           CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS score,
           CAST(row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf * n.n_docs AS DOUBLE) / d.df DESC,
                        t.term) AS BIGINT) AS rank
    FROM tf t JOIN df d USING (term) CROSS JOIN n)
WHERE rank <= 5
""",
    doc="top-5 salient terms per doc by tf * N / df (linear-idf TF-IDF "
    "— integer products + one IEEE-exact division keep the ranking "
    "engine-portable where ln() would not be)",
)
def doc_salient_terms(spark, sf_dir):
    return tf_salient_terms(load_table(spark, "documents", sf_dir))


@register(
    "doc_chunk_dedup",
    """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ch AS (SELECT doc_id, w,
              unnest(generate_series(
                  0, CAST(ceil(len(w) / 8.0) AS BIGINT) - 1)) AS chunk_idx
       FROM tok),
chunks AS (
    SELECT doc_id, chunk_idx,
           array_to_string(w[chunk_idx * 8 + 1 : chunk_idx * 8 + 8], ' ')
               AS chunk
    FROM ch),
kept AS (
    SELECT doc_id, chunk_idx,
           row_number() OVER (PARTITION BY chunk
                              ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks)
SELECT doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
           AS kept_frac
FROM kept GROUP BY doc_id
""",
    doc="sub-document dedup (CCNet/RefinedWeb line-level dedup applied "
    "to fixed 8-word chunks): corpus-wide canonical = (lowest doc_id, "
    "lowest chunk_idx); chunking via slice() is codegen — shuffles "
    "only on chunk and doc",
)
def doc_chunk_dedup(spark, sf_dir):
    return chunk_dedup_stats(load_table(spark, "documents", sf_dir))


@register(
    "doc_stratified_sample",
    """
WITH h AS (
    SELECT doc_id, lang, source,
           ((CAST(position(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                 IN '0123456789abcdef') AS BIGINT) - 1) * 16
            + (CAST(position(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)
                 IN '0123456789abcdef') AS BIGINT) - 1)) AS bucket256,
           CASE WHEN lang = 'en' THEN 10 ELSE 30 END AS rate_pct
    FROM documents
)
SELECT doc_id, lang, source, bucket256, CAST(rate_pct AS BIGINT) AS rate_pct
FROM h WHERE bucket256 * 100 < rate_pct * 256
""",
    doc="stratified downsampling by language: md5(doc_id)-bucketed, "
    "per-stratum rates (majority 'en' at 10%, tail langs at 30%) — "
    "deterministic across engines/retries (never rand()), rebalances "
    "the language mix the way a training-data pipeline upweights "
    "low-resource strata. The bucket is the first two md5 hex DIGITS "
    "parsed to a uniform 0..255 value (the ascii(hex char) idiom this "
    "replaced skewed the realized rates — r5 review finding) and the "
    "rate test is integer cross-multiplication, exact on both engines.",
)
def doc_stratified_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    d = load_table(spark, "documents", sf_dir)
    m = F.md5(F.col("doc_id").cast("string").cast("binary"))
    hexd = "0123456789abcdef"

    def v(i):
        return F.position(F.substring(m, i, 1), F.lit(hexd)).cast("long") - 1

    bucket256 = v(1) * 16 + v(2)
    rate = F.when(F.col("lang") == "en", 10).otherwise(30).cast("long")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            bucket256.alias("bucket256"),
            rate.alias("rate_pct"),
        )
        .filter(F.col("bucket256") * 100 < F.col("rate_pct") * 256)
    )


_PII = {
    "email": r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
_PII_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII["email"]}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{_PII["phone"]}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '{_PII["ssn"]}')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(text, '{_PII["ipv4"]}')) AS BIGINT) AS n_ipv4,
       len(regexp_extract_all(text, '{_PII["email"]}'))
         + len(regexp_extract_all(text, '{_PII["phone"]}'))
         + len(regexp_extract_all(text, '{_PII["ssn"]}'))
         + len(regexp_extract_all(text, '{_PII["ipv4"]}')) > 0 AS has_pii,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII["email"]}', '[EMAIL]', 'g'),
           '{_PII["phone"]}', '[PHONE]', 'g'),
           '{_PII["ssn"]}', '[SSN]', 'g'),
           '{_PII["ipv4"]}', '[IPV4]', 'g') AS redacted
FROM documents
"""


@register(
    "doc_pii_scan",
    _PII_ORACLE,
    doc="PII detection + redaction, the filter every public-corpus "
    "training pipeline runs before anything else: per-document match "
    "counts for email/phone/SSN/IPv4 plus the redacted text. Pure "
    "codegen projections (regexp_extract_all + regexp_replace, "
    "patterns limited to the Java-regex/RE2 common subset) — a "
    "single-pass zero-shuffle scan at any scale. The synthetic corpus "
    "contains no PII (all counts 0, redacted == text — still "
    "value-hash-checked); positive matches and redaction order are "
    "pinned by tests/test_llm_operators.py on crafted rows.",
)
def doc_pii_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from feature_store_2_spark.operators.text import pii_count, pii_redact

    d = load_table(spark, "documents", sf_dir)
    counts = {k: pii_count("text", k) for k in ("email", "phone", "ssn", "ipv4")}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return d.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ssn"].alias("n_ssn"),
        counts["ipv4"].alias("n_ipv4"),
        (total > 0).alias("has_pii"),
        pii_redact("text").alias("redacted"),
    )


_BIGRAM_CTE = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 1, 0)),
               i -> w[i] || ' ' || w[i+1]))) AS bigram
    FROM tok),
df AS (SELECT bigram, count(*) AS df FROM bg GROUP BY bigram)
"""


@register(
    "doc_bigram_novelty",
    _BIGRAM_CTE
    + """
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS novelty
FROM bg JOIN df ON bg.bigram = df.bigram
GROUP BY bg.doc_id
""",
    doc="bigram novelty score — the integer-exact stand-in for an LM "
    "perplexity filter: the fraction of a document's distinct bigrams "
    "that occur in NO other document. Low novelty flags boilerplate/"
    "template text that repeats corpus-common phrasing; high novelty "
    "flags gibberish — both tails are curation cut candidates "
    "(KenLM-style filters draw the same two-sided cut on perplexity). "
    "All counts are integers and the score is one IEEE division, so "
    "the oracle hashes exactly where a log-prob would drift. Shape: "
    "explode to distinct (doc, bigram), bigram-df hash agg, join back "
    "on bigram (vocabulary-keyed, AQE-chosen strategy — never a "
    "forced broadcast), per-doc agg: two shuffles plus the join at "
    "any scale.",
)
def doc_bigram_novelty(spark, sf_dir):
    from pyspark.sql import functions as F

    from feature_store_2_spark.operators.text import tokens

    d = load_table(spark, "documents", sf_dir)
    toks = tokens("text")
    # when-guard, not greatest(): Spark's sequence(1, 0) DESCENDS
    # ([1, 0] -> element_at(toks, 2) OOB under ANSI for 1-token docs)
    # where DuckDB's generate_series(1, 0) is empty; NULL grams drop
    # the doc at explode, matching the oracle.
    grams = F.when(
        F.size(toks) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            )
        ),
    )
    bg = d.select("doc_id", F.explode(grams).alias("bigram"))
    df_ = bg.groupBy("bigram").agg(F.count("*").alias("df"))
    novel = (F.col("df") == 1).cast("long")
    return (
        bg.join(df_, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel).cast("double") / F.count("*")).alias("novelty"),
        )
    )


_GOPHER_ORACLE = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
wn AS (SELECT doc_id, word FROM w WHERE word <> ''),
tf AS (SELECT doc_id, word, count(*) AS c FROM wn GROUP BY 1, 2),
per AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           CAST(sum(length(word) * c) AS BIGINT) AS tot_chars,
           CAST(max(c) AS BIGINT) AS max_tf,
           CAST(COALESCE(sum(CASE WHEN word IN
               ('the', 'and', 'of', 'to', 'in', 'a', 'is')
               THEN c END), 0) AS BIGINT) AS n_stop,
           CAST(COALESCE(sum(CASE WHEN regexp_full_match(word, '[a-z]+')
               THEN c END), 0) AS BIGINT) AS n_alpha
    FROM tf GROUP BY doc_id),
base AS (
    SELECT d.doc_id,
           COALESCE(n_words, 0) AS n_words,
           COALESCE(tot_chars, 0) AS tot_chars,
           COALESCE(max_tf, 0) AS max_tf,
           COALESCE(n_stop, 0) AS n_stop,
           COALESCE(n_alpha, 0) AS n_alpha
    FROM documents d LEFT JOIN per USING (doc_id)),
flags AS (
    SELECT *,
           n_words BETWEEN 50 AND 100000 AS wc_ok,
           3 * n_words <= tot_chars AND tot_chars <= 10 * n_words
               AS mean_len_ok,
           5 * max_tf < n_words AS rep_ok,
           n_stop >= 2 AS stop_ok,
           5 * n_alpha >= 4 * n_words AS alpha_ok
    FROM base)
SELECT *,
       wc_ok AND mean_len_ok AND rep_ok AND stop_ok AND alpha_ok AS keep
FROM flags
"""


@register(
    "doc_gopher_quality_flags",
    _GOPHER_ORACLE,
    doc="Gopher rule battery (Rae et al. 2021 A1.1, the MassiveText "
    "filters; same family Dolma/RefinedWeb use): word-count bounds, "
    "mean-word-length bounds, most-common-word coverage, stopword "
    "presence, alphabetic-word fraction, and the AND-of-all keep "
    "flag. Every published ratio threshold is cross-multiplied into "
    "an integer comparison so no division exists anywhere — Spark "
    "and DuckDB agree exactly on every row. Line-shape rules "
    "(bullets/ellipses) are omitted: single-line synthetic corpus. "
    "Scale shape: explode -> (doc,word) tf -> per-doc agg, both "
    "shuffles on doc_id with map-side combine; left join keeps "
    "zero-word docs.",
)
def doc_gopher_quality_flags(spark, sf_dir):
    from feature_store_2_spark.operators.curation import gopher_quality_flags

    return gopher_quality_flags(load_table(spark, "documents", sf_dir))


def _source_overlap_oracle() -> str:
    from feature_store_2_spark.queries.llm_text import _minhash_oracle

    return f"""
WITH pairs AS ({_minhash_oracle()}),
lab AS (SELECT doc_id, source FROM documents)
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_dup_pairs,
       CAST(count(DISTINCT CASE WHEN a.source <= b.source
                                THEN p.doc1 ELSE p.doc2 END) AS BIGINT)
           AS n_docs_a,
       CAST(count(DISTINCT CASE WHEN a.source <= b.source
                                THEN p.doc2 ELSE p.doc1 END) AS BIGINT)
           AS n_docs_b
FROM pairs p
JOIN lab a ON p.doc1 = a.doc_id
JOIN lab b ON p.doc2 = b.doc_id
GROUP BY 1, 2
"""


@register(
    "dedup_source_overlap_matrix",
    _source_overlap_oracle(),
    doc="Cross-source duplication matrix — which sources copy from "
    "which: MinHash-LSH candidate near-dup pairs (the "
    "dedup_minhash_lsh band join, never all-pairs) labeled with each "
    "side's `source` and aggregated to an unordered source-pair "
    "matrix with pair counts and per-side distinct-doc counts. The "
    "C4/Dolma-style curation forensic that decides which source to "
    "drop when two feeds mirror each other. Unordered normalization "
    "via least/greatest on the source label keeps (A,B) and (B,A) "
    "in one cell deterministically; the within-pair doc attribution "
    "follows the same orientation so counts are engine-independent. "
    "Scale shape: band equi-join candidates + two broadcastable "
    "doc->source lookups + one tiny matrix agg.",
)
def dedup_source_overlap_matrix(spark, sf_dir):
    from feature_store_2_spark.operators.dedup import minhash_lsh_candidate_pairs

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_lsh_candidate_pairs(docs).select("doc1", "doc2")
    lab = docs.select("doc_id", "source")
    both = (
        pairs.join(
            lab.select(F.col("doc_id").alias("doc1"), F.col("source").alias("sa")),
            "doc1",
        )
        .join(
            lab.select(F.col("doc_id").alias("doc2"), F.col("source").alias("sb")),
            "doc2",
        )
    )
    oriented = both.select(
        F.least("sa", "sb").alias("source_a"),
        F.greatest("sa", "sb").alias("source_b"),
        F.when(F.col("sa") <= F.col("sb"), F.col("doc1"))
        .otherwise(F.col("doc2"))
        .alias("da"),
        F.when(F.col("sa") <= F.col("sb"), F.col("doc2"))
        .otherwise(F.col("doc1"))
        .alias("db"),
    )
    return oriented.groupBy("source_a", "source_b").agg(
        F.count("*").alias("n_dup_pairs"),
        F.countDistinct("da").alias("n_docs_a"),
        F.countDistinct("db").alias("n_docs_b"),
    )


# Eight deterministic wire shapes for the synthetic URL column (driven
# by doc_id % 8) — uppercase scheme/host, ports, userinfo, query,
# fragment, mobile/www prefixes, protocol-relative, bare host — the
# mess a real crawl manifest carries. Built identically in both
# engines so the CANONICALIZATION (not the synthesis) is what the
# oracle checks.
_URL_BLOCKLIST = ("src0.example.com", "src13.example.com")


def _url_sql(dialect: str) -> str:
    """One CASE expression rendering the synthetic url; identical text
    works in Spark SQL and DuckDB (both support || and CASE)."""
    d = "CAST(doc_id AS VARCHAR)" if dialect == "duck" else "CAST(doc_id AS STRING)"
    up = "upper(source)"
    return f"""CASE doc_id % 8
  WHEN 0 THEN 'https://www.' || source || '.example.com/p/' || {d}
  WHEN 1 THEN 'HTTP://' || {up} || '.Example.COM/p/' || {d} || '/'
  WHEN 2 THEN 'https://' || source || '.example.com:443/p/' || {d} || '?utm_source=feed&ref=x'
  WHEN 3 THEN 'http://' || source || '.example.com:80/p/' || {d} || '#frag'
  WHEN 4 THEN 'https://m.' || source || '.example.com/p/' || {d}
  WHEN 5 THEN '//' || source || '.example.com/p/' || {d}
  WHEN 6 THEN 'https://user:pw@' || source || '.example.com/p/' || {d}
  ELSE source || '.example.com/p/' || {d} || '/index.html'
END"""


@register(
    "doc_url_canonicalize_blocklist",
    f"""
WITH u AS (SELECT doc_id, lower({_url_sql('duck')}) AS url FROM documents),
s AS (SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(url,
                 '^[a-z][a-z0-9+.-]*://', ''), '^//', ''),
                 '^[^/@]*@', '') AS hp
      FROM u),
hostpath AS (
    SELECT doc_id, url,
           regexp_replace(regexp_replace(
               regexp_extract(hp, '^([^/?#]*)', 1),
               ':[0-9]+$', ''), '^(www|m)\\.', '') AS host,
           regexp_replace(regexp_replace(
               regexp_extract(hp, '^[^/?#]*([^?#]*)', 1),
               '/index\\.html$', ''), '/+$', '') AS path
    FROM s)
SELECT doc_id, url, host, host || path AS canonical_url,
       host IN {repr(_URL_BLOCKLIST)} AS blocked
FROM hostpath
""",
    doc="URL/domain canonicalization + blocklist filter — the curation "
    "front door every crawl pipeline runs before dedup (otherwise "
    "http/https, www., ports, utm params and fragments make the same "
    "page look like eight pages). The url is synthesized "
    "deterministically from (source, doc_id) in BOTH engines (the "
    "corpus carries no url column), then canonicalized: lowercase, "
    "strip scheme / protocol-relative prefix / userinfo, strip port, "
    "strip www./m. subdomain, drop query+fragment, drop /index.html "
    "and trailing slashes; blocked = host on the blocklist (broadcast "
    "at scale — a blocklist is always small). Every regex is ANCHORED "
    "so it matches at most once — the portable subset, since Spark's "
    "regexp_replace is replace-ALL while DuckDB's default is "
    "replace-first. Zero shuffle: one narrow projection pass.",
)
def doc_url_canonicalize_blocklist(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    url = F.lower(F.expr(_url_sql("spark")))
    hp = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://", ""), r"^//", ""
        ),
        r"^[^/@]*@",
        "",
    )
    host = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(hp, r"^([^/?#]*)", 1), r":[0-9]+$", ""),
        r"^(www|m)\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(hp, r"^[^/?#]*([^?#]*)", 1), r"/index\.html$", ""
        ),
        r"/+$",
        "",
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        host.alias("host"),
        F.concat(host, path).alias("canonical_url"),
        host.isin(*_URL_BLOCKLIST).alias("blocked"),
    )
