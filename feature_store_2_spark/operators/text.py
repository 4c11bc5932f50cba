"""Text-analysis operators for training-data pipelines (north-star
extension): stats, token counting, quality scoring, language-ID
heuristic, normalization fingerprints.

All pure Column expressions (codegen'd, no UDFs) so they run at full
scan speed — on 100 TB of documents these are single-pass projections
with pushdown-friendly shapes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens = whitespace split; BPE-ish pieces = letter runs / digit runs /
# single other chars (a deterministic stand-in for a real tokenizer).
TOKEN_REGEX = "[a-z]+|[A-Z]+|[0-9]+"

# Tiny per-language marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "fr": ("le", "la", "les"),
    "es": ("el", "los", "una"),
}


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def n_words(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def n_distinct_words(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(text, F.lit(TOKEN_REGEX)).cast("long")


def avg_word_len(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double") / n_words(
        text
    )


def marker_hits(text: Column | str, markers: tuple[str, ...]) -> Column:
    """How many tokens are language-marker words (exact token match)."""
    toks = tokens(text)
    return F.size(
        F.filter(toks, lambda t: t.isin(*markers))
    ).cast("long")


def lang_guess(text: Column | str) -> Column:
    """Argmax over marker-hit counts, 'und' when nothing matches.
    Deterministic tie-break: lexicographic language order."""
    hits = {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    top = F.greatest(*hits.values())
    best = None
    for lang in sorted(hits):  # first match wins => lexicographic ties
        best = (
            F.when(hits[lang] == top, lang)
            if best is None
            else best.when(hits[lang] == top, lang)
        )
    return F.when(top == 0, "und").otherwise(best)


def quality_score(text: Column | str) -> Column:
    """Lexical-diversity x length-window score in [0,1]-ish: single
    divisions only, so cross-engine deterministic."""
    text = F.col(text) if isinstance(text, str) else text
    diversity = n_distinct_words(text).cast("double") / n_words(text)
    in_window = (F.length(text) >= 100) & (F.length(text) <= 500)
    return F.when(in_window, diversity).otherwise(diversity / 2)


def normalized_fingerprint(text: Column | str) -> Column:
    """md5 of whitespace-collapsed lowercase text — the canonical exact-
    dedup key after normalization."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(
        F.regexp_replace(F.lower(text), "\\s+", " ").cast("binary")
    )


# --- PII detection / redaction ------------------------------------------
#
# Quantifiers are BOUNDED (RFC 5321: local part <= 64, domain <= 255,
# TLD <= 24) — not just for correctness: an UNBOUNDED greedy class with
# a required char after it ([A-Za-z0-9._%+-]+@) is O(len^2) in Java's
# backtracking regex on text that feeds the class but never yields the
# required char (a 1M-char single-token doc pegged one core for an
# HOUR — fixture class 11b find, r11; DuckDB's RE2 is linear and never
# showed it). Bounding the repeat caps the per-position backtrack at
# the bound, restoring O(bound * len). A local part longer than 64
# matches only its trailing 64 chars (leftmost-first in BOTH engines),
# which is the RFC-invalid edge and pinned in tests.
# Patterns restricted to the Java-regex / RE2 common subset (no
# lookaround, no backrefs) so Spark's regexp_* and DuckDB's regexp_*
# compile them identically — the cross-engine determinism requirement
# for the oracle gate. Ordered dict: redaction applies in this order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern — a pure codegen projection
    (regexp_extract_all + size), zero shuffles at any scale."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0))
    ).cast("long")


def pii_redact(text: Column | str) -> Column:
    """Text with every PII_PATTERNS match replaced by [KIND] — applied
    in dict order (email first so phone/ssn digit runs inside addresses
    are already gone; order is part of the operator contract and the
    oracle mirrors it)."""
    out = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out
