"""Text-analysis operators for LLM-training-data pipelines.

North-star extension surface (BASELINE.json): language ID, quality scoring,
token counting, document fingerprinting — all pure `pyspark.sql.functions`
expressions (JVM-side, whole-stage codegen), no Python in the hot path.
Every operator is a narrow map over the documents table: zero shuffles,
embarrassingly parallel, which is exactly what a 100 TB text sweep needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round

# Minimal stopword inventories per language for the n-gram/stopword-overlap
# language heuristic. Deliberately tiny: the heuristic must be cheap enough
# to run on every document at ingest.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "los", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def _text_col(text: Column | str) -> Column:
    """Resolve + apply the engine-wide NULL policy: NULL text reads as ''
    at every tokenization/fingerprint boundary. Without it Spark and the
    DuckDB oracle diverge structurally on NULL documents (Spark keeps a
    NULL-array row where DuckDB's unnest(NULL) drops the doc) — see
    tests/test_degenerate_docs.py."""
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(c, F.lit(""))


def tokens(text: Column | str) -> Column:
    """Whitespace tokenizer (lowercased)."""
    return F.split(F.lower(F.trim(_text_col(text))), "\\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count word-piece-like units — runs of
    letters, runs of digits, or single non-space symbols. A deterministic
    stand-in for a real tokenizer's token count (~GPT-style regex)."""
    pieces = F.regexp_extract_all(
        _text_col(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces).cast("long")


def stopword_hits(text: Column | str, lang: str) -> Column:
    """How many distinct stopwords of ``lang`` appear in the text."""
    toks = F.array_distinct(tokens(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, sw)).cast("long")


def lang_id(text: Column | str) -> Column:
    """Stopword-overlap language guess: argmax over per-language distinct
    stopword hits, 'und' (undetermined) when nothing matches. Ties break by
    language code order — deterministic, oracle-matchable."""
    scores = [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # fold right-to-left so earlier languages win ties
    for lang, score in reversed(scores):
        guess = F.when(score == best_score, F.lit(lang)).otherwise(guess)
    return F.when(best_score == 0, F.lit("und")).otherwise(guess)


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs, real
    word structure, and low symbol noise (the usual pretraining filters).

    score = 0.4·len_score + 0.3·alpha_ratio + 0.3·(1 - repetition)
    where len_score saturates at 200 tokens, alpha_ratio is the fraction
    of alphabetic chars, and repetition is 1 - unique/total tokens.
    """
    c = _text_col(text)
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    len_score = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    n_chars = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * len_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * uniq_ratio
    )
    return ieee_round(score, 4)


def char_shingles(text: Column | str, n: int = 8) -> Column:
    """Distinct character n-grams of the normalized text (fingerprinting
    unit for winnowing-style near-dup detection)."""
    norm = F.regexp_replace(F.lower(F.trim(_text_col(text))), "\\s+", " ")
    starts = F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(starts, lambda i: norm.substr(i, F.lit(n))))


def doc_fingerprint_rolling(text: Column | str, n: int = 8) -> Column:
    """Winnowing-lite fingerprint: min xxhash64 over character n-grams.
    Two docs sharing the fingerprint almost certainly share an n-gram run —
    the standard near-dup pre-filter at corpus scale."""
    sh = char_shingles(text, n)
    return F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
