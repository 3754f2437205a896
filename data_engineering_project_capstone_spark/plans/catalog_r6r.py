"""Round-6r catalog entries — corpus linguistics metrics:

- ``text_readability``: Flesch-reading-ease-style score per document
  from sentence, word, and syllable-proxy counts — all pure codegen
  expressions. Syllable proxy = vowel-GROUP count, computed with the
  replace-length trick (replace each ``[aeiouy]+`` run with one
  marker; groups = len(marked) − len(stripped)) — exact integers on
  both engines, no split-semantics edge cases.
- ``zipf_fit``: Zipf exponent of the token frequency distribution —
  OLS slope of log(freq) on log(rank) over the top-100 terms (both
  engines' native ``regr_slope`` over identical (rank, freq) integer
  pairs; the established regr_* parity family).

Scale shape: readability is a narrow map (cost = the scan); zipf is
one token-count shuffle, a top-100 TakeOrdered, and a 100-row
regression."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog_r5 import _SQL_TOKS, _toks


def _group_count(col, pattern: str):
    """Number of non-overlapping ``pattern`` runs in col: replace each
    run with one marker char, count = len(marked) − len(stripped)."""
    marked = F.length(F.regexp_replace(col, pattern, "#"))
    stripped = F.length(F.regexp_replace(col, pattern, ""))
    return marked - stripped


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Flesch-style reading ease:
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    sentences = [.!?]+ run count (min 1), words = non-whitespace run
    count (min 1; the same replace-length trick — no tokenizer-in-HOF,
    which the plan-hygiene sweep rejects as the documented re-evaluate-
    per-element hazard), syllables = vowel-group runs (min words).
    Clamps keep empty/degenerate docs finite instead of ANSI-throwing
    on 0/0."""
    docs = t(spark, sf_dir, "documents")
    low = F.lower(F.coalesce(F.col("text"), F.lit("")))
    sentences = F.greatest(_group_count(low, r"[.!?]+"), F.lit(1))
    words = F.greatest(_group_count(low, r"\S+"), F.lit(1))
    syllables = F.greatest(_group_count(low, r"[aeiouy]+"), words)
    score = (
        F.lit(206.835)
        - 1.015 * (words.cast("double") / sentences)
        - 84.6 * (syllables.cast("double") / words)
    )
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        ieee_round(score, 4).alias("reading_ease"),
    ).orderBy("doc_id")


def _sql_groups(col: str, pattern: str) -> str:
    return (
        f"(length(regexp_replace({col}, '{pattern}', '#', 'g'))"
        f" - length(regexp_replace({col}, '{pattern}', '', 'g')))"
    )


# Java \S == [^ \t\n\x0b\f\r]; RE2 \S lacks the VT — pin explicitly
_SQL_WORD_GROUPS = _sql_groups("low", r"[^ \t\n\x0b\f\r]+")


TEXT_READABILITY_SQL = f"""
WITH base AS (
    SELECT doc_id, lower(coalesce(text, '')) AS low FROM documents
),
worded AS (
    SELECT doc_id, low,
           greatest({_SQL_WORD_GROUPS}, 1) AS words
    FROM base
),
counted AS (
    SELECT doc_id, words,
           greatest({_sql_groups("low", "[.!?]+")}, 1) AS sentences,
           greatest({_sql_groups("low", "[aeiouy]+")}, words) AS syllables
    FROM worded
)
SELECT doc_id,
       CAST(words AS BIGINT) AS n_words,
       CAST(sentences AS BIGINT) AS n_sentences,
       CAST(syllables AS BIGINT) AS n_syllables,
       {sql_ieee_round(
           "206.835 - 1.015 * (words * 1.0 / sentences)"
           " - 84.6 * (syllables * 1.0 / words)", 4)} AS reading_ease
FROM counted
ORDER BY doc_id
"""


_ZIPF_TOP = 100


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Zipf diagnostic: vocab size, and the OLS slope/intercept
    of ln(freq) ~ ln(rank) over the top-100 terms (a Zipfian corpus
    slopes ≈ −1). Ranks break frequency ties by token so both engines
    regress the identical 100 points."""
    tk = (
        t(spark, sf_dir, "documents")
        .select(F.explode(_toks()).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    vocab = tk.agg(F.count("*").alias("n_vocab"))
    top = (
        tk.orderBy(F.desc("freq"), "tok")
        .limit(_ZIPF_TOP)
        .select(
            "freq",
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), "tok"))
            .alias("rank"),
        )
    )
    fit = top.agg(
        F.expr("regr_slope(ln(freq), ln(rank))").alias("slope"),
        F.expr("regr_intercept(ln(freq), ln(rank))").alias("icept"),
        F.count("*").alias("n_terms"),
    )
    return (
        fit.crossJoin(F.broadcast(vocab))
        .select(
            F.col("n_vocab").cast("long").alias("n_vocab"),
            F.col("n_terms").cast("long").alias("n_terms"),
            ieee_round(F.col("slope"), 4).alias("zipf_slope"),
            ieee_round(F.col("icept"), 4).alias("zipf_intercept"),
        )
    )


ZIPF_FIT_SQL = f"""
WITH tk AS (
    SELECT tok, count(*) AS freq
    FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
),
vocab AS (SELECT count(*) AS n_vocab FROM tk),
top AS (
    SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
    FROM tk
    ORDER BY freq DESC, tok
    LIMIT {_ZIPF_TOP}
),
fit AS (
    -- global aggregate: exactly ONE row even when top is empty (an
    -- empty/all-NULL corpus), matching the Spark side's top.agg();
    -- the previous FROM top, vocab GROUP BY form emitted zero rows
    -- there (empty/all-NULL degenerate net)
    SELECT regr_slope(ln(freq), ln(rank)) AS slope,
           regr_intercept(ln(freq), ln(rank)) AS icept,
           count(*) AS n_terms
    FROM top
)
SELECT CAST(n_vocab AS BIGINT) AS n_vocab,
       CAST(n_terms AS BIGINT) AS n_terms,
       {sql_ieee_round("slope", 4)} AS zipf_slope,
       {sql_ieee_round("icept", 4)} AS zipf_intercept
FROM fit, vocab
"""


R6R_ENTRIES: dict[str, Entry] = {
    "text_readability": Entry(text_readability, TEXT_READABILITY_SQL),
    "zipf_fit": Entry(zipf_fit, ZIPF_FIT_SQL),
}
