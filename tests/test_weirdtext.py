"""Control-character and Unicode text corpus for the documents family —
the cross-engine STRING-SEMANTICS net (round 11).

Motivation: a live probe of Spark (Java regex / java.lang.String) vs
DuckDB (RE2 / utf8proc) found the tokenizer class itself diverging on
ASCII input: Java ``\\s`` is ``[ \\t\\n\\x0b\\f\\r]`` while RE2 ``\\s``
is ``[ \\t\\n\\f\\r]`` — NO vertical tab. Any document containing
``\\x0b`` tokenized differently on the two engines, invisibly, because
every prior corpus is plain-ASCII-with-spaces. r11 pinned every oracle
tokenizer to the explicit Java class ``[ \\t\\n\\x0b\\f\\r]+`` (the
Spark side keeps the idiomatic ``\\s+``; the class IS Java's ``\\s``),
and this corpus makes the pin load-bearing: texts here mix vertical
tabs, form feeds, CR/LF, NBSP-glued tokens, zero-width spaces, emoji,
CJK, combining marks and huge tokens through every documents-consuming
entry, exact agreement required.

Envelope (probed live, pinned in test_string_semantics_envelope): the
corpus deliberately EXCLUDES code points whose case-folding is
engine-structural — Java applies full/special Unicode mappings where
utf8proc applies simple folds (İ→i̇ vs i; straße↑→STRASSE vs STRAẞE;
ﬁ↑→FI vs ﬁ; final-sigma Σ→ς context rule), DuckDB's levenshtein counts
UTF-8 BYTES where Spark counts code points, and DuckDB's reverse works
on grapheme clusters where Spark reverses code points. Simple-fold
pairs (CAFÉ→café), identity-fold scripts (CJK, emoji, digits) and all
ASCII case-folding are INSIDE the envelope and covered below. The
envelope test asserts each structural divergence is still divergent —
an engine upgrade that silently aligns (or further splits) either side
surfaces there, not as an unexplained oracle flake.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from degen_util import assert_entry_matches
from test_degenerate_docs import _doc_entries
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

# each text is a named hazard; duplicates of the vtab row give the
# dedup/shingle families real work over the control-char tokens
_TEXTS = [
    "alpha\x0bbeta gamma delta epsilon zeta",          # vertical tab (THE fix)
    "alpha\x0bbeta gamma delta epsilon zeta",          # exact dup of ^
    "alpha beta gamma delta epsilon zeta",             # space twin (near-dup)
    "tab\tsep\x0cformfeed mixed\x0b\x0cruns",          # tab/FF/VT runs
    "cr\r\nlf lines\rcarriage only\nnewline only",     # CR LF CRLF
    "nbsp\xa0glued stays one token here",              # NBSP must NOT split
    "zero​width glued stays one token too",       # ZWSP must NOT split
    "emoji 😀 solo 😀😀 doubled 🎉 party",               # emoji tokens
    "中文 tokens 混合 with ascii 中文",                  # CJK (identity fold)
    "CAFÉ Café café naïve NAÏVE",                      # simple-fold accents
    "MIXED Case TOKENS lower UPPER MiXeD",             # ASCII case folding
    "é combining acute vs é precomposed",   # NFC/NFD both kept
    "punct!!! ??? ,,,. ### $$$ %%%",                   # non-alpha density
    "x" * 5000 + " tiny",                              # huge single token
    " \t\x0b\x0c\r\n ",                                # whitespace-only text
    "",                                                # empty text
]


def _build(d: str) -> None:
    n = len(_TEXTS)
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(_TEXTS, pa.string()),
            "lang": pa.array(
                ["en", "en", "en", "es", "es", "fr", "fr", "xx",
                 "zh", "fr", "en", "fr", "xx", "en", "en", "en"][:n],
                pa.string(),
            ),
            "source": pa.array(
                ["src%d" % (i % 3) for i in range(n)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in _TEXTS], pa.int64()),
        }
    )
    for name in TABLES:
        if name != "documents":
            shutil.copy(f"{REAL_SF}/{name}.parquet", f"{d}/{name}.parquet")
    pq.write_table(docs, f"{d}/documents.parquet")


@pytest.fixture(scope="module")
def weird_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("weirdtext")
    _build(str(d))
    return str(d)


@pytest.mark.parametrize("name", _doc_entries())
def test_docs_entry_survives_weird_text(spark, weird_dir, name):
    assert_entry_matches(spark, name, weird_dir, "control-char/unicode corpus")


def test_string_semantics_envelope(spark):
    """Machine-pinned record of the STRUCTURAL string divergences that
    define the parity envelope (module doc). Each case asserts the two
    engines still DISAGREE in the documented way; if an upgrade aligns
    them, this fails loudly and the envelope (and corpus above) can be
    widened."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [  # (value, spark_expr_fn, duckdb_sql, expect_spark, expect_duck)
        ("İstanbul", lambda c: F.lower(c), "lower(?)", "i̇stanbul", "istanbul"),
        ("straße", lambda c: F.upper(c), "upper(?)", "STRASSE", "STRAẞE"),
        ("ﬁsh", lambda c: F.upper(c), "upper(?)", "FISH", "ﬁSH"),
        ("ΣΟΦΟΣ", lambda c: F.lower(c), "lower(?)", "σοφος", "σοφοσ"),
        # levenshtein: code points (Spark) vs UTF-8 bytes (DuckDB)
        ("中文abc", lambda c: F.levenshtein(c, F.lit("abc")),
         "levenshtein(?, 'abc')", 2, 6),
        # reverse: code points (Spark) vs grapheme clusters (DuckDB)
        ("ábc", lambda c: F.reverse(c), "reverse(?)",
         "cb́a", "cbá"),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, (v, *_) in enumerate(cases)], "i int, v string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i", *[fn(F.col("v")).alias(f"c{i}")
                   for i, (_, fn, *_ ) in enumerate(cases)]
        ).collect()
    }
    for i, (v, _fn, sql, exp_s, exp_d) in enumerate(cases):
        s_val = got[i][f"c{i}"]
        d_val = duckdb.execute(f"SELECT {sql}", [v]).fetchone()[0]
        assert s_val == exp_s, f"spark {sql} on {v!r}: {s_val!r}"
        assert d_val == exp_d, f"duckdb {sql} on {v!r}: {d_val!r}"
        assert s_val != d_val  # the envelope is real
