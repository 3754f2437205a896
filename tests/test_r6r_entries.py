"""Semantic invariants for the round-6r linguistics entries."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def test_readability_counts_match_python_regex(spark):
    texts = {
        r["doc_id"]: (r["text"] or "")
        for r in t(spark, SF, "documents").collect()
    }
    rows = CATALOG["text_readability"].spark_fn(spark, SF).collect()
    assert len(rows) == len(texts)
    for r in rows:
        low = texts[r["doc_id"]].lower()
        words = max(len([w for w in re.split(r"\s+", low.strip()) if w]), 1)
        sents = max(len(re.findall(r"[.!?]+", low)), 1)
        sylls = max(len(re.findall(r"[aeiouy]+", low)), words)
        assert r["n_words"] == words, r
        assert r["n_sentences"] == sents, r
        assert r["n_syllables"] == sylls, r
        want = 206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words)
        assert abs(r["reading_ease"] - round(want, 4)) < 1e-6


def test_zipf_slope_is_negative_and_matches_ols(spark):
    from collections import Counter
    import math

    c = Counter()
    for r in t(spark, SF, "documents").collect():
        for w in re.split(r"\s+", (r["text"] or "").lower().strip()):
            if w:
                c[w] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(f) for _, f in top]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    [row] = CATALOG["zipf_fit"].spark_fn(spark, SF).collect()
    assert row["n_vocab"] == len(c)
    assert row["n_terms"] == len(top)
    assert row["zipf_slope"] < 0, "frequency must decay with rank"
    assert abs(row["zipf_slope"] - slope) < 1e-3
