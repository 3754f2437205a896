"""Seeded random-corpus fuzz for the documents family — the third net
in the recipe that caught 13 real divergences on orders/lineitem and
events in round 8, pointed at the text/corpus consumers (dedup, shingle
and n-gram pipelines, BM25/TF-IDF/PMI, packing, quality gates), whose
hazard surface is TEXT SHAPE: duplicate and near-duplicate bodies,
shared shingles placed where nobody looked, empty/whitespace/one-token
strings, double spaces through whitespace tokenizers, NULL text and
NULL grouping keys through three-valued logic.

The hand-built degenerate-docs corpus places ten pathological rows one
hazard at a time; this net samples 150 documents from a 24-template
pool over an 8-word vocabulary, so exact duplicates, one-word-edit
near-duplicates and cross-template shared 5-grams occur by the dozen
per seed, in combinations no author placed. Entry list is IMPORTED
from the degenerate net (every catalog entry whose plan or oracle
touches ``documents``) so the two sweeps can never drift apart.
Seeds are FIXED — a failure reproduces exactly.
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from degen_util import assert_entry_matches
from test_degenerate_docs import _doc_entries
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

# tiny vocabulary: every 5-gram shingle domain is small enough that
# distinct templates share shingles by accident — the collision-heavy
# regime MinHash/Jaccard blocking and span profiling must survive
_VOCAB = ["the", "fast", "key", "order", "sort", "merge", "scan", "dup"]
_LANGS = ["en", "en", "es", "fr", "xx", "", None]
_SOURCES = ["src0", "src0", "src1", "src2", "", None]


def _pick(rng: np.random.RandomState, pool, n):
    return [pool[i] for i in rng.randint(0, len(pool), n)]


def _template_pool(rng: np.random.RandomState) -> list[str | None]:
    """24 template texts: random word sequences (lengths 5-40), plus the
    degenerate specials. Doubled spaces are injected into a few random
    templates (whitespace-tokenizer edge: empty tokens)."""
    pool: list[str | None] = []
    for _ in range(16):
        n_words = int(rng.randint(5, 41))
        words = _pick(rng, _VOCAB, n_words)
        text = " ".join(words)
        if rng.rand() < 0.25:
            # a double space at a random word boundary
            cut = int(rng.randint(1, n_words))
            text = " ".join(words[:cut]) + "  " + " ".join(words[cut:])
        pool.append(text)
    # one-word-edit near-duplicates of the first four templates: share
    # every shingle except around the edit point
    for i in range(4):
        words = pool[i].split(" ")
        j = int(rng.randint(0, len(words)))
        words[j] = _VOCAB[int(rng.randint(0, len(_VOCAB)))]
        pool.append(" ".join(words))
    # degenerate specials, present in every seed
    pool.extend(["", "   ", "solo", None])
    return pool


def _build_corpus(seed: int, d: str) -> None:
    rng = np.random.RandomState(seed)
    n = 150
    pool = _template_pool(rng)
    # sample texts from the pool: ~6 copies of each template on average,
    # so exact duplicates dominate and every dedup family has real work
    texts = [pool[i] for i in rng.randint(0, len(pool), n)]
    docs = pa.table(
        {
            # unique-or-NULL doc ids (PK contract, as in the other nets)
            "doc_id": pa.array(
                [
                    None if rng.rand() < 0.05 else int(k)
                    for k in rng.permutation(n)
                ],
                pa.int64(),
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(_pick(rng, _LANGS, n), pa.string()),
            "source": pa.array(_pick(rng, _SOURCES, n), pa.string()),
            # n_chars consistent with text, NULL-ed at random (and NULL
            # whenever text is NULL) — length-derived stats must treat
            # a NULL length identically on both engines
            "n_chars": pa.array(
                [
                    None if t is None or rng.rand() < 0.05 else len(t)
                    for t in texts
                ],
                pa.int64(),
            ),
        }
    )
    for name in TABLES:
        if name != "documents":
            shutil.copy(f"{REAL_SF}/{name}.parquet", f"{d}/{name}.parquet")
    pq.write_table(docs, f"{d}/documents.parquet")


@pytest.fixture(scope="module", params=[23, 3301])
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzz_docs_{request.param}")
    _build_corpus(request.param, str(d))
    return str(d)


@pytest.mark.parametrize("name", _doc_entries())
def test_docs_entry_survives_random_corpus(spark, fuzz_dir, name):
    assert_entry_matches(spark, name, fuzz_dir, "random docs corpus")
