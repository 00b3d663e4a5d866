"""Benchmark decontamination (kgforge/decontam.py) vs a pure-Python
oracle, plus distribution-invariance and edge cases."""

from __future__ import annotations

import random
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgforge.decontam import (
    _tokenize,
    benchmark_ngram_hashes,
    contamination_counts,
    decontaminate,
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega red blue green "
    "cloud river stone market north south harbor winter summer".split()
)


def _mk_doc(rng: random.Random, n_tok: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_tok))


def _oracle_counts(texts, bench_texts, n):
    """Independent loop-based reference: count window occurrences whose
    normalized n-gram appears anywhere in the benchmark."""
    def grams(text):
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    bench = {g for b in bench_texts for g in grams(b)}
    return [sum(1 for g in grams(t) if g in bench) for t in texts]


@pytest.fixture(scope="module")
def corpus_and_bench():
    rng = random.Random(7)
    bench_texts = [_mk_doc(rng, 40) for _ in range(5)]
    docs = []
    for i in range(120):
        body = _mk_doc(rng, rng.randint(3, 60))
        if i % 10 == 0:
            # plant a verbatim benchmark span mid-doc (the contamination case)
            src = rng.choice(bench_texts).split()
            k = rng.randrange(0, len(src) - 13)
            span = " ".join(src[k : k + 13])
            body = f"{body} {span} {_mk_doc(rng, 5)}"
        docs.append({"doc_id": i, "text": body})
    return docs, bench_texts


def test_counts_match_pure_python_oracle(ray_session, corpus_and_bench):
    docs, bench_texts = corpus_and_bench
    ds = rd.from_items(docs)
    out = (
        contamination_counts(ds, bench_texts, n=13)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    expect = _oracle_counts([d["text"] for d in docs], bench_texts, 13)
    assert out["contaminated_ngrams"].tolist() == expect
    # the planted docs ARE detected and clean docs stay clean
    assert all(expect[i] > 0 for i in range(0, 120, 10))
    assert sum(1 for e in expect if e == 0) > 80


def test_block_layout_invariance(ray_session, corpus_and_bench):
    """Windows never cross doc boundaries, so counts must be identical
    under any partitioning (including blocks that split mid-corpus)."""
    docs, bench_texts = corpus_and_bench
    bench = benchmark_ngram_hashes(bench_texts, n=13)
    a = (
        contamination_counts(rd.from_items(docs), bench, n=13)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    b = (
        contamination_counts(
            rd.from_items(docs).repartition(17), bench, n=13
        )
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert a["contaminated_ngrams"].tolist() == b["contaminated_ngrams"].tolist()


def test_decontaminate_drops_planted_docs(ray_session, corpus_and_bench):
    docs, bench_texts = corpus_and_bench
    ds = rd.from_items(docs)
    kept = decontaminate(ds, bench_texts, n=13).to_pandas()
    planted = set(range(0, 120, 10))
    expect = _oracle_counts([d["text"] for d in docs], bench_texts, 13)
    expect_kept = [d["doc_id"] for d, e in zip(docs, expect) if e == 0]
    assert sorted(kept["doc_id"].tolist()) == sorted(expect_kept)
    assert planted.isdisjoint(set(kept["doc_id"]))
    # schema untouched in drop mode; count column kept with annotate=True
    assert list(kept.columns) == ["doc_id", "text"]
    ann = decontaminate(ds, bench_texts, n=13, annotate=True).to_pandas()
    assert "contaminated_ngrams" in ann.columns
    assert (ann["contaminated_ngrams"] == 0).all()


def test_normalization_case_and_punct_insensitive(ray_session):
    """A crawled copy with different case/quoting must still collide."""
    span = "one two three four five six seven eight nine ten eleven twelve thirteen"
    crawled = 'Intro... "ONE, two; THREE four (five) six-seven eight nine TEN eleven twelve THIRTEEN!" outro'
    ds = rd.from_items([{"doc_id": 0, "text": crawled}])
    out = contamination_counts(ds, [span], n=13).to_pandas()
    assert out["contaminated_ngrams"].iloc[0] >= 1


def test_order_sensitivity_no_bag_collision(ray_session):
    """Same multiset of tokens in a different order is NOT an overlap."""
    span = "a1 b2 c3 d4 e5 f6 g7 h8 i9 j10 k11 l12 m13"
    reversed_span = " ".join(reversed(span.split()))
    ds = rd.from_items([{"doc_id": 0, "text": reversed_span}])
    out = contamination_counts(ds, [span], n=13).to_pandas()
    assert out["contaminated_ngrams"].iloc[0] == 0


def test_edge_cases(ray_session):
    """Short docs, null/empty text, empty benchmark, short bench entries."""
    docs = [
        {"doc_id": 0, "text": None},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "only five words right here now"},
    ]
    ds = rd.from_items(docs)
    # empty benchmark → everything clean, nothing dropped
    out = contamination_counts(ds, [], n=13).to_pandas()
    assert out["contaminated_ngrams"].tolist() == [0, 0, 0]
    assert decontaminate(ds, [], n=13).count() == 3
    # benchmark entries shorter than n contribute no hashes
    assert len(benchmark_ngram_hashes(["too short"], n=13)) == 0
    # smaller n fires on short spans
    out2 = contamination_counts(
        ds, ["five words right"], n=3
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out2["contaminated_ngrams"].tolist() == [0, 0, 1]


def test_precomputed_hash_reuse_and_max_overlap(ray_session, corpus_and_bench):
    """An np.ndarray benchmark is used as-is (amortized across shards);
    max_overlap keeps lightly-overlapping docs."""
    docs, bench_texts = corpus_and_bench
    bench = benchmark_ngram_hashes(bench_texts, n=13)
    counts = (
        contamination_counts(rd.from_items(docs), bench, n=13)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )["contaminated_ngrams"]
    hi = int(counts.max())
    assert hi >= 1
    kept = decontaminate(
        rd.from_items(docs), bench, n=13, max_overlap=hi
    ).count()
    assert kept == len(docs)  # threshold at the max keeps everything


def test_tokenize_contract():
    assert _tokenize('Hello, WORLD! 42-x') == ["hello", "world", "42", "x"]
    assert _tokenize(None) == []
