"""Hashed n-gram LM + stupid-backoff pseudo-perplexity (kgforge/ngramlm.py)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgforge.decontam import _tokenize
from kgforge.ngramlm import (
    load_lm,
    perplexity_filter,
    save_lm,
    score_perplexity,
    train_ngram_lm,
)

_VOCAB = ("the cat sat on the mat the dog ran in the park the bird flew "
          "over the tree").split()


def _sentence(i: int, ln: int = 12) -> str:
    rng = np.random.RandomState(100 + i)
    # markov-ish: overlapping windows of the base phrase bank
    start = rng.randint(0, len(_VOCAB) - 4)
    words = []
    for _ in range(ln // 4):
        s = (start + rng.randint(0, 3)) % (len(_VOCAB) - 4)
        words += _VOCAB[s : s + 4]
    return " ".join(words)


def _train_corpus(n=80):
    return [_sentence(i) for i in range(n)]


# ---------------------------------------------------------------- oracle

def _py_counts(texts, n):
    counts = {k: Counter() for k in range(1, n + 1)}
    total = 0
    for t in texts:
        toks = _tokenize(t)
        total += len(toks)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                counts[k][tuple(toks[i : i + k])] += 1
    return counts, total


def _py_ppl(text, counts, total, n, alpha, min_count):
    def c(k, gram):
        v = counts[k][gram]
        return v if v >= min_count else 0

    toks = _tokenize(text)
    if not toks:
        return float("nan")
    logs = []
    for i, w in enumerate(toks):
        m = min(n, i + 1)
        sc = None
        for k in range(m, 1, -1):
            num = c(k, tuple(toks[i - k + 1 : i + 1]))
            den = c(k - 1, tuple(toks[i - k + 1 : i]))
            if num > 0 and den > 0:
                sc = (alpha ** (m - k)) * num / den
                break
        if sc is None:
            c1 = c(1, (w,)) or 0.5
            sc = (alpha ** (m - 1)) * c1 / max(total, 1)
        logs.append(math.log(sc))
    return math.exp(-sum(logs) / len(logs))


def test_matches_python_oracle(ray_session):
    train = _train_corpus(50)
    lm = train_ngram_lm(
        rd.from_pandas(pd.DataFrame({"text": train})).repartition(4),
        n=3, min_count=1,
    )
    counts, total = _py_counts(train, 3)
    assert lm.total == total
    evals = [_sentence(900 + i) for i in range(10)]
    evals.append("zebra quantum flux unseen tokens entirely")
    evals.append("")
    df = pd.DataFrame({"doc_id": range(len(evals)), "text": evals})
    got = (score_perplexity(rd.from_pandas(df).repartition(3), lm)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    for i, t in enumerate(evals):
        want = _py_ppl(t, counts, total, 3, lm.alpha, 1)
        g = got["lm_ppl"][i]
        if math.isnan(want):
            assert math.isnan(g)
        else:
            assert g == pytest.approx(want, rel=1e-9), (i, t)


def test_in_domain_scores_below_gibberish(ray_session):
    train = _train_corpus(80)
    lm = train_ngram_lm(rd.from_pandas(pd.DataFrame({"text": train})), n=3)
    rng = np.random.RandomState(0)
    in_dom = [_sentence(2000 + i) for i in range(10)]
    gib = [" ".join(rng.permutation(_VOCAB).tolist()) for _ in range(10)]
    df = pd.DataFrame({"doc_id": range(20), "text": in_dom + gib})
    s = (score_perplexity(rd.from_pandas(df), lm).to_pandas()
         .sort_values("doc_id")["lm_ppl"].to_numpy())
    assert np.median(s[:10]) < np.median(s[10:])

    # filter keeps the fluent half at a threshold between the medians
    thr = float(np.sort(s)[len(s) // 2])
    kept = perplexity_filter(rd.from_pandas(df), lm, thr).to_pandas()
    assert len(kept) == (s <= thr).sum()
    assert "lm_ppl" not in kept.columns
    kept2 = perplexity_filter(rd.from_pandas(df), lm, thr, keep_score=True)
    assert "lm_ppl" in kept2.to_pandas().columns


def test_training_layout_invariant_and_pruning(ray_session):
    train = _train_corpus(40)
    a = train_ngram_lm(
        rd.from_pandas(pd.DataFrame({"text": train})).repartition(2),
        n=2, min_count=1,
    )
    b = train_ngram_lm(
        rd.from_pandas(pd.DataFrame({"text": train})).repartition(7),
        n=2, min_count=1,
    )
    assert np.array_equal(a.keys, b.keys)
    assert np.array_equal(a.counts, b.counts)
    pruned = train_ngram_lm(
        rd.from_pandas(pd.DataFrame({"text": train})), n=2, min_count=3,
    )
    assert len(pruned.keys) < len(a.keys)
    assert (pruned.counts >= 3).all()


def test_fully_pruned_model_still_scores(ray_session):
    """min_count above every gram count → empty model; every token
    scores at the 0.5-pseudo-count unigram backstop instead of
    crashing (empty-keys searchsorted regression)."""
    train = [_sentence(i) for i in range(3)]   # too small to repeat much
    lm = train_ngram_lm(
        rd.from_pandas(pd.DataFrame({"text": train})), n=2, min_count=10**9,
    )
    assert len(lm.keys) == 0 and lm.total > 0
    df = pd.DataFrame({"doc_id": [0], "text": [_sentence(99)]})
    s = score_perplexity(rd.from_pandas(df), lm).to_pandas()["lm_ppl"][0]
    toks = len(_tokenize(_sentence(99)))
    assert toks > 0 and np.isfinite(s)
    # every token gets alpha^(m-1) * 0.5/total — bounded by the m=1 case
    assert s >= lm.total / 0.5 * 0  # positive, sanity
    assert s == pytest.approx(
        math.exp(-np.mean([
            math.log((lm.alpha ** (min(2, i + 1) - 1)) * 0.5 / lm.total)
            for i in range(toks)
        ])), rel=1e-9,
    )


def test_max_entries_guard_and_validation(ray_session):
    train = _train_corpus(30)
    ds = rd.from_pandas(pd.DataFrame({"text": train}))
    with pytest.raises(ValueError, match="max_entries"):
        train_ngram_lm(ds, n=3, min_count=1, max_entries=5)
    with pytest.raises(ValueError, match="n must be"):
        train_ngram_lm(ds, n=0)


def test_perplexity_buckets(ray_session):
    from kgforge.ngramlm import perplexity_buckets

    train = _train_corpus(80)
    lm = train_ngram_lm(rd.from_pandas(pd.DataFrame({"text": train})), n=3)
    rng = np.random.RandomState(5)
    in_dom = [_sentence(3000 + i) for i in range(15)]
    gib = [" ".join(rng.permutation(_VOCAB).tolist()) for _ in range(15)]
    df = pd.DataFrame({"doc_id": range(31), "text": in_dom + gib + [""]})
    ds = rd.from_pandas(df).repartition(3)
    out = (perplexity_buckets(ds, lm, id_col="doc_id", sample_fraction=1.0)
           .to_pandas().set_index("doc_id"))
    assert set(out["ppl_bucket"]) <= {"head", "middle", "tail"}
    # terciles from a full sample split ~1/3 each (the empty doc lands
    # in the last bucket: no fluency evidence)
    assert out["ppl_bucket"].value_counts()["head"] >= 8
    assert out.loc[30, "ppl_bucket"] == "tail"
    # fluent docs skew head, gibberish skews tail
    head_ids = set(out[out["ppl_bucket"] == "head"].index)
    assert len(head_ids & set(range(15))) > len(head_ids & set(range(15, 30)))
    # deterministic across layouts
    out2 = (perplexity_buckets(rd.from_pandas(df).repartition(6), lm,
                               id_col="doc_id", sample_fraction=1.0)
            .to_pandas().set_index("doc_id"))
    assert (out["ppl_bucket"] == out2["ppl_bucket"]).all()
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(ds, lm, quantiles=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascending"):
        perplexity_buckets(ds, lm, quantiles=(2 / 3, 1 / 3))
    with pytest.raises(ValueError, match="ascending"):
        perplexity_buckets(ds, lm, quantiles=(0.5, 1.5), labels=("a", "b", "c"))


def test_save_load_round_trip(ray_session, tmp_path):
    train = _train_corpus(20)
    lm = train_ngram_lm(rd.from_pandas(pd.DataFrame({"text": train})), n=2)
    p = str(tmp_path / "lm.npz")
    save_lm(lm, p)
    lm2 = load_lm(p)
    assert np.array_equal(lm.keys, lm2.keys)
    assert np.array_equal(lm.counts, lm2.counts)
    assert (lm.total, lm.n, lm.alpha, lm.salt) == (
        lm2.total, lm2.n, lm2.alpha, lm2.salt)
    df = pd.DataFrame({"doc_id": [0], "text": [_sentence(1)]})
    s1 = score_perplexity(rd.from_pandas(df), lm).to_pandas()["lm_ppl"][0]
    s2 = score_perplexity(rd.from_pandas(df), lm2).to_pandas()["lm_ppl"][0]
    assert s1 == s2


def test_rescoring_replaces_column_not_duplicates(ray_session):
    """score_perplexity over an already-scored dataset must replace
    lm_ppl (the _replace_column convention), not create an ambiguous
    duplicate field."""
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat", "dog ran far"]})
    lm = train_ngram_lm(rd.from_pandas(df), n=2)
    once = score_perplexity(rd.from_pandas(df), lm)
    twice = score_perplexity(once, lm).to_pandas()
    assert list(twice.columns).count("lm_ppl") == 1
    base = once.to_pandas()
    assert twice["lm_ppl"].tolist() == base["lm_ppl"].tolist()
