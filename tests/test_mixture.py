"""Token-budget sampling + weighted corpus mixing (kgforge/mixture.py)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
import ray.data as rd

from kgforge.mixture import count_tokens, mix_corpora, sample_token_budget


def _corpus(n, seed, prefix="d"):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(5, 40)
        rows.append(
            {"doc_id": f"{prefix}{i}", "text": " ".join(f"w{j}" for j in range(k))}
        )
    return pd.DataFrame(rows)


def _tok_total(df):
    return int(df["text"].str.split().str.len().sum())


def test_count_tokens_matches_pandas(ray_session):
    df = _corpus(300, 1)
    assert count_tokens(rd.from_pandas(df).repartition(5)) == _tok_total(df)


def test_sample_token_budget_hits_target(ray_session):
    df = _corpus(2000, 2)
    total = _tok_total(df)
    budget = total // 4
    ds = rd.from_pandas(df).repartition(7)
    sub, rate = sample_token_budget(ds, budget, seed=3)
    assert rate == pytest.approx(budget / total)
    got = count_tokens(sub)
    assert got == pytest.approx(budget, rel=0.15)  # statistical tolerance


def test_sample_deterministic_and_nested(ray_session):
    """Same (corpus, seed, budget) → same docs on any layout; a BIGGER
    budget yields a SUPERSET (hash thresholds nest)."""
    df = _corpus(800, 4)
    total = _tok_total(df)
    a, _ = sample_token_budget(rd.from_pandas(df).repartition(3),
                               total // 5, seed=7)
    b, _ = sample_token_budget(rd.from_pandas(df).repartition(11),
                               total // 5, seed=7)
    small = sorted(a.to_pandas()["doc_id"])
    assert small == sorted(b.to_pandas()["doc_id"])
    c, _ = sample_token_budget(rd.from_pandas(df), total // 2, seed=7)
    big = set(c.to_pandas()["doc_id"])
    assert set(small) <= big
    # different seed → different selection
    d, _ = sample_token_budget(rd.from_pandas(df), total // 5, seed=8)
    assert sorted(d.to_pandas()["doc_id"]) != small


def test_budget_at_least_total_keeps_all(ray_session):
    df = _corpus(50, 5)
    ds = rd.from_pandas(df)
    sub, rate = sample_token_budget(ds, _tok_total(df) + 1)
    assert rate == 1.0
    assert sub.count() == 50
    # budget 0 selects nothing (mix_corpora floors tiny weight
    # fractions to 0) — only NEGATIVE budgets are invalid
    sub0, rate0 = sample_token_budget(ds, 0)
    assert rate0 == 0.0 and sub0.count() == 0
    with pytest.raises(ValueError):
        sample_token_budget(ds, -1)


def test_mix_corpora_proportions_and_tags(ray_session):
    web = _corpus(1500, 6, "web")
    code = _corpus(1500, 7, "code")
    total = (_tok_total(web) + _tok_total(code)) // 3
    mixed, report = mix_corpora(
        {"web": (rd.from_pandas(web), 3.0), "code": (rd.from_pandas(code), 1.0)},
        total_tokens=total,
        seed=1,
    )
    got = mixed.to_pandas()
    assert set(got["source_corpus"]) == {"web", "code"}
    toks = got.assign(n=got["text"].str.split().str.len()).groupby(
        "source_corpus")["n"].sum()
    assert toks["web"] == pytest.approx(total * 0.75, rel=0.15)
    assert toks["code"] == pytest.approx(total * 0.25, rel=0.15)
    assert report["web"]["budget_tokens"] == int(total * 0.75)
    assert report["web"]["shortfall_tokens"] == 0


def test_mix_corpora_shortfall_reported_not_hidden(ray_session):
    tiny = _corpus(10, 8, "tiny")
    big = _corpus(500, 9, "big")
    budget = _tok_total(big)  # tiny's 50% allocation is infeasible
    mixed, report = mix_corpora(
        {"tiny": (rd.from_pandas(tiny), 1.0), "big": (rd.from_pandas(big), 1.0)},
        total_tokens=budget,
    )
    assert report["tiny"]["rate"] == 1.0
    assert report["tiny"]["shortfall_tokens"] > 0
    # tiny kept whole
    n_tiny = (mixed.to_pandas()["source_corpus"] == "tiny").sum()
    assert n_tiny == 10
    with pytest.raises(ValueError):
        mix_corpora({}, total_tokens=10)
    with pytest.raises(ValueError):
        mix_corpora({"x": (rd.from_pandas(tiny), 0.0)}, total_tokens=10)
