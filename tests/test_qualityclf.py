"""Seed-vs-web quality classifier (kgforge/qualityclf.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgforge.qualityclf import (
    QualityModel,
    load_model,
    quality_classifier_filter,
    save_model,
    score_quality,
    train_quality_classifier,
)

_SEED_VOCAB = ("analysis history result method evidence theory chapter "
               "research government literature science economy").split()
_SPAM_VOCAB = ("click free winner casino pills cheap viagra bonus jackpot "
               "offer credit loan").split()


def _doc(vocab, i, n=25):
    rng = np.random.RandomState(1000 + i)
    return " ".join(rng.choice(vocab, size=n))


def _labeled(n=60):
    pos = [_doc(_SEED_VOCAB, i) for i in range(n)]
    neg = [_doc(_SPAM_VOCAB, 10_000 + i) for i in range(n)]
    return pos, neg


def test_train_separates_holdout():
    pos, neg = _labeled(80)
    model = train_quality_classifier(pos[:60], neg[:60])
    hold_pos = [_doc(_SEED_VOCAB, 5000 + i) for i in range(20)]
    hold_neg = [_doc(_SPAM_VOCAB, 6000 + i) for i in range(20)]
    df = pd.DataFrame({"doc_id": range(40), "text": hold_pos + hold_neg})
    scored = score_quality(rd.from_pandas(df), model).to_pandas()
    scored = scored.sort_values("doc_id", ignore_index=True)
    s = scored["clf_quality"].to_numpy()
    assert ((s > 0.5) == (np.arange(40) < 20)).mean() >= 0.95
    assert ((0 < s) & (s < 1)).all()


def test_training_and_scoring_deterministic(ray_session):
    pos, neg = _labeled(30)
    m1 = train_quality_classifier(pos, neg)
    m2 = train_quality_classifier(pos, neg)
    assert np.array_equal(m1.w, m2.w) and m1.b == m2.b

    df = pd.DataFrame({"doc_id": range(20),
                       "text": [_doc(_SEED_VOCAB, 70 + i) for i in range(20)]})
    a = (score_quality(rd.from_pandas(df).repartition(2), m1).to_pandas()
         .sort_values("doc_id")["clf_quality"].to_numpy())
    b = (score_quality(rd.from_pandas(df).repartition(7), m1).to_pandas()
         .sort_values("doc_id")["clf_quality"].to_numpy())
    # block layout changes per-batch unique-token sets but not features
    assert np.array_equal(a, b)


def test_filter_and_keep_score(ray_session):
    pos, neg = _labeled(40)
    model = train_quality_classifier(pos, neg)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [_doc(_SEED_VOCAB, 1), _doc(_SPAM_VOCAB, 2),
                 _doc(_SEED_VOCAB, 3), None],
    })
    ds = rd.from_pandas(docs).repartition(2)
    kept = quality_classifier_filter(ds, model).to_pandas()
    assert set(kept["doc_id"]) == {0, 2}
    assert "clf_quality" not in kept.columns
    kept2 = quality_classifier_filter(ds, model, keep_score=True).to_pandas()
    assert "clf_quality" in kept2.columns
    # token-less docs score exactly 0.0 (deterministic drop), not
    # sigmoid(b) which can sit arbitrarily close to the 0.5 threshold
    scored = score_quality(ds, model).to_pandas().set_index("doc_id")
    assert scored.loc[3, "clf_quality"] == 0.0


def test_dataset_inputs_and_gather_guard(ray_session):
    pos, neg = _labeled(20)
    pos_ds = rd.from_pandas(pd.DataFrame({"text": pos}))
    neg_ds = rd.from_pandas(pd.DataFrame({"text": neg}))
    m = train_quality_classifier(pos_ds, neg_ds)
    m_list = train_quality_classifier(pos, neg)
    assert np.array_equal(m.w, m_list.w)
    with pytest.raises(ValueError, match="max_rows"):
        train_quality_classifier(pos_ds, neg_ds, max_rows=5)
    with pytest.raises(ValueError, match="at least one"):
        train_quality_classifier([], neg)


def test_save_load_round_trip(tmp_path):
    pos, neg = _labeled(15)
    m = train_quality_classifier(pos, neg, dim=512)
    p = str(tmp_path / "qm.npz")
    save_model(m, p)
    m2 = load_model(p)
    assert isinstance(m2, QualityModel)
    assert np.array_equal(m.w, m2.w)
    assert (m.b, m.dim, m.salt) == (m2.b, m2.dim, m2.salt)


def test_rescoring_replaces_column_not_duplicates(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat", "dog ran far"]})
    seed = pd.DataFrame({"text": ["the cat sat on the mat today"]})
    model = train_quality_classifier(
        rd.from_pandas(seed), rd.from_pandas(df), dim=64, iters=5
    )
    once = score_quality(rd.from_pandas(df), model)
    twice = score_quality(once, model).to_pandas()
    assert list(twice.columns).count("clf_quality") == 1
