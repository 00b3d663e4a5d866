"""Model-based quality classification (the CCNet / GPT-3-style data
step): train a logistic-regression classifier that separates a
high-quality SEED corpus (positives) from a general web sample
(negatives), then score and filter the full corpus with it.  This is
the learned counterpart of `textops.add_quality`'s heuristics — the
standard pipeline runs both.

Scale shape: the labeled sample is SMALL by contract (seed corpora are
thousands of docs), so training is a deterministic driver-side
full-batch gradient descent; the fitted model is one ``(dim,)`` float32
weight vector that ships to workers by closure capture (well under any
broadcast threshold), and scoring is ONE vectorized ``map_batches`` —
no shuffle at any corpus size.

Features: hashed unigram+bigram counts into ``dim`` buckets (the
feature-hashing trick), log1p-scaled and L2-normalized per doc.
Hashing uses ``extract_core.stable_u64`` over each batch's UNIQUE
tokens only (Zipf reuse makes that cheap — same pattern as
``textops.pack_sequences``), so features are bit-identical across
runs, block layouts and cluster sizes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Sequence

import numpy as np
import pyarrow as pa

from .extract_core import stable_u64

_TOKEN_RE = re.compile(r"[a-z0-9']+")

#: gather guard for Dataset-valued training inputs: training is
#: driver-side by design, so refuse corpora that plainly aren't a
#: labeled sample (override per call with ``max_rows``).
TRAIN_MAX_ROWS = 100_000


@dataclass(frozen=True)
class QualityModel:
    """A fitted quality classifier: ``sigmoid(X @ w + b)`` over hashed
    n-gram features.  ``salt`` binds scores to the training-time
    feature space — changing it re-buckets every token."""

    w: np.ndarray          # (dim,) float32
    b: float
    dim: int
    salt: str = "qclf"


def _featurize(texts: Sequence[str | None], dim: int, salt: str) -> np.ndarray:
    """Hashed unigram+bigram count features, log1p + L2 per row."""
    import pandas as _pd

    toks_per_doc = [_TOKEN_RE.findall((x or "").lower()) for x in texts]
    grams_per_doc = [
        toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        for toks in toks_per_doc
    ]
    n = len(texts)
    X = np.zeros((n, dim), dtype=np.float32)
    flat = [g for grams in grams_per_doc for g in grams]
    if flat:
        codes, uniques = _pd.factorize(np.asarray(flat, dtype=object))
        buckets_u = np.array(
            [stable_u64(u, salt) % dim for u in uniques], dtype=np.int64
        )
        rows = np.repeat(
            np.arange(n, dtype=np.int64),
            np.array([len(g) for g in grams_per_doc], dtype=np.int64),
        )
        np.add.at(X, (rows, buckets_u[codes]), 1.0)
    np.log1p(X, out=X)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    np.divide(X, norms, out=X, where=norms > 0)
    return X


def _gather_texts(corpus, text_col: str, max_rows: int) -> list[str]:
    if isinstance(corpus, (list, tuple)):
        return list(corpus)
    # take_all(limit=...) guards and gathers in ONE execution — a
    # separate count() would run the input's lazy lineage twice
    try:
        rows = corpus.select_columns([text_col]).take_all(limit=max_rows)
    except ValueError as e:
        raise ValueError(
            f"training corpus exceeds max_rows={max_rows}: training is "
            "driver-side by contract — pass a labeled SAMPLE (e.g. "
            "relops.stratified_sample), or raise max_rows deliberately"
        ) from e
    return [r[text_col] for r in rows]


def train_quality_classifier(
    positives,
    negatives,
    *,
    text_col: str = "text",
    dim: int = 4096,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
    salt: str = "qclf",
    max_rows: int = TRAIN_MAX_ROWS,
) -> QualityModel:
    """Fit the seed-vs-web logistic regression.  ``positives`` /
    ``negatives`` are text lists or Datasets (gather-guarded by
    ``max_rows``).  Full-batch gradient descent from zero init — fully
    deterministic: same labeled sample → bit-identical model."""
    pos = _gather_texts(positives, text_col, max_rows)
    neg = _gather_texts(negatives, text_col, max_rows)
    if not pos or not neg:
        raise ValueError("need at least one positive and one negative example")
    X = _featurize(pos + neg, dim, salt)
    y = np.concatenate(
        [np.ones(len(pos), dtype=np.float32), np.zeros(len(neg), dtype=np.float32)]
    )
    # balance classes so a lopsided web sample can't drown the seed
    wts = np.where(y == 1.0, 0.5 / len(pos), 0.5 / len(neg)).astype(np.float32)
    w = np.zeros(dim, dtype=np.float32)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) * wts
        w -= lr * (X.T @ g + l2 * w)
        b -= lr * float(g.sum())
    return QualityModel(w=w, b=float(b), dim=dim, salt=salt)


def score_quality(
    ds,
    model: QualityModel,
    text_col: str = "text",
    out_col: str = "clf_quality",
):
    """Append ``out_col`` = P(seed-like) ∈ [0, 1) per doc — one
    vectorized ``map_batches``; the model rides to workers as a
    captured ``(dim,)`` vector.

    Docs with NO extractable tokens (null/empty text, scripts the
    tokenizer can't see) score exactly 0.0: their natural score would
    be ``sigmoid(b)``, which training drives arbitrarily close to the
    default 0.5 threshold — their fate would then flip with
    training-set noise.  No evidence → not seed-like, deterministically."""
    w, b, dim, salt = model.w, model.b, model.dim, model.salt
    from .textops import _replace_column

    def f(t: pa.Table) -> pa.Table:
        X = _featurize(t[text_col].to_pylist(), dim, salt)
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        p[np.abs(X).sum(axis=1) == 0] = 0.0
        return _replace_column(t, out_col, pa.array(p.astype(np.float64)))

    return ds.map_batches(f, batch_format="pyarrow")


def quality_classifier_filter(
    ds,
    model: QualityModel,
    threshold: float = 0.5,
    text_col: str = "text",
    *,
    keep_score: bool = False,
):
    """Keep docs the classifier scores ≥ ``threshold``.  With
    ``keep_score=True`` the ``clf_quality`` column stays on the output
    (e.g. to rank a later per-domain quota)."""
    import pyarrow.compute as pc

    scored = score_quality(ds, model, text_col)
    filtered = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["clf_quality"], threshold)),
        batch_format="pyarrow",
    )
    if keep_score:
        return filtered
    return filtered.map_batches(
        lambda t: t.drop_columns(["clf_quality"]), batch_format="pyarrow"
    )


def save_model(model: QualityModel, path: str) -> None:
    """Persist to ``.npz`` (the model is one small dense vector).
    Written through a file handle: ``np.savez(path)`` silently appends
    '.npz' to extension-less paths, breaking save→load round-trips."""
    with open(path, "wb") as f:
        np.savez(
            f,
            w=model.w,
            b=np.float64(model.b),
            dim=np.int64(model.dim),
            salt=np.str_(model.salt),
        )


def load_model(path: str) -> QualityModel:
    z = np.load(path, allow_pickle=False)
    return QualityModel(
        w=z["w"].astype(np.float32),
        b=float(z["b"]),
        dim=int(z["dim"]),
        salt=str(z["salt"]),
    )
