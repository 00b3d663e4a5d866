from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from kgforge.ann import brute_force_topk, ivf_topk, train_centroids
from kgforge.relational import read

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds():
    return read(SF, "embeddings", ["vec_id", "embedding"]).materialize()


@pytest.fixture(scope="module")
def qvecs():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = t.slice(0, 3).to_pylist()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float32)


def test_brute_force_matches_numpy(emb_ds, qvecs):
    out = brute_force_topk(emb_ds, qvecs, k=5)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array([r["vec_id"] for r in t.to_pylist()])
    mat = np.asarray([r["embedding"] for r in t.to_pylist()], dtype=np.float32)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = qvecs / np.linalg.norm(qvecs, axis=1, keepdims=True)
    for qi in range(3):
        cos = mat @ q[qi]
        expected = set(ids[np.argsort(-cos, kind="stable")[:5]].tolist())
        got = set(out[out["query_idx"] == qi]["vec_id"].tolist())
        assert got == expected, f"query {qi}: {got} vs {expected}"


def test_ivf_recall_vs_brute(emb_ds, qvecs):
    cent = train_centroids(emb_ds, n_centroids=16, seed=3)
    brute = brute_force_topk(emb_ds, qvecs, k=10)
    approx = ivf_topk(emb_ds, cent, qvecs, k=10, nprobe=6)
    recalls = []
    for qi in range(3):
        b = set(brute[brute["query_idx"] == qi]["vec_id"].tolist())
        a = set(approx[approx["query_idx"] == qi]["vec_id"].tolist())
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_topk_rank_is_deterministic(emb_ds, qvecs):
    a = brute_force_topk(emb_ds, qvecs, k=10)
    b = brute_force_topk(emb_ds, qvecs, k=10)
    assert a[["query_idx", "vec_id", "rank"]].equals(b[["query_idx", "vec_id", "rank"]])
