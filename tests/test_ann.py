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


def test_train_centroids_tiny_table_falls_back():
    """A table too small for the hash sample to hit anything must still
    train a quantizer (sample-everything fallback), not crash in numpy."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgforge.ann import train_centroids

    rng = np.random.RandomState(0)
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([rng.randn(8).tolist() for _ in range(3)],
                              pa.list_(pa.float32(), 8)),
    })
    cent = train_centroids(rd.from_arrow(t), n_centroids=2)
    assert cent.shape == (2, 8)
    # deterministic across calls
    cent2 = train_centroids(rd.from_arrow(t), n_centroids=2)
    assert np.array_equal(cent, cent2)


def test_ivf_build_and_search_index(emb_ds, qvecs, tmp_path):
    """Persisted cell-partitioned index: probes read ONLY their cell
    directories; nprobe=all through the index equals brute force."""
    import os

    from kgforge.ann import ivf_build, ivf_search_index, load_centroids

    path = str(tmp_path / "ivf")
    cent = ivf_build(emb_ds, path, n_centroids=8, sample_mod=2, seed=3)
    assert np.array_equal(load_centroids(path), cent)
    cells = [d for d in os.listdir(f"{path}/cells") if d.startswith("ivf_cell=")]
    assert len(cells) >= 2  # real partitioned layout on disk
    exact = ivf_search_index(path, qvecs, k=10, nprobe=len(cent), dtype=np.float64)
    brute = brute_force_topk(emb_ds, qvecs, k=10, dtype=np.float64)
    assert exact[["query_idx", "vec_id", "rank"]].reset_index(drop=True).equals(
        brute[["query_idx", "vec_id", "rank"]].reset_index(drop=True)
    )
    # pruned probe: valid subset result with correct shape
    part = ivf_search_index(path, qvecs, k=10, nprobe=1)
    assert set(part.columns) == {"query_idx", "vec_id", "cosine", "rank"}
    assert len(part) <= len(brute)


def test_ivf_recall_monotone_in_nprobe(emb_ds, qvecs):
    from kgforge.ann import ivf_recall_report

    rep = ivf_recall_report(emb_ds, qvecs, k=10, nprobes=(1, 2, 4, 8, 16),
                            n_centroids=16)
    rec = rep["recall_at_k"].tolist()
    assert all(b >= a - 1e-9 for a, b in zip(rec, rec[1:])), rec  # monotone
    assert rec[-1] == 1.0  # nprobe = n_centroids → exact
    assert rep["cells_probed_frac"].iloc[-1] == 1.0


def test_train_centroids_sqrt_sizing(emb_ds):
    cent = train_centroids(emb_ds, n_centroids=None)
    n = emb_ds.count()
    assert len(cent) == max(16, int(round(np.sqrt(n))))


def test_ann_cli_build_search_recall(tmp_path):
    """End-to-end CLI: build a persisted index, search it, print the
    recall table (subprocess — owns its own Ray session)."""
    import json
    import subprocess
    import sys

    idx = str(tmp_path / "idx")
    out = subprocess.run(
        [sys.executable, "-m", "kgforge.ann_cli", "build",
         "--input", f"{SF}/embeddings.parquet", "--out", idx,
         "--n-centroids", "8"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_centroids"] == 8 and info["rows"] > 0
    res = str(tmp_path / "res.parquet")
    out = subprocess.run(
        [sys.executable, "-m", "kgforge.ann_cli", "search",
         "--index", idx, "--queries", f"{SF}/embeddings.parquet",
         "--k", "5", "--nprobe", "8", "--limit", "2", "--out", res],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    got = pq.read_table(res)
    assert got.num_rows == 10  # 2 queries x k=5 (nprobe=all: exact)
    assert set(got.schema.names) == {"query_idx", "vec_id", "cosine", "rank"}


def test_ivf_multi_assign_exact_at_full_probe(emb_ds, qvecs):
    """assign_top > 1 replicates rows across cells; at nprobe=all the
    result must STILL be exact-equal to brute force — the driver merge
    deduplicates the replicated (id, cosine) rows before ranking."""
    cent = train_centroids(emb_ds, n_centroids=16, seed=3)
    brute = brute_force_topk(emb_ds, qvecs, k=10)
    full = ivf_topk(emb_ds, cent, qvecs, k=10, nprobe=len(cent), assign_top=3)
    cols = ["query_idx", "vec_id", "rank"]
    assert full[cols].reset_index(drop=True).equals(brute[cols].reset_index(drop=True))


def test_ivf_multi_assign_recall_not_worse(emb_ds, qvecs):
    """At a fixed nprobe the multi-assigned index's probed union is a
    superset of the single-assigned one, so recall can only go up."""
    from kgforge.ann import ivf_recall_report

    r1 = ivf_recall_report(emb_ds, qvecs, k=10, nprobes=(2, 4), n_centroids=16)
    r3 = ivf_recall_report(
        emb_ds, qvecs, k=10, nprobes=(2, 4), n_centroids=16, assign_top=3
    )
    for np_ in (2, 4):
        a = float(r1.loc[r1["nprobe"] == np_, "recall_at_k"].iloc[0])
        b = float(r3.loc[r3["nprobe"] == np_, "recall_at_k"].iloc[0])
        assert b >= a, (np_, a, b)


def test_ivf_build_multi_assign_round_trip(emb_ds, qvecs, tmp_path):
    """Persisted multi-assigned index: each row lands in assign_top cell
    dirs; search dedups and at nprobe=all equals brute force."""
    from kgforge.ann import ivf_build, ivf_search_index

    path = str(tmp_path / "ivf_ma")
    cent = ivf_build(emb_ds, path, n_centroids=8, assign_top=2)
    import ray.data as rd

    n_stored = rd.read_parquet(f"{path}/cells").count()
    assert n_stored == 2 * emb_ds.count()  # replicated storage, documented trade
    brute = brute_force_topk(emb_ds, qvecs, k=5)
    got = ivf_search_index(path, qvecs, k=5, nprobe=len(cent))
    cols = ["query_idx", "vec_id", "rank"]
    assert got[cols].reset_index(drop=True).equals(brute[cols].reset_index(drop=True))


def test_ivf_multi_assign_single_batch_replicas_do_not_crowd_topk():
    """A multi-assigned index can hold BOTH replicas of a row in one
    batch (single-block corpus, both its cells probed): the per-batch
    top-k cut must dedup ids first, or replicas occupy k slots and the
    driver merge returns fewer than k rows, silently dropping true
    neighbors ranked just past the cut."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(7)
    vecs = rng.randn(6, 8).astype(np.float64)
    t = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs]),
        }
    )
    ds = rd.from_arrow(t)  # ONE block: all replicas share every batch
    q = vecs[:2] + 0.01
    cent = train_centroids(ds, n_centroids=2, sample_mod=1, seed=3)
    brute = brute_force_topk(ds, q, k=3)
    got = ivf_topk(ds, cent, q, k=3, nprobe=len(cent), assign_top=2)
    cols = ["query_idx", "vec_id", "rank"]
    assert got[cols].reset_index(drop=True).equals(
        brute[cols].reset_index(drop=True)
    )
    # every query must get its full k — the pre-fix plan returned fewer
    assert (got.groupby("query_idx").size() == 3).all()
