"""SemDeDup-style clustered semantic dedup (kgforge/semdedup.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgforge.semdedup import cluster_assign, semantic_dedup, semantic_dedup_drops

DIM = 16


def _corpus(seed=0, proto_noise=0.5):
    """Two well-separated topics; within each, groups of near-identical
    vectors (tiny noise) plus distinct singletons.  With the anchor norm
    ~10, ``proto_noise=0.5`` keeps prototypes >0.95 cosine to each other
    (groups merge under SemDeDup); pass ~3.0 to keep the groups distinct."""
    rng = np.random.RandomState(seed)
    base_a = rng.randn(DIM); base_a[0] += 10        # topic A anchor
    base_b = rng.randn(DIM); base_b[1] -= 10        # topic B anchor
    rows = []
    vid = 0

    def add(vec):
        nonlocal vid
        rows.append({"vec_id": vid, "embedding": vec.astype(np.float32).tolist()})
        vid += 1

    for base in (base_a, base_b):
        for g in range(3):                          # 3 dup-groups per topic
            proto = base + rng.randn(DIM) * proto_noise
            for _ in range(4):                      # 4 near-copies each
                add(proto + rng.randn(DIM) * 1e-3)
        for _ in range(5):                          # 5 distinct singletons
            add(base + rng.randn(DIM) * 2.0)
    return pd.DataFrame(rows)


def _oracle_keep(df, threshold):
    """Global greedy in ascending id order (valid here because the dup
    groups are far apart, so clustering never splits one)."""
    mats = np.asarray([np.asarray(v) for v in df["embedding"]], dtype=np.float32)
    mats = mats / np.linalg.norm(mats, axis=1, keepdims=True)
    kept = []
    for i in range(len(df)):
        if kept and (mats[kept] @ mats[i]).max() > threshold:
            continue
        kept.append(i)
    return sorted(df["vec_id"].iloc[kept])


def test_semantic_dedup_drops_planted_near_copies(ray_session):
    df = _corpus(proto_noise=3.0)
    ds = rd.from_pandas(df).repartition(4)
    kept = semantic_dedup(ds, threshold=0.95, n_clusters=2)
    got = sorted(kept.to_pandas()["vec_id"])
    assert got == _oracle_keep(df, 0.95)
    # 6 dup-groups collapse to 1 each + 10 singletons survive
    assert len(got) == 6 + 10
    assert list(kept.to_pandas().columns) == ["vec_id", "embedding"]


def test_layout_and_rerun_determinism(ray_session):
    df = _corpus(3)
    a = sorted(
        semantic_dedup(rd.from_pandas(df).repartition(3), 0.95, n_clusters=2)
        .to_pandas()["vec_id"]
    )
    b = sorted(
        semantic_dedup(rd.from_pandas(df).repartition(9), 0.95, n_clusters=2)
        .to_pandas()["vec_id"]
    )
    assert a == b


def test_threshold_one_keeps_all_and_validation(ray_session):
    df = _corpus(5)
    ds = rd.from_pandas(df)
    assert semantic_dedup(ds, threshold=1.0, n_clusters=2).count() == len(df)
    with pytest.raises(ValueError):
        semantic_dedup(ds, threshold=1.5)


def test_drops_complement_keeps(ray_session):
    df = _corpus(1, proto_noise=3.0)
    ds = rd.from_pandas(df).repartition(4)
    kept = sorted(
        semantic_dedup(ds, 0.95, n_clusters=2).to_pandas()["vec_id"]
    )
    drops = sorted(
        semantic_dedup_drops(ds, 0.95, n_clusters=2).to_pandas()["vec_id"]
    )
    assert sorted(kept + drops) == sorted(df["vec_id"])
    assert set(kept).isdisjoint(drops)
    assert len(drops) == 6 * 3                  # 3 dropped per 4-copy group
    # nothing to drop at threshold 1.0
    assert semantic_dedup_drops(ds, 1.0, n_clusters=2).count() == 0


def test_cluster_sample_balanced_and_deterministic(ray_session):
    from kgforge.semdedup import cluster_sample

    df = _corpus(21, proto_noise=3.0)          # 17 docs per topic
    ds = rd.from_pandas(df).repartition(4)
    out = cluster_sample(ds, 5, n_clusters=2).to_pandas()
    assert len(out) == 10                      # 5 from each cluster
    assert sorted(out.columns) == ["embedding", "vec_id"]
    out2 = cluster_sample(
        rd.from_pandas(df).repartition(7), 5, n_clusters=2
    ).to_pandas()
    assert sorted(out["vec_id"]) == sorted(out2["vec_id"])
    # k larger than every cluster → everything survives
    assert cluster_sample(ds, 1000, n_clusters=2).count() == len(df)
    with pytest.raises(ValueError):
        cluster_sample(ds, 0)
    # by= a precomputed column (unbiased-draw mode, skips the sim pass)
    df2 = df.copy()
    df2["draw"] = [(v * 2654435761) % 97 for v in df2["vec_id"]]
    byhash = cluster_sample(
        rd.from_pandas(df2), 5, n_clusters=2, by="draw", descending=False
    ).to_pandas()
    assert len(byhash) == 10
    assert sorted(byhash.columns) == ["draw", "embedding", "vec_id"]


def test_greedy_keep_gram_equals_buffer(monkeypatch):
    """The one-Gram-matmul fast path and the O(m·d)-memory buffer
    fallback implement the same scan (pure unit test — the env switch
    must be read in THIS process, not a Ray worker)."""
    from kgforge.semdedup import _greedy_keep

    rng = np.random.RandomState(11)
    vecs = list(rng.randn(40, DIM).astype(np.float32))
    for i in range(0, 30, 3):                    # planted near-copies
        vecs[i + 1] = vecs[i] + rng.randn(DIM).astype(np.float32) * 1e-3
    df = pd.DataFrame({"embedding": [v.tolist() for v in vecs]})
    for thr in (0.5, 0.9, 0.95, 1.0):
        a = _greedy_keep(df, thr, "embedding")
        monkeypatch.setenv("KGFORGE_SEMDEDUP_GRAM_ROWS", "0")
        b = _greedy_keep(df, thr, "embedding")
        monkeypatch.delenv("KGFORGE_SEMDEDUP_GRAM_ROWS")
        assert (a == b).all(), thr
        assert a.any()


def test_cluster_assign_columns(ray_session):
    df = _corpus(7)
    out = cluster_assign(rd.from_pandas(df), 2).to_pandas()
    assert {"cluster", "centroid_sim"} <= set(out.columns)
    assert out["cluster"].nunique() <= 2
    assert (out["centroid_sim"] <= 1.0 + 1e-6).all()
    # the two topics separate almost perfectly
    topic = out["vec_id"] < len(df) // 2
    dominant = out[topic]["cluster"].mode()[0]
    assert (out[topic]["cluster"] == dominant).mean() > 0.9


def test_semantic_dedup_empty_input(ray_session):
    """Upstream filters can empty the corpus; the clustered dedup must
    degrade to an empty result instead of train_centroids raising."""
    df = _corpus(proto_noise=3.0)
    ds = rd.from_pandas(df).map_batches(
        lambda t: t.slice(0, 0), batch_format="pyarrow"
    )
    assert semantic_dedup_drops(ds, threshold=0.9).count() == 0
    assert semantic_dedup(ds, threshold=0.9).count() == 0
    assigned = cluster_assign(ds)
    assert assigned.count() == 0
    schema = assigned.schema()
    if schema is not None:  # Ray may report no schema for all-empty datasets
        assert {"cluster", "centroid_sim"} <= set(schema.names)
