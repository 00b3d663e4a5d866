"""Embedding-cluster operators: k-means document clustering and
SemDeDup-style semantic deduplication (public-knowledge recipe:
cluster the corpus's embeddings, then drop near-identical pairs
WITHIN each cluster — the cross-cluster pairs a global O(N²) pass
would also catch are, by construction of the clustering, the distant
ones a threshold this high would not drop anyway).

Scale shape: the quantizer is trained once on a deterministic hash
sample and broadcast (`ann.train_centroids`); assignment is one
vectorized ``map_batches``; the dedup itself is a
``groupby(cluster).map_groups`` whose per-group work is an m×m
similarity matmul + a deterministic greedy scan.  Choose ``n_clusters``
so m stays matmul-sized — the default targets ~1k rows per cluster
(``N/1024`` clusters), the published SemDeDup operating point; the ~√N
IVF sizing would leave √N-sized clusters whose m² blows up at corpus
scale.

Pipelines on TEXT corpora compose this with the encoder protocol and
the Bloom-gated drop application so cost scales with the DROP rate,
not the corpus (`pipelines/curation.curate_corpus(semdedup_threshold=...)`):
embed a thin (id, text) projection, ``semantic_dedup_drops`` the thin
(id, embedding) table, then ``apply_drop_ds`` the ids against the full
corpus — the wide rows never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _normalize, ivf_assign, train_centroids


def cluster_assign(
    ds,
    n_clusters: int | None = None,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 3,
):
    """Annotate rows with ``cluster`` (nearest k-means centroid) and
    ``centroid_sim`` (cosine similarity to it).  ``n_clusters=None`` →
    ~N/1024 clusters (min 4).

    The input is materialized once up front: centroid training and the
    assignment pass are separate consumers, and on a lazy input the
    upstream lineage would otherwise re-execute per consumer (same
    hazard ``ivf_build`` guards against)."""
    ds = ds.materialize()
    if n_clusters is None:
        n_clusters = max(4, int(round(ds.count() / 1024)))
    cent = train_centroids(
        ds, n_centroids=n_clusters, sample_mod=None,
        seed=seed, vec_col=vec_col, id_col=id_col,
    )
    assigned = ivf_assign(ds, cent, id_col=id_col, vec_col=vec_col)

    def sim(t: pa.Table) -> pa.Table:
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
        cell = t["ivf_cell"].to_numpy(zero_copy_only=False)
        s = np.einsum("ij,ij->i", mat, cent[cell]).astype(np.float64)
        t = t.rename_columns(
            [c if c != "ivf_cell" else "cluster" for c in t.column_names]
        )
        return t.append_column("centroid_sim", pa.array(s, pa.float64()))

    return assigned.map_batches(sim, batch_format="pyarrow")


def _greedy_keep(df, threshold: float, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic SemDeDup scan over ONE cluster's frame (must be
    pre-sorted by ``id_col``): a row is kept iff no already-kept row's
    cosine similarity exceeds the threshold.  Returns the keep mask."""
    mat = _normalize(
        np.asarray([np.asarray(v) for v in df[vec_col]], dtype=np.float32)
    )
    m = len(df)
    keep = np.zeros(m, dtype=bool)
    kept_rows: list[int] = []
    for i in range(m):
        # clip: float32 dots of near-identical unit vectors can round
        # to just above 1.0, which would make threshold=1.0 drop rows
        # whose true cosine is exactly 1 — a cosine is never > 1
        if kept_rows and min(
            (mat[kept_rows] @ mat[i]).max(), 1.0
        ) > threshold:
            continue
        keep[i] = True
        kept_rows.append(i)
    return keep


def _check_threshold(threshold: float) -> None:
    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be a cosine similarity in [-1, 1]")


def semantic_dedup(
    ds,
    threshold: float = 0.95,
    *,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 3,
):
    """Drop rows whose embedding has cosine similarity > ``threshold``
    to an already-kept row of the SAME cluster (SemDeDup).  The keeper
    per near-duplicate group is deterministic: rows are scanned in
    ascending ``id_col`` order and a row is kept iff no kept row is
    above the threshold — independent of block layout or cluster count
    WITHIN a cluster (the clustering itself decides which pairs are
    even compared; same seed → same clustering).  Output schema equals
    the input schema."""
    _check_threshold(threshold)
    clustered = cluster_assign(
        ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
    )

    def dedupe(df):
        df = df.sort_values(id_col, ignore_index=True)
        keep = _greedy_keep(df, threshold, id_col, vec_col)
        return df[keep].drop(columns=["cluster", "centroid_sim"])

    return clustered.groupby("cluster").map_groups(dedupe)


def semantic_dedup_drops(
    ds,
    threshold: float = 0.95,
    *,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 3,
):
    """Drop-side form of ``semantic_dedup``: a one-column Dataset of
    the ``id_col`` values the same greedy scan would REMOVE.  The
    pipeline-facing shape — at web dup rates the drop side is a small
    fraction of the corpus, so applying it with ``apply_drop_ds``
    (broadcast ``is_in`` below the threshold, Bloom + anti-join above)
    moves O(dropped) rows where the keep-side form would re-emit every
    survivor through the groupby."""
    _check_threshold(threshold)
    clustered = cluster_assign(
        ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
    )

    def drops(df):
        df = df.sort_values(id_col, ignore_index=True)
        keep = _greedy_keep(df, threshold, id_col, vec_col)
        return df[~keep][[id_col]]

    return clustered.groupby("cluster").map_groups(drops)
