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
scale."""

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
    ~N/1024 clusters (min 4)."""
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
    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be a cosine similarity in [-1, 1]")
    clustered = cluster_assign(
        ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
    )

    def dedupe(df):
        df = df.sort_values(id_col, ignore_index=True)
        mat = _normalize(
            np.asarray([np.asarray(v) for v in df[vec_col]], dtype=np.float32)
        )
        m = len(df)
        keep = np.zeros(m, dtype=bool)
        kept_rows: list[int] = []
        for i in range(m):
            if kept_rows and (mat[kept_rows] @ mat[i]).max() > threshold:
                continue
            keep[i] = True
            kept_rows.append(i)
        return df[keep].drop(columns=["cluster", "centroid_sim"])

    return clustered.groupby("cluster").map_groups(dedupe)
