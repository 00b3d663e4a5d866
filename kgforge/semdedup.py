"""Embedding-cluster operators: k-means document clustering and
SemDeDup-style semantic deduplication (public-knowledge recipe:
cluster the corpus's embeddings, then drop near-identical pairs
WITHIN each cluster — the cross-cluster pairs a global O(N²) pass
would also catch are, by construction of the clustering, the distant
ones a threshold this high would not drop anyway).

Scale shape: the quantizer is trained once on a deterministic hash
sample (size-capped — see ``ann.train_centroids``) and broadcast;
assignment is one vectorized ``map_batches``; the dedup itself is a
``groupby(cluster).map_groups`` whose per-group work is one m×m Gram
matmul + a deterministic greedy scan.  Choose ``n_clusters`` so m
stays matmul-sized — the default targets ~1k rows per cluster
(``N/1024`` clusters), the published SemDeDup operating point; the ~√N
IVF sizing would leave √N-sized clusters whose m² blows up at corpus
scale.  Beyond ~10⁸ rows the driver-trained quantizer itself becomes
the bound (the training matmul is sample×k); at that point train the
codebook hierarchically (cluster a sample's sample, then refine per
coarse cell) and pass it through ``n_clusters``-trained centroids via
``ann.ivf_assign`` — the per-group dedup kernel is unchanged.

Pipelines on TEXT corpora compose this with the encoder protocol and
the Bloom-gated drop application so cost scales with the DROP rate,
not the corpus (`pipelines/curation.curate_corpus(semdedup_threshold=...)`):
embed a thin (id, text) projection, ``semantic_dedup_drops`` the thin
(id, embedding) table, then ``apply_drop_ds`` the ids against the full
corpus — the wide rows never shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .ann import _normalize, ivf_assign, train_centroids

#: per-cluster row count above which the greedy scan switches from ONE
#: m×m Gram matmul (fastest; m²·4 B ≤ 256 MB at the default) to an
#: incremental preallocated-buffer scan (same flops, O(m·d) memory).
GRAM_LIMIT = 8192


def _clustered(ds, n_clusters, *, vec_col, id_col, seed):
    """Materialize the input once (training + assignment are separate
    consumers of the lineage), train the codebook, and tag every row
    with its ``cluster`` id — no similarity column, which the dedup
    paths would only throw away."""
    ds = ds.materialize()
    n_rows = ds.count()
    if n_rows == 0:
        # empty survivor set (upstream filters can legitimately drop
        # everything): there is nothing to train on — short-circuit
        # with an empty clustered view instead of letting
        # train_centroids raise, so every consumer (dedup drops,
        # cluster_assign, cluster_sample, curation stage 4b) degrades
        # to an empty result like the rest of the pipeline stages
        empty = ds.map_batches(
            lambda t: t.append_column(
                "cluster", pa.nulls(t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
        return empty, np.zeros((1, 1), dtype=np.float32)
    if n_clusters is None:
        n_clusters = max(4, int(round(n_rows / 1024)))
    cent = train_centroids(
        ds, n_centroids=n_clusters, sample_mod=None,
        seed=seed, vec_col=vec_col, id_col=id_col,
    )
    assigned = ivf_assign(ds, cent, id_col=id_col, vec_col=vec_col)
    return assigned.map_batches(
        lambda t: t.rename_columns(
            [c if c != "ivf_cell" else "cluster" for c in t.column_names]
        ),
        batch_format="pyarrow",
    ), cent


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
    clustered, cent = _clustered(
        ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
    )

    def sim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("centroid_sim", pa.nulls(0, pa.float64()))
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
        cell = t["cluster"].to_numpy(zero_copy_only=False)
        s = np.einsum("ij,ij->i", mat, cent[cell]).astype(np.float64)
        return t.append_column("centroid_sim", pa.array(s, pa.float64()))

    return clustered.map_batches(sim, batch_format="pyarrow")


def cluster_sample(
    ds,
    k_per_cluster: int,
    *,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 3,
    by: str = "centroid_sim",
    descending: bool = True,
):
    """Cluster-balanced subsample (the DataComp / SSL-prototypes
    recipe): assign k-means clusters, keep at most ``k_per_cluster``
    rows per cluster — topic coverage survives aggressive downsampling
    where a uniform draw would follow the corpus's topic skew.

    ``by="centroid_sim"`` (default, descending) keeps each cluster's
    most PROTOTYPICAL members; order by a precomputed hash column with
    ``descending=False`` for an unbiased per-cluster draw.  ``id_col``
    breaks ties, so the pick is deterministic on any layout.  One
    groupby shuffle (``relops.top_k_per_group``); output schema equals
    the input schema."""
    if k_per_cluster <= 0:
        raise ValueError("k_per_cluster must be positive")
    from .relops import top_k_per_group

    if by == "centroid_sim":
        clustered = cluster_assign(
            ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
        )
        helper_cols = ["cluster", "centroid_sim"]
    else:
        # ordering by a caller-provided column: skip the centroid_sim
        # pass entirely (it re-decodes every embedding only to be
        # dropped below)
        clustered, _cent = _clustered(
            ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
        )
        helper_cols = ["cluster"]
    out = top_k_per_group(
        clustered, "cluster", [by, id_col], k_per_cluster,
        descending=[descending, False],
    )
    return out.map_batches(
        lambda t: t.drop_columns(helper_cols), batch_format="pyarrow",
    )


def _greedy_keep(df, threshold: float, vec_col: str) -> np.ndarray:
    """Deterministic SemDeDup scan over ONE cluster's frame (must be
    pre-sorted by id): a row is kept iff no already-kept row's cosine
    similarity exceeds the threshold.  Returns the keep mask.

    Cosines are clipped at 1.0: float32 dots of near-identical unit
    vectors can round just above it, which would make threshold=1.0
    drop rows whose true cosine is exactly 1 — a cosine is never > 1."""
    m = len(df)
    keep = np.zeros(m, dtype=bool)
    if m == 0:
        return keep
    mat = _normalize(
        np.asarray([np.asarray(v) for v in df[vec_col]], dtype=np.float32)
    )
    limit = int(os.environ.get("KGFORGE_SEMDEDUP_GRAM_ROWS", GRAM_LIMIT))
    kept: list[int] = []
    if m <= limit:
        # one BLAS call; the scan then only slices Gram rows (no d factor)
        gram = np.minimum(mat @ mat.T, 1.0)
        for i in range(m):
            if kept and gram[i, kept].max() > threshold:
                continue
            keep[i] = True
            kept.append(i)
    else:
        # same flops, O(m·d) memory: kept rows append into a
        # preallocated buffer (no per-row fancy-index re-copy)
        buf = np.empty_like(mat)
        n = 0
        for i in range(m):
            if n and min((buf[:n] @ mat[i]).max(), 1.0) > threshold:
                continue
            keep[i] = True
            buf[n] = mat[i]
            n += 1
    return keep


def _check_threshold(threshold: float) -> None:
    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be a cosine similarity in [-1, 1]")


def _dedup_groups(ds, threshold, n_clusters, vec_col, id_col, seed, project):
    """Shared SemDeDup plan: cluster, then per group sort-by-id, greedy
    scan, and ``project(df, keep_mask)`` — the ONLY difference between
    the keep-side and drop-side forms."""
    _check_threshold(threshold)
    clustered, _cent = _clustered(
        ds, n_clusters, vec_col=vec_col, id_col=id_col, seed=seed
    )

    def group_fn(df):
        df = df.sort_values(id_col, ignore_index=True)
        return project(df, _greedy_keep(df, threshold, vec_col))

    return clustered.groupby("cluster").map_groups(group_fn)


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
    return _dedup_groups(
        ds, threshold, n_clusters, vec_col, id_col, seed,
        lambda df, keep: df[keep].drop(columns=["cluster"]),
    )


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
    return _dedup_groups(
        ds, threshold, n_clusters, vec_col, id_col, seed,
        lambda df, keep: df[~keep][[id_col]],
    )
