"""Similarity search over an embedding column (task brief): brute-force
cosine top-k as the exact baseline (numpy matmul per batch against a
broadcast query matrix, per-batch partial top-k, driver merge), and an
IVF (inverted-file) variant as the scale path: coarse k-means centroids
learned from a seeded sample, rows bucketed by nearest centroid, queries
probe only the closest ``nprobe`` cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1, norms)


def _driver_merge(part: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    """Merge per-batch partial top-k rows into the global per-query top-k.
    The (-cosine, id) tie order here is the CONTRACT both brute-force and
    IVF search share — IVF at nprobe=all is exact-equal to brute force
    (and to the min-id SQL oracle) only because both funnel through this
    single implementation."""
    out = []
    for _qi, grp in part.groupby("query_idx"):
        g = grp.sort_values(["cosine", id_col], ascending=[False, True]).head(k).copy()
        g["rank"] = range(1, len(g) + 1)
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else part.assign(rank=[])


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dtype=np.float32) -> pd.DataFrame:
    """Exact cosine top-k for each query row: returns (query_idx, vec_id,
    cosine, rank). query_vecs is broadcast via closure (small side).
    ``dtype=np.float64`` gives rank order stable against the DuckDB
    double-precision oracle (float32 is the memory-right scale default)."""
    q = _normalize(np.asarray(query_vecs, dtype=dtype))
    nq = q.shape[0]

    def batch_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=dtype))
        cos = mat @ q.T  # (n, nq)
        qi_out, id_out, c_out = [], [], []
        kk = min(k, len(ids))
        for qi in range(nq):
            # (-cos, id) order INSIDE the batch too: a cosine tie cut at
            # the partial-top-k boundary must drop the same row the
            # driver merge (and the min-id oracle) would drop
            top = np.lexsort((ids, -cos[:, qi]))[:kk]
            qi_out.extend([qi] * len(top))
            id_out.extend(ids[top].tolist())
            c_out.extend(cos[top, qi].tolist())
        return pa.table(
            {
                "query_idx": pa.array(qi_out, pa.int64()),
                id_col: pa.array(id_out, pa.int64()),
                "cosine": pa.array(c_out, pa.from_numpy_dtype(np.dtype(dtype))),
            }
        )

    part = ds.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    return _driver_merge(part, k, id_col)


def train_centroids(ds, n_centroids: int = 16, sample_mod: int = 5,
                    seed: int = 3, iters: int = 8, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Seeded mini k-means on a DETERMINISTIC hash-based sample (id-hash
    % sample_mod == 0 → ~1/sample_mod of rows; `Dataset.random_sample`
    varies with block layout, which made the quantizer nondeterministic
    across processes). The quantizer is small, trained once, broadcast."""
    import pyarrow as pa_
    import pyarrow.compute as pc_

    from .extract_core import stable_u64

    def pick(t: pa_.Table) -> pa_.Table:
        keep = [
            stable_u64(str(v), "ivfsample") % sample_mod == 0
            for v in t[id_col].to_pylist()
        ]
        return t.select([id_col, vec_col]).filter(pa_.array(keep))

    # take_all row order follows streaming completion order (Ray Data
    # defaults to preserve_order=False), so sort the sample by id before
    # seeding k-means — otherwise rng.choice picks DIFFERENT vectors per
    # run and the quantizer (hence IVF recall) is nondeterministic.
    sample = sorted(
        ds.map_batches(pick, batch_format="pyarrow").take_all(),
        key=lambda r: r[id_col],
    )
    if not sample:
        # small tables can miss the 1/sample_mod hash entirely — fall back
        # to sampling every row, capped (deterministic: sorted by id)
        sample = sorted(
            ds.select_columns([id_col, vec_col]).take_all(),
            key=lambda r: r[id_col],
        )[: max(4096, 16 * n_centroids)]
    if not sample:
        raise ValueError("train_centroids: dataset has no rows")
    mat = _normalize(np.asarray([r[vec_col] for r in sample], dtype=np.float32))
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_assign(ds, centroids: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Add the IVF cell id (nearest centroid) — the partitioning column a
    100 TB index would shuffle/write by."""
    cent = centroids

    def f(t: pa.Table) -> pa.Table:
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
        cell = (mat @ cent.T).argmax(axis=1)
        return t.append_column("ivf_cell", pa.array(cell, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def ivf_topk(ds, centroids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             dtype=np.float32) -> pd.DataFrame:
    """IVF search: filter to the nprobe cells nearest each query, then
    exact cosine within those cells only. With ``nprobe == len(centroids)``
    every cell is probed, making the result exact (equal to brute force) —
    that configuration drives the SQL-verified driver query."""
    q = _normalize(np.asarray(query_vecs, dtype=dtype))
    probe_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted: set[int] = set(probe_cells.flatten().tolist())
    assigned = ivf_assign(ds, centroids, id_col, vec_col)
    import pyarrow.compute as pc

    cells_arr = pa.array(sorted(wanted), pa.int64())
    pruned = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=cells_arr)),
        batch_format="pyarrow",
    )
    nq = q.shape[0]
    cell_sets = [set(probe_cells[qi].tolist()) for qi in range(nq)]

    def batch_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        cells = t["ivf_cell"].to_numpy()
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=dtype))
        qi_out, id_out, c_out = [], [], []
        for qi in range(nq):
            mask = np.isin(cells, list(cell_sets[qi]))
            if not mask.any():
                continue
            cos = mat[mask] @ q[qi]
            sub_ids = ids[mask]
            # same (-cos, id) tie order as brute_force_topk
            top = np.lexsort((sub_ids, -cos))[: min(k, mask.sum())]
            qi_out.extend([qi] * len(top))
            id_out.extend(sub_ids[top].tolist())
            c_out.extend(cos[top].tolist())
        return pa.table(
            {
                "query_idx": pa.array(qi_out, pa.int64()),
                id_col: pa.array(id_out, pa.int64()),
                "cosine": pa.array(c_out, pa.from_numpy_dtype(np.dtype(dtype))),
            }
        )

    part = pruned.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    return _driver_merge(part, k, id_col)
