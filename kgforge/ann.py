"""Similarity search over an embedding column (task brief): brute-force
cosine top-k as the exact baseline (numpy matmul per batch against a
broadcast query matrix, per-batch partial top-k, driver merge), and an
IVF (inverted-file) variant as the scale path: coarse k-means centroids
learned from a seeded sample, rows bucketed by nearest centroid, queries
probe only the closest ``nprobe`` cells.
"""

from __future__ import annotations

import os

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
    if part.empty:
        if {"query_idx", id_col, "cosine"}.issubset(part.columns):
            out0 = part.copy()
            out0["rank"] = pd.Series(dtype="int64")
            return out0
        # an empty Dataset→pandas round trip can drop the columns too —
        # synthesize the contract columns (int64 id is the common case;
        # a string-id caller concatenating empties should pass through
        # the columns-preserving branch above)
        return pd.DataFrame(
            {"query_idx": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64"), "rank": pd.Series(dtype="int64")}
        )
    out = []
    for _qi, grp in part.groupby("query_idx"):
        g = grp.sort_values(["cosine", id_col], ascending=[False, True])
        # a multi-assigned index (assign_top > 1) probes the same row in
        # more than one cell: identical (id, cosine) duplicates must not
        # occupy two rank slots
        g = g.drop_duplicates(subset=[id_col]).head(k).copy()
        g["rank"] = range(1, len(g) + 1)
        out.append(g)
    return pd.concat(out, ignore_index=True)


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


def _kmeanspp_seed(mat: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    """k-means++ seeding over normalized vectors (distance = 1 - cosine):
    each next centroid is sampled proportional to its distance from the
    nearest already-chosen one.  Deterministic given (mat order, seed).
    Cost ≈ one Lloyd iteration (k sequential sample·dim dot products) —
    and it removes the split-cluster/empty-cell codebooks uniform random
    seeding produces, which were the IVF recall ceiling (r4 bench:
    recall@10 = 0.64 at nprobe 8)."""
    n = len(mat)
    cent = np.empty((k, mat.shape[1]), dtype=mat.dtype)
    cent[0] = mat[int(rng.randint(n))]
    d2 = np.maximum(1.0 - mat @ cent[0], 0.0)
    for i in range(1, k):
        tot = float(d2.sum())
        if tot <= 0.0:  # all points coincide with a chosen centroid
            idx = int(rng.randint(n))
        else:
            idx = int(rng.choice(n, p=d2 / tot))
        cent[i] = mat[idx]
        d2 = np.minimum(d2, np.maximum(1.0 - mat @ cent[i], 0.0))
    return cent


def train_centroids(ds, n_centroids: int | None = 16, sample_mod: int | None = 5,
                    seed: int = 3, iters: int = 12, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Seeded mini k-means on a DETERMINISTIC hash-based sample (id-hash
    % sample_mod == 0 → ~1/sample_mod of rows; `Dataset.random_sample`
    varies with block layout, which made the quantizer nondeterministic
    across processes). The quantizer is small, trained once, broadcast.

    ``n_centroids=None`` sizes the codebook at ~√N (the classic IVF
    sizing: ~√N cells × ~√N rows/cell balances probe cost against scan
    cost); ``sample_mod=None`` then picks the modulus so the training
    sample is ~64 rows per centroid, CAPPED at
    ``KGFORGE_CENTROID_SAMPLE_CAP`` rows (default 2²⁰ ≈ 1 M — the
    sample is the only driver-materialized structure; without the cap a
    large-k caller like semdedup's N/1024 sizing would gather N/16 rows
    onto the driver)."""
    if n_centroids is None or sample_mod is None:
        n_rows = ds.count()
        if n_centroids is None:
            n_centroids = max(16, int(round(np.sqrt(max(n_rows, 1)))))
        if sample_mod is None:
            cap = int(os.environ.get("KGFORGE_CENTROID_SAMPLE_CAP", 1 << 20))
            sample_mod = max(1, n_rows // max(min(64 * n_centroids, cap), 1))
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
    cent = _kmeanspp_seed(mat, min(n_centroids, len(mat)), rng)
    # segment-mean update via per-dimension bincount — the per-centroid
    # Python loop it replaces was O(k·sample) masked scans per
    # iteration, which dominates at √N (k≈31k) and larger codebooks
    k = len(cent)
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        counts = np.bincount(assign, minlength=k)
        sums = np.stack(
            [np.bincount(assign, weights=mat[:, j], minlength=k)
             for j in range(mat.shape[1])],
            axis=1,
        )
        nz = counts > 0
        v = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(v, axis=1)
        ok = norms > 0
        cent[np.flatnonzero(nz)[ok]] = (v[ok] / norms[ok, None]).astype(
            np.float32
        )
    return cent


def ivf_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding", assign_top: int = 1):
    """Add the IVF cell id (nearest centroid) — the partitioning column a
    100 TB index would shuffle/write by.

    ``assign_top > 1`` replicates each row into its ``assign_top``
    nearest cells (FAISS-style spilled assignment): Voronoi boundary
    rows — where most recall loss lives — become reachable from either
    side's probe, raising recall@k at a FIXED nprobe for assign_top×
    index storage (measured on the sf0.1 embeddings: recall@10 at
    nprobe=8/45 cells 0.64 → 0.90 at assign_top=3).  Search results
    stay exact w.r.t. the probed union: the shared driver merge
    deduplicates the replicated rows."""
    cent = centroids
    a_top = max(1, int(assign_top))

    def f(t: pa.Table) -> pa.Table:
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
        if a_top == 1:
            cell = (mat @ cent.T).argmax(axis=1)
            return t.append_column("ivf_cell", pa.array(cell, pa.int64()))
        kk = min(a_top, len(cent))
        sims = mat @ cent.T
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (n, kk), unordered
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), kk)
        rep = t.take(pa.array(idx))
        return rep.append_column(
            "ivf_cell", pa.array(top.reshape(-1), pa.int64())
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _probe_topk(assigned, q: np.ndarray, probe_cells: np.ndarray, k: int,
                id_col: str, vec_col: str, dtype) -> pd.DataFrame:
    """Per-batch exact top-k inside the probed cells of an
    (ivf_cell-tagged) dataset + the shared driver merge — the one kernel
    both the streaming ``ivf_topk`` and the persisted-index
    ``ivf_search_index`` funnel through (identical tie order →
    identical results)."""
    nq = q.shape[0]
    cell_sets = [np.sort(probe_cells[qi]) for qi in range(nq)]

    def batch_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        cells = t["ivf_cell"].to_numpy()
        mat = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=dtype))
        qi_out, id_out, c_out = [], [], []
        for qi in range(nq):
            mask = np.isin(cells, cell_sets[qi])
            if not mask.any():
                continue
            cos = mat[mask] @ q[qi]
            sub_ids = ids[mask]
            # same (-cos, id) tie order as brute_force_topk
            order = np.lexsort((sub_ids, -cos))
            # a multi-assigned index (assign_top > 1) can replicate the
            # same row into two probed cells of ONE batch; replicas must
            # not occupy top-k slots here — the driver merge dedups them
            # and would then return fewer than k rows from this batch,
            # dropping true neighbors ranked just past the cut
            _, first = np.unique(sub_ids[order], return_index=True)
            top = order[np.sort(first)[: min(k, len(first))]]
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

    part = assigned.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    return _driver_merge(part, k, id_col)


def ivf_topk(ds, centroids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             dtype=np.float32, assign_top: int = 1) -> pd.DataFrame:
    """IVF search over a STREAMING (un-persisted) dataset: filter to the
    nprobe cells nearest each query, then exact cosine within those
    cells only. With ``nprobe == len(centroids)`` every cell is probed,
    making the result exact (equal to brute force) — that configuration
    drives the SQL-verified driver query.  For a corpus worth indexing
    once and probing many times, build the cell-partitioned layout with
    ``ivf_build`` and search with ``ivf_search_index`` — that path
    prunes READS, not just the stream."""
    q = _normalize(np.asarray(query_vecs, dtype=dtype))
    probe_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted: set[int] = set(probe_cells.flatten().tolist())
    assigned = ivf_assign(ds, centroids, id_col, vec_col, assign_top=assign_top)
    import pyarrow.compute as pc

    cells_arr = pa.array(sorted(wanted), pa.int64())
    pruned = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=cells_arr)),
        batch_format="pyarrow",
    )
    return _probe_topk(pruned, q, probe_cells, k, id_col, vec_col, dtype)


# ---------------------------------------------------------------------------
# persisted cell-partitioned index (the 100 TB path)
# ---------------------------------------------------------------------------


def ivf_build(ds, path: str, n_centroids: int | None = None, *,
              sample_mod: int | None = None, seed: int = 3,
              id_col: str = "vec_id", vec_col: str = "embedding",
              overwrite: bool = False, assign_top: int = 1) -> np.ndarray:
    """Build the persisted IVF index: train a ~√N quantizer, tag every
    row with its nearest-centroid cell, and write hive-partitioned
    parquet (``<path>/cells/ivf_cell=<c>/``) so a probe READS only its
    cells — scan pruning at the storage layer, not a filter over the
    full stream.  The centroid codebook lands next to the cells
    (``<path>/centroids.parquet``).  Returns the centroids.

    One directory per cell also makes the build resumable/appendable in
    the usual partitioned-parquet way (task-brief 'resumable output') —
    but ONLY with identical centroids: Ray's ``write_parquet`` never
    deletes, so rebuilding into a populated ``<path>/cells`` would leave
    the old files next to the new ones while ``centroids.parquet`` is
    silently overwritten, and every later probe would return
    duplicate/stale rows.  A non-empty ``cells/`` therefore fails fast;
    pass ``overwrite=True`` to delete and rebuild."""
    import shutil

    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    cells_dir = f"{path}/cells"
    if "://" not in path and os.path.isdir(cells_dir) and os.listdir(cells_dir):
        if not overwrite:
            raise FileExistsError(
                f"{cells_dir} already holds an index; write_parquet appends, so a "
                "rebuild would mix stale cells with new centroids. Pass "
                "overwrite=True (deletes it), or append only with the ORIGINAL "
                "centroids via ivf_assign(...).write_parquet(...)"
            )
        shutil.rmtree(cells_dir)
    elif "://" in path:
        filesystem, root = pafs.FileSystem.from_uri(path)
        sel = pafs.FileSelector(f"{root}/cells", recursive=True, allow_not_found=True)
        if any(fi.is_file for fi in filesystem.get_file_info(sel)):
            if not overwrite:
                raise FileExistsError(
                    f"{path}/cells already holds an index (see local-path message)"
                )
            filesystem.delete_dir(f"{root}/cells")

    # one materialize up front: train_centroids(n_centroids=None) counts,
    # sampling re-consumes, and the assignment pass consumes again — on a
    # lazy input the upstream lineage would execute up to three times
    ds = ds.materialize()
    centroids = train_centroids(
        ds, n_centroids, sample_mod, seed=seed, vec_col=vec_col, id_col=id_col
    )
    # assign_top > 1 writes each row into its top-A cell dirs (see
    # ivf_assign: A× storage for boundary-row recall at fixed nprobe)
    assigned = ivf_assign(ds, centroids, id_col, vec_col, assign_top=assign_top)
    assigned.write_parquet(f"{path}/cells", partition_cols=["ivf_cell"])
    dim = centroids.shape[1]
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(len(centroids)), pa.int64()),
                "centroid": pa.array(
                    [c.tolist() for c in centroids], pa.list_(pa.float32(), dim)
                ),
            }
        ),
        f"{path}/centroids.parquet",
    )
    return centroids


def load_centroids(path: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{path}/centroids.parquet")
    return np.asarray(t["centroid"].to_pylist(), dtype=np.float32)


def ivf_search_index(path: str, query_vecs: np.ndarray, k: int = 10,
                     nprobe: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding", dtype=np.float32) -> pd.DataFrame:
    """Search a persisted ``ivf_build`` index: only the union of each
    query's ``nprobe`` nearest cell DIRECTORIES is read from storage
    (hive-partitioned layout → the un-probed ~(1 - nprobe/√N) of the
    corpus never leaves disk).  Funnels through the same probe kernel as
    ``ivf_topk``, so ``nprobe == n_centroids`` is exact-equal to brute
    force."""
    import ray.data as rd
    from pyarrow import fs as pafs

    centroids = load_centroids(path)
    q = _normalize(np.asarray(query_vecs, dtype=dtype))
    nprobe = min(nprobe, len(centroids))
    probe_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted(set(probe_cells.flatten().tolist()))
    # Ray 2.49 read_parquet takes a LIST of files, not directories —
    # expand each probed cell dir through pyarrow.fs so remote URIs
    # (s3://…) list correctly too (os.path.isdir is always False there,
    # which would silently return 0 matches)
    if "://" in path:
        filesystem, root = pafs.FileSystem.from_uri(path)
    else:
        filesystem, root = pafs.LocalFileSystem(), path
    files: list[str] = []
    for c in wanted:
        sel = pafs.FileSelector(f"{root}/cells/ivf_cell={c}", allow_not_found=True)
        files.extend(
            sorted(
                fi.path
                for fi in filesystem.get_file_info(sel)
                if fi.is_file and fi.path.endswith(".parquet")
            )
        )
    if not files:
        return pd.DataFrame(
            {"query_idx": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype=np.dtype(dtype)), "rank": pd.Series(dtype="int64")}
        )
    ds = rd.read_parquet(files, filesystem=filesystem if "://" in path else None)
    names = ds.schema().base_schema.names if ds.schema() else []
    if "ivf_cell" in names:
        # hive partition values deserialize as STRINGS — cast back
        import pyarrow.compute as pc

        assigned = ds.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("ivf_cell"),
                "ivf_cell",
                pc.cast(t["ivf_cell"], pa.int64()),
            ),
            batch_format="pyarrow",
        )
    else:
        # layout without the hive column — re-derive the cell tag from
        # the (broadcast) codebook; deterministic, so tags match the build
        assigned = ivf_assign(ds, centroids, id_col, vec_col)
    return _probe_topk(assigned, q, probe_cells, k, id_col, vec_col, dtype)


def ivf_recall_report(ds, query_vecs: np.ndarray, k: int = 10,
                      nprobes: tuple[int, ...] = (1, 2, 4, 8),
                      n_centroids: int | None = None, seed: int = 3,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      assign_top: int = 1) -> pd.DataFrame:
    """recall@k vs nprobe against the exact brute-force ground truth:
    one row per nprobe with mean recall and the fraction of cells
    probed.  The tuning artifact a 100 TB similarity-search deployment
    reads before picking nprobe (reported in BASELINE.md)."""
    # ONE execution of the upstream lineage: truth, quantizer training
    # and every nprobe probe all read the materialized blocks
    mat = ds.materialize()
    truth = brute_force_topk(mat, query_vecs, k, id_col, vec_col, dtype=np.float64)
    truth_sets = {
        int(qi): set(g[id_col].tolist())
        for qi, g in truth.groupby("query_idx")
    }
    centroids = train_centroids(mat, n_centroids, None if n_centroids is None else 5,
                                seed=seed, vec_col=vec_col, id_col=id_col)
    rows = []
    for np_ in nprobes:
        np_eff = min(int(np_), len(centroids))
        # float64 on BOTH sides: a float32 probe can tie-break k-boundary
        # cosines differently than the float64 truth and report <1.0
        # recall even at nprobe = n_centroids
        got = ivf_topk(mat, centroids, query_vecs, k, np_eff, id_col, vec_col,
                       dtype=np.float64, assign_top=assign_top)
        recalls = []
        for qi, want in truth_sets.items():
            have = set(got.loc[got["query_idx"] == qi, id_col].tolist())
            recalls.append(len(have & want) / max(len(want), 1))
        rows.append(
            {
                "nprobe": np_eff,
                "n_centroids": len(centroids),
                "recall_at_k": float(np.mean(recalls)) if recalls else 0.0,
                "cells_probed_frac": np_eff / len(centroids),
            }
        )
    return pd.DataFrame(rows)
