"""Deterministic global shuffle + sharded output for training data.

The last step of a curation pipeline: write the corpus as N shards in
a globally shuffled, RUN-REPRODUCIBLE order.  ``random_shuffle()``
would do the data movement but its permutation is not a pure function
of (corpus, seed) across cluster layouts — and a 100 TB shuffle that
cannot be re-produced or resumed is an operational liability.  Instead
the permutation here is hash-derived per row:

    shard = splitmix64(hash(id) ^ seed) % n_shards
    pos   = splitmix64(hash(id) ^ seed ^ GOLDEN)   (intra-shard order)

so the full layout is a deterministic function of (ids, seed,
n_shards) — any re-run, any block layout, any cluster size produces
byte-identical shard contents.  One range sort on the thin (shard,
pos) pair is the only data movement (the same single all-to-all any
global shuffle must pay), and the output is hive-partitioned
``shard=K/`` directories so a failed write resumes per shard and
readers can stream shard-by-shard.  Epoch re-shuffles are just a new
seed — no new copy of the data is required if the consumer re-sorts,
but materializing per-epoch shards is one call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .relops import _splitmix64, sample_hash_u64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def assign_shards(
    ds,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "__shuffle_pos",
):
    """Annotate rows with their deterministic (shard, position) under
    the given seed.  Exposed separately so tests and consumers that
    stream (rather than write) can reuse the assignment."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)

    def assign(t: pa.Table) -> pa.Table:
        h = sample_hash_u64(t[id_col], seed=0)
        shard = (_splitmix64(h ^ s) % np.uint64(n_shards)).astype(np.int64)
        pos = _splitmix64(h ^ s ^ _GOLDEN).astype(np.int64)
        for c in (shard_col, pos_col):
            if c in t.column_names:
                t = t.drop_columns([c])
        t = t.append_column(shard_col, pa.array(shard, pa.int64()))
        return t.append_column(pos_col, pa.array(pos, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def shuffle_shard(
    ds,
    out_path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    max_rows_per_file: int | None = None,
):
    """Globally shuffle (deterministically, see module docstring) and
    write ``shard=K/`` hive partitions under ``out_path``.  Returns the
    written row count.  ``id_col`` values must be unique — the position
    hash ties are broken by ``id_col`` so even colliding hashes order
    stably."""
    assigned = assign_shards(ds, n_shards, id_col=id_col, seed=seed)
    ordered = assigned.sort(["shard", "__shuffle_pos", id_col]).drop_columns(
        ["__shuffle_pos"]
    )
    kwargs = {}
    if max_rows_per_file is not None:
        kwargs["max_rows_per_file"] = max_rows_per_file
    # overwrite mode: uuid-free ordered filenames are safe (Ray insists
    # on a uuid otherwise), and a re-run into the same path replaces the
    # previous epoch instead of silently mixing files with it
    ordered.write_parquet(
        out_path,
        partition_cols=["shard"],
        filename_provider=_OrderedFilenames(),
        mode="overwrite",
        **kwargs,
    )
    # row count from the WRITTEN files' parquet metadata — a ds.count()
    # here would re-execute the (possibly lazy) input lineage end to end
    import os

    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(out_path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


class _OrderedFilenames:
    """FilenameProvider whose lexicographic file order equals the
    logical (sorted) block order, so ``sorted(listdir)`` streams each
    shard in its deterministic shuffle order — the default uuid-prefixed
    names destroy that property."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        return f"part-{task_index:06d}-{block_index:06d}.parquet"

    def get_filename_for_row(self, row, write_uuid, task_index, block_index, row_index):
        return (
            f"part-{task_index:06d}-{block_index:06d}-{row_index:09d}.parquet"
        )


def read_sharded(path: str, *, shards: list[int] | None = None):
    """Read back shards written by ``shuffle_shard`` (all, or a subset
    for resumable / per-worker consumption)."""
    import ray.data as rd

    if shards is None:
        return rd.read_parquet(path)
    # Ray 2.49 read_parquet rejects directories inside an explicit path
    # LIST — expand each shard dir to its files (repo landmine note).
    # A shard that received zero rows has NO shard=k/ directory at all
    # (write_parquet only creates partitions it writes) — a per-worker
    # subset read must treat it as empty, not crash
    import os

    files = []
    for k in shards:
        d = os.path.join(path, f"shard={k}")
        if not os.path.isdir(d):
            continue
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    if not files:
        # schema-preserving empty read (limit(0) never loads row data)
        return rd.read_parquet(path).limit(0)
    return rd.read_parquet(files)
