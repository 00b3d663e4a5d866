"""Parquet lineage ledger + checkpoint/resume (SURVEY §2.S4-S5, §4.1).

The checkpoint unit is an INPUT PARTITION (a page-id range here; a
parquet-fragment/url range in production). Stage 1 (the 100 TB-heavy
extraction) writes each partition's docs to
``out/docs/part-<K>/`` atomically (tmp dir + rename) and appends one
ledger row ``out/ledger/part-<K>.parquet``; a resumed run skips
partitions whose ledger row exists with status='docs'. The global
shuffle stages (dedup/link/materialize) re-run from the checkpointed
docs — they are orders of magnitude cheaper than extraction and land in
``out/triples/`` with a status='materialized' summary row.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from .. import ENGINE_VERSION
from ..schemas import LEDGER


def ledger_row(
    partition_id: int,
    url_min: str,
    url_max: str,
    epoch: int,
    n_pages: int,
    n_docs: int,
    n_triples: int,
    status: str,
    wall_s: float,
    group_fp: str = "",
) -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([partition_id], pa.int32()),
            "url_min": pa.array([url_min], pa.string()),
            "url_max": pa.array([url_max], pa.string()),
            "epoch": pa.array([epoch], pa.int64()),
            "n_pages": pa.array([n_pages], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_triples": pa.array([n_triples], pa.int64()),
            "status": pa.array([status], pa.string()),
            "wall_s": pa.array([wall_s], pa.float64()),
            "engine_version": pa.array([ENGINE_VERSION], pa.string()),
            "group_fp": pa.array([group_fp], pa.string()),
        },
        schema=LEDGER,
    )


def write_ledger_row(out_dir: str, row: pa.Table, name: str) -> None:
    ldir = os.path.join(out_dir, "ledger")
    os.makedirs(ldir, exist_ok=True)
    tmp = os.path.join(ldir, f".tmp-{name}-{os.getpid()}-{time.monotonic_ns()}.parquet")
    pq.write_table(row, tmp)
    os.replace(tmp, os.path.join(ldir, f"{name}.parquet"))  # atomic publish


def read_ledger(out_dir: str) -> pa.Table | None:
    ldir = os.path.join(out_dir, "ledger")
    if not os.path.isdir(ldir):
        return None
    files = sorted(
        os.path.join(ldir, f) for f in os.listdir(ldir) if f.endswith(".parquet") and not f.startswith(".")
    )
    if not files:
        return None
    # promote: ledgers written before the group_fp column gained it read
    # back with nulls instead of a concat schema error
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )


def completed_partitions(out_dir: str, status: str = "docs") -> set[int]:
    t = read_ledger(out_dir)
    if t is None:
        return set()
    return {
        int(r["partition_id"])
        for r in t.to_pylist()
        if r["status"] == status and r["partition_id"] >= 0
    }


def current_epoch(out_dir: str) -> int:
    t = read_ledger(out_dir)
    if t is None or t.num_rows == 0:
        return 0
    return max(int(r["epoch"]) for r in t.to_pylist())


def atomic_write_parquet(ds, final_dir: str, writer=None) -> None:
    """Write a Dataset to ``final_dir`` atomically: stage into a sibling
    tmp dir, then rename. A crashed write leaves only a .tmp dir a resumed
    run ignores and overwrites.

    This is the ONE copy of the crash-safety-critical publish sequence;
    callers that need a different physical write (e.g. curate.py's
    empty-dataset fallback) pass ``writer(ds, tmp_dir)`` instead of
    re-implementing the staging protocol."""
    parent = os.path.dirname(final_dir.rstrip("/"))
    os.makedirs(parent, exist_ok=True)
    tmp = final_dir.rstrip("/") + f".tmp-{os.getpid()}"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if writer is None:
        ds.write_parquet(tmp)
    else:
        writer(ds, tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)
