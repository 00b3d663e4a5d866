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


def completed_fingerprints(out_dir: str, status: str = "docs") -> dict[int, str]:
    """partition_id → recorded ``group_fp`` for completed partitions —
    the resume gate that makes a checkpoint row trustworthy only when
    the CURRENT input grouping matches the one it was built from."""
    t = read_ledger(out_dir)
    if t is None:
        return {}
    return {
        int(r["partition_id"]): (r.get("group_fp") or "")
        for r in t.to_pylist()
        if r["status"] == status and r["partition_id"] >= 0
    }


def group_fingerprint(group: "list[str]", params: str = "") -> str:
    """Fingerprint of a partition's exact input spec AND the settings
    that change what its checkpoint contains.  A resume only trusts a
    ledger row whose fingerprint matches the current grouping+settings:
    new files landing in the input dir, a different partition count, or
    changed filter thresholds would otherwise silently substitute a
    checkpoint built from the wrong inputs."""
    import hashlib

    payload = "\n".join(group) + "\0" + params
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


def write_parquet_always(ds, path: str, fallback_schema=None) -> None:
    """``write_parquet`` that always leaves a readable parquet directory:
    Ray writes ZERO files (and no directory) for an empty dataset, so an
    empty partition would otherwise break the atomic-publish rename (and
    any later read of the published dir) with FileNotFoundError.
    ``fallback_schema`` is used when even the dataset-level schema is
    gone (schema-less empty datasets)."""
    os.makedirs(path, exist_ok=True)
    if ds.count() > 0:
        ds.write_parquet(path)
        return
    schema = None
    try:
        schema = ds.schema().base_schema
    except Exception:
        schema = None
    if schema is None:
        schema = fallback_schema
    if schema is None:
        raise ValueError(
            "write_parquet_always: empty dataset with no schema and no "
            "fallback_schema to pin the empty parquet's columns"
        )
    pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))


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
    base = final_dir.rstrip("/")
    tmp = base + f".tmp-{os.getpid()}"
    import glob
    import shutil

    # sweep debris from crashed earlier attempts (stage dirs + displaced
    # old data whose swap never finished)
    for debris in glob.glob(base + ".tmp-*") + glob.glob(base + ".old-*"):
        shutil.rmtree(debris, ignore_errors=True)
    if writer is None:
        ds.write_parquet(tmp)
    else:
        writer(ds, tmp)
    if os.path.exists(final_dir):
        # rename-swap, NOT rmtree-then-replace: deleting the published
        # dir before the new one lands opens a crash window (possibly
        # minutes long for a big partition tree) where the checkpoint is
        # gone while its ledger row still claims completion.  The swap
        # narrows that to the instant between two renames, and a crash
        # there leaves the old data recoverable in the .old dir.
        old = base + f".old-{os.getpid()}"
        os.replace(final_dir, old)
        os.replace(tmp, final_dir)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.replace(tmp, final_dir)
