"""Ledger-driven checkpoint/resume test (SURVEY §5.4.5): a run killed
after k partitions, resumed, must produce byte-identical triples to an
uninterrupted run, with no partition processed twice."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from kgforge.run import run_stage1, run_stage2
from kgforge.steps.ledger import completed_partitions, read_ledger

N_PAGES = 600
PARTS = 6


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("full"))
    run_stage1(out, N_PAGES, PARTS, resume=False, seed=42)
    run_stage2(out, seed=42)
    return out


@pytest.fixture(scope="module")
def resumed_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resumed"))
    # crash simulation: only the first 3 partitions complete...
    run_stage1(out, N_PAGES, PARTS, resume=False, seed=42, stop_after=3)
    # ...then the job restarts with --resume and the full input
    run_stage1(out, N_PAGES, PARTS, resume=True, seed=42)
    run_stage2(out, seed=42)
    return out


def _triples(out: str):
    return pq.read_table(os.path.join(out, "triples")).to_pandas().sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)


def test_resume_output_identical(full_run, resumed_run):
    a, b = _triples(full_run), _triples(resumed_run)
    assert a.equals(b), "resumed run diverges from uninterrupted run"


def test_no_partition_processed_twice(resumed_run):
    led = read_ledger(resumed_run).to_pylist()
    part_rows = [r for r in led if r["partition_id"] >= 0]
    ids = [r["partition_id"] for r in part_rows]
    assert sorted(ids) == sorted(set(ids)), "a partition has two ledger rows"
    assert completed_partitions(resumed_run, "docs") == set(range(PARTS))


def test_ledger_fields(full_run):
    led = read_ledger(full_run).to_pylist()
    parts = [r for r in led if r["partition_id"] >= 0]
    assert len(parts) == PARTS
    for r in parts:
        assert r["status"] == "docs"
        assert r["n_pages"] > 0 and r["n_docs"] > 0
        assert r["url_min"] <= r["url_max"]
        assert r["wall_s"] > 0
        assert r["engine_version"]
    summary = [r for r in led if r["partition_id"] == -1]
    assert len(summary) == 1 and summary[0]["status"] == "materialized"
    assert summary[0]["n_triples"] > 0


def test_resume_with_changed_params_refused(tmp_path):
    out = str(tmp_path)
    run_stage1(out, 200, 2, resume=False, seed=42)
    with pytest.raises(SystemExit, match="changed run parameters"):
        run_stage1(out, 400, 4, resume=True, seed=42)


def test_stage2_missing_checkpoint_dir_refused(tmp_path):
    out = str(tmp_path)
    run_stage1(out, 200, 2, resume=False, seed=42)
    shutil.rmtree(os.path.join(out, "docs", "part-1"))  # ledger row remains
    with pytest.raises(SystemExit, match="part-1.*missing|missing"):
        run_stage2(out, seed=42)


def test_cli_triples_match_flagship(full_run):
    """ADVICE r1: run_stage2 must apply the same corpus-prior
    disambiguation pass as run_flagship — CLI triples and library
    flagship triples over the same corpus must be identical."""
    from kgforge.corpus import pages_dataset
    from kgforge.pipelines.flagship import run_flagship

    res = run_flagship(pages_dataset(N_PAGES, parallelism=4))
    a = res.triples.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = _triples(full_run)
    assert a.equals(b), "CLI stage-2 triples diverge from run_flagship"


def test_crash_debris_is_overwritten(tmp_path):
    """A crash between the staged write and the atomic rename leaves a
    .tmp dir and no ledger row; a resumed run must re-process that
    partition cleanly and ignore/replace the debris."""
    out = str(tmp_path)
    run_stage1(out, 200, 2, resume=False, seed=42)
    # simulate debris from a crashed partition-1 attempt + lost ledger row
    debris = os.path.join(out, "docs", "part-1.tmp-99999")
    os.makedirs(debris, exist_ok=True)
    with open(os.path.join(debris, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    os.remove(os.path.join(out, "ledger", "part-1.parquet"))
    shutil.rmtree(os.path.join(out, "docs", "part-1"))
    # resume: partition 0 skipped, partition 1 rebuilt
    run_stage1(out, 200, 2, resume=True, seed=42)
    assert completed_partitions(out, "docs") == {0, 1}
    n = run_stage2(out, seed=42)
    assert n > 0
