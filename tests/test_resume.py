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


def _pages_table(rows):
    import pyarrow as pa

    from datetime import datetime

    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([datetime(2024, 1, 1)] * len(rows),
                            pa.timestamp("us")),
        "html": pa.array(
            [f"<html><body><p>{r[1]}</p></body></html>" for r in rows],
            pa.string()),
        "text": pa.array([None] * len(rows), pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })


def test_empty_partition_checkpoints_and_resumes(ray_session, tmp_path):
    """A partition whose pages all filter out must still publish an
    (empty) checkpoint + ledger row — the run used to crash renaming a
    tmp dir Ray never created, and crash identically on every resume."""
    import pyarrow.parquet as pq

    from kgforge.steps.ledger import completed_partitions

    in_dir = tmp_path / "pages"
    in_dir.mkdir()
    pq.write_table(_pages_table(
        [(f"http://de.site/{i}", f"der text nummer {i}", "de")
         for i in range(4)]), str(in_dir / "a.parquet"))
    pq.write_table(_pages_table(
        [(f"http://en.site/{i}",
          f"The article {i} is about the Example Corp in the city.", "en")
         for i in range(4)]), str(in_dir / "b.parquet"))
    out = str(tmp_path / "out")
    run_stage1(out, 0, 2, resume=False, seed=42, input_dir=str(in_dir))
    assert completed_partitions(out, "docs") == {0, 1}
    # the empty partition's dir is readable parquet with the docs schema
    t = pq.read_table(str(tmp_path / "out" / "docs" / "part-0"))
    assert t.num_rows == 0 and "extracted_text" in t.schema.names
    # stage 2 + a full resume both run clean
    run_stage1(out, 0, 2, resume=True, seed=42, input_dir=str(in_dir))
    n = run_stage2(out, seed=42)
    assert n >= 0


def test_fresh_rerun_with_fewer_partitions_purges_stale(ray_session, tmp_path):
    """A non-resume rerun into the same --out with fewer partitions must
    not mix the previous run's extra part-K checkpoints into stage 2."""
    import os

    out = str(tmp_path / "out")
    run_stage1(out, 400, 8, resume=False, seed=42)
    assert os.path.isdir(os.path.join(out, "docs", "part-7"))
    run_stage1(out, 200, 2, resume=False, seed=42)
    # stale dirs and ledger rows from the 8-partition run are gone
    assert not os.path.isdir(os.path.join(out, "docs", "part-7"))
    from kgforge.steps.ledger import completed_partitions

    assert completed_partitions(out, "docs") == {0, 1}
    n = run_stage2(out, seed=42)
    # equals a clean-out run of the same 200-page corpus
    out2 = str(tmp_path / "out2")
    run_stage1(out2, 200, 2, resume=False, seed=42)
    assert n == run_stage2(out2, seed=42)


def test_resume_revalidates_changed_input_files(ray_session, tmp_path):
    """--input resume with a file added (same dir path, shifted
    grouping) must re-run remapped partitions, not trust stale rows."""
    import pyarrow.parquet as pq

    in_dir = tmp_path / "pages"
    in_dir.mkdir()
    for name, start in (("b.parquet", 0), ("c.parquet", 4)):
        pq.write_table(_pages_table(
            [(f"http://en.site/{start + i}",
              f"The article {start + i} is about the Example Corp.", "en")
             for i in range(4)]), str(in_dir / name))
    out = str(tmp_path / "out")
    # crash after 1 of 2 partitions
    run_stage1(out, 0, 2, resume=False, seed=42, input_dir=str(in_dir),
               stop_after=1)
    # a new file lands, sorting FIRST → groupings shift
    pq.write_table(_pages_table(
        [(f"http://en.site/n{i}",
          f"The new article n{i} is about the Example Corp.", "en")
         for i in range(4)]), str(in_dir / "a.parquet"))
    run_stage1(out, 0, 2, resume=True, seed=42, input_dir=str(in_dir))
    run_stage2(out, seed=42)
    import ray.data as rd
    import glob

    files = sorted(glob.glob(str(tmp_path / "out" / "docs" / "part-*" / "*.parquet")))
    urls = set(rd.read_parquet(files).to_pandas()["url"])
    # every file's pages present exactly once — including the new one's
    assert {f"http://en.site/n{i}" for i in range(4)} <= urls
    assert {f"http://en.site/{i}" for i in range(8)} <= urls


def test_mixture_zero_budget_corpus(ray_session):
    """A weight fraction below 1/total_tokens floors to budget 0 — that
    corpus contributes nothing (rate 0.0), it must not crash."""
    import pandas as pd
    import ray.data as rd

    from kgforge.mixture import mix_corpora

    big = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(20), "text": ["alpha beta gamma"] * 20}))
    rare = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(100, 105), "text": ["delta epsilon"] * 5}))
    mixed, report = mix_corpora(
        {"web": (big, 1000.0), "rare": (rare, 1.0)}, total_tokens=10)
    assert report["rare"]["budget_tokens"] == 0
    assert report["rare"]["rate"] == 0.0
    out = mixed.to_pandas()
    assert (out["source_corpus"] == "rare").sum() == 0


def test_atomic_overwrite_crash_window_recoverable(ray_session, tmp_path):
    """Crash between the two swap renames: the published dir is missing
    but the old data survives in .old-*; the next write sweeps the
    debris and publishes cleanly."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from kgforge.steps import ledger as L

    final = str(tmp_path / "part")
    ds1 = rd.from_pandas(pd.DataFrame({"v": [1, 2, 3]}))
    L.atomic_write_parquet(ds1, final)
    assert sorted(pq.read_table(final)["v"].to_pylist()) == [1, 2, 3]

    ds2 = rd.from_pandas(pd.DataFrame({"v": [9]}))
    real_replace = os.replace
    calls = {"n": 0}

    def crashing_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:          # the tmp→final publish rename
            raise RuntimeError("simulated crash mid-swap")
        return real_replace(src, dst)

    os.replace = crashing_replace
    try:
        with pytest.raises(RuntimeError, match="mid-swap"):
            L.atomic_write_parquet(ds2, final)
    finally:
        os.replace = real_replace
    # published dir gone, but the old data is recoverable in .old-*
    assert not os.path.exists(final)
    import glob

    old = glob.glob(final + ".old-*")
    assert len(old) == 1
    assert sorted(pq.read_table(old[0])["v"].to_pylist()) == [1, 2, 3]
    # the next write sweeps the debris and publishes the new data
    L.atomic_write_parquet(ds2, final)
    assert pq.read_table(final)["v"].to_pylist() == [9]
    assert not glob.glob(final + ".old-*") and not glob.glob(final + ".tmp-*")
