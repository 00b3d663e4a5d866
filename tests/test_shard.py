"""Deterministic shuffle-shard writer (kgforge/shard.py)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgforge.shard import assign_shards, read_sharded, shuffle_shard


def _corpus(n=400):
    return pd.DataFrame(
        {"doc_id": range(n), "text": [f"doc number {i} body" for i in range(n)]}
    )


def _shard_sequences(path: str) -> dict[int, list[int]]:
    """Per-shard doc_id sequence, files in lexicographic (=logical) order."""
    out = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("shard="):
            continue
        k = int(d.split("=")[1])
        seq = []
        for f in sorted(os.listdir(os.path.join(path, d))):
            if f.endswith(".parquet"):
                seq.extend(
                    pq.read_table(os.path.join(path, d, f))["doc_id"].to_pylist()
                )
        out[k] = seq
    return out


def test_shuffle_shard_deterministic_across_layouts(ray_session, tmp_path):
    """Same (corpus, seed, n_shards) → byte-identical shard sequences,
    regardless of input block layout or run."""
    df = _corpus()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    n = shuffle_shard(rd.from_pandas(df).repartition(3), a, 8, seed=7)
    shuffle_shard(rd.from_pandas(df).repartition(11), b, 8, seed=7)
    assert n == len(df)
    sa, sb = _shard_sequences(a), _shard_sequences(b)
    assert sa == sb
    # complete, disjoint cover of the corpus
    all_ids = [i for seq in sa.values() for i in seq]
    assert sorted(all_ids) == list(range(len(df)))
    # actually shuffled: no shard is a contiguous ascending range
    assert any(seq != sorted(seq) for seq in sa.values())


def test_seed_changes_permutation(ray_session, tmp_path):
    df = _corpus(200)
    a, b = str(tmp_path / "s7"), str(tmp_path / "s8")
    shuffle_shard(rd.from_pandas(df), a, 4, seed=7)
    shuffle_shard(rd.from_pandas(df), b, 4, seed=8)
    sa, sb = _shard_sequences(a), _shard_sequences(b)
    assert sa != sb  # different epoch → different layout
    assert sorted(i for s in sa.values() for i in s) == sorted(
        i for s in sb.values() for i in s
    )


def test_shard_balance(ray_session, tmp_path):
    df = _corpus(2000)
    p = str(tmp_path / "bal")
    shuffle_shard(rd.from_pandas(df), p, 8, seed=1)
    sizes = [len(s) for s in _shard_sequences(p).values()]
    assert len(sizes) == 8
    assert min(sizes) > 2000 / 8 * 0.7 and max(sizes) < 2000 / 8 * 1.3


def test_read_sharded_subset(ray_session, tmp_path):
    df = _corpus(120)
    p = str(tmp_path / "sub")
    shuffle_shard(rd.from_pandas(df), p, 6, seed=3)
    seqs = _shard_sequences(p)
    got = read_sharded(p, shards=[1, 4]).to_pandas()
    assert sorted(got["doc_id"]) == sorted(seqs[1] + seqs[4])
    assert read_sharded(p).count() == 120


def test_assign_shards_validation_and_columns(ray_session):
    ds = rd.from_pandas(_corpus(10))
    with pytest.raises(ValueError):
        assign_shards(ds, 0)
    out = assign_shards(ds, 3, seed=2).to_pandas()
    assert set(out["shard"]) <= {0, 1, 2}
    assert "__shuffle_pos" in out.columns


def test_read_sharded_empty_shard_is_empty_not_crash(ray_session, tmp_path):
    """A shard that received zero rows has no shard=k/ dir; a subset
    read of it must return an empty dataset (review fix)."""
    df = _corpus(3)
    p = str(tmp_path / "tiny")
    shuffle_shard(rd.from_pandas(df), p, 8, seed=1)
    present = {int(d.split("=")[1]) for d in os.listdir(p) if d.startswith("shard=")}
    missing = sorted(set(range(8)) - present)
    assert missing  # 3 rows into 8 shards always leaves empty shards
    got = read_sharded(p, shards=[missing[0]])
    assert got.count() == 0
    # mixed subset: one empty + one present
    got2 = read_sharded(p, shards=[missing[0], sorted(present)[0]])
    assert got2.count() >= 1
