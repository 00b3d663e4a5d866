"""Bloom-filter semi-join pushdown: no false negatives, bounded false
positives, distributed build == driver build, and
filter→exact-join == unfiltered exact join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kgforge.bloom import BloomFilter, _SEED, bloom_semi_filter, build_bloom
from kgforge.relops import sample_hash_u64


def _hashes(vals) -> np.ndarray:
    return sample_hash_u64(pa.array(vals), _SEED)


def test_no_false_negatives_and_bounded_fp():
    keys = list(range(0, 20000, 2))  # 10k even ints
    bf = BloomFilter.for_capacity(len(keys), fpp=0.01)
    bf.add_hashes(_hashes(keys))
    assert bf.contains_hashes(_hashes(keys)).all()  # no false negatives
    absent = list(range(1, 20001, 2))  # 10k odd ints
    fp = bf.contains_hashes(_hashes(absent)).mean()
    assert fp <= 0.03  # ~3x the design point is a generous bound


def test_union_merges_partials():
    a = BloomFilter.for_capacity(1000, 0.01)
    b = BloomFilter(a.m, a.k)
    a.add_hashes(_hashes([1, 2, 3]))
    b.add_hashes(_hashes([4, 5]))
    u = a.union(b)
    assert u.contains_hashes(_hashes([1, 2, 3, 4, 5])).all()
    with pytest.raises(ValueError, match="different parameters"):
        a.union(BloomFilter.for_capacity(10, 0.5))


def test_distributed_build_equals_driver_build(ray_session):
    keys = [f"k{i}" for i in range(5000)]
    ds = rd.from_arrow(pa.table({"key": pa.array(keys)})).repartition(8)
    dist = build_bloom(ds, "key", capacity=5000, fpp=0.01)
    local = BloomFilter.for_capacity(5000, 0.01)
    local.add_hashes(_hashes(keys))
    assert (dist.words == local.words).all()


def test_semi_filter_then_join_equals_unfiltered_join(ray_session):
    rng = np.random.default_rng(42)
    build_keys = rng.choice(100000, size=2000, replace=False)
    probe_keys = rng.integers(0, 100000, size=30000)
    build = rd.from_arrow(pa.table({"k": pa.array(build_keys, pa.int64())}))
    probe = rd.from_arrow(
        pa.table(
            {"k": pa.array(probe_keys, pa.int64()),
             "v": pa.array(np.arange(len(probe_keys)), pa.int64())}
        )
    ).repartition(4)

    bf = build_bloom(build, "k", capacity=2000, fpp=0.01)
    filtered = bloom_semi_filter(probe, "k", bf).to_pandas()
    # superset of true matches (no false negatives) …
    true_set = set(build_keys.tolist())
    exact = [k in true_set for k in filtered["k"]]
    survivors = filtered[pd.Series(exact, index=filtered.index)]
    probe_pd = probe.to_pandas()
    want = probe_pd[probe_pd["k"].isin(true_set)]
    assert sorted(survivors["v"]) == sorted(want["v"])
    # … and the pushdown actually prunes: most non-matching rows gone
    n_match = len(want)
    assert len(filtered) <= n_match + 0.05 * len(probe_pd)


def test_semi_filter_drops_null_keys(ray_session):
    bf = BloomFilter.for_capacity(10, 0.01)
    bf.add_hashes(_hashes([1, 2]))
    t = pa.table({"k": pa.array([1, None, 2, 3], pa.int64())})
    out = bloom_semi_filter(rd.from_arrow(t), "k", bf).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]


def test_build_bloom_empty_build_side_rejects_all(ray_session):
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    bf = build_bloom(empty, "k", capacity=100, fpp=0.01)
    probe = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    assert bloom_semi_filter(probe, "k", bf).count() == 0


def test_bloom_semi_filter_nullable_noninteger_keys(ray_session):
    """Float/timestamp keys with nulls: sample_hash_u64's contract covers
    them; the old fill_null('') crashed mid-stream."""
    import datetime

    import pandas as pd
    import ray.data as rd

    import pyarrow as pa

    from kgforge.bloom import _SEED, BloomFilter, bloom_semi_filter
    from kgforge.relops import sample_hash_u64

    def _bf(keys, typ):
        f = BloomFilter.for_capacity(16)
        f.add_hashes(sample_hash_u64(pa.array(keys, typ), _SEED))
        return f

    bf = _bf([1.5, 2.5], pa.float64())
    probe = rd.from_pandas(pd.DataFrame({
        "k": [1.5, None, 99.0, 2.5],
        "v": list(range(4)),
    }))
    kept = bloom_semi_filter(probe, "k", bf).to_pandas()
    assert set(kept["v"]) >= {0, 3}          # true matches survive
    assert 1 not in set(kept["v"])           # null never matches

    ts = [datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2)]
    bf2 = _bf(ts, pa.timestamp("us"))
    # same unit as the build side: the string canonicalization hashes
    # "…00.000000" differently from a ns-precision "…00.000000000"
    probe2 = rd.from_arrow(pa.table({
        "k": pa.array([ts[0], None, datetime.datetime(2030, 5, 5)],
                      pa.timestamp("us")),
        "v": pa.array([0, 1, 2], pa.int64()),
    }))
    kept2 = bloom_semi_filter(probe2, "k", bf2).to_pandas()
    assert 0 in set(kept2["v"]) and 1 not in set(kept2["v"])
