"""Boundary-stress tests for the round-4 sort-scan kernels.

Both `_dup_band_hashes` (LSH collision detection) and the exact-dedup
loser scan replace per-group Ray aggregates with one range sort plus a
vectorized per-segment scan; their only non-vectorized logic is the
handling of keys that SPAN sorted-segment boundaries. These tests build
inputs where single keys repeat enough to straddle many blocks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _naive_dups(values: np.ndarray) -> np.ndarray:
    u, c = np.unique(values, return_counts=True)
    return np.sort(u[c >= 2])


@pytest.mark.parametrize("seed", [0, 7])
def test_dup_band_hashes_equals_naive_count(ray_session, seed):
    from kgforge.steps.dedup import _dup_band_hashes

    rng = np.random.default_rng(seed)
    # heavy-dup regime: a few hashes repeated block-spanning many times,
    # a mid tail of small multiplicities, and a sea of singletons
    vals = np.concatenate(
        [
            np.repeat(rng.integers(0, 2**62, size=3), 5000),  # span blocks
            np.repeat(rng.integers(0, 2**62, size=200), rng.integers(2, 6, 200)),
            rng.integers(0, 2**62, size=30_000),
        ]
    ).astype(np.int64)
    rng.shuffle(vals)
    bands = rd.from_arrow(
        pa.table({"band_h": pa.array(vals, pa.int64()),
                  "url_norm": pa.array([f"u{i}" for i in range(len(vals))])})
    ).repartition(16)
    got = _dup_band_hashes(bands.materialize())
    want = _naive_dups(vals)
    # the sea of singletons can collide by chance — naive count is truth
    np.testing.assert_array_equal(got, want)


def test_dup_band_hashes_empty_and_all_same(ray_session):
    from kgforge.steps.dedup import _dup_band_hashes

    empty = rd.from_arrow(
        pa.table({"band_h": pa.array([], pa.int64()),
                  "url_norm": pa.array([], pa.string())})
    )
    assert len(_dup_band_hashes(empty)) == 0
    same = rd.from_arrow(
        pa.table({"band_h": pa.array([42] * 1000, pa.int64()),
                  "url_norm": pa.array([f"u{i}" for i in range(1000)])})
    ).repartition(8)
    np.testing.assert_array_equal(_dup_band_hashes(same.materialize()), [42])


def test_exact_dedup_join_high_multiplicity_url(ray_session):
    """One url re-crawled 2,000 times spans every sorted block: the
    boundary-resolution path (not the vectorized interior scan) decides
    its winner. Exactly the newest crawl must survive, and the unique
    urls must pass through untouched."""
    from kgforge.steps.extract import exact_dedup

    n_hot, n_cold = 2000, 500
    ts = pa.array(
        np.arange(n_hot, dtype="int64") * 1_000_000 + 1_600_000_000_000_000,
        pa.timestamp("us"),
    )
    hot = pa.table(
        {
            "url": pa.array(["http://hot.example/page"] * n_hot),
            "url_norm": pa.array(["hot.example/page"] * n_hot),
            "warc_ts": ts,
            "text_sha256": pa.array([f"sha{i:08d}" for i in range(n_hot)]),
            "extracted_text": pa.array([f"body {i}" for i in range(n_hot)]),
        }
    )
    cold = pa.table(
        {
            "url": pa.array([f"http://cold.example/{i}" for i in range(n_cold)]),
            "url_norm": pa.array([f"cold.example/{i}" for i in range(n_cold)]),
            "warc_ts": pa.array([ts[0].as_py()] * n_cold, pa.timestamp("us")),
            "text_sha256": pa.array([f"cold{i:08d}" for i in range(n_cold)]),
            "extracted_text": pa.array([f"cold body {i}" for i in range(n_cold)]),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([hot, cold])).repartition(16)
    out = exact_dedup(ds, force_path="join").to_pandas()
    assert out["url_norm"].is_unique
    assert len(out) == n_cold + 1
    winner = out[out["url_norm"] == "hot.example/page"].iloc[0]
    assert winner["text_sha256"] == f"sha{n_hot - 1:08d}"  # newest crawl
