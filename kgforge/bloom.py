"""Bloom-filter semi-join pushdown (SURVEY §2.D7 extension — the
classic distributed-join optimization: pre-filter the BIG side with a
compact membership sketch of the build side's keys BEFORE the shuffle
join, so rows that cannot match never enter the all-to-all exchange).

Shapes:

- ``BloomFilter`` — numpy uint64 bit-array; k index positions per key
  via Kirsch–Mitzenmacher double hashing over two splitmix64 mixes
  (public construction: k_i(x) = h1(x) + i*h2(x) mod m).  Fully
  vectorized add/contains over u64 key arrays; union = bitwise OR, so
  partial filters merge associatively in Ray's aggregate tree.
- ``BloomSketch`` — mergeable ``AggregateFnV2`` (same pattern as the
  HLL sketch in ``sketches.py``): each block contributes a partial
  filter of ``m/64`` u64 words; the shuffle carries filters, not keys.
- ``bloom_semi_filter`` — builds the filter from the build side
  distributedly, broadcasts the bits ONCE via ``ray.put``, and streams
  the probe side through a vectorized membership filter.  False
  positives pass (they are removed by the exact join that follows);
  false negatives are impossible, so `bloom_semi_filter → exact join`
  equals the unfiltered join exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import AggregateFnV2

from kgforge.relops import _splitmix64, sample_hash_u64

_SEED = 0x5EED_B100_F11E  # fixed so build and probe sides always agree


def _params_for(capacity: int, fpp: float) -> tuple[int, int]:
    """Textbook sizing: m = -n ln p / ln2², k = (m/n) ln2 (rounded up to
    whole u64 words / at least one hash)."""
    capacity = max(int(capacity), 1)
    fpp = min(max(float(fpp), 1e-9), 0.5)
    m = int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, int(round(m / capacity * math.log(2))))
    return m, k


class BloomFilter:
    def __init__(self, n_bits: int, k: int, words: np.ndarray | None = None):
        if n_bits % 64:
            raise ValueError("n_bits must be a multiple of 64")
        self.m = n_bits
        self.k = k
        self.words = (
            words if words is not None else np.zeros(n_bits // 64, dtype=np.uint64)
        )

    @classmethod
    def for_capacity(cls, capacity: int, fpp: float = 0.01) -> "BloomFilter":
        return cls(*_params_for(capacity, fpp))

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(len(hashes), k) bit positions via double hashing."""
        h1 = hashes
        h2 = _splitmix64(hashes ^ np.uint64(_SEED)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_hashes(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(
            self.words, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
        )

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        bits = (self.words[(pos >> np.uint64(6))] >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    def union(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot union filters with different parameters")
        return BloomFilter(self.m, self.k, self.words | other.words)


class BloomSketch(AggregateFnV2):
    """Mergeable Bloom build over a key column: per-block partial
    filters OR-merged by the aggregate tree; finalize → word array."""

    def __init__(self, on: str, capacity: int, fpp: float = 0.01,
                 alias_name: str | None = None):
        self._m, self._k = _params_for(capacity, fpp)
        super().__init__(
            alias_name or f"bloom({on})",
            lambda: np.zeros(self._m // 64, dtype=np.uint64),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        col = (
            block[self.get_target_column()]
            if isinstance(block, pa.Table)
            else pa.Array.from_pandas(block[self.get_target_column()])
        )
        bf = BloomFilter(self._m, self._k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = col.drop_null()
        if len(valid):
            bf.add_hashes(sample_hash_u64(valid, _SEED))
        return bf.words

    def combine(self, current_accumulator: np.ndarray, new: np.ndarray) -> np.ndarray:
        return current_accumulator | new

    def finalize(self, accumulator: np.ndarray) -> np.ndarray:
        return accumulator


def build_bloom(ds: Dataset, key_col: str, capacity: int, fpp: float = 0.01) -> BloomFilter:
    """Distributed build: one mergeable aggregate over the build side.
    An EMPTY build side (e.g. a fully-filtered dimension) yields the
    all-zero reject-everything filter — Ray's empty aggregate returns a
    None-valued row, not an accumulator."""
    m, k = _params_for(capacity, fpp)
    row = ds.aggregate(BloomSketch(key_col, capacity, fpp, alias_name="bf"))
    words = row.get("bf") if isinstance(row, dict) else None
    if words is None:
        return BloomFilter(m, k)
    return BloomFilter(m, k, np.asarray(words, dtype=np.uint64))


def bloom_hit_mask(words_ref, m: int, k: int, col) -> np.ndarray:
    """Vectorized per-row membership mask for a broadcast Bloom filter
    (words shipped once via ``ray.put``, rebuilt zero-copy per call).
    Null keys NEVER match (SQL semi-join semantics) — the single probe
    implementation every consumer shares, so the hash schedule cannot
    drift between ``bloom_semi_filter`` and the dedup split filters."""
    bf = BloomFilter(m, k, ray.get(words_ref))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # no fill_null: sample_hash_u64 already sentinels nulls (and
    # fill_null('') crashes on float/date/timestamp keys its contract
    # supports) — the mask below enforces null-never-matches
    null_mask = np.asarray(col.is_null()) if col.null_count else None
    mask = bf.contains_hashes(sample_hash_u64(col, _SEED))
    if null_mask is not None:
        mask &= ~null_mask
    return mask


def bloom_semi_filter(
    probe: Dataset, key_col: str, bloom: BloomFilter
) -> Dataset:
    """Keep probe rows whose key MIGHT be in the filter (superset of the
    exact semi join — no false negatives).  The filter words ship once
    via ``ray.put``; each task reads them zero-copy from the object
    store and filters its batches vectorized."""
    words_ref = ray.put(bloom.words)
    m, k = bloom.m, bloom.k

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(bloom_hit_mask(words_ref, m, k, t[key_col])))

    return probe.map_batches(keep, batch_format="pyarrow")
