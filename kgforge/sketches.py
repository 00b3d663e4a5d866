"""Mergeable sketch aggregates (SURVEY §2.E8): HyperLogLog distinct-count
as a custom Ray ``AggregateFnV2`` — per-block partial sketches merged by
the aggregate tree, so the shuffle carries 2^p bytes per block instead
of every distinct value.
"""

from __future__ import annotations

import numpy as np

from ray.data.aggregate import AggregateFnV2

from .extract_core import stable_u64

_P = 12  # 4096 registers → ~1.6% standard error
_M = 1 << _P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hll_zero() -> np.ndarray:
    return np.zeros(_M, dtype=np.uint8)


def _hll_add_hashes(regs: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized register update from a u64 hash array: bucket index =
    top P bits, rank = leading-zero count of the low 64-P bits + 1.
    bit_length is float-log2 with an exact ±1 correction (float64
    rounding can misplace values adjacent to a power of two)."""
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - _P)) - 1)
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    if nz.any():
        v = w[nz]
        lw = np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1
        over = v >= (np.uint64(1) << lw.astype(np.uint64))
        lw[over] += 1
        under = v < (np.uint64(1) << (lw.astype(np.uint64) - np.uint64(1)))
        lw[under] -= 1
        bl[nz] = lw
    rank = ((64 - _P) - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_add_values(regs: np.ndarray, values) -> np.ndarray:
    """Scalar-iterable form (tests, tiny inputs): hashes str(v) exactly
    like the pre-vectorization implementation."""
    h = np.array(
        [stable_u64(str(v), "hll") for v in values], dtype=np.uint64
    )
    return _hll_add_hashes(regs, h)


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if est <= 2.5 * _M:
        zeros = int((regs == 0).sum())
        if zeros:
            est = _M * np.log(_M / zeros)  # linear counting, small range
    return float(est)


class HllDistinct(AggregateFnV2):
    """approx distinct-count of a column; finalize → int estimate."""

    def __init__(self, on: str, alias_name: str | None = None):
        super().__init__(
            alias_name or f"approx_distinct({on})", _hll_zero, on=on, ignore_nulls=True
        )

    def aggregate_block(self, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            col = block[self.get_target_column()].to_pylist()
        else:  # pandas
            col = block[self.get_target_column()].tolist()
        # v == v filters float NaN: pandas blocks surface nulls as NaN
        # (not None), which would otherwise count as a distinct value on
        # the pandas path only — same data, different estimate per format.
        # Hash the block's UNIQUE values only (duplicates update the same
        # register identically, so registers — and estimates — are
        # BIT-IDENTICAL to the old per-row loop), then one vectorized
        # register pass: the per-row stable_u64 loop was the hot path.
        import pandas as _pd

        vals = [v for v in col if v is not None and v == v]
        if not vals:
            return _hll_zero()
        _codes, uniques = _pd.factorize(np.asarray(vals, dtype=object))
        uh = np.array(
            [stable_u64(str(u), "hll") for u in uniques], dtype=np.uint64
        )
        return _hll_add_hashes(_hll_zero(), uh)

    def combine(self, current_accumulator: np.ndarray, new: np.ndarray) -> np.ndarray:
        return np.maximum(current_accumulator, new)

    def finalize(self, accumulator: np.ndarray) -> int:
        return int(round(hll_estimate(accumulator)))


# --- t-digest (approximate quantiles) ---------------------------------------
# The 100 TB path for quantiles over HIGH-cardinality columns: the exact
# value-count plan (stats_quantiles) is bounded by the number of DISTINCT
# values; a t-digest is bounded by ~delta centroids per block regardless
# of cardinality, and centroids merge associatively in the aggregate tree.
# Standard merging-digest formulation (Dunning & Ertl, "Computing extremely
# accurate quantiles using t-digests", arXiv:1902.04023): centroid sizes
# bounded by the k1 scale function's 4*n*q*(1-q)/delta envelope, so the
# tails stay near-exact while the middle compresses.


def _td_compress(cents: np.ndarray, delta: int) -> np.ndarray:
    """Merge sorted (mean, weight) centroid rows down to ~delta centroids."""
    if len(cents) <= 1:
        return cents
    order = np.argsort(cents[:, 0], kind="mergesort")
    cents = cents[order]
    total = float(cents[:, 1].sum())
    out: list[tuple[float, float]] = []
    cur_m, cur_w = float(cents[0, 0]), float(cents[0, 1])
    w_before = 0.0  # total weight fully emitted so far
    for m, w in cents[1:]:
        q = (w_before + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= max(limit, 1.0):
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out.append((cur_m, cur_w))
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out.append((cur_m, cur_w))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def _td_quantile(cents: np.ndarray, q: float) -> float:
    """Interpolated quantile from sorted centroids (cumulative-midpoint
    interpolation, the standard t-digest estimator)."""
    if len(cents) == 0:
        return float("nan")
    if len(cents) == 1:
        return float(cents[0, 0])
    means, weights = cents[:, 0], cents[:, 1]
    total = float(weights.sum())
    target = q * total
    # cumulative weight at each centroid's MIDPOINT
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


class TDigestQuantiles(AggregateFnV2):
    """Approximate quantiles of a numeric column; finalize → dict
    {"q<q>": estimate} (string keys: a grouped aggregate's result
    column must convert to an Arrow struct, which rejects float keys).
    ``delta`` trades accuracy for sketch size (~delta (mean, weight)
    float64 pairs cross the shuffle per block). Works globally AND
    under ``groupby(...).aggregate(...)``."""

    def __init__(self, on: str, quantiles: tuple[float, ...] = (0.5,),
                 delta: int = 200, alias_name: str | None = None):
        self._qs = tuple(quantiles)
        self._delta = int(delta)
        super().__init__(
            alias_name or f"tdigest({on})",
            lambda: np.zeros((0, 2), dtype=np.float64),
            on=on, ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            col = block[self.get_target_column()].to_numpy(zero_copy_only=False)
        else:  # pandas
            col = block[self.get_target_column()].to_numpy()
        vals = np.asarray(col, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return np.zeros((0, 2), dtype=np.float64)
        cents = np.stack([vals, np.ones_like(vals)], axis=1)
        return _td_compress(cents, self._delta)

    def combine(self, current_accumulator: np.ndarray, new: np.ndarray) -> np.ndarray:
        both = np.concatenate([current_accumulator, new], axis=0)
        if len(both) == 0:
            return both
        return _td_compress(both, self._delta)

    def finalize(self, accumulator: np.ndarray) -> dict[str, float]:
        return {f"q{q:g}": _td_quantile(accumulator, q) for q in self._qs}


# --- Misra-Gries heavy hitters ---------------------------------------------
# Hot-key detection for skew-aware shuffles (which url_norm / band_h /
# entity ids would overload one reducer): a bounded summary of ~capacity
# counters per block with the classic merge (sum counters, subtract the
# (capacity+1)-th largest, drop non-positive). Counts are LOWER bounds,
# undercounting by at most N/capacity — any key with true frequency
# > N/capacity is guaranteed present.


class TopKFrequent(AggregateFnV2):
    """Approximate top-k most frequent values; finalize → list of
    (value, lower-bound count), count-desc then value-asc. ``capacity``
    ≥ 8×k keeps the guaranteed-present threshold at N/(8k)."""

    def __init__(self, on: str, k: int = 10, capacity: int | None = None,
                 alias_name: str | None = None):
        self._k = int(k)
        self._cap = int(capacity or 8 * k)
        super().__init__(
            alias_name or f"top_{k}({on})", lambda: {}, on=on, ignore_nulls=True
        )

    def _trim(self, counts: dict) -> dict:
        if len(counts) <= self._cap:
            return counts
        # subtract the (cap+1)-th largest count from everyone, drop <= 0
        # (Misra-Gries merge step; preserves the N/capacity error bound)
        cut = sorted(counts.values(), reverse=True)[self._cap]
        return {key: n - cut for key, n in counts.items() if n > cut}

    def aggregate_block(self, block) -> dict:
        from collections import Counter

        import pyarrow as pa

        if isinstance(block, pa.Table):
            col = block[self.get_target_column()].to_pylist()
        else:  # pandas
            col = block[self.get_target_column()].tolist()
        c = Counter(v for v in col if v is not None and v == v)
        return self._trim(dict(c))

    def combine(self, current_accumulator: dict, new: dict) -> dict:
        for key, n in new.items():
            current_accumulator[key] = current_accumulator.get(key, 0) + n
        return self._trim(current_accumulator)

    def finalize(self, accumulator: dict) -> list:
        items = sorted(accumulator.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return [(key, int(n)) for key, n in items[: self._k]]
