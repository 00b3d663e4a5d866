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


def _hll_add_values(regs: np.ndarray, values) -> np.ndarray:
    for v in values:
        h = stable_u64(str(v), "hll")
        idx = h >> (64 - _P)
        w = h & ((1 << (64 - _P)) - 1)  # low 52 bits
        rank = (64 - _P) - w.bit_length() + 1  # = 53 when w == 0
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


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
        # the pandas path only — same data, different estimate per format
        return _hll_add_values(_hll_zero(), (v for v in col if v is not None and v == v))

    def combine(self, current_accumulator: np.ndarray, new: np.ndarray) -> np.ndarray:
        return np.maximum(current_accumulator, new)

    def finalize(self, accumulator: np.ndarray) -> int:
        return int(round(hll_estimate(accumulator)))
