from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from kgforge.sketches import HllDistinct, _hll_add_values, _hll_zero, hll_estimate


def test_hll_math_accuracy():
    # n = 30k is clear of the linear-counting/raw-HLL transition zone
    # (~2.5 * 4096 registers) where uncorrected HLL biases a few percent
    regs = _hll_add_values(_hll_zero(), (f"v{i}" for i in range(30_000)))
    est = hll_estimate(regs)
    assert abs(est - 30_000) / 30_000 < 0.05
    # and in the transition zone, stay within 8%
    regs2 = _hll_add_values(_hll_zero(), (f"w{i}" for i in range(10_000)))
    assert abs(hll_estimate(regs2) - 10_000) / 10_000 < 0.08


def test_hll_merge_equals_union():
    a = _hll_add_values(_hll_zero(), (f"a{i}" for i in range(3000)))
    b = _hll_add_values(_hll_zero(), (f"a{i}" for i in range(1500, 4500)))
    merged = np.maximum(a, b)
    est = hll_estimate(merged)
    assert abs(est - 4500) / 4500 < 0.05


def test_hll_aggregate_in_ray():
    n = 5000
    t = pa.table({"k": pa.array([f"key{i % 1200}" for i in range(n)], pa.string())})
    ds = rd.from_arrow(t).repartition(8)
    out = ds.aggregate(HllDistinct("k", alias_name="nd"))
    est = out["nd"]
    assert abs(est - 1200) / 1200 < 0.05, est


def test_hll_pandas_nan_equals_arrow_null():
    """NaN on pandas-format blocks is a NULL, not a distinct value — the
    same logical data must give the same estimate in both block formats."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgforge.sketches import HllDistinct

    pdf = pd.DataFrame({"v": [1.0, 2.0, np.nan, np.nan, np.nan]})
    a = rd.from_pandas(pdf).aggregate(HllDistinct("v"))["approx_distinct(v)"]
    t = pa.table({"v": pa.array([1.0, 2.0, None, None, None], pa.float64())})
    b = rd.from_arrow(t).aggregate(HllDistinct("v"))["approx_distinct(v)"]
    assert a == b == 2
