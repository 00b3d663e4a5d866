"""Hypothesis property tests for the grouping-sets derivation kernel:
emulate the finest Ray aggregate in pandas, run _reaggregate for every
grouping set, and compare against DuckDB GROUP BY GROUPING SETS on the
raw rows — random frames with NULL keys and NULL values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.analytic import _reaggregate

AGGS = [
    {"fn": "count", "out": "n"},
    {"fn": "count", "col": "v", "out": "n_v"},
    {"fn": "sum", "col": "v", "out": "s"},
    {"fn": "min", "col": "v", "out": "mn"},
    {"fn": "max", "col": "v", "out": "mx"},
    {"fn": "mean", "col": "v", "out": "m"},
]


def _finest_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """The same partials _finest_aggregate produces, computed in pandas:
    per (a, b) group — count(*), count(v), sum(v) (NULL if all null),
    min, max."""
    def agg(g: pd.DataFrame) -> pd.Series:
        return pd.Series(
            {
                "__cnt_n": len(g),
                "__cnt_n_v": g["v"].notna().sum(),
                "__sum_s": g["v"].sum(min_count=1),
                "__min_mn": g["v"].min(),
                "__max_mx": g["v"].max(),
                "__sum_m": g["v"].sum(min_count=1),
                "__cnt_m": g["v"].notna().sum(),
            }
        )

    return (
        df.groupby(["a", "b"], dropna=False)
        .apply(agg, include_groups=False)
        .reset_index()
    )


def _oracle(df: pd.DataFrame, sub_keys: list[str]) -> pd.DataFrame:
    keys = ", ".join(sub_keys) if sub_keys else ""
    sel_keys = f"{keys}, " if keys else ""
    group = f"GROUP BY {keys}" if keys else ""
    con = duckdb.connect()
    con.register("t", df)
    try:
        return con.execute(
            f"""
            SELECT {sel_keys}
                   count(*) AS n, count(v) AS n_v, sum(v) AS s,
                   min(v) AS mn, max(v) AS mx, avg(v) AS m
            FROM t {group}
            """
        ).df()
    finally:
        con.close()


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    a = draw(st.lists(st.sampled_from(["p", "q", None]), min_size=n, max_size=n))
    b = draw(st.lists(st.sampled_from([0, 1, None]), min_size=n, max_size=n))
    v = draw(st.lists(st.one_of(st.none(), st.integers(-5, 5)), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "a": pd.array(a, dtype=object),
            "b": pd.array(b, dtype="Int64"),
            "v": np.array([np.nan if x is None else float(x) for x in v]),
        }
    )


@settings(max_examples=60, deadline=None)
@given(frames())
def test_reaggregate_matches_duckdb_on_every_grouping_set(df):
    if len(df) == 0:
        return  # the empty-input path has a dedicated integration test
    base = _finest_pandas(df)
    for sub in ([], ["a"], ["b"], ["a", "b"]):
        got = _reaggregate(base, sub, AGGS)
        want = _oracle(df, sub)
        key = sub if sub else None
        if key:
            got = got.sort_values(key, ignore_index=True, na_position="last")
            want = want.sort_values(key, ignore_index=True, na_position="last")
        assert len(got) == len(want), sub
        for c in ("n", "n_v"):
            assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), (sub, c)
        for c in ("s", "mn", "mx", "m"):
            a_ = got[c].astype(float).fillna(-1e18)
            b_ = want[c].astype(float).fillna(-1e18)
            assert np.allclose(a_, b_, atol=1e-9), (sub, c, a_.tolist(), b_.tolist())


# ---------------------------------------------------------------------------
# interval-join batch kernel vs DuckDB (randomized)
# ---------------------------------------------------------------------------

from kgforge.relops import broadcast_interval_join  # noqa: E402  (kernel reuse)


@st.composite
def probe_and_dim(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    probe = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": np.array(draw(st.lists(st.integers(0, 3), min_size=n, max_size=n)),
                          dtype=np.int64),
            "ts": np.array(draw(st.lists(st.integers(0, 20), min_size=n, max_size=n)),
                           dtype=np.int64),
        }
    )
    m = draw(st.integers(min_value=0, max_value=8))
    starts = draw(st.lists(st.integers(0, 18), min_size=m, max_size=m))
    lens = draw(st.lists(st.integers(0, 6), min_size=m, max_size=m))
    dim = pd.DataFrame(
        {
            "k": np.array(draw(st.lists(st.integers(0, 3), min_size=m, max_size=m)),
                          dtype=np.int64),
            "lo": np.array(starts, dtype=np.int64),
            "hi": np.array([s + l for s, l in zip(starts, lens)], dtype=np.int64),
            "tag": [f"w{i}" for i in range(m)],
        }
    )
    return probe, dim


def _join_kernel(probe: pd.DataFrame, dim: pd.DataFrame, how: str) -> pd.DataFrame:
    """Run broadcast_interval_join's per-batch function directly (no
    Ray): capture the map_batches closure with a fake Dataset and call
    it on one batch in whatever format the kernel declared."""
    from kgforge.relops import broadcast_interval_join as bij

    class FakeDS:
        def map_batches(self, fn, batch_format):
            self.fn = fn
            self.batch_format = batch_format
            return self

    fake = FakeDS()
    bij(fake, dim, "k", "ts", "lo", "hi", how=how)
    if fake.batch_format == "pyarrow":
        batch = pa.Table.from_pandas(probe, preserve_index=False)
        return fake.fn(batch).to_pandas()
    return fake.fn(probe.copy())


@settings(max_examples=60, deadline=None)
@given(probe_and_dim(), st.sampled_from(["inner", "left"]))
def test_interval_join_kernel_matches_duckdb(data, how):
    probe, dim = data
    got = _join_kernel(probe, dim, how)
    con = duckdb.connect()
    con.register("p", probe)
    con.register("d", dim)
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    want = con.execute(
        f"""
        SELECT p.rid, p.k, p.ts, d.lo, d.hi, d.tag
        FROM p {join_kw} d ON p.k = d.k AND d.lo <= p.ts AND p.ts < d.hi
        """
    ).df()
    con.close()
    key = ["rid", "tag"]
    got = got.fillna({"tag": ""}).sort_values(key, ignore_index=True)
    want = want.fillna({"tag": ""}).sort_values(key, ignore_index=True)
    assert got["rid"].tolist() == want["rid"].tolist()
    assert got["tag"].tolist() == want["tag"].tolist()
