"""Hypothesis property tests for the grouping-sets derivation kernel:
emulate the finest Ray aggregate in pandas, run _reaggregate for every
grouping set, and compare against DuckDB GROUP BY GROUPING SETS on the
raw rows — random frames with NULL keys and NULL values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
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
