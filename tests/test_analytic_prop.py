"""Hypothesis property tests: the window kernel (_apply_specs — the
exact per-group code map_groups runs) against DuckDB window SQL on
randomized frames with NULL values, single-row partitions, and
duplicate ORDER BY keys.  Pure pandas/DuckDB — no Ray session needed
(the distributed plumbing is covered by tests/test_analytic.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.analytic import _apply_specs

FULL_SPECS = [
    {"out": "rn", "fn": "row_number"},
    {"out": "rk", "fn": "rank"},
    {"out": "drk", "fn": "dense_rank"},
    {"out": "prk", "fn": "percent_rank"},
    {"out": "cd", "fn": "cume_dist"},
    {"out": "tile", "fn": "ntile", "n": 3},
    {"out": "lg", "fn": "lag", "col": "v"},
    {"out": "ld2", "fn": "lead", "col": "v", "offset": 2},
    {"out": "fv", "fn": "first_value", "col": "v"},
    {"out": "lv", "fn": "last_value", "col": "v"},
    {"out": "nv2", "fn": "nth_value", "col": "v", "n": 2},
    {"out": "cs", "fn": "cumsum", "col": "v"},
    {"out": "cmn", "fn": "cummin", "col": "v"},
    {"out": "cmx", "fn": "cummax", "col": "v"},
    {"out": "rs3", "fn": "rolling_sum", "col": "v", "window": 3},
    {"out": "rmn3", "fn": "rolling_min", "col": "v", "window": 3},
    {"out": "rmx3", "fn": "rolling_max", "col": "v", "window": 3},
]

FULL_SQL = """
SELECT p, o, v,
       row_number() OVER w AS rn,
       rank() OVER w AS rk,
       dense_rank() OVER w AS drk,
       percent_rank() OVER w AS prk,
       cume_dist() OVER w AS cd,
       ntile(3) OVER w AS tile,
       lag(v) OVER w AS lg,
       lead(v, 2) OVER w AS ld2,
       first_value(v) OVER w AS fv,
       last_value(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
       nth_value(v, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv2,
       sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS cs,
       min(v) OVER (w ROWS UNBOUNDED PRECEDING) AS cmn,
       max(v) OVER (w ROWS UNBOUNDED PRECEDING) AS cmx,
       sum(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rs3,
       min(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rmn3,
       max(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rmx3
FROM t WINDOW w AS (PARTITION BY p ORDER BY o)
"""

TIE_SPECS = [
    {"out": "rk", "fn": "rank"},
    {"out": "drk", "fn": "dense_rank"},
    {"out": "prk", "fn": "percent_rank"},
    {"out": "cd", "fn": "cume_dist"},
]

TIE_SQL = """
SELECT p, o, v,
       rank() OVER w AS rk,
       dense_rank() OVER w AS drk,
       percent_rank() OVER w AS prk,
       cume_dist() OVER w AS cd
FROM t WINDOW w AS (PARTITION BY p ORDER BY o)
"""


def _engine(df: pd.DataFrame, specs) -> pd.DataFrame:
    parts = [
        _apply_specs(g.copy(), ["o"], [True], specs)
        for _, g in df.groupby("p", sort=False)
    ]
    return pd.concat(parts, ignore_index=True)


def _oracle(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _compare(got: pd.DataFrame, want: pd.DataFrame):
    key = [c for c in ("p", "o", "rk", "drk") if c in got.columns]
    got = got[sorted(got.columns)].sort_values(key, ignore_index=True)
    want = want[sorted(want.columns)].sort_values(key, ignore_index=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a = got[c].astype(float) if want[c].dtype != object else got[c]
        b = want[c].astype(float) if want[c].dtype != object else want[c]
        assert np.allclose(
            a.fillna(-1e18), b.fillna(-1e18), atol=1e-9
        ), f"{c}: {a.tolist()} != {b.tolist()}"


@st.composite
def unique_order_frames(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    pids = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    order = draw(st.permutations(range(n)))  # globally unique → per-partition unique
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(-5, 5)), min_size=n, max_size=n
        )
    )
    return pd.DataFrame(
        {
            "p": np.array(pids, dtype=np.int64),
            "o": np.array(order, dtype=np.int64),
            "v": np.array(
                [np.nan if v is None else float(v) for v in vals], dtype=np.float64
            ),
        }
    )


@st.composite
def tied_order_frames(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    pids = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    order = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))  # heavy ties
    vals = draw(st.lists(st.integers(-3, 3), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "p": np.array(pids, dtype=np.int64),
            "o": np.array(order, dtype=np.int64),
            "v": np.array(vals, dtype=np.float64),
        }
    )


@settings(max_examples=60, deadline=None)
@given(unique_order_frames())
def test_window_kernel_matches_duckdb_unique_order(df):
    _compare(_engine(df, FULL_SPECS), _oracle(df, FULL_SQL))


@settings(max_examples=60, deadline=None)
@given(tied_order_frames())
def test_window_kernel_matches_duckdb_with_ties(df):
    # only tie-deterministic functions: rank family is well-defined on
    # duplicate ORDER BY keys; row_number/lag/cumsum etc. are not
    _compare(_engine(df, TIE_SPECS), _oracle(df, TIE_SQL))


def test_cumulative_null_semantics_regression():
    """sum/min/max OVER ROWS skip nulls and keep accumulating; the naive
    pandas cumsum pins NaN at the null row (caught by hypothesis)."""
    df = pd.DataFrame(
        {"p": [0, 0, 0, 0], "o": [0, 1, 2, 3], "v": [np.nan, 1.0, np.nan, 2.0]}
    )
    out = _engine(
        df,
        [
            {"out": "cs", "fn": "cumsum", "col": "v"},
            {"out": "cmn", "fn": "cummin", "col": "v"},
            {"out": "cmx", "fn": "cummax", "col": "v"},
        ],
    )
    assert out["cs"].fillna(-1).tolist() == [-1.0, 1.0, 1.0, 3.0]
    assert out["cmn"].fillna(-1).tolist() == [-1.0, 1.0, 1.0, 1.0]
    assert out["cmx"].fillna(-1).tolist() == [-1.0, 1.0, 1.0, 2.0]


# --- the vectorized multi-group kernel (window strategy='hashed') ----------


def _engine_grouped(df: pd.DataFrame, specs) -> pd.DataFrame:
    from kgforge.analytic import _apply_specs_grouped

    return _apply_specs_grouped(df.copy(), ["p"], ["o"], [True], specs)


@settings(max_examples=60, deadline=None)
@given(unique_order_frames())
def test_grouped_kernel_matches_duckdb_unique_order(df):
    _compare(_engine_grouped(df, FULL_SPECS), _oracle(df, FULL_SQL))


@settings(max_examples=60, deadline=None)
@given(tied_order_frames())
def test_grouped_kernel_matches_duckdb_with_ties(df):
    _compare(_engine_grouped(df, TIE_SPECS), _oracle(df, TIE_SQL))


def test_grouped_kernel_null_partition_and_cumulatives():
    """NULL partition keys form their own group (SQL/Ray semantics);
    null-skipping cumulative semantics hold across groups."""
    df = pd.DataFrame(
        {
            "p": [np.nan, 0.0, np.nan, 0.0, np.nan],
            "o": [0, 1, 2, 3, 4],
            "v": [np.nan, 1.0, 2.0, np.nan, 3.0],
        }
    )
    out = _engine_grouped(
        df,
        [
            {"out": "rn", "fn": "row_number"},
            {"out": "cs", "fn": "cumsum", "col": "v"},
        ],
    ).sort_values("o", ignore_index=True)
    assert out["rn"].tolist() == [1, 1, 2, 2, 3]
    assert out["cs"].fillna(-1).tolist() == [-1.0, 1.0, 2.0, 1.0, 5.0]
