"""DuckDB-oracle and determinism tests for kgforge.relops (interval
join, unnest, stratified sampling) over the sf0.001 driver tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kgforge.relops import (
    broadcast_interval_join,
    stratified_sample,
    top_k_per_group,
    unnest,
)
from kgforge.relational import read

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def _assert_equal(got: pd.DataFrame, want: pd.DataFrame):
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.allclose(
                a.astype(float).fillna(-1e18), b.astype(float).fillna(-1e18), atol=1e-9
            ), c
        else:
            assert a.astype(object).where(pd.notna(a), None).tolist() == b.astype(
                object
            ).where(pd.notna(b), None).tolist(), c


def _scd2_dim() -> pd.DataFrame:
    """Deterministic SCD-2 validity-window dimension over the events
    user ids: two consecutive tiers per user, a gap after, and a column
    named ``value`` to exercise name-collision suffixing."""
    users = list(range(0, 40))
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for u in users:
        rows.append((u, t0, t0 + pd.Timedelta(days=12), "bronze", float(u)))
        rows.append(
            (u, t0 + pd.Timedelta(days=12), t0 + pd.Timedelta(days=21), "gold", u + 0.5)
        )
    return pd.DataFrame(rows, columns=["user_id", "start_ts", "end_ts", "tier", "value"])


def _duck_with_dim(sql: str, dim: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    con.register("dim", dim)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_interval_join_inner_vs_duckdb(ray_session):
    dim = _scd2_dim()
    ds = read(SF, "events", ["event_id", "user_id", "ts", "value"])
    got = broadcast_interval_join(
        ds, dim, "user_id", "ts", "start_ts", "end_ts", how="inner"
    ).to_pandas()
    want = _duck_with_dim(
        """
        SELECT e.event_id, e.user_id, e.ts, e.value,
               d.start_ts, d.end_ts, d.tier, d.value AS value_dim
        FROM events e
        JOIN dim d ON e.user_id = d.user_id
                  AND d.start_ts <= e.ts AND e.ts < d.end_ts
        """,
        dim,
    )
    assert len(got) > 0
    _assert_equal(got, want)


def test_interval_join_left_vs_duckdb(ray_session):
    dim = _scd2_dim()
    ds = read(SF, "events", ["event_id", "user_id", "ts", "value"])
    got = broadcast_interval_join(
        ds, dim, "user_id", "ts", "start_ts", "end_ts", how="left"
    ).to_pandas()
    want = _duck_with_dim(
        """
        SELECT e.event_id, e.user_id, e.ts, e.value,
               d.start_ts, d.end_ts, d.tier, d.value AS value_dim
        FROM events e
        LEFT JOIN dim d ON e.user_id = d.user_id
                       AND d.start_ts <= e.ts AND e.ts < d.end_ts
        """,
        dim,
    )
    assert len(got) == len(want)
    _assert_equal(got, want)


def test_interval_join_closed_both_vs_duckdb(ray_session):
    dim = _scd2_dim().drop(columns=["value"])
    ds = read(SF, "events", ["event_id", "user_id", "ts"])
    got = broadcast_interval_join(
        ds, dim, "user_id", "ts", "start_ts", "end_ts", closed="both"
    ).to_pandas()
    want = _duck_with_dim(
        """
        SELECT e.event_id, e.user_id, e.ts, d.start_ts, d.end_ts, d.tier
        FROM events e
        JOIN dim d ON e.user_id = d.user_id
                  AND e.ts BETWEEN d.start_ts AND d.end_ts
        """,
        dim,
    )
    _assert_equal(got, want)


def test_interval_join_validates_args(ray_session):
    ds = read(SF, "events", ["event_id", "user_id", "ts"])
    dim = _scd2_dim()
    with pytest.raises(ValueError, match="how"):
        broadcast_interval_join(ds, dim, "user_id", "ts", "start_ts", "end_ts", how="outer")
    with pytest.raises(ValueError, match="missing column"):
        broadcast_interval_join(ds, dim, "user_id", "ts", "nope", "end_ts")


# ---------------------------------------------------------------------------
# unnest
# ---------------------------------------------------------------------------


def test_unnest_vs_duckdb(ray_session):
    ds = read(SF, "embeddings", ["vec_id", "embedding"])
    got = unnest(ds, "embedding", out_col="v", ordinal_col="ord").to_pandas()
    want = _duck_with_dim(
        """
        SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS ord
        FROM embeddings
        """,
        pd.DataFrame({"x": [0]}),
    )
    got["ord"] = got["ord"].astype("int64")
    want["ord"] = want["ord"].astype("int64")
    _assert_equal(got, want)


def test_unnest_drops_null_and_empty_lists(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "xs": pa.array([[10, 11], [], None, [12]], pa.list_(pa.int64())),
        }
    )
    got = unnest(rd.from_arrow(t), "xs", ordinal_col="ord").to_pandas()
    got = got.sort_values(["id", "ord"], ignore_index=True)
    assert got["id"].tolist() == [1, 1, 4]
    assert got["xs"].tolist() == [10, 11, 12]
    assert got["ord"].tolist() == [1, 2, 1]


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_unbiased(ray_session):
    ds = read(SF, "events", ["event_id", "event_type"])
    a = stratified_sample(ds, "event_id", 0.3, seed=7).to_pandas()
    b = stratified_sample(ds, "event_id", 0.3, seed=7).to_pandas()
    assert sorted(a["event_id"]) == sorted(b["event_id"])  # same rows every run
    n_total = ds.count()
    assert 0.22 <= len(a) / n_total <= 0.38
    c = stratified_sample(ds, "event_id", 0.3, seed=8).to_pandas()
    assert sorted(a["event_id"]) != sorted(c["event_id"])  # seed changes the sample


def test_stratified_sample_per_stratum_rates(ray_session):
    ds = read(SF, "events", ["event_id", "event_type"])
    types = ds.groupby("event_type").count().to_pandas()
    counts = dict(zip(types["event_type"], types["count()"]))
    rates = {"click": 0.5, "purchase": 1.0}
    out = stratified_sample(
        ds, "event_id", rates, key_col="event_type", seed=3
    ).to_pandas()
    got_counts = out["event_type"].value_counts().to_dict()
    # absent strata are dropped entirely
    assert set(got_counts) <= set(rates)
    assert got_counts.get("purchase", 0) == counts["purchase"]
    assert 0.38 * counts["click"] <= got_counts.get("click", 0) <= 0.62 * counts["click"]


def test_stratified_sample_string_ids(ray_session):
    t = pa.table({"sid": pa.array([f"doc-{i}" for i in range(2000)], pa.string())})
    ds = rd.from_arrow(t)
    a = stratified_sample(ds, "sid", 0.25, seed=11).to_pandas()
    b = stratified_sample(ds, "sid", 0.25, seed=11).to_pandas()
    assert sorted(a["sid"]) == sorted(b["sid"])
    assert 0.18 <= len(a) / 2000 <= 0.32


def test_stratified_sample_null_ids_deterministic(ray_session):
    t = pa.table({"k": pa.array([1, None, 2, None, 3], pa.int64())})
    ds = rd.from_arrow(t)
    a = stratified_sample(ds, "k", 0.5, seed=2).to_pandas()
    b = stratified_sample(ds, "k", 0.5, seed=2).to_pandas()
    # no crash, no undefined NaN cast: identical decision every run,
    # and all null ids share one decision
    assert a["k"].isna().sum() == b["k"].isna().sum()
    assert sorted(a["k"].fillna(-1)) == sorted(b["k"].fillna(-1))
    s = pa.table({"k": pa.array(["a", None, "b"], pa.string())})
    out = stratified_sample(rd.from_arrow(s), "k", 1.0, seed=1).to_pandas()
    assert len(out) == 3  # string nulls don't crash; f=1.0 keeps all


# ---------------------------------------------------------------------------
# top_k_per_group
# ---------------------------------------------------------------------------


def test_top_k_per_group_vs_duckdb(ray_session):
    ds = read(SF, "events", ["event_id", "user_id", "ts"])
    got = top_k_per_group(
        ds, "user_id", ["ts", "event_id"], 3, descending=[True, False]
    ).to_pandas()
    want = _duck_with_dim(
        """
        SELECT event_id, user_id, ts FROM (
          SELECT event_id, user_id, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id) AS rn
          FROM events
        ) WHERE rn <= 3
        """,
        pd.DataFrame({"x": [0]}),
    )
    _assert_equal(got, want)


def test_top_k_per_group_validates(ray_session):
    ds = read(SF, "events", ["event_id", "user_id"])
    with pytest.raises(ValueError, match="k must be"):
        top_k_per_group(ds, "user_id", "event_id", 0)


# ---------------------------------------------------------------------------
# smart_join
# ---------------------------------------------------------------------------


def _join_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "nation", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_smart_join_broadcast_and_shuffle_agree_with_duckdb(ray_session):
    from kgforge.relops import smart_join

    cust = read(SF, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    nat = read(SF, "nation", ["n_nationkey", "n_name"])
    want = _join_oracle(
        """
        SELECT c_custkey, c_nationkey, c_acctbal, n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        """
    )
    for strat in ("broadcast", "shuffle"):
        got = smart_join(
            cust, nat, "c_nationkey", right_on="n_nationkey", strategy=strat
        ).to_pandas()
        got = got[["c_custkey", "c_nationkey", "c_acctbal", "n_name"]]
        _assert_equal(got, want)


def test_smart_join_left_keeps_unmatched(ray_session):
    from kgforge.relops import smart_join

    cust = read(SF, "customer", ["c_custkey", "c_nationkey"])
    # restrict the right side so some customers have no match
    nat = read(SF, "nation", ["n_nationkey", "n_name"]).map_batches(
        lambda t: t.filter(pa.compute.less(t["n_nationkey"], 5)),
        batch_format="pyarrow",
    )
    want = _join_oracle(
        """
        SELECT c_custkey, c_nationkey, n_name
        FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 5) n
          ON c_nationkey = n_nationkey
        """
    )
    for strat in ("broadcast", "shuffle"):
        got = smart_join(
            cust, nat, "c_nationkey", right_on="n_nationkey", how="left", strategy=strat
        ).to_pandas()[["c_custkey", "c_nationkey", "n_name"]]
        _assert_equal(got, want)


def test_smart_join_auto_picks_broadcast_for_small_right(ray_session):
    from kgforge.relops import smart_join

    cust = read(SF, "customer", ["c_custkey", "c_nationkey"])
    nat = read(SF, "nation", ["n_nationkey", "n_name"])
    out = smart_join(cust, nat, "c_nationkey", right_on="n_nationkey").to_pandas()
    assert len(out) == cust.count()
    with pytest.raises(ValueError, match="how must be"):
        smart_join(cust, nat, "c_nationkey", how="full")


def test_smart_join_null_keys_never_match_either_strategy(ray_session):
    from kgforge.relops import smart_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()), "x": pa.array([10, 20], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([None], pa.int64()), "y": pa.array([99], pa.int64())})
    )
    for strat in ("broadcast", "shuffle"):
        inner = smart_join(left, right, "k", strategy=strat).to_pandas()
        assert len(inner) == 0, strat  # SQL: NULL = NULL is not a match
        lft = smart_join(left, right, "k", how="left", strategy=strat).to_pandas()
        assert len(lft) == 2 and lft["y"].isna().all(), strat


def test_smart_join_suffixes_overlapping_columns_both_strategies(ray_session):
    from kgforge.relops import smart_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, 20], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([7, 8], pa.int64())})
    )
    for strat in ("broadcast", "shuffle"):
        out = smart_join(left, right, "k", strategy=strat).to_pandas()
        assert {"k", "v", "v_r"} <= set(out.columns), (strat, out.columns)
        out = out.sort_values("k", ignore_index=True)
        assert out["v"].tolist() == [10, 20] and out["v_r"].tolist() == [7, 8], strat


def test_smart_join_strategies_share_schema_with_right_on(ray_session):
    from kgforge.relops import smart_join

    cust = read(SF, "customer", ["c_custkey", "c_nationkey"])
    nat = read(SF, "nation", ["n_nationkey", "n_name"])
    cols = {}
    for strat in ("broadcast", "shuffle"):
        out = smart_join(
            cust, nat, "c_nationkey", right_on="n_nationkey", strategy=strat
        ).to_pandas()
        cols[strat] = sorted(out.columns)
        # contract: left cols + right NON-KEY cols; right_on keys dropped
        assert "n_nationkey" not in out.columns, strat
    assert cols["broadcast"] == cols["shuffle"] == ["c_custkey", "c_nationkey", "n_name"]


def test_sample_hash_u64_nonstring_key_types(ray_session):
    """Float / timestamp keys canonicalize through a string cast; an
    uncastable type gets a clear ValueError (ADVICE r2)."""
    from kgforge.relops import sample_hash_u64

    f = pa.array([1.5, 2.5, None, 1.5], pa.float64())
    h = sample_hash_u64(f, 7)
    assert h[0] == h[3] and h[0] != h[1]
    ts = pa.array([1000, 2000], pa.timestamp("s"))
    h2 = sample_hash_u64(ts, 7)
    assert h2[0] != h2[1]
    # sampling by float key end-to-end (used to crash with TypeError)
    ds = rd.from_arrow(pa.table({"fk": pa.array([0.1 * i for i in range(200)])}))
    out = stratified_sample(ds, "fk", 0.5, seed=3).to_pandas()
    assert 0 < len(out) < 200
    import pytest as _pytest

    nested = pa.array([[1, 2], [3]], pa.list_(pa.int64()))
    with _pytest.raises(ValueError, match="unsupported key type"):
        sample_hash_u64(nested, 7)


def test_drop_empty_blocks_all_empty_keeps_schema(ray_session):
    """ALL-0-row input: the rebuilt dataset must carry ONE schema-ful
    empty block, not the schema-less originals (ADVICE r2)."""
    from kgforge.rayutil import drop_empty_blocks

    sch = pa.schema([("k", pa.string()), ("v", pa.int64())])
    ds = rd.from_arrow(sch.empty_table()).filter(lambda r: False)
    out = drop_empty_blocks(ds)
    assert out.count() == 0
    blocks = [
        md.num_rows
        for b in out.materialize().iter_internal_ref_bundles()
        for _, md in b.blocks
    ]
    assert blocks == [0]


def test_quantile_filter_band(ray_session):
    """Corpus-relative band filter: thresholds within t-digest tolerance
    of exact quantiles, kept fraction ≈ the band width, nulls dropped."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgforge.relops import quantile_filter, quantile_thresholds

    rng = np.random.RandomState(3)
    vals = rng.lognormal(0, 1.5, 20000)  # heavy-tailed, like quality/ppl
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(len(vals)), "v": vals})).repartition(8)

    thr = quantile_thresholds(ds, "v", (0.1, 0.9))
    lo_exact, hi_exact = np.quantile(vals, [0.1, 0.9])
    assert abs(thr[0.1] - lo_exact) / lo_exact < 0.05
    assert abs(thr[0.9] - hi_exact) / hi_exact < 0.05

    kept = quantile_filter(ds, "v", 0.1, 0.9).to_pandas()
    frac = len(kept) / len(vals)
    assert 0.77 <= frac <= 0.83
    assert kept["v"].min() >= thr[0.1] and kept["v"].max() <= thr[0.9]

    # nulls never match the band
    with_null = rd.from_pandas(pd.DataFrame({"v": [1.0, None, 2.0, 3.0]}))
    out = quantile_filter(with_null, "v", 0.0, 1.0).to_pandas()
    assert out["v"].notna().all() and len(out) == 3

    # degenerate inputs: empty stays empty; an all-null column returns
    # ZERO rows (null never matches — on every path, incl. NaN thresholds)
    empty = rd.from_pandas(pd.DataFrame({"v": pd.array([], dtype="float64")}))
    assert quantile_filter(empty, "v", 0.2, 0.8).count() == 0
    all_null = rd.from_pandas(pd.DataFrame({"v": pd.array([None, None], dtype="float64")}))
    assert quantile_filter(all_null, "v", 0.0, 1.0).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_filter(ds, "v", 0.9, 0.1)


def test_interval_join_fixed_size_list_payload(ray_session):
    """The Arrow-native kernel must carry fixed_size_list payload
    columns (embeddings) through the acero join — acero rejects them as
    non-key fields, so they ride packed as fixed_size_binary (the
    pandas kernel this replaced accepted them silently)."""
    probe = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "k": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([5, 50, 5], pa.int64()),
            "emb": pa.array(
                [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float32(), 2)
            ),
        }
    )
    dim = pd.DataFrame({"k": [1, 2], "lo": [0, 0], "hi": [10, 10], "tag": ["a", "b"]})
    out = (
        broadcast_interval_join(rd.from_arrow(probe), dim, "k", "ts", "lo", "hi", how="left")
        .to_pandas()
        .sort_values("rid", ignore_index=True)
    )
    assert out["tag"].tolist() == ["a", None, "b"]
    assert [list(e) for e in out["emb"]] == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
