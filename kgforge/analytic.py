"""Analytic operators: partitioned window functions, ROLLUP / CUBE /
GROUPING SETS, and pivot (SURVEY §2.I2/I4 extension — the SQL-analytics
surface a user of a kbgen-class engine expects next to plain groupbys).

Ray-Data-first shapes:

- ``window()`` — SQL ``fn() OVER (PARTITION BY p ORDER BY o)`` as
  ``ds.groupby(partition).map_groups`` with every window kernel
  vectorized (numpy / pandas) inside the sorted group.  Partitioning
  assumption (same as Spark/Flink partitioned windows): ONE PARTITION
  must fit in a worker's heap.  An unpartitioned window is a single
  group — callers get an explicit error unless they opt in, so a
  global window over web-scale data cannot sneak in silently.
- ``grouping_sets()`` / ``rollup()`` / ``cube()`` — ONE distributed
  shuffle at the finest grain; every coarser grouping set is
  re-aggregated from the finest partials (algebraic aggregates:
  count/sum/min/max, with mean derived as sum/count).  The finest
  aggregate is bounded by group cardinality, so the re-aggregation is
  driver-side Arrow/pandas over a small table — no second shuffle.
  A ``grouping_id`` bitmask column (SQL ``GROUPING()``) disambiguates
  "NULL because rolled up" from "NULL key in the data".
- ``pivot()`` — finest groupby (one shuffle) then a per-index
  ``map_groups`` reshape to wide rows.  The pivot-value set must be
  supplied (stable schema at scale) or is discovered from the small
  aggregated result.
"""

from __future__ import annotations

from collections.abc import Sequence
from itertools import chain, combinations
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import AggregateFnV2, Count, Max, Min, Sum

# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

#: spec field ``fn`` → (needs ``col``, needs numeric col)
WINDOW_FNS: dict[str, bool] = {
    "row_number": False,
    "rank": False,
    "dense_rank": False,
    "percent_rank": False,
    "cume_dist": False,
    "ntile": False,
    "lag": True,
    "lead": True,
    "first_value": True,
    "last_value": True,   # FULL-partition frame (ROWS UNBOUNDED BOTH WAYS)
    "nth_value": True,    # FULL-partition frame; 1-based 'n'
    "cumsum": True,
    "cummin": True,
    "cummax": True,
    "rolling_sum": True,
    "rolling_mean": True,
    "rolling_min": True,
    "rolling_max": True,
}


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _validate_specs(specs: Sequence[dict[str, Any]]) -> None:
    seen: set[str] = set()
    for s in specs:
        fn = s.get("fn")
        if fn not in WINDOW_FNS:
            raise ValueError(f"unknown window fn {fn!r}; supported: {sorted(WINDOW_FNS)}")
        out = s.get("out")
        if not out or out in seen:
            raise ValueError(f"every spec needs a unique 'out' column (got {out!r})")
        seen.add(out)
        if WINDOW_FNS[fn] and not s.get("col"):
            raise ValueError(f"window fn {fn!r} needs a 'col'")
        if fn in ("ntile", "nth_value") and int(s.get("n") or 0) < 1:
            raise ValueError(f"{fn} needs 'n' >= 1")
        if fn in ("rolling_sum", "rolling_mean", "rolling_min", "rolling_max") and not s.get("window"):
            raise ValueError(f"{fn} needs 'window'")


def _order_boundaries(g: pd.DataFrame, order_keys: list[str]) -> np.ndarray:
    """Boolean array: True where the ORDER BY key differs from the
    previous row (row 0 is always True).  NaN keys compare equal to NaN
    (SQL peers).  Delegates to ``_bound_mask`` — ONE implementation of
    the NaN-peer boundary semantics for both window kernels."""
    return _bound_mask(g, order_keys)


def _apply_specs(
    g: pd.DataFrame, order_keys: list[str], ascending: list[bool], specs: Sequence[dict]
) -> pd.DataFrame:
    g = g.sort_values(order_keys, ascending=ascending, kind="stable").reset_index(drop=True)
    n = len(g)
    new = None  # lazily computed tie-group boundaries

    def boundaries() -> np.ndarray:
        nonlocal new
        if new is None:
            new = _order_boundaries(g, order_keys)
        return new

    for s in specs:
        fn, out = s["fn"], s["out"]
        if fn == "row_number":
            g[out] = np.arange(1, n + 1, dtype=np.int64)
        elif fn == "rank":
            b = boundaries()
            start = np.where(b, np.arange(1, n + 1, dtype=np.int64), 0)
            g[out] = np.maximum.accumulate(start)
        elif fn == "dense_rank":
            g[out] = np.cumsum(boundaries()).astype(np.int64)
        elif fn == "percent_rank":
            b = boundaries()
            start = np.where(b, np.arange(1, n + 1, dtype=np.int64), 0)
            rank = np.maximum.accumulate(start)
            g[out] = (rank - 1) / (n - 1) if n > 1 else np.zeros(n)
        elif fn == "cume_dist":
            b = boundaries()
            dense = np.cumsum(b) - 1
            counts = np.bincount(dense)
            end_pos = np.cumsum(counts)  # last row index (1-based) of each tie group
            g[out] = end_pos[dense] / n
        elif fn == "ntile":
            # SQL ntile: first n%k buckets get ceil(n/k) rows, the rest floor(n/k)
            k = int(s["n"])
            base, rem = divmod(n, k)
            sizes = np.full(min(k, n), base, dtype=np.int64)
            sizes[:rem] += 1
            g[out] = np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64), sizes[: len(sizes)])[:n]
        elif fn == "lag":
            g[out] = g[s["col"]].shift(int(s.get("offset", 1)))
        elif fn == "lead":
            g[out] = g[s["col"]].shift(-int(s.get("offset", 1)))
        elif fn == "first_value":
            g[out] = g[s["col"]].iloc[0] if n else None
        elif fn == "last_value":
            # FULL-partition frame (SQL: ROWS BETWEEN UNBOUNDED PRECEDING
            # AND UNBOUNDED FOLLOWING) — the default running frame would
            # make last_value ≡ the current row
            g[out] = g[s["col"]].iloc[-1] if n else None
        elif fn == "nth_value":
            k = int(s["n"])
            g[out] = g[s["col"]].iloc[k - 1] if 1 <= k <= n else None
        elif fn == "cumsum":
            # SQL running sum SKIPS nulls (null only until the first
            # non-null); pandas cumsum would pin NaN at the null row
            vals = g[s["col"]]
            g[out] = vals.fillna(0).cumsum().where(vals.notna().cumsum() > 0)
        elif fn == "cummin":
            g[out] = g[s["col"]].cummin().ffill()
        elif fn == "cummax":
            g[out] = g[s["col"]].cummax().ffill()
        elif fn in ("rolling_sum", "rolling_mean", "rolling_min", "rolling_max"):
            r = g[s["col"]].rolling(int(s["window"]), min_periods=1)
            g[out] = getattr(r, fn.split("_")[1])()
    return g


def _bound_mask(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """True where any of ``keys`` differs from the previous row (row 0
    True); NaN == NaN (SQL peers / same group)."""
    n = len(df)
    new = np.ones(n, dtype=bool)
    if n > 1 and keys:
        same = np.ones(n - 1, dtype=bool)
        for k in keys:
            col = df[k]
            eq = col.values[1:] == col.values[:-1]
            both_na = col.isna().values[1:] & col.isna().values[:-1]
            same &= eq | both_na
        new[1:] = ~same
    return new


def _apply_specs_grouped(
    df: pd.DataFrame,
    part_keys: list[str],
    order_keys: list[str],
    ascending: list[bool],
    specs: Sequence[dict],
) -> pd.DataFrame:
    """Vectorized multi-group window kernel: ONE stable sort over
    (partition keys, order keys), then every window function computed
    across ALL groups at once — numpy boundary arithmetic for the rank
    family / lag / lead, Cython ``groupby(gid)`` transforms for the
    cumulative and rolling fns.  No per-group Python call: this is what
    makes million-partition PARTITION BY affordable (the per-group
    ``map_groups`` path pays Ray's ~7 µs/group)."""
    df = df.sort_values(
        part_keys + order_keys,
        ascending=[True] * len(part_keys) + ascending,
        kind="stable",
    ).reset_index(drop=True)
    n = len(df)
    if n == 0:
        return df
    new_grp = _bound_mask(df, part_keys)
    new_ord = new_grp | _bound_mask(df, order_keys)
    gid = np.cumsum(new_grp) - 1
    starts_idx = np.nonzero(new_grp)[0]
    grp_start = starts_idx[gid]
    pos = np.arange(n, dtype=np.int64) - grp_start
    sizes = np.diff(np.append(starts_idx, n))
    n_in = sizes[gid]
    gids = pd.Series(gid)  # integer keys → Cython-grouped transforms

    rank = None  # lazily shared by rank / percent_rank

    def _rank() -> np.ndarray:
        nonlocal rank
        if rank is None:
            t_start = np.maximum.accumulate(
                np.where(new_ord, np.arange(n, dtype=np.int64), -1)
            )
            rank = t_start - grp_start + 1
        return rank

    for s in specs:
        fn, out = s["fn"], s["out"]
        if fn == "row_number":
            df[out] = pos + 1
        elif fn == "rank":
            df[out] = _rank()
        elif fn == "dense_rank":
            cum_ord = np.cumsum(new_ord)
            df[out] = cum_ord - cum_ord[grp_start] + 1
        elif fn == "percent_rank":
            df[out] = np.where(n_in > 1, (_rank() - 1) / np.maximum(n_in - 1, 1), 0.0)
        elif fn == "cume_dist":
            tid = np.cumsum(new_ord) - 1
            t_starts = np.nonzero(new_ord)[0]
            t_sizes = np.diff(np.append(t_starts, n))
            t_end = t_starts[tid] + t_sizes[tid] - 1
            df[out] = (t_end - grp_start + 1) / n_in
        elif fn == "ntile":
            k = int(s["n"])
            base, rem = n_in // k, n_in % k
            cutoff = rem * (base + 1)
            df[out] = np.where(
                pos < cutoff,
                pos // (base + 1),
                rem + (pos - cutoff) // np.maximum(base, 1),
            ) + 1
        elif fn in ("lag", "lead"):
            off = int(s.get("offset", 1))
            if fn == "lag":
                shifted = df[s["col"]].shift(off)
                valid = pos >= off
            else:
                shifted = df[s["col"]].shift(-off)
                valid = pos < n_in - off
            df[out] = shifted.where(pd.Series(valid))
        elif fn == "first_value":
            df[out] = df[s["col"]].values[grp_start]
        elif fn == "last_value":
            df[out] = df[s["col"]].values[grp_start + n_in - 1]
        elif fn == "nth_value":
            kk = int(s["n"])
            idx = np.minimum(grp_start + kk - 1, n - 1)
            picked = pd.Series(df[s["col"]].values[idx], index=df.index)
            df[out] = picked.where(pd.Series(kk <= n_in, index=df.index))
        elif fn == "cumsum":
            vals = df[s["col"]]
            c = vals.fillna(0).groupby(gids).cumsum()
            nn = vals.notna().groupby(gids).cumsum()
            df[out] = c.where(nn > 0)
        elif fn == "cummin":
            df[out] = df[s["col"]].groupby(gids).cummin().groupby(gids).ffill()
        elif fn == "cummax":
            df[out] = df[s["col"]].groupby(gids).cummax().groupby(gids).ffill()
        elif fn in ("rolling_sum", "rolling_mean", "rolling_min", "rolling_max"):
            w = int(s["window"])
            r = df[s["col"]].groupby(gids).rolling(w, min_periods=1)
            agg = getattr(r, fn.split("_")[1])()
            df[out] = agg.reset_index(level=0, drop=True).sort_index()
    return df


#: 'auto' window strategy flips from per-group map_groups to the hashed
#: multi-group kernel at or above this many input rows; override via
#: KGFORGE_WINDOW_HASHED_ROWS
WINDOW_HASHED_ROWS = 2_000_000

#: hashed-strategy bucket sizing target (rows per bucket) when
#: num_partitions is None; override via KGFORGE_WINDOW_BUCKET_ROWS.
#: Each bucket is one worker-heap pandas frame, so this bounds the
#: kernel's peak per-worker memory.
WINDOW_BUCKET_ROWS = 250_000


def window(
    ds: Dataset,
    partition_by: str | Sequence[str] | None,
    order_by: str | Sequence[str],
    specs: Sequence[dict[str, Any]],
    *,
    descending: bool | Sequence[bool] = False,
    allow_global: bool = False,
    strategy: str = "auto",
    num_partitions: int | None = None,
) -> Dataset:
    """SQL window functions over ``PARTITION BY partition_by ORDER BY
    order_by``; frame semantics are ``ROWS`` (``ROWS UNBOUNDED
    PRECEDING`` for cumulative fns, ``ROWS window-1 PRECEDING`` for
    rolling fns) — match the oracle SQL with an explicit ROWS frame.
    Exception: ``last_value`` and ``nth_value`` use the FULL-partition
    frame (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING``) — under SQL's default running frame ``last_value``
    would always equal the current peer-group end, which is never what
    callers want; a SQL port with default frames must add the explicit
    UNBOUNDED FOLLOWING frame to match.

    ``specs``: list of ``{"out": name, "fn": name, ...}`` dicts, fn one
    of ``WINDOW_FNS``.  ``lag``/``lead`` take ``col`` and ``offset``;
    ``ntile`` takes ``n``; ``rolling_*`` take ``col`` and ``window``.

    Determinism: rows are sorted with a STABLE sort inside the group;
    for ``row_number``/``ntile`` to be reproducible across runs the
    ORDER BY keys must be unique per partition (append a tiebreak
    column, exactly as SQL requires).

    ``partition_by=None`` is a GLOBAL window: the whole dataset becomes
    one group on one worker.  That is a deliberate scale hazard, so it
    requires ``allow_global=True`` (meant for small / pre-aggregated
    inputs only).

    ``strategy``: ``'auto'`` (default) picks 'hashed' at or above
    KGFORGE_WINDOW_HASHED_ROWS input rows, 'groups' below (correct
    either way — only the physical grouping differs).  ``'groups'``
    shuffles with ``groupby(partition).map_groups`` — right while
    partitions are few and large.  ``'hashed'`` hash-buckets the
    partition KEYS into ``num_partitions`` coarse groups and runs the
    vectorized multi-group kernel (``_apply_specs_grouped``) once per
    bucket — the million-partition path: Ray pays ~7 µs per
    ``map_groups`` group, so a 10⁶-key PARTITION BY costs seconds of
    pure per-group overhead that the hashed kernel replaces with one
    sort + numpy/Cython scans.

    ``num_partitions`` (hashed only) bounds memory: each bucket holds
    ~rows/num_partitions rows in ONE worker's pandas heap for the sort.
    ``None`` (default) sizes it as rows / KGFORGE_WINDOW_BUCKET_ROWS
    (default 250k, floor 64) so the per-bucket frame stays worker-sized
    no matter the input — a fixed count would put N/64 rows in one heap
    at exactly the scale that triggers the hashed plan.
    """
    order_keys = _as_list(order_by)
    asc = (
        [not descending] * len(order_keys)
        if isinstance(descending, bool)
        else [not d for d in descending]
    )
    if len(asc) != len(order_keys):
        raise ValueError("descending must be a bool or match order_by length")
    specs = [dict(s) for s in specs]
    _validate_specs(specs)

    if partition_by is None:
        if not allow_global:
            raise ValueError(
                "global (unpartitioned) window collapses the dataset onto one "
                "worker; pass allow_global=True only for small inputs"
            )

        def apply_all(g: pd.DataFrame) -> pd.DataFrame:
            return _apply_specs(g, order_keys, asc, specs)

        return ds.repartition(1).map_batches(apply_all, batch_format="pandas", batch_size=None)

    part_keys = _as_list(partition_by)
    n_rows: int | None = None
    if strategy == "auto":
        import os

        # materialize before the size probe: count() executes a lazy
        # lineage, and the chosen plan would re-execute it — exactly the
        # multi-million-row inputs this gate exists for (smart_join's
        # auto does the same)
        ds = ds.materialize()
        n_rows = ds.count()
        limit = int(os.environ.get("KGFORGE_WINDOW_HASHED_ROWS", WINDOW_HASHED_ROWS))
        strategy = "hashed" if n_rows >= limit else "groups"
    if strategy == "hashed":

        def apply_specs(g: pd.DataFrame) -> pd.DataFrame:
            return _apply_specs_grouped(g, part_keys, order_keys, asc, specs)

        return hash_bucketed_groups(
            ds, part_keys, apply_specs, num_partitions=num_partitions, n_rows=n_rows
        )
    if strategy != "groups":
        raise ValueError(f"unknown strategy {strategy!r}")
    key = part_keys[0] if len(part_keys) == 1 else part_keys

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return _apply_specs(g, order_keys, asc, specs)

    return ds.groupby(key).map_groups(apply, batch_format="pandas")


def hash_bucketed_groups(
    ds: Dataset,
    part_keys: Sequence[str],
    frame_fn,
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> Dataset:
    """The shared hashed multi-group machinery: hash the partition keys
    into worker-sized coarse buckets and run ``frame_fn`` (a whole-frame
    pandas kernel) ONCE per bucket.  Every partition key lands entirely
    in one bucket, so any per-partition computation (window functions,
    sessionization, per-group aggregation) is exact — and Ray's ~7 µs
    per-``map_groups``-group overhead is paid on ~rows/250k buckets,
    never on millions of partition keys (the landmine this repo has now
    measured three times: LSH band counting 446 s → 4.8 s, window
    ``strategy='hashed'`` 196×, r5 sessionize/as-of conversion).

    ``num_partitions=None`` sizes buckets at KGFORGE_WINDOW_BUCKET_ROWS
    rows each (floor 64) so one bucket's pandas frame stays worker-sized
    at any input scale."""
    import os

    from kgforge.relops import sample_hash_u64

    part_keys = list(part_keys)
    if num_partitions is None:
        if n_rows is None:
            # materialize before counting: the chosen plan re-reads the
            # input, and a lazy lineage would re-execute per consumer
            ds = ds.materialize()
            n_rows = ds.count()
        target = int(os.environ.get("KGFORGE_WINDOW_BUCKET_ROWS", WINDOW_BUCKET_ROWS))
        # ceil-divide so every bucket targets ≤ target rows; floor 64
        # keeps small-but-forced-hashed inputs parallel
        P = max(64, -(-n_rows // max(1, target)))
    else:
        P = int(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for i, k in enumerate(part_keys):
            h ^= sample_hash_u64(t[k], 1000 + i)
        return t.append_column(
            "__wpart", pa.array((h % np.uint64(P)).astype(np.int64), pa.int64())
        )

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return frame_fn(g.drop(columns="__wpart"))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__wpart")
        .map_groups(apply_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# sessionization (SURVEY §2.I3)
# ---------------------------------------------------------------------------


def _sessionize_frame(
    df: pd.DataFrame,
    part_keys: list[str],
    ts_col: str,
    gap,
    out_col: str,
) -> pd.DataFrame:
    """Vectorized multi-group sessionization kernel (the
    ``_apply_specs_grouped`` pattern): ONE stable sort over (partition
    keys, ts), then per-partition 1-based session ids via boundary
    arithmetic — no per-group Python call.  A new session starts at each
    partition boundary and wherever the gap from the previous row
    exceeds ``gap``."""
    df = df.sort_values(part_keys + [ts_col], kind="stable").reset_index(drop=True)
    n = len(df)
    if n == 0:
        df[out_col] = pd.Series(dtype="int64")
        return df
    new_grp = _bound_mask(df, part_keys)
    # diff > gap is False at NaN/NaT (a null ts never OPENS a session —
    # it joins its predecessor's, matching SQL where NULL - ts is NULL)
    new_sess = new_grp | (df[ts_col].diff() > gap).to_numpy()
    sid = np.cumsum(new_sess)
    starts_idx = np.nonzero(new_grp)[0]
    gid = np.cumsum(new_grp) - 1
    grp_start = starts_idx[gid]
    df[out_col] = (sid - sid[grp_start] + 1).astype(np.int64)
    return df


def sessionize(
    ds: Dataset,
    partition_by: str | Sequence[str],
    ts_col: str,
    gap,
    *,
    out_col: str = "session_id",
    num_partitions: int | None = None,
) -> Dataset:
    """Gap-and-island sessionization (SURVEY §2.I3): within each
    partition, ordered by ``ts_col``, a new session starts where the gap
    from the previous row exceeds ``gap`` (a ``pd.Timedelta`` for
    timestamp axes, a number for numeric ones); ids are 1-based per
    partition.  Equivalent SQL: ``1 + sum(new_sess) OVER (PARTITION BY
    keys ORDER BY ts)`` with ``new_sess = (ts - lag(ts) > gap)``.

    Always the hashed multi-group plan (``hash_bucketed_groups``): a
    ``groupby(user).map_groups`` plan pays Ray's ~7 µs per GROUP, which
    at web-scale user counts is pure per-group overhead — here the cost
    is one hash shuffle plus a vectorized kernel per ~250k-row bucket."""
    part_keys = _as_list(partition_by)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _sessionize_frame(g, part_keys, ts_col, gap, out_col)

    return hash_bucketed_groups(ds, part_keys, bucket, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------

#: agg spec fn → Ray aggregate over the finest grain
_ALGEBRAIC = ("count", "sum", "min", "max", "mean", "var", "std")


def _validate_agg_specs(aggs: Sequence[dict]) -> None:
    """Reject duplicate 'out' names up front: the partial-alias dedup in
    ``_finest_aggregate`` would otherwise silently drop the second
    aggregate sharing an out and stamp every duplicate output column
    with the FIRST agg's values — the same mistake ``window()`` already
    raises on (``_validate_specs``)."""
    seen: set[str] = set()
    for a in aggs:
        fn = a.get("fn")
        if fn not in _ALGEBRAIC:
            raise ValueError(f"unsupported agg fn {fn!r}; algebraic fns: {_ALGEBRAIC}")
        out = a.get("out")
        if not out or out in seen:
            raise ValueError(f"every agg spec needs a unique 'out' column (got {out!r})")
        seen.add(out)
        if fn != "count" and not a.get("col"):
            raise ValueError(f"agg fn {fn!r} needs a 'col'")


def _partial_names(aggs: list[dict]) -> list[str]:
    """Partial-column aliases the finest aggregate emits for ``aggs``."""
    names: list[str] = []
    for a in aggs:
        fn, out = a["fn"], a["out"]
        if fn == "count":
            names.append(f"__cnt_{out}")
        elif fn in ("sum", "min", "max"):
            names.append(f"__{fn}_{out}")
        elif fn == "mean":
            names += [f"__sum_{out}", f"__cnt_{out}"]
        elif fn in ("var", "std"):
            names += [f"__sum_{out}", f"__ssq_{out}", f"__cnt_{out}"]
    seen: set[str] = set()
    return [n for n in names if not (n in seen or seen.add(n))]


def _finest_aggregate_ds(ds: Dataset, keys: list[str], aggs: list[dict]) -> Dataset:
    """One distributed shuffle: per-finest-group algebraic partials.
    mean is carried as (sum, count), var/std as (sum, sum-of-squares,
    count) — all re-aggregable, finalized per grouping set.  Returns the
    aggregated DATASET (one row per finest group) — whether it ever
    lands on the driver is the caller's capped decision."""
    # var/std partials need a squared column on the INPUT before the
    # groupby: append them once (one extra f64 column per distinct col)
    sq_cols = {a["col"] for a in aggs if a["fn"] in ("var", "std")}
    if sq_cols:
        _sq = sorted(sq_cols)

        def add_sq(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            for c in _sq:
                v = pc.cast(t[c], pa.float64())
                t = t.append_column(f"__sq__{c}", pc.multiply(v, v))
            return t

        ds = ds.map_batches(add_sq, batch_format="pyarrow")
    ray_aggs = []
    for a in aggs:
        fn, col, out = a["fn"], a.get("col"), a["out"]
        if fn == "count":
            # count(*) without col; SQL count(col) (non-null only) with
            ray_aggs.append(
                Count(col, ignore_nulls=True, alias_name=f"__cnt_{out}")
                if col
                else Count(alias_name=f"__cnt_{out}")
            )
        elif fn == "sum":
            ray_aggs.append(Sum(col, alias_name=f"__sum_{out}"))
        elif fn == "min":
            ray_aggs.append(Min(col, alias_name=f"__min_{out}"))
        elif fn == "max":
            ray_aggs.append(Max(col, alias_name=f"__max_{out}"))
        elif fn == "mean":
            # SQL avg divides by the NON-NULL count of col, not count(*)
            ray_aggs.append(Sum(col, alias_name=f"__sum_{out}"))
            ray_aggs.append(Count(col, ignore_nulls=True, alias_name=f"__cnt_{out}"))
        elif fn in ("var", "std"):
            ray_aggs.append(Sum(col, alias_name=f"__sum_{out}"))
            ray_aggs.append(Sum(f"__sq__{col}", alias_name=f"__ssq_{out}"))
            ray_aggs.append(Count(col, ignore_nulls=True, alias_name=f"__cnt_{out}"))
        else:
            raise ValueError(f"unsupported agg fn {fn!r}; algebraic fns: {_ALGEBRAIC}")
    # Count() counts rows; dedup identical aliases (mean+count on same out)
    names: set[str] = set()
    uniq = []
    for ra in ray_aggs:
        alias = ra.name
        if alias not in names:
            names.add(alias)
            uniq.append(ra)
    return ds.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*uniq)


def _collect_base(base_ds: Dataset, keys: list[str], aggs: list[dict]) -> pd.DataFrame:
    """Driver-side finest-partials frame (the under-cap path)."""
    base = base_ds.to_pandas()
    if base.empty:
        # empty input: pin the expected columns so the grand-total row
        # can still be derived (SQL ROLLUP over an empty table emits it)
        base = pd.DataFrame(
            {c: pd.Series(dtype=float) for c in keys + sorted(_partial_names(aggs))}
        )
    return base


def _reaggregate(base: pd.DataFrame, sub_keys: list[str], aggs: list[dict]) -> pd.DataFrame:
    """Collapse the finest partials to one grouping set (pandas, small)."""
    # SQL sum/avg over ZERO non-null inputs is NULL, not 0 → min_count=1
    def _sum_null_if_empty(s: pd.Series):
        return s.sum(min_count=1)

    how = {}
    for a in aggs:
        fn, out = a["fn"], a["out"]
        if fn in ("count",):
            how[f"__cnt_{out}"] = "sum"
        elif fn == "sum":
            how[f"__sum_{out}"] = _sum_null_if_empty
        elif fn == "min":
            how[f"__min_{out}"] = "min"
        elif fn == "max":
            how[f"__max_{out}"] = "max"
        elif fn == "mean":
            how[f"__sum_{out}"] = _sum_null_if_empty
            how[f"__cnt_{out}"] = "sum"
        elif fn in ("var", "std"):
            how[f"__sum_{out}"] = _sum_null_if_empty
            how[f"__ssq_{out}"] = _sum_null_if_empty
            how[f"__cnt_{out}"] = "sum"
    if sub_keys:
        g = base.groupby(sub_keys, dropna=False).agg(how).reset_index()
    else:
        # pandas .agg chokes on a string/callable mix over an empty
        # frame — compute the single grand-total row explicitly
        row = {
            col: (op(base[col]) if callable(op) else getattr(base[col], op)())
            for col, op in how.items()
        }
        g = pd.DataFrame([row])
    g = _finalize_partials(g, aggs)
    return g[sub_keys + [a["out"] for a in aggs]]


def _finalize_partials(g: pd.DataFrame, aggs: Sequence[dict]) -> pd.DataFrame:
    """Combined partial columns → final agg outputs (shared by the
    driver finalize and the in-cluster per-set finalize)."""
    for a in aggs:
        fn, out = a["fn"], a["out"]
        if fn == "count":
            g[out] = g[f"__cnt_{out}"].astype("int64")
        elif fn == "mean":
            g[out] = g[f"__sum_{out}"] / g[f"__cnt_{out}"]
        elif fn in ("var", "std"):
            # SAMPLE variance (SQL var_samp / stddev_samp): NULL when
            # n < 2; clip tiny negative float residue before the sqrt
            n_ = g[f"__cnt_{out}"].astype(float)
            var = (g[f"__ssq_{out}"] - g[f"__sum_{out}"] ** 2 / n_) / (n_ - 1)
            var = var.clip(lower=0.0).where(n_ >= 2)
            g[out] = np.sqrt(var) if fn == "std" else var
        else:
            g[out] = g[f"__{fn}_{out}"]
    return g


#: driver finalize gathers at most this many finest-grain rows; above it
#: every grouping set is re-aggregated IN-CLUSTER (one small groupby per
#: set over the already-aggregated finest grain) and only the final,
#: caller-requested result ever reaches the driver.  Override via
#: KGFORGE_GROUPING_FINEST_CAP — the same gated-driver-combine pattern
#: as relational._combine_partials.
GROUPING_FINEST_CAP = 1_000_000


def _gid(keys: list[str], sub: list[str]) -> int:
    gid = 0
    for i, k in enumerate(keys):
        if k not in set(sub):
            gid |= 1 << (len(keys) - 1 - i)
    return gid


def _set_reaggs(aggs: Sequence[dict]):
    """Ray aggregates that collapse finest partials to one grouping set
    (alias == partial column name, so _finalize_partials applies as-is)."""
    ras, seen = [], set()

    def add(cls, col):
        if col not in seen:
            seen.add(col)
            ras.append(cls(col, alias_name=col))

    for a in aggs:
        fn, out = a["fn"], a["out"]
        if fn == "count":
            add(Sum, f"__cnt_{out}")
        elif fn in ("sum", "mean"):
            add(Sum, f"__sum_{out}")
            if fn == "mean":
                add(Sum, f"__cnt_{out}")
        elif fn == "min":
            add(Min, f"__min_{out}")
        elif fn == "max":
            add(Max, f"__max_{out}")
        elif fn in ("var", "std"):
            add(Sum, f"__sum_{out}")
            add(Sum, f"__ssq_{out}")
            add(Sum, f"__cnt_{out}")
    return ras


def _grouping_sets_distributed(
    base_ds: Dataset,
    keys: list[str],
    sets: Sequence[Sequence[str]],
    aggs: list[dict],
    in_schema: pa.Schema | None = None,
) -> Dataset:
    """Over-cap plan: each grouping set is one small in-cluster groupby
    over the finest-grain partials (already ≤ finest-group cardinality),
    finalized per batch and cast to ONE pinned schema so the per-set
    datasets union cleanly.  Output column types: keys keep their input
    types (null where rolled up), count → int64, min/max keep the
    partial's type, sum/mean/var/std → float64."""
    import ray.data as rd

    # an EMPTY finest aggregate is schema-less in Ray 2.49 — fall back to
    # the INPUT schema for key/min/max types (and float64 as a last
    # resort, matching _collect_base's empty-frame dtype)
    base_schema: pa.Schema | None = None
    try:
        sch = base_ds.schema(fetch_if_missing=True)
        base_schema = getattr(sch, "base_schema", None)
        if base_schema is not None and not isinstance(base_schema, pa.Schema):
            base_schema = None
    except Exception:
        base_schema = None

    def _ftype(name: str, fallback_col: str | None) -> pa.DataType:
        if base_schema is not None and name in base_schema.names:
            return base_schema.field(name).type
        if (
            in_schema is not None
            and fallback_col is not None
            and fallback_col in in_schema.names
        ):
            return in_schema.field(fallback_col).type
        return pa.float64()

    outs = [a["out"] for a in aggs]
    fields = [pa.field(k, _ftype(k, k)) for k in keys]
    for a in aggs:
        fn, out = a["fn"], a["out"]
        if fn == "count":
            fields.append(pa.field(out, pa.int64()))
        elif fn in ("min", "max"):
            fields.append(pa.field(out, _ftype(f"__{fn}_{out}", a.get("col"))))
        else:
            fields.append(pa.field(out, pa.float64()))
    fields.append(pa.field("grouping_id", pa.int64()))
    target = pa.schema(fields)
    cols = keys + outs + ["grouping_id"]

    def make_fin(sub: list[str], gid: int):
        def fin(df: pd.DataFrame) -> pa.Table:
            if df.empty:
                return target.empty_table()
            g = _finalize_partials(df, aggs)
            for k in keys:
                if k not in set(sub):
                    g[k] = None
            g["grouping_id"] = np.int64(gid)
            return pa.Table.from_pandas(g[cols], schema=target, preserve_index=False)

        return fin

    from .rayutil import drop_empty_blocks

    parts: list[Dataset] = []
    for s in sets:
        sub = [k for k in keys if k in set(s)]  # canonical key order
        gid = _gid(keys, sub)
        if sub:
            agg = base_ds.groupby(sub[0] if len(sub) == 1 else sub).aggregate(
                *_set_reaggs(aggs)
            )
            # map_batches never touches 0-row blocks, so empty partitions'
            # partial-schema blocks would bypass the pinned target cast
            # and poison the union for downstream acero consumers
            parts.append(
                drop_empty_blocks(
                    agg.map_batches(make_fin(sub, gid), batch_format="pandas")
                )
            )
        else:
            # grand total: one global aggregate → a single driver row.
            # Empty input returns None: SQL's grand total over an empty
            # table is count=0 (not NULL), every other agg NULL.
            row = base_ds.aggregate(*_set_reaggs(aggs)) or {}
            # Ray returns None (or a dict of None values) for an empty
            # aggregate — count partials coalesce to 0, the rest stay NULL
            frame = pd.DataFrame(
                [
                    {
                        k: (
                            row.get(k)
                            if row.get(k) is not None
                            # NaN, not None: keeps the partial columns
                            # float-dtyped so mean/var finalize divides
                            # instead of crashing on object-dtype None
                            else (0 if k.startswith("__cnt_") else np.nan)
                        )
                        for k in _partial_names(aggs)
                    }
                ]
            )
            parts.append(rd.from_arrow(make_fin([], gid)(frame)))
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


def grouping_sets(
    ds: Dataset,
    keys: Sequence[str],
    sets: Sequence[Sequence[str]],
    aggs: Sequence[dict],
    *,
    output: str = "pandas",
) -> pd.DataFrame | Dataset:
    """``GROUP BY GROUPING SETS (...)`` with algebraic aggregates.

    ``keys``: every column any set uses (defines the bitmask order —
    bit i set ⇔ keys[i] is AGGREGATED AWAY in that row, matching
    DuckDB's ``GROUPING(keys...)``).  ``aggs``: list of
    ``{"fn": "count|sum|min|max|mean|var|std", "col": c, "out": name}``.

    ONE distributed shuffle at the finest grain.  Below
    KGFORGE_GROUPING_FINEST_CAP finest rows the per-set derivation runs
    driver-side over the gathered partials (fast at bench scale); above
    it — e.g. CUBE over a high-cardinality key, where the finest grain
    is ~input-sized — each set is re-aggregated IN-CLUSTER and the
    driver only ever holds the final result.  ``output='pandas'``
    (default) returns a DataFrame with all key columns (None where
    rolled up), the agg columns, and ``grouping_id``;
    ``output='dataset'`` skips the driver path entirely and returns the
    unioned Dataset (the 100-TB shape — nothing result-sized on the
    driver either).
    """
    if output not in ("pandas", "dataset"):
        raise ValueError(f"unknown output {output!r} (pandas|dataset)")
    keys = list(keys)
    aggs = [dict(a) for a in aggs]
    _validate_agg_specs(aggs)
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} uses columns not in keys: {unknown}")
    # materialize: the finest shuffle is consumed once per grouping set
    # on the distributed path (and count() + to_pandas on the driver
    # path) — without it the upstream lineage would re-execute per set
    base_ds = _finest_aggregate_ds(ds, keys, aggs).materialize()

    def _in_schema() -> pa.Schema | None:
        try:
            s = getattr(ds.schema(fetch_if_missing=True), "base_schema", None)
            return s if isinstance(s, pa.Schema) else None
        except Exception:
            return None

    if output == "dataset":
        return _grouping_sets_distributed(base_ds, keys, sets, aggs, _in_schema())
    import os

    cap = int(os.environ.get("KGFORGE_GROUPING_FINEST_CAP", GROUPING_FINEST_CAP))
    if base_ds.count() > cap:
        return _grouping_sets_distributed(
            base_ds, keys, sets, aggs, _in_schema()
        ).to_pandas()
    base = _collect_base(base_ds, keys, aggs)
    out_frames = []
    for s in sets:
        sub = [k for k in keys if k in set(s)]  # canonical key order
        g = _reaggregate(base, sub, aggs)
        for k in keys:
            if k not in set(sub):
                g[k] = None
        g["grouping_id"] = np.int64(_gid(keys, sub))
        out_frames.append(g[keys + [a["out"] for a in aggs] + ["grouping_id"]])
    return pd.concat(out_frames, ignore_index=True)


def rollup(
    ds: Dataset, keys: Sequence[str], aggs: Sequence[dict], *, output: str = "pandas"
) -> pd.DataFrame | Dataset:
    """``GROUP BY ROLLUP (keys...)``: prefixes of ``keys`` incl. grand total."""
    keys = list(keys)
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, sets, aggs, output=output)


def cube(
    ds: Dataset, keys: Sequence[str], aggs: Sequence[dict], *, output: str = "pandas"
) -> pd.DataFrame | Dataset:
    """``GROUP BY CUBE (keys...)``: every subset of ``keys``."""
    keys = list(keys)
    sets = list(chain.from_iterable(combinations(keys, r) for r in range(len(keys), -1, -1)))
    return grouping_sets(ds, keys, [list(s) for s in sets], aggs, output=output)


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------


def pivot(
    ds: Dataset,
    index: str,
    pivot_col: str,
    value_col: str,
    *,
    agg: str = "sum",
    values: Sequence[Any] | None = None,
) -> Dataset:
    """``PIVOT``: one row per ``index``, one column per pivot value,
    cells = ``agg(value_col)`` (sum/count/min/max/mean).

    One distributed shuffle (finest groupby on (index, pivot_col)),
    then a per-index ``map_groups`` reshape.  ``values`` fixes the
    output schema (required for a stable schema on unseen data at
    scale); when omitted it is discovered from the aggregated result
    (small: one row per (index, pivot) pair).  Missing cells are null
    (count: 0).
    """
    if agg not in ("count", "sum", "min", "max", "mean"):
        raise ValueError(f"unsupported pivot agg {agg!r}")
    fine = ds.groupby([index, pivot_col]).aggregate(
        *(
            [Count(value_col, ignore_nulls=True, alias_name="__cnt___v")]
            if agg == "count"
            else [
                Sum(value_col, alias_name="__sum___v"),
                # SQL avg divides by the NON-NULL count of value_col
                Count(value_col, ignore_nulls=True, alias_name="__cnt___v"),
            ]
            if agg == "mean"
            else [
                {"sum": Sum, "min": Min, "max": Max}[agg](
                    value_col, alias_name=f"__{agg}___v"
                )
            ]
        )
    )
    if values is None:
        # discovery consumes `fine` once and widen consumes it again —
        # materialize so the groupby shuffle doesn't execute twice
        fine = fine.materialize()
        disc = fine.groupby(pivot_col).aggregate(Count(alias_name="__n")).to_pandas()
        # an EMPTY input comes back as a schema-less pandas frame (Ray
        # 2.49: aggregating an empty Dataset loses the key column), so
        # guard the column access — zero pivot values, index-only output
        found = disc[pivot_col].tolist() if pivot_col in disc.columns else []
        # a NULL pivot value cannot become a column (SQL PIVOT ... IN
        # lists only real values); rows with it are dropped like SQL does
        vals = sorted(v for v in found if v is not None and v == v)
    else:
        vals = list(values)
    col_names = [str(v) for v in vals]

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, Any] = {index: g[index].iloc[0]}
        if agg == "mean":
            cell = g["__sum___v"] / g["__cnt___v"]
        else:
            cell = g[[c for c in g.columns if c.startswith("__")][0]]
        lut = dict(zip(g[pivot_col], cell))
        for v, name in zip(vals, col_names):
            row[name] = lut.get(v, 0 if agg == "count" else None)
        return pd.DataFrame([row])

    return fine.groupby(index).map_groups(widen, batch_format="pandas")


# ---------------------------------------------------------------------------
# collection aggregates (E12): array_agg / string_agg
# ---------------------------------------------------------------------------


class ListAgg(AggregateFnV2):
    """SQL ``array_agg(col)`` as a mergeable aggregate: per-block value
    lists concatenated up the aggregate tree.  ``sort=True`` (default)
    sorts the final list — block arrival order is nondeterministic in a
    streaming executor, so an unsorted result is not reproducible
    (matching SQL, where array_agg without ORDER BY is also
    unspecified).  Nulls are skipped like SQL's.  Memory caveat: one
    group's values materialize on its reducer — this is an inherently
    group-sized aggregate, use it on bounded groups."""

    def __init__(self, on: str, alias_name: str | None = None, sort: bool = True):
        self._sort = sort
        super().__init__(
            alias_name or f"array_agg({on})", list, on=on, ignore_nulls=True
        )

    def aggregate_block(self, block) -> list:
        col = (
            block[self.get_target_column()]
            if isinstance(block, pa.Table)
            else pa.Array.from_pandas(block[self.get_target_column()])
        )
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # v == v drops float NaN too: pandas blocks surface nulls as NaN
        # (arrow keeps NaN as a value), and NaN would break the sorted
        # finalize's determinism — same guard as sketches.HllDistinct
        return [v for v in col.drop_null().to_pylist() if v == v]

    def combine(self, current_accumulator: list, new: list) -> list:
        return current_accumulator + new

    def finalize(self, accumulator: list) -> list:
        return sorted(accumulator) if self._sort else accumulator


class StringAgg(ListAgg):
    """SQL ``string_agg(col, sep ORDER BY col)``: the sorted value list
    joined with ``sep`` (sorted for the same determinism reason)."""

    def __init__(self, on: str, sep: str = ",", alias_name: str | None = None):
        self._sep = sep
        super().__init__(on, alias_name or f"string_agg({on})", sort=True)

    def finalize(self, accumulator: list) -> str | None:
        if not accumulator:
            return None
        return self._sep.join(str(x) for x in sorted(accumulator))


# ---------------------------------------------------------------------------
# dataset profiling (E13): one-pass column statistics
# ---------------------------------------------------------------------------


def profile_dataset(
    ds: Dataset,
    columns: Sequence[str] | None = None,
    *,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> pd.DataFrame:
    """``describe()`` for ingest QA: one row per column with row/null
    counts, approx distinct (HLL), and for numeric columns min / max /
    mean / t-digest quantiles — ALL columns profiled in a SINGLE
    aggregate pass (the per-block partials for every column travel in
    one mergeable aggregate tree; the input streams once).

    Returns a small pandas frame: column, dtype, n_rows, n_nulls,
    approx_distinct, min, max, mean, q<…> (numeric only, else NaN).
    """
    from kgforge.sketches import HllDistinct, TDigestQuantiles

    ray_schema = ds.schema()
    if ray_schema is None:  # schema-less empty dataset (rayutil note)
        cols = ["column", "dtype", "n_rows", "n_nulls", "approx_distinct",
                "min", "max", "mean"] + [f"q{q:g}" for q in quantiles]
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    schema = ray_schema.base_schema
    names = list(columns) if columns is not None else list(schema.names)
    numeric = {
        n
        for n in names
        if pa.types.is_integer(schema.field(n).type)
        or pa.types.is_floating(schema.field(n).type)
    }
    aggs: list[AggregateFnV2] = [Count(alias_name="__rows")]
    for n in names:
        aggs.append(Count(n, ignore_nulls=True, alias_name=f"__nn_{n}"))
        aggs.append(HllDistinct(n, alias_name=f"__nd_{n}"))
        if n in numeric:
            aggs.append(Min(n, alias_name=f"__min_{n}"))
            aggs.append(Max(n, alias_name=f"__max_{n}"))
            aggs.append(Sum(n, alias_name=f"__sum_{n}"))
            aggs.append(
                TDigestQuantiles(n, quantiles=quantiles, alias_name=f"__q_{n}")
            )
    row = ds.aggregate(*aggs)
    n_rows = int(row["__rows"]) if row and row.get("__rows") is not None else 0
    out = []
    for n in names:
        nn = int(row.get(f"__nn_{n}") or 0) if n_rows else 0
        rec: dict[str, Any] = {
            "column": n,
            "dtype": str(schema.field(n).type),
            "n_rows": n_rows,
            "n_nulls": n_rows - nn,
            "approx_distinct": int(row.get(f"__nd_{n}") or 0) if n_rows else 0,
            "min": np.nan,
            "max": np.nan,
            "mean": np.nan,
        }
        for q in quantiles:
            rec[f"q{q:g}"] = np.nan
        if n in numeric and n_rows and nn:
            # a float column polluted with NaN VALUES (not nulls) makes
            # Ray's Sum/Min/Max return None while Count(ignore_nulls)
            # still counts the NaN rows — surface NaN, don't crash
            def _f(v):
                return float(v) if v is not None else np.nan

            rec["min"] = _f(row.get(f"__min_{n}"))
            rec["max"] = _f(row.get(f"__max_{n}"))
            s = row.get(f"__sum_{n}")
            rec["mean"] = float(s) / nn if s is not None else np.nan
            td = row.get(f"__q_{n}") or {}
            for q in quantiles:
                rec[f"q{q:g}"] = _f(td.get(f"q{q:g}"))
        out.append(rec)
    return pd.DataFrame(out)
