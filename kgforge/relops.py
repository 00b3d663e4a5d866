"""Relational operator extensions (SURVEY §2.D6/F5/B11 additions):
broadcast interval (validity-window / SCD-2) join, unnest (explode) of
list columns, and deterministic stratified sampling.

Scale shapes:

- ``broadcast_interval_join`` — the dimension (windows) side is SMALL
  and ships once per task via closure capture (same broadcast pattern
  as the D1 dimension joins in ``relational.py``); the big probe side
  streams through ``map_batches`` with a vectorized pandas merge +
  interval filter per batch.  No shuffle of the big side at all.
- ``unnest`` — per-batch zero-copy Arrow flatten
  (``list_flatten`` + ``list_parent_indices``); null/empty lists drop
  their row, matching SQL ``UNNEST`` semantics.
- ``stratified_sample`` — keep a row iff a DETERMINISTIC 64-bit hash of
  its id falls below ``fraction`` of the hash space, independently
  inside each stratum.  No RNG state: the same (seed, id) keeps/drops
  identically across runs, block layouts and cluster sizes, so a
  resumed or re-sharded job samples the same rows (ray_guide: never
  depend on block order for randomness).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from kgforge.extract_core import stable_u64

# ---------------------------------------------------------------------------
# broadcast interval join (D6)
# ---------------------------------------------------------------------------


def broadcast_interval_join(
    ds: Dataset,
    dim: pd.DataFrame,
    key: str | Sequence[str],
    probe_col: str,
    start_col: str,
    end_col: str,
    *,
    how: str = "inner",
    closed: str = "left",
    suffix: str = "_dim",
) -> Dataset:
    """Join each probe row to the dimension rows with the same ``key``
    whose ``[start_col, end_col)`` interval contains ``probe_col``
    (``closed='left'``; ``'both'`` = inclusive end — SQL ``BETWEEN``).

    ``dim`` is the SMALL side (validity-window dimension, e.g. an SCD-2
    price/ownership table): it is captured by closure and shipped once
    per task.  ``how='left'`` keeps unmatched probe rows with null
    dimension columns.  Overlapping windows multiply rows, exactly as
    the equivalent SQL non-equi join does.

    Arrow-native (round 5; the last pandas kernel in the join family):
    the equi-prefix runs as a zero-copy acero ``pa.Table.join`` per
    batch — the same kernel ``smart_join``'s broadcast strategy uses —
    and the interval predicate is a vectorized ``pyarrow.compute``
    post-filter.  SQL key semantics: a NULL key matches nothing (the
    old pandas ``merge`` matched NaN to NaN).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    keys = [key] if isinstance(key, str) else list(key)
    for c in keys + [start_col, end_col]:
        if c not in dim.columns:
            raise ValueError(f"dim is missing column {c!r}")
    dim_t = pa.Table.from_pandas(dim.reset_index(drop=True), preserve_index=False)

    def join_batch(t: pa.Table) -> pa.Table:
        # dim columns that collide with probe columns get the suffix
        # (probe keeps the bare name, like SQL's qualified projection)
        overlap = (set(t.column_names) & set(dim_t.column_names)) - set(keys)
        d = dim_t.rename_columns(
            [c + suffix if c in overlap else c for c in dim_t.column_names]
        )
        # acero requires exactly matching key types; the dim side is
        # small, so casting it per batch is free
        for k in keys:
            if d[k].type != t[k].type:
                d = d.set_column(
                    d.column_names.index(k), k, pc.cast(d[k], t[k].type)
                )
        s_col = start_col + suffix if start_col in overlap else start_col
        e_col = end_col + suffix if end_col in overlap else end_col
        probe = t.append_column(
            "__rid", pa.array(np.arange(t.num_rows), pa.int64())
        )
        # acero rejects fixed_size_list payload columns (embeddings, band
        # keys) in join non-key fields; ride them through as
        # fixed_size_binary (same pattern as apply_drop_ds)
        from kgforge.rayutil import fsl_pack, fsl_pack_specs, fsl_unpack

        specs = fsl_pack_specs(probe.schema) + fsl_pack_specs(d.schema)
        if specs:
            probe = fsl_pack(probe, specs)
            d = fsl_pack(d, specs)
        m = probe.join(d, keys=keys, join_type="inner")
        if specs:
            m = fsl_unpack(m, specs)
            probe = fsl_unpack(probe, specs)  # the left branch reuses it
        ts = m[probe_col]
        in_window = pc.and_kleene(
            pc.less_equal(m[s_col], ts),
            pc.less(ts, m[e_col]) if closed == "left" else pc.less_equal(ts, m[e_col]),
        )
        m = m.filter(pc.fill_null(in_window, False))
        if how == "left":
            matched = m["__rid"].combine_chunks()
            missing = probe.filter(
                pc.invert(pc.is_in(probe["__rid"], value_set=matched))
            )
            if missing.num_rows:
                for name in m.column_names:
                    if name not in missing.column_names:
                        missing = missing.append_column(
                            name,
                            pa.nulls(missing.num_rows, m.schema.field(name).type),
                        )
                m = pa.concat_tables([m, missing.select(m.column_names)])
        return m.drop_columns(["__rid"])

    return ds.map_batches(join_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# unnest / explode (B11)
# ---------------------------------------------------------------------------


def unnest(
    ds: Dataset,
    list_col: str,
    *,
    out_col: str | None = None,
    ordinal_col: str | None = None,
) -> Dataset:
    """Explode a ``list<T>`` column to one row per element (SQL
    ``UNNEST``): other columns repeat per element; null or empty lists
    drop their row.  ``ordinal_col`` adds the 1-based position within
    the list (``generate_subscripts`` semantics).  Zero-copy Arrow:
    ``list_flatten`` + ``take`` on ``list_parent_indices`` per batch."""
    out = out_col or list_col

    def explode(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        parents = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        rest = t.drop_columns([list_col]).take(parents)
        arrays = list(rest.columns)
        names = list(rest.schema.names)
        arrays.append(flat)
        names.append(out)
        if ordinal_col is not None:
            lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
            total = int(lengths.sum())
            starts = np.cumsum(lengths) - lengths
            ordinals = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths) + 1
            arrays.append(pa.array(ordinals, pa.int64()))
            names.append(ordinal_col)
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified sampling (F5)
# ---------------------------------------------------------------------------


def ngram_window_hashes(
    th: np.ndarray, doc_idx: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-token window hashes over a batch-flat token-hash
    stream: ``acc = splitmix64(acc ^ th[j:j+L])`` applied n times over
    shifted views (order-sensitive), plus the validity mask for windows
    whose first and last token share a doc.  THE single implementation
    of this kernel — decontamination and the repetition metrics both
    build on it, so a hash-schedule change cannot silently diverge.

    Returns ``(acc, valid)`` of length ``L = len(th) - n + 1`` (both
    empty when L <= 0); callers slice their own per-window payloads
    (doc ids, char offsets) with the same ``[:L][valid]`` views."""
    L = len(th) - n + 1
    if L <= 0:
        return np.array([], dtype=np.uint64), np.array([], dtype=bool)
    acc = np.zeros(L, dtype=np.uint64)
    for j in range(n):
        acc = _splitmix64(acc ^ th[j : j + L])
    valid = doc_idx[:L] == doc_idx[n - 1 : n - 1 + L]
    return acc, valid


def token_hash_stream(
    toks_per_doc: "list[list[str]]", salt: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-flat ``(token-hash stream, doc index, per-doc lengths)``
    from pre-tokenized docs — THE shared prelude feeding
    ``ngram_window_hashes`` (decontamination and the n-gram LM both use
    it; tokenization stays the caller's).  Token→u64 is blake2b
    (``stable_u64``) over the batch's UNIQUE tokens only (Zipf reuse
    makes that cheap) then a vectorized gather — deterministic across
    runs, block layouts and cluster sizes."""
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = [tok for toks in toks_per_doc for tok in toks]
    if flat:
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uhash = np.array(
            [stable_u64(u, salt) for u in uniques], dtype=np.uint64
        )
        th = uhash[codes]
    else:
        th = np.array([], dtype=np.uint64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return th, doc_idx, lens


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed deterministic
    u64→u64 permutation (public constant schedule)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def sample_hash_u64(values: pa.Array | pa.ChunkedArray, seed: int) -> np.ndarray:
    """Deterministic per-value u64 hash: vectorized splitmix64 for
    integer ids, blake2b (``stable_u64``) for strings.  Stable across
    processes, library versions and cluster layouts — the property the
    sampling contract needs (polars' hash seed schedule is not
    version-pinned, so it is NOT used here).

    Null ids hash as a fixed sentinel (0 / ""), so every null-id row
    gets the SAME deterministic decision per seed — never the undefined
    NaN→uint64 cast (platform-dependent) or a crash.  Callers that need
    null-specific semantics (e.g. bloom's null-never-matches) mask nulls
    themselves.

    Non-integer, non-string keys (float, date, timestamp, decimal, …)
    are canonicalized through Arrow's string cast and hashed as
    strings; a type Arrow cannot render as a string (e.g. arbitrary
    binary) raises a clear ValueError naming the supported key types."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if pa.types.is_integer(values.type):
        if values.null_count:
            values = values.fill_null(0)
        ids = values.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _splitmix64(ids ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    if not (pa.types.is_string(values.type) or pa.types.is_large_string(values.type)):
        try:
            values = pc.cast(values, pa.string())
        except (pa.ArrowInvalid, pa.lib.ArrowNotImplementedError) as e:
            raise ValueError(
                f"sample_hash_u64: unsupported key type {values.type} — supported: "
                "integer, string, and any type Arrow can cast to string "
                "(float, date, timestamp, decimal, bool)"
            ) from e
    if values.null_count:
        values = values.fill_null("")
    salt = f"strat{seed}"
    return np.array(
        [stable_u64(v, salt) for v in values.to_pylist()], dtype=np.uint64
    )


def stratified_sample(
    ds: Dataset,
    id_col: str,
    fraction: float | dict[Any, float],
    *,
    key_col: str | None = None,
    seed: int = 0,
) -> Dataset:
    """Deterministic sample: keep a row iff ``hash(seed, id) <
    fraction * 2^64``.  With ``fraction`` a dict, ``key_col`` selects a
    per-stratum rate (strata absent from the dict are dropped); with a
    scalar, every row uses the same rate (ids spread uniformly within
    every stratum, so each stratum is sampled at ~``fraction``
    independently of its size).  Same (seed, id) → same decision on any
    run, block layout or cluster size."""
    # exact-integer predicate: keep iff h <= int(f * 2^64) - 1.  f=1.0
    # gives 2^64-1 (keep all), f=0.0 gives -1 (keep none, via the valid
    # flag) — no float round-trip, so no uint64 overflow at the edges.
    def _thr(f: Any) -> tuple[np.uint64, bool]:
        t = int(min(max(float(f), 0.0), 1.0) * 2**64) - 1
        return np.uint64(max(t, 0)), t >= 0

    if isinstance(fraction, dict):
        if key_col is None:
            raise ValueError("per-stratum fractions need key_col")
        thresholds = {k: _thr(f) for k, f in fraction.items()}

        def keep(t: pa.Table) -> pa.Table:
            h = sample_hash_u64(t[id_col], seed)
            codes, uniques = pd.factorize(t[key_col].to_pandas(), use_na_sentinel=True)
            lut_thr = np.array(
                [thresholds.get(u, (np.uint64(0), False))[0] for u in uniques],
                dtype=np.uint64,
            )
            lut_ok = np.array(
                [thresholds.get(u, (np.uint64(0), False))[1] for u in uniques],
                dtype=bool,
            )
            safe = np.maximum(codes, 0)
            mask = (codes >= 0) & lut_ok[safe] & (h <= lut_thr[safe]) if len(uniques) else np.zeros(len(h), bool)
            return t.filter(pa.array(mask))

        return ds.map_batches(keep, batch_format="pyarrow")

    threshold, valid = _thr(fraction)

    def keep_flat(t: pa.Table) -> pa.Table:
        h = sample_hash_u64(t[id_col], seed)
        mask = (h <= threshold) if valid else np.zeros(len(h), bool)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep_flat, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-relative quantile band filter (F7)
# ---------------------------------------------------------------------------


def quantile_thresholds(
    ds: Dataset, col: str, qs: Sequence[float], *, delta: int = 500
) -> dict[float, float]:
    """{q: threshold} for ``col`` via ONE mergeable t-digest aggregate
    pass (sketches.TDigestQuantiles) — bounded by ~delta centroids per
    block regardless of cardinality or corpus size, so corpus-relative
    thresholds never need a value gather."""
    from kgforge.sketches import TDigestQuantiles

    row = ds.aggregate(
        TDigestQuantiles(col, quantiles=tuple(qs), delta=delta, alias_name="__td")
    )
    td = (row or {}).get("__td") or {}
    return {float(q): float(td.get(f"q{q:g}", float("nan"))) for q in qs}


def quantile_filter(
    ds: Dataset,
    col: str,
    lo_q: float = 0.0,
    hi_q: float = 1.0,
    *,
    delta: int = 500,
) -> Dataset:
    """Keep rows whose ``col`` lies inside the corpus-relative
    ``[quantile(lo_q), quantile(hi_q)]`` band — the CCNet-style
    "drop the worst X% / best Y%" curation step for any numeric score
    (quality, perplexity, length) without a fixed absolute threshold.

    Thresholds come from one t-digest pass (approximate — tails are
    near-exact by the k1 scale function); the filter is a second
    vectorized streaming pass.  The input is materialized once so the
    two passes share one lineage execution.  Null/NaN values never
    match the band (SQL comparison semantics)."""
    if not (0.0 <= lo_q <= hi_q <= 1.0):
        raise ValueError("need 0 <= lo_q <= hi_q <= 1")
    ds = ds.materialize()
    thr = quantile_thresholds(ds, col, (lo_q, hi_q), delta=delta)
    lo_v, hi_v = thr[lo_q], thr[hi_q]
    # NaN thresholds (empty / all-null / all-NaN input) flow into the
    # filter: NaN comparisons are false, so no row matches — consistent
    # with the null-never-matches contract on every degenerate input
    # (the old early-return passed an all-null column through unchanged)

    def keep(t: pa.Table) -> pa.Table:
        v = t[col]
        mask = pc.and_kleene(
            pc.greater_equal(v, pa.scalar(lo_v)),
            pc.less_equal(v, pa.scalar(hi_v)),
        )
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-group cap / top-k per group (F6)
# ---------------------------------------------------------------------------


def top_k_per_group(
    ds: Dataset,
    group_by: str | Sequence[str],
    order_by: str | Sequence[str],
    k: int,
    *,
    descending: bool | Sequence[bool] = False,
) -> Dataset:
    """Keep the first ``k`` rows of every group in ``order_by`` order
    (SQL ``row_number() OVER (PARTITION BY g ORDER BY o) <= k``) — the
    per-domain quota / best-N-per-key curation step.

    One shuffle (the groupby); the per-group head is a vectorized
    sort+slice inside ``map_groups``.  Determinism requires unique
    ORDER BY keys per group (append a tiebreak column, as SQL would).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    order_keys = [order_by] if isinstance(order_by, str) else list(order_by)
    asc = (
        [not descending] * len(order_keys)
        if isinstance(descending, bool)
        else [not d for d in descending]
    )
    if len(asc) != len(order_keys):
        raise ValueError("descending must be a bool or match order_by length")

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_keys, ascending=asc, kind="stable").head(k)

    return ds.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        head, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# size-aware join (D8): broadcast vs hash-shuffle strategy selection
# ---------------------------------------------------------------------------

#: right sides at or below this many rows are fetched once and
#: broadcast-merged per batch (no shuffle of the left side at all);
#: override via KGFORGE_BROADCAST_JOIN_ROWS
BROADCAST_JOIN_ROWS = 1_000_000


def smart_join(
    left: Dataset,
    right: Dataset,
    on: str | Sequence[str],
    *,
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    suffix: str = "_r",
    strategy: str = "auto",
) -> Dataset:
    """Equi-join with automatic physical-strategy selection — the call a
    user reaches for instead of hand-picking D1 (broadcast) vs D3
    (hash shuffle) per query.

    ``auto``: if ``right.count()`` (metadata-cheap on materialized /
    parquet inputs) fits KGFORGE_BROADCAST_JOIN_ROWS, the right side is
    fetched ONCE and merged per left batch inside ``map_batches`` — the
    big side never shuffles.  Otherwise ``Dataset.join`` (hash shuffle)
    with the Ray 2.49 guards this repo measured: explicit
    ``num_partitions`` and a ``drop_empty_blocks`` on the output so the
    schema-less empty blocks a hash shuffle emits cannot crash a
    downstream acero join (rayutil.ensure_schema docstring; chained
    joins in 2.49 local mode fail without it).

    ``how``: 'inner' or 'left'.  Broadcast-left keeps unmatched left
    rows with null right columns, exactly like the shuffle plan.
    """
    import os

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    left_keys = [on] if isinstance(on, str) else list(on)
    right_keys = (
        left_keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    if len(left_keys) != len(right_keys):
        raise ValueError("on and right_on must have the same length")

    if strategy == "auto":
        # materialize so the size probe and the chosen plan share ONE
        # execution of the right lineage (count() is then metadata)
        right = right.materialize()
        limit = int(os.environ.get("KGFORGE_BROADCAST_JOIN_ROWS", BROADCAST_JOIN_ROWS))
        strategy = "broadcast" if right.count() <= limit else "shuffle"

    if strategy == "broadcast":
        import ray as _ray

        # one batched get: sequential per-ref round trips serialize the
        # fetch for a many-block right side
        all_blocks = _ray.get(list(right.to_arrow_refs()))
        nonempty = [t for t in all_blocks if t.num_rows]
        if nonempty:
            dim_t = pa.concat_tables(nonempty, promote_options="default")
        else:
            # 0-row right side: keep a SCHEMA-FUL empty dim so a left
            # join still emits the right columns as nulls (block schema
            # first, dataset schema as fallback — rayutil note)
            schemaful = [t for t in all_blocks if t.schema.names]
            if schemaful:
                dim_t = schemaful[0].schema.empty_table()
            else:
                sch = right.schema(fetch_if_missing=False)
                base = getattr(sch, "base_schema", None) if sch is not None else None
                if not isinstance(base, pa.Schema):
                    raise ValueError(
                        "smart_join: right side is empty and schema-less; "
                        "cannot derive the joined schema"
                    )
                dim_t = base.empty_table()
        # align right key names to left's so the join is a plain `keys=`
        ren = {r: l for l, r in zip(left_keys, right_keys) if r != l}
        if ren:
            dim_t = dim_t.rename_columns([ren.get(c, c) for c in dim_t.schema.names])
        # SQL equality never matches NULL = NULL — drop null-key dim
        # rows so both strategies agree (acero also never matches nulls;
        # the filter just makes the contract explicit)
        for k in left_keys:
            dim_t = dim_t.filter(pc.is_valid(dim_t[k]))
        join_type = "inner" if how == "inner" else "left outer"

        def join_batch(b: pa.Table) -> pa.Table:
            # shuffle-plan parity: Ray's hash join emits left cols +
            # right NON-KEY cols (right_on keys dropped) — acero's join
            # does the same once the key names are aligned; overlapping
            # non-key right cols get the suffix.  Zero-copy-in Arrow
            # join per batch (the old pandas merge paid
            # Arrow→pandas→Arrow per batch).
            return b.join(
                dim_t,
                keys=left_keys,
                join_type=join_type,
                right_suffix=suffix,
            )

        return left.map_batches(join_batch, batch_format="pyarrow")

    if strategy != "shuffle":
        raise ValueError(f"unknown strategy {strategy!r}")
    from kgforge.rayutil import drop_empty_blocks, join_partitions

    joined = left.join(
        right,
        join_type="inner" if how == "inner" else "left_outer",
        # None → adaptive: floor 8 at small scale (per-partition fixed
        # cost), cluster-CPU-scaled above (join output blocks bound
        # downstream map parallelism); n unknown without a count probe
        num_partitions=join_partitions() if num_partitions is None else num_partitions,
        on=tuple(left_keys),
        right_on=tuple(right_keys) if right_on is not None else None,
        left_suffix="",
        right_suffix=suffix,
    )
    return drop_empty_blocks(joined)
