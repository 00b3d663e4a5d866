"""Per-domain operators for corpus curation: domain extraction, domain
histograms, and per-domain document caps ("no more than K docs per
site" — the standard crawl-diversity quota in CC-style pipelines).

Scale shape of ``domain_cap`` (the interesting one):

1. **Per-batch combiner prune** — within each batch, rows ranked ≥ K
   inside their domain are DEFINITE global losers (≥ K better rows of
   the same domain exist in that batch alone); their thin ids are
   emitted directly.  At most K rows per (domain, batch) survive as
   thin candidates ``(domain, __ord, id)`` — the only data that ever
   shuffles, and it shrinks with the cap, not the corpus.
2. **Candidate resolution** — below an env-tunable row threshold the
   candidates are gathered and ranked with one pandas groupby on the
   driver; above it, a thin-column range sort + vectorized segment scan
   (the repo's sort-scan standard, `steps/extract.py` exact-dedup v2)
   finds candidate losers fully in-cluster, with rows of each block's
   edge domains resolved exactly on the driver (post-prune they are
   ≤ K × touched-blocks per domain).
3. **Apply** — losers (local ∪ candidate) are removed with
   ``apply_drop_ds``: Bloom misses survive with NO shuffle, hits
   anti-join O(drops).  Cost scales with the drop rate — the right
   shape for a quota that typically removes a minority of rows.

The full corpus never shuffles and nothing corpus-sized lands on the
driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relops import sample_hash_u64

# host = authority minus userinfo/port; scheme optional so bare
# "example.com/path" inputs still classify
_HOST_RE = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?(?:[^/?#@]*@)?(?P<host>[^/:?#]+)"

# above this many thin candidate rows the driver groupby flips to the
# distributed sort-scan plan
DOMAIN_CAP_DRIVER_ROWS = 5_000_000


def domain_of(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized registrable-host extraction: lowercase host with one
    leading ``www.`` stripped; null/unparseable urls → null domain (they
    form their own quota group in ``domain_cap``)."""
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    ext = pc.extract_regex(pc.cast(url_col, pa.string()), _HOST_RE)
    host = pc.utf8_lower(pc.struct_field(ext, "host"))
    return pc.replace_substring_regex(host, r"^www\.", "", max_replacements=1)


def add_domain(ds, url_col: str = "url", out_col: str = "domain"):
    """Annotate every row with its domain (see ``domain_of``)."""

    def f(t: pa.Table) -> pa.Table:
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, domain_of(t[url_col]))

    return ds.map_batches(f, batch_format="pyarrow")


def domain_histogram(ds, url_col: str = "url"):
    """(domain, n_docs) counts — partial per-batch value_counts feed a
    small final Sum groupby, so the shuffle moves one row per
    (domain, batch), not per doc."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        dom = domain_of(t[url_col])
        vc = dom.value_counts().flatten()
        return pa.table(
            {
                "domain": pc.cast(vc[0], pa.string()),
                "n_docs": pc.cast(vc[1], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby("domain").aggregate(Sum("n_docs", alias_name="n_docs"))
    return out


def domain_blocklist_filter(
    ds,
    blocked,
    *,
    url_col: str = "url",
    match_subdomains: bool = True,
):
    """Drop rows whose domain is on a blocklist (UT1-style): with
    ``match_subdomains`` (default) a blocked ``example.com`` also blocks
    ``a.b.example.com``.  The blocklist is host-count-sized (small by
    contract) — normalized once on the driver, shipped via ``ray.put``,
    and probed per batch over the batch's UNIQUE domains only (Zipf
    reuse: a crawl batch has far fewer domains than rows), walking each
    unique domain's suffix chain against the set.  Null/unparseable
    urls are kept (no domain → no blocklist evidence)."""
    import pandas as _pd
    import ray

    if hasattr(blocked, "take_all"):
        blocked = [r["domain"] for r in blocked.take_all()]
    bset = {
        str(b).strip().lower().lstrip(".").removeprefix("www.")
        for b in blocked
        if b and str(b).strip()
    }
    bref = ray.put(bset)

    def keep(t: pa.Table) -> pa.Table:
        doms = domain_of(t[url_col])
        dn = np.asarray(doms.fill_null(""), dtype=object)
        codes, uniques = _pd.factorize(dn)
        bs = ray.get(bref)

        def bad(d: str) -> bool:
            if not d:
                return False
            if not match_subdomains:
                return d in bs
            parts = d.split(".")
            return any(".".join(parts[i:]) in bs for i in range(len(parts)))

        bad_u = np.fromiter((bad(u) for u in uniques), dtype=bool,
                            count=len(uniques))
        return t.filter(pa.array(~bad_u[codes]))

    return ds.map_batches(keep, batch_format="pyarrow")


def _ord_array(t: pa.Table, order_col: str | None, id_col: str) -> np.ndarray:
    """float64 rank value, HIGHER = better.  Null order values rank
    last; ``order_col=None`` → deterministic per-id hash (an unbiased
    per-domain sample under the cap)."""
    if order_col is None:
        return (
            sample_hash_u64(t[id_col], seed=0xD0_CA_9).astype(np.float64)
        )
    col = pc.cast(t[order_col], pa.float64())
    col = pc.fill_null(col, float("-inf"))
    return col.to_numpy(zero_copy_only=False)


def _rank_in_domain(dom: np.ndarray, order: np.ndarray, ids) -> np.ndarray:
    """Rank of each row within its domain under (order DESC, id ASC),
    vectorized: lexsort → run-relative positions → scatter back."""
    n = len(dom)
    perm = np.lexsort((np.asarray(ids), -order, dom))
    d_sorted = dom[perm]
    new_run = np.r_[True, d_sorted[1:] != d_sorted[:-1]]
    run_starts = np.flatnonzero(new_run)
    run_idx = np.cumsum(new_run) - 1
    rank_sorted = np.arange(n, dtype=np.int64) - run_starts[run_idx]
    rank = np.empty(n, dtype=np.int64)
    rank[perm] = rank_sorted
    return rank


def domain_cap(
    ds,
    max_per_domain: int,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str | None = None,
    strategy: str = "auto",
    num_partitions: int | None = None,
):
    """Keep at most ``max_per_domain`` rows per domain, preferring
    highest ``order_col`` (ties → smallest ``id_col``); with no
    ``order_col`` a deterministic seeded hash picks an unbiased sample.
    ``strategy``: 'auto' | 'driver' | 'distributed' (tests force paths).
    Output schema equals the input schema; ``id_col`` values must be
    unique."""
    import ray.data as rd

    from .rayutil import drop_empty_blocks
    from .steps.dedup import apply_drop_ds

    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    k = int(max_per_domain)

    def thin(t: pa.Table) -> pa.Table:
        """Emit per-batch candidates (rank < k) and definite local
        losers (rank >= k) as one thin table tagged by __cand."""
        dom_arr = domain_of(t[url_col])
        dom = np.asarray(dom_arr.fill_null("\x00<null>"), dtype=object)
        order = _ord_array(t, order_col, id_col)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        id_np = np.asarray(ids, dtype=object)
        rank = _rank_in_domain(dom, order, id_np)
        cand = rank < k
        return pa.table(
            {
                "domain": pa.array(dom, pa.string()),
                "__ord": pa.array(order, pa.float64()),
                id_col: pa.array(id_np, ids.type),
                "__cand": pa.array(cand),
            }
        )

    thin_ds = ds.map_batches(thin, batch_format="pyarrow").materialize()
    local_losers = drop_empty_blocks(
        thin_ds.map_batches(
            lambda t: t.filter(pc.invert(t["__cand"])).select([id_col]),
            batch_format="pyarrow",
        )
    )
    cands = thin_ds.map_batches(
        lambda t: t.filter(t["__cand"]).select(["domain", "__ord", id_col]),
        batch_format="pyarrow",
    ).materialize()
    # empty input: no candidates implies no losers anywhere (every
    # nonempty batch yields rank<k candidates) — and the schema probe
    # below would crash on a schema-less empty lineage
    sch = cands.schema()
    if sch is None or cands.count() == 0:
        return ds
    id_type = sch.base_schema.field(id_col).type

    if strategy == "auto":
        limit = int(
            os.environ.get("KGFORGE_DOMAIN_CAP_DRIVER_ROWS", DOMAIN_CAP_DRIVER_ROWS)
        )
        strategy = "driver" if cands.count() <= limit else "distributed"

    if strategy == "driver":
        df = cands.to_pandas()
        if len(df):
            df = df.sort_values(
                ["domain", "__ord", id_col], ascending=[True, False, True]
            )
            lose = df[df.groupby("domain").cumcount() >= k]
        else:
            lose = df
        cand_losers = rd.from_arrow(
            pa.table({id_col: pa.array(lose[id_col].tolist(),
                                       id_type)})
        )
    elif strategy == "distributed":
        srt = cands.sort(
            ["domain", "__ord", id_col], descending=[False, True, False]
        )

        def scan(t: pa.Table) -> pa.Table:
            d = np.asarray(t["domain"].to_numpy(zero_copy_only=False), dtype=object)
            n = len(d)
            empty = pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "domain": pa.array([], pa.string()),
                    "__ord": pa.array([], pa.float64()),
                    id_col: pa.array([], t.schema.field(id_col).type),
                }
            )
            if not n:
                return empty
            order = t["__ord"].to_numpy(zero_copy_only=False)
            ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=object)
            rank = _rank_in_domain(d, order, ids)
            # rank >= k within ANY subset of a domain already proves a
            # global loser — emit those directly even on block-edge
            # domains, so a hot domain spanning whole blocks ships at
            # most k rows per block to the driver, not its entire
            # candidate set; the driver re-ranks only the collected
            # rank<k edge rows (the true global top-k per edge domain is
            # a subset of them, since a global top-k row is top-k in its
            # own block)
            loser = rank >= k
            boundary = ((d == d[0]) | (d == d[-1])) & ~loser
            lt = t.filter(pa.array(loser))
            bt = t.filter(pa.array(boundary))
            return pa.table(
                {
                    "kind": pa.array(
                        ["l"] * lt.num_rows + ["b"] * bt.num_rows, pa.string()
                    ),
                    "domain": pa.concat_arrays(
                        [lt["domain"].combine_chunks(), bt["domain"].combine_chunks()]
                    ),
                    "__ord": pa.concat_arrays(
                        [lt["__ord"].combine_chunks(), bt["__ord"].combine_chunks()]
                    ),
                    id_col: pa.concat_arrays(
                        [lt[id_col].combine_chunks(), bt[id_col].combine_chunks()]
                    ),
                }
            )

        marked = srt.map_batches(
            scan, batch_format="pyarrow", batch_size=None
        ).materialize()
        interior = drop_empty_blocks(
            marked.map_batches(
                lambda t: t.filter(pc.equal(t["kind"], "l")).select([id_col]),
                batch_format="pyarrow",
            )
        )
        bdf = (
            marked.map_batches(
                lambda t: t.filter(pc.equal(t["kind"], "b")).select(
                    ["domain", "__ord", id_col]
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        cand_losers = interior
        if len(bdf):
            bdf = bdf.sort_values(
                ["domain", "__ord", id_col], ascending=[True, False, True]
            )
            b_lose = bdf[bdf.groupby("domain").cumcount() >= k]
            if len(b_lose):
                cand_losers = cand_losers.union(
                    rd.from_arrow(
                        pa.table({id_col: pa.array(
                            b_lose[id_col].tolist(),
                            id_type)})
                    )
                )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    losers = local_losers.union(cand_losers)
    return apply_drop_ds(
        ds, losers, key_col=id_col, num_partitions=num_partitions
    )
