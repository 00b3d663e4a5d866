"""Extraction-side stages (SURVEY §2.B1-B3, B7, G2): url normalization,
exact dedup, language filter, HTML→text extraction."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..extract_core import extract_page_text, sha256_hex, url_normalize


def add_url_norm(batch: pa.Table) -> pa.Table:
    """Add the stable dedup/partition key. Per-row regex (C-level) — this
    is the cheapest stage in the pipeline."""
    urls = batch["url"].to_pylist()
    return batch.append_column("url_norm", pa.array([url_normalize(u) for u in urls], pa.string()))


def _sort_key(t: pa.Table) -> pa.Array:
    """Total-order key for 'newest crawl wins': zero-padded µs timestamp
    concatenated with the raw url (deterministic tie-break), then a
    content digest — so two rows tie ONLY when (warc_ts, url, content)
    are all equal, i.e. byte-identical duplicate pages. String-max of
    this key == max (warc_ts, url, content-digest) tuple.

    The digest is ``text_sha256`` when extraction already computed it;
    for pre-extraction inputs (exact dedup placed before extract_text,
    e.g. via plan_from_config) it falls back to hashing the html/text
    payload, so rows tying on (warc_ts, url) with DIFFERENT content are
    still resolved by content — identically in the gather and join paths
    — rather than by physical row order."""
    import hashlib

    ts = pc.cast(pc.cast(t["warc_ts"], pa.int64()), pa.string())
    ts_pad = pc.utf8_lpad(ts, 20, "0")
    key = pc.binary_join_element_wise(ts_pad, t["url"], "|")
    if "text_sha256" in t.column_names:
        return pc.binary_join_element_wise(key, t["text_sha256"], "|")
    content_col = next((c for c in ("html", "text") if c in t.column_names), None)
    if content_col is not None:
        digests = [
            hashlib.blake2b(
                v if isinstance(v, bytes) else ("" if v is None else v).encode(),
                digest_size=16,
            ).hexdigest()
            for v in t[content_col].to_pylist()
        ]
        key = pc.binary_join_element_wise(key, pa.array(digests, pa.string()), "|")
    return key


# above this row count the driver-gather path's 8 B/row hash pass stops
# being "small" (≈8 GB at 10^9 rows) and exact_dedup flips to the
# distributed groupby+join plan; override via KGFORGE_DEDUP_JOIN_ROWS
EXACT_DEDUP_JOIN_ROWS = 50_000_000


def exact_dedup_join(ds, num_partitions: int | None = None):
    """G2 scale path: keep the newest crawl per url_norm with NO driver
    materialization and NO corpus-payload shuffle.

    v2 plan (round 4 — profiled at 1.2M pages): the old plan hash-joined
    per-url max keys back against the FULL rows, moving every document
    body through the join (30.5 s) after a 1.2M-group Max aggregate
    (11.7 s). The loser set is duplicate-rate-sized (~2% of rows for a
    re-crawl corpus), so the replacement shuffles only thin columns: a
    range sort of the (url_norm, __dedup_key) projection (~50 B/row),
    a vectorized segment scan marking all-but-max-key rows per url (rows
    of a segment's first/last url are resolved on the driver — a url
    spanning two contiguous sorted segments is by construction the
    last/first url of those segments, so the flagged rows are complete
    and the resolution exact; per-url multiplicity is re-crawl-bounded),
    then ``apply_drop_ds`` removes the losers — Bloom misses (~98%)
    survive with no shuffle, hits anti-join O(losers).

    Ties (byte-identical rows — _sort_key includes the content sha) are
    broken by a per-row suffix appended to the key, so exactly ONE row
    survives per url_norm. The suffix must be (a) UNIQUE across the whole
    dataset — a content-derived tag collides for byte-identical BLOCKS
    (the re-ingested-dump case, the classic dedup input), leaving every
    copy sharing the max key and surviving together — and (b)
    lineage-STABLE — a uuid per task re-rolls on Ray block
    reconstruction and the loser keys then silently miss. A
    driver-enumerated block index satisfies both: the materialized block
    list is fixed on the driver, and re-keying block i from its
    (reconstructible) object ref reproduces the same keys."""
    import numpy as np
    import ray
    import ray.data as rd

    @ray.remote
    def _key_block(t: pa.Table, bid: int) -> pa.Table:
        base = _sort_key(t)
        rid = pa.array(
            np.char.add(
                f"{bid:010d}",
                np.char.zfill(np.arange(t.num_rows).astype("U10"), 10),
            )
        )
        key = pc.binary_join_element_wise(base, rid, "|")
        return t.append_column("__dedup_key", key)

    from ..rayutil import drop_empty_blocks
    from .dedup import apply_drop_ds

    refs = ds.materialize().to_arrow_refs()
    if not refs:
        return ds
    keyed = rd.from_arrow_refs([_key_block.remote(r, i) for i, r in enumerate(refs)])
    srt = keyed.select_columns(["url_norm", "__dedup_key"]).sort(
        ["url_norm", "__dedup_key"]
    )

    def scan(t: pa.Table) -> pa.Table:
        u = t["url_norm"].to_numpy(zero_copy_only=False)
        n = len(u)
        if not n:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "url_norm": pa.array([], pa.string()),
                    "__dedup_key": pa.array([], pa.string()),
                }
            )
        boundary = (u == u[0]) | (u == u[-1])
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = u[:-1] == u[1:]
        # interior urls are fully contained in this segment (a url
        # crossing a segment edge IS the first/last url): keys sort
        # ascending, so every row but the run's last is a loser
        loser = ~boundary & same_next
        lt = t.filter(pa.array(loser))
        bt = t.filter(pa.array(boundary))
        return pa.table(
            {
                "kind": pa.array(["l"] * lt.num_rows + ["b"] * bt.num_rows, pa.string()),
                "url_norm": pa.concat_arrays(
                    [lt["url_norm"].combine_chunks(), bt["url_norm"].combine_chunks()]
                ),
                "__dedup_key": pa.concat_arrays(
                    [lt["__dedup_key"].combine_chunks(), bt["__dedup_key"].combine_chunks()]
                ),
            }
        )

    marked = srt.map_batches(scan, batch_format="pyarrow", batch_size=None).materialize()
    interior = drop_empty_blocks(
        marked.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "l")).select(["__dedup_key"]),
            batch_format="pyarrow",
        )
    )
    bdf = (
        marked.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "b")).select(
                ["url_norm", "__dedup_key"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    losers = interior
    if len(bdf):
        b_losers = bdf[
            bdf.groupby("url_norm")["__dedup_key"].transform("max")
            != bdf["__dedup_key"]
        ]
        if len(b_losers):
            losers = losers.union(
                rd.from_arrow(
                    pa.table(
                        {"__dedup_key": pa.array(b_losers["__dedup_key"], pa.string())}
                    )
                )
            )
    out = apply_drop_ds(
        keyed, losers, key_col="__dedup_key", num_partitions=num_partitions
    )
    return out.drop_columns(["__dedup_key"])


def exact_dedup(ds, force_path: str | None = None):
    """G2: keep the newest crawl per url_norm.

    Two plans, selected by corpus size (or ``force_path`` ∈
    {"gather", "join"} for tests):

    * **gather** (small/medium corpora, profiled twice — see BASELINE.md
      optimization log): no groupby at all. Pass 1 streams an 8-byte hash
      per row to the driver and finds REPEATED url hashes with one
      np.sort (a groupby would pay Ray's per-group cost on millions of
      singleton urls); pass 2 collects (url_norm, sort_key) for the
      duplicated urls only (~2% re-crawl rate), resolves winners on the
      driver, and broadcast-filters.
    * **join** (``exact_dedup_join``, above EXACT_DEDUP_JOIN_ROWS rows):
      fully distributed groupby(max key) + hash join — nothing
      corpus-sized ever lands on the driver.

    Call AFTER extract_docs so the wide html column never crosses a
    shuffle boundary (re-extracting the ~2% superseded crawls is cheaper
    than shuffling html).
    """
    import os

    import numpy as np

    from ..extract_core import stable_u64

    # Both plans read the input MORE THAN ONCE (count probe + hash pass +
    # filter pass, or key pass + join). Pin the blocks first: a lazy
    # upstream (e.g. a plan.py chain ending in html extraction) would
    # otherwise re-execute its whole pipeline per pass — measured 4-5×
    # the extraction cost. materialize() on an already-materialized
    # dataset is free, so flagship/run callers pay nothing extra.
    ds = ds.materialize()

    if force_path != "gather":
        limit = int(os.environ.get("KGFORGE_DEDUP_JOIN_ROWS", EXACT_DEDUP_JOIN_ROWS))
        if force_path == "join" or ds.count() > limit:
            return exact_dedup_join(ds)

    # the hash only has to be stable WITHIN one run, but it must be the
    # SAME function in both passes on EVERY worker — so the implementation
    # choice is made ONCE here on the driver and closed over, never probed
    # per-task (a heterogeneous cluster where only some workers have polars
    # would otherwise silently miss duplicates). If the driver picks polars
    # and a worker lacks it, the task fails loudly instead.
    try:
        import polars  # noqa: F401

        use_polars = True
    except ImportError:
        use_polars = False

    def _hash_urls(col, _polars=use_polars) -> np.ndarray:
        """Vectorized 64-bit url hash (polars Rust kernel when the driver
        chose it; per-row stable hash otherwise)."""
        if _polars:
            import polars as pl

            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return (
                pl.from_arrow(col).hash(seed=41).to_numpy().astype(np.uint64).view(np.int64)
            )
        return np.array(
            [stable_u64(u, "urldup") - (1 << 63) for u in col.to_pylist()],
            dtype=np.int64,
        )

    def _key_hash(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(_hash_urls(t["url_norm"]), pa.int64())})

    # pass 1: repeated url_norm hashes (8 B/row gather + one np.sort —
    # a groupby here would pay Ray's per-group cost on millions of
    # singleton urls; only the ~2% re-crawled urls matter)
    chunks = [
        b["h"].to_numpy()
        for b in ds.map_batches(_key_hash, batch_format="pyarrow").iter_batches(
            batch_size=262144, batch_format="pyarrow"
        )
    ]
    if not chunks:
        return ds
    allh = np.concatenate(chunks)
    allh.sort()
    dup_h = np.unique(allh[:-1][allh[:-1] == allh[1:]]) if len(allh) > 1 else np.array([])
    if not len(dup_h):
        return ds
    dup_sorted = np.sort(dup_h)

    # pass 2: winners among the duplicated urls only (hash false-positives
    # just add a few singleton "dup" urls — their winner is themselves)
    def _dup_rows(t: pa.Table) -> pa.Table:
        hs = _hash_urls(t["url_norm"])
        mask = np.isin(hs, dup_sorted)
        thin = pa.table({"url_norm": t["url_norm"], "sort_key": _sort_key(t)})
        return thin.filter(pa.array(mask))

    win_of: dict[str, str] = {}
    win_count: dict[str, int] = {}
    for b in ds.map_batches(_dup_rows, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for u, k in zip(b["url_norm"].to_pylist(), b["sort_key"].to_pylist()):
            if u not in win_of or k > win_of[u]:
                win_of[u] = k
                win_count[u] = 1
            elif k == win_of[u]:
                win_count[u] += 1
    if not win_of:
        return ds
    # urls whose winning key is shared by >1 row: byte-identical duplicate
    # pages (same ts, url AND content — _sort_key includes the sha). The
    # reference emitter keeps exactly ONE row per url_norm, so these are
    # dropped in the streaming filter and exactly one representative per
    # url is re-injected (gathered on the driver: ties are rare and tiny).
    tied = sorted(u for u, n in win_count.items() if n > 1)
    items = sorted(win_of.items())
    dup_keys = pa.array([u for u, _ in items], pa.string())
    dup_wins = pa.array([w for _, w in items], pa.string())
    tied_arr = pa.array(tied, pa.string())

    def keep_winners(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["url_norm"], value_set=dup_keys)
        win = pc.take(dup_wins, idx)
        keep = pc.or_kleene(
            pc.is_null(idx), pc.equal(_sort_key(t), win)
        )
        if len(tied):
            keep = pc.and_kleene(
                pc.fill_null(keep, True),
                pc.invert(pc.is_in(t["url_norm"], value_set=tied_arr)),
            )
        return t.filter(pc.fill_null(keep, True))

    out = ds.map_batches(keep_winners, batch_format="pyarrow")
    if not tied:
        return out
    # gather ONE representative row per tied url (rows are byte-identical
    # up to column order; sort for a deterministic pick regardless of
    # block layout) and union it back in
    import ray.data as rd

    rescued: dict[str, tuple[str, pa.Table]] = {}
    winkey = {u: win_of[u] for u in tied}
    fetched = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["url_norm"], value_set=tied_arr)),
        batch_format="pyarrow",
    )
    for b in fetched.iter_batches(batch_size=8192, batch_format="pyarrow"):
        keys = _sort_key(b).to_pylist()
        for i, (u, k) in enumerate(zip(b["url_norm"].to_pylist(), keys)):
            if k != winkey[u]:
                continue
            # deterministic pick independent of block order: min over the
            # full row serialization (ties differ at most in metadata cols)
            row_repr = repr(sorted(b.slice(i, 1).to_pylist()[0].items()))
            if u not in rescued or row_repr < rescued[u][0]:
                rescued[u] = (row_repr, b.slice(i, 1))
    one_each = pa.concat_tables([rescued[u][1] for u in sorted(rescued)])
    return out.union(rd.from_arrow(one_each))


def lang_filter(ds, langs: tuple[str, ...] = ("en",)):
    """B2: vectorized language filter inside map_batches (a row-UDF
    ``ds.filter`` would call Python per row)."""
    allowed = pa.array(list(langs), pa.string())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], value_set=allowed)),
        batch_format="pyarrow",
    )


def extract_docs_batch(batch: pa.Table, bands: bool = False) -> pa.Table:
    """B1: html → extracted_text (+sha256, n_chars); DROPS the wide html
    column immediately (SURVEY §7.5) and rows with empty extraction.
    html-less rows fall back to the normalized raw ``text`` column.

    ``bands=True`` additionally emits the minhash-LSH ``band_h[16]``
    column in the SAME kernel (the near-dup engine's collision keys) —
    the fused form cuts a full-corpus text pass out of the flagship:
    the bands side table becomes a zero-copy projection of the
    materialized docs instead of a second read of every extracted_text
    byte.  Values are bit-identical to ``dedup_core.batch_minhash_bands``
    recomputed later (deterministic seeds), so plan equivalence holds;
    the ~2% exact-dedup losers hash once redundantly, which is the
    cheaper side of re-reading the corpus."""
    raw = batch["text"].to_pylist() if "text" in batch.column_names else [None] * batch.num_rows
    texts = [
        extract_page_text(h, ft) for h, ft in zip(batch["html"].to_pylist(), raw)
    ]
    out = batch.drop_columns([c for c in ("html", "text") if c in batch.column_names])
    out = out.append_column("extracted_text", pa.array(texts, pa.string()))
    out = out.append_column(
        "text_sha256", pa.array([sha256_hex(t) for t in texts], pa.string())
    )
    out = out.append_column(
        "n_chars", pa.array([len(t) for t in texts], pa.int64())
    )
    out = out.filter(pc.greater(pc.utf8_length(out["extracted_text"]), 0))
    if bands:
        from ..dedup_core import LSH_BANDS, batch_minhash_bands

        _, bhs = batch_minhash_bands(out["extracted_text"].to_pylist())
        out = out.append_column(
            "band_h",
            pa.FixedSizeListArray.from_arrays(
                pa.array(bhs.reshape(-1), pa.int64()), LSH_BANDS
            ),
        )
    return out


def extract_docs(ds, batch_size: int = 256, bands: bool = False):
    """Stateless task stage; modest batch_size because the html column is
    wide (binary payloads) — blocks stay under the object-store target.
    ``bands=True`` fuses the minhash band keys into this pass (see
    ``extract_docs_batch``)."""
    return ds.map_batches(
        lambda t: extract_docs_batch(t, bands=bands),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
