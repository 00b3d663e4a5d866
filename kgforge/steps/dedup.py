"""Near-duplicate removal: minhash-LSH + union-find (SURVEY §2.G3-G4).

Scale shape (v4 — profiled three times): one stateless map_batches
computes per-doc MinHash signatures and stores ONLY the 16 int64 band
hashes in a slim materialized side dataset (``url_norm, band_h[16]``,
~150 B/doc — the 1 KB sig column is never materialized corpus-wide; at
10^12 docs it would be ~1 PB of object store). Signatures are
deterministic, so they are recomputed from text exactly where needed:
for the CANDIDATE docs at verification (driver path) or in a lazy map
feeding the verify join (distributed path). No exploded band dataset
exists at all:

  1. the driver gathers ONLY the flattened band_h column (8 B × 16 per
     doc, vectorized arrow→numpy) and finds repeated hashes with one
     np.sort — these are the collision buckets (near-dups + rare
     collisions; almost every bucket is a singleton, which is why a
     groupby here wastes ~7 µs per singleton group);
  2. a broadcast filter fetches the few rows touching a repeated hash,
     and the driver forms candidate pairs under the shared
     ``bucket_pair_policy``;
  3. signatures of candidate docs only are fetched the same way;
     verification (``sig_jaccard`` — identical criterion to the oracle)
     + union-find run on the driver.

On a multi-node cluster the step-1 gather becomes a hash-shuffle
count>1 over the band rows and step-3 a join pairs⋈sigs — same outputs,
flip when the band column stops fitting on the driver (SURVEY §4.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dedup_core import (
    LSH_BANDS,
    NUM_PERM,
    UnionFind,
    bucket_pair_policy,
    minhash_signature,
    shingles,
    sig_jaccard,
)

NEARDUP_JACCARD = 0.7


def _flat_i64(col) -> np.ndarray:
    """list<int64> column → flat int64 numpy array (chunk-safe)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.flatten(), dtype=np.int64)


def _sig_rows(batch: pa.Table, include_sig: bool = True) -> pa.Table:
    """docs → one (url_norm[, sig[128]], band_h[16]) row per doc.
    Whole-batch kernel (``dedup_core.batch_minhash_bands`` — one
    factorize/hash pass over the batch's unique tokens, reduceat minima,
    vectorized band mixing); values are equality-tested against the
    per-doc ``minhash_signature(shingles(t))`` definition."""
    from ..dedup_core import batch_minhash_bands

    urls = batch["url_norm"].to_pylist()
    texts = batch["extracted_text"].to_pylist()
    sigs, bhs = batch_minhash_bands(texts)
    cols: dict = {"url_norm": pa.array(urls, pa.string())}
    if include_sig:
        cols["sig"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.view(np.int64).reshape(-1), pa.int64()), NUM_PERM
        )
    cols["band_h"] = pa.FixedSizeListArray.from_arrays(
        pa.array(bhs.reshape(-1), pa.int64()), LSH_BANDS
    )
    return pa.table(cols)


def _rows_touching(sig_ds, dup_h: np.ndarray, columns: list[str]):
    """Broadcast filter: rows whose band_h intersects the dup-hash set."""
    dup_sorted = np.sort(dup_h)

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select(columns)
        flat = _flat_i64(t["band_h"])
        hit = np.isin(flat, dup_sorted).reshape(n, LSH_BANDS).any(axis=1)
        return t.select(columns).filter(pa.array(hit))

    return sig_ds.map_batches(f, batch_format="pyarrow")


def minhash_sig_ds(ds, id_col: str = "url_norm", text_col: str = "extracted_text",
                   include_sig: bool = True):
    """Generic minhash side dataset: (url_norm=id[, sig[128]], band_h[16])
    per row, materialized (slim; consumed by several passes).

    ``include_sig=False`` yields the bands-only table (~150 B/doc instead
    of ~1.2 KB/doc) — the flagship pairing scans use that and recompute
    signatures from text for CANDIDATE docs only at verification time,
    so the 1 KB/doc signature column is never materialized corpus-wide."""

    def rows(batch: pa.Table) -> pa.Table:
        return _sig_rows(
            pa.table({"url_norm": batch[id_col], "extracted_text": batch[text_col]}),
            include_sig=include_sig,
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(rows, batch_format="pyarrow")
        .materialize()
    )


def minhash_band_ds(ds, id_col: str = "url_norm", text_col: str = "extracted_text"):
    """Slim (url_norm, band_h[16]) side dataset (see minhash_sig_ds).

    When the docs already CARRY a ``band_h`` column (the fused
    extraction pass — ``extract_docs(..., bands=True)`` emits band keys
    as a by-product of pass 1), this is a zero-copy projection: no
    second read of the corpus text, no minhash recompute.  The fused
    values are bit-identical to the recompute (deterministic seeds), so
    both forms feed the same collision scan."""
    schema = ds.schema()
    # the fused shortcut is only valid when the bands were computed from
    # the SAME column this call is asked to band: extract_docs(bands=True)
    # hashes extracted_text, so a caller banding any other column (or a
    # pipeline that rewrote the text after extraction must drop band_h)
    # gets an honest recompute instead of stale keys
    if (
        schema is not None
        and "band_h" in schema.names
        and text_col == "extracted_text"
    ):
        cols = [id_col, "band_h"]
        proj = ds.select_columns(cols)
        if id_col != "url_norm":
            proj = proj.rename_columns({id_col: "url_norm"})
        return proj.materialize()
    return minhash_sig_ds(ds, id_col, text_col, include_sig=False)


def recompute_sigs(docs_ds, cand_ids: list[str], id_col: str = "url_norm",
                   text_col: str = "extracted_text") -> dict[str, np.ndarray]:
    """Signatures for the candidate ids only, recomputed from text in a
    distributed broadcast-filter pass (deterministic: same seeds → same
    signature as the pairing pass). Replaces a full scan of a
    corpus-wide materialized sig column with a candidates-sized fetch."""
    id_arr = pa.array(cand_ids, pa.string())

    def f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string())
        m = pc.is_in(ids, value_set=id_arr)
        t2 = pa.table({"url_norm": ids, "extracted_text": t[text_col]}).filter(m)
        return _sig_rows(t2, include_sig=True).select(["url_norm", "sig"])

    cand = docs_ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )
    return _gather_sigs(cand)


def _gather_sigs(sig_rows_ds) -> dict[str, np.ndarray]:
    """(url_norm, sig) Dataset → {url: sig array} on the driver.

    One matrix view per BATCH (fixed-size-list column → flat int64 →
    reshape), not a Python list per ROW: the per-row
    ``to_pylist``/``np.asarray`` form measured ~5 s of driver-serial
    time for 75k candidate signatures at the 1.2M-page bench — the
    single largest non-width-scaling term in the 8→32 leg.  Duplicate
    ids (caller skipped exact dedup) resolve min-by-bytes,
    deterministic regardless of block arrival order — the same rule
    ``_verify_pairs_ds`` applies."""
    sig_of: dict[str, np.ndarray] = {}
    for b in sig_rows_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        n = b.num_rows
        if not n:
            continue
        urls = b["url_norm"].to_pylist()
        mat = _flat_i64(b["sig"]).reshape(n, -1)
        for i, u in enumerate(urls):
            prev = sig_of.get(u)
            if prev is None:
                sig_of[u] = mat[i]
            elif mat[i].tobytes() < prev.tobytes():
                sig_of[u] = mat[i]
    return sig_of


def candidate_pairs(sig_ds) -> set[tuple[str, str]]:
    """Unverified LSH candidate pairs from a minhash side dataset.
    Collision buckets via the repeated-band-hash scan (never a per-group
    Python call — almost every bucket is a singleton at web scale)."""
    # pass 1: find repeated band hashes (vectorized gather, one np.sort)
    chunks = [
        _flat_i64(b["band_h"])
        for b in sig_ds.select_columns(["band_h"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    ]
    if not chunks:
        return set()
    allh = np.concatenate(chunks)
    allh.sort()
    dup_h = np.unique(allh[:-1][allh[:-1] == allh[1:]]) if len(allh) > 1 else np.array([])
    if not len(dup_h):
        return set()

    # pass 2: bucket membership for collision rows only → candidate pairs
    # (vectorized: flatten all (band_hash, url) hits, lexsort by hash,
    # walk group boundaries — no per-row Python)
    hit_h_parts: list[np.ndarray] = []
    hit_u_parts: list[np.ndarray] = []
    for b in _rows_touching(sig_ds, dup_h, ["url_norm", "band_h"]).iter_batches(
        batch_size=16384, batch_format="pyarrow"
    ):
        n = b.num_rows
        if n == 0:
            continue
        urls = np.asarray(b["url_norm"].to_pylist(), dtype=object)
        bh = _flat_i64(b["band_h"]).reshape(n, LSH_BANDS)
        hits = np.isin(bh, dup_h)
        rows, cols = np.nonzero(hits)
        hit_h_parts.append(bh[rows, cols])
        hit_u_parts.append(urls[rows])
    pairs: set[tuple[str, str]] = set()
    if hit_h_parts:
        hh = np.concatenate(hit_h_parts)
        uu = np.concatenate(hit_u_parts)
        order = np.argsort(hh, kind="stable")
        hh, uu = hh[order], uu[order]
        boundaries = np.nonzero(np.diff(hh))[0] + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(hh)]))
        sizes = ends - starts
        # fast path: 2-member buckets are the overwhelming majority (a
        # bucket is one near-dup pair); a python sorted/set per bucket
        # costs ~25 µs × 10^5 buckets of DRIVER-serial time, so the
        # common case is formed with two vectorized object-array min/max
        # passes and only >2-member buckets take the policy loop
        two = np.nonzero(sizes == 2)[0]
        if len(two):
            a = uu[starts[two]]
            b = uu[starts[two] + 1]
            neq = a != b
            lo_ = np.minimum(a[neq], b[neq])
            hi_ = np.maximum(a[neq], b[neq])
            pairs.update(zip(lo_.tolist(), hi_.tolist()))
        for k in np.nonzero(sizes > 2)[0]:
            s, e = starts[k], ends[k]
            members = sorted(set(uu[s:e].tolist()))
            if len(members) < 2:
                continue
            for i, j in bucket_pair_policy(members):
                pairs.add((members[i], members[j]))
    return pairs


def fetch_sigs(sig_ds, cand_ids: list[str]) -> dict[str, np.ndarray]:
    """Broadcast semi-join: signatures of the candidate ids only."""
    id_arr = pa.array(cand_ids, pa.string())
    cand_sigs = sig_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["url_norm"], value_set=id_arr)).select(
            ["url_norm", "sig"]
        ),
        batch_format="pyarrow",
    )
    return _gather_sigs(cand_sigs)


def verified_pairs(sig_ds, threshold: float = NEARDUP_JACCARD) -> list[tuple[str, str, float]]:
    """candidate pairs → signature-verified (a, b, est_jaccard ≥ threshold),
    sorted (deterministic)."""
    pairs = candidate_pairs(sig_ds)
    if not pairs:
        return []
    sig_of = fetch_sigs(sig_ds, sorted({u for p in pairs for u in p}))
    return _verify_with(pairs, sig_of, threshold)


def _verify_with(pairs, sig_of, threshold: float) -> list[tuple[str, str, float]]:
    out = []
    for a, b in sorted(pairs):
        if a in sig_of and b in sig_of:
            j = sig_jaccard(sig_of[a], sig_of[b])
            if j >= threshold:
                out.append((a, b, float(j)))
    return out


def verified_pairs_from_docs(
    docs_ds,
    id_col: str = "url_norm",
    text_col: str = "extracted_text",
    threshold: float = NEARDUP_JACCARD,
) -> list[tuple[str, str, float]]:
    """verified_pairs without ever materializing the corpus-wide sig
    column: bands-only side dataset for the collision scan, candidate
    signatures recomputed from text (same criterion, same results)."""
    band_ds = minhash_band_ds(docs_ds, id_col, text_col)
    pairs = candidate_pairs(band_ds)
    if not pairs:
        return []
    sig_of = recompute_sigs(
        docs_ds, sorted({u for p in pairs for u in p}), id_col, text_col
    )
    return _verify_with(pairs, sig_of, threshold)


# above this doc count the driver-side collision scan (128 B/doc band
# gather + pair forming + union-find) flips to the fully distributed
# band-groupby → pair map_groups → sig-join verify → cc_label_propagation
# plan; override via KGFORGE_NEARDUP_DIST_ROWS
NEARDUP_DISTRIBUTED_ROWS = 5_000_000


def _dup_band_hashes(bands) -> np.ndarray:
    """Repeated band hashes via ONE range sort + vectorized segment scan.

    ``groupby(band_h).aggregate(Count)`` pays Ray's per-group Python
    overhead on ~16 nearly-all-singleton band rows per doc — measured
    446 s at 1.2M docs / 19.2M band rows, the dominant wall of the whole
    forced-distributed flagship. The replacement sorts the thin int64
    band column (the same corpus-sized data movement the groupby's hash
    shuffle paid) and finds repeats with numpy: within a contiguous
    sorted segment, a repeat is an adjacent-equal compare; a hash
    spanning two segments must be last-of-A == first-of-B (segments
    partition the sorted order contiguously), so emitting each segment's
    (first, last) hash with its in-segment count and summing counts per
    boundary hash on the driver is EXACT. Scan output is ~2 rows per
    block plus the true collisions — trivially driver-sized."""
    sorted_h = bands.select_columns(["band_h"]).sort("band_h")

    def scan(t: pa.Table) -> pa.Table:
        h = t["band_h"].to_numpy()
        if not len(h):
            return pa.table(
                {"h": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        rep = np.unique(h[1:][h[1:] == h[:-1]])
        hs = rep.tolist()
        ns = [2] * len(rep)  # ">=2" marker; exact count not needed
        for b in {int(h[0]), int(h[-1])}:
            hs.append(b)
            ns.append(int((h == b).sum()))
        return pa.table({"h": pa.array(hs, pa.int64()), "n": pa.array(ns, pa.int64())})

    # batch_size=None → whole sorted blocks = maximal contiguous segments
    parts = sorted_h.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if not len(parts):
        return np.array([], dtype=np.int64)
    totals = parts.groupby("h")["n"].sum()
    return np.sort(totals.index[totals.values >= 2].to_numpy(dtype=np.int64))


def _pairs_ds_distributed(sig_ds):
    """Distributed candidate pairing: exploded (band_h, url) rows →
    repeated-hash detection via ``_dup_band_hashes`` (one thin-column
    range sort — the only corpus-sized shuffle; moves 16 int64s per doc)
    → per-bucket pair forming under the SHARED bucket_pair_policy →
    Dataset(a, b). Only collision buckets ever reach a Python group
    callable — singletons die in the broadcast hash filter."""
    from ray.data.aggregate import Count

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat = _flat_i64(t["band_h"])
        urls = np.repeat(np.asarray(t["url_norm"].to_pylist(), dtype=object), LSH_BANDS)
        return pa.table(
            {
                "band_h": pa.array(flat, pa.int64()),
                "url_norm": pa.array(urls, pa.string()),
            }
        ) if n else pa.table(
            {"band_h": pa.array([], pa.int64()), "url_norm": pa.array([], pa.string())}
        )

    bands = sig_ds.select_columns(["url_norm", "band_h"]).map_batches(
        explode, batch_format="pyarrow"
    ).materialize()
    # collision hashes are the SMALL side (near-dups + rare collisions) —
    # broadcast them into the filter instead of a second corpus shuffle
    dup_arr = _dup_band_hashes(bands)
    if not len(dup_arr):
        return None
    hits = bands.map_batches(
        lambda t, d=dup_arr: t.filter(
            pa.array(np.isin(t["band_h"].to_numpy(), d))
        ),
        batch_format="pyarrow",
    )

    def form_pairs(group: pa.Table) -> pa.Table:
        members = sorted(set(group["url_norm"].to_pylist()))
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
        if len(members) < 2:
            return empty
        a_out, b_out = [], []
        for i, j in bucket_pair_policy(members):
            a_out.append(members[i])
            b_out.append(members[j])
        return pa.table(
            {"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string())}
        )

    pairs = hits.groupby("band_h").map_groups(form_pairs, batch_format="pyarrow")
    # the same pair can surface from several bands — make edges distinct
    from ..rayutil import ensure_schema

    return ensure_schema(
        pairs.groupby(["a", "b"]).aggregate(Count(alias_name="__n")).select_columns(["a", "b"]),
        pa.schema([("a", pa.string()), ("b", pa.string())]),
    )


def _flat_i64_col(ds, col: str) -> np.ndarray:
    parts = [
        b[col].to_numpy()
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    return np.concatenate(parts) if parts else np.array([], dtype=np.int64)


def _verify_pairs_ds(pairs_ds, docs_ds, threshold: float):
    """Distributed signature verification with ONE hash join: pairs are
    exploded to (pair_id, url) rows, joined once against the packed sigs
    (1 KiB binary blob per doc — pyarrow joins reject fixed_size_list
    payloads), then a groupby(pair_id) computes sig_jaccard from the two
    member rows. Deliberately NOT pairs⋈sigs⋈sigs: Ray 2.49's hash-join
    operator fails when a join consumes another join's output
    ("No match ... for key field reference" in the aggregator), and a
    single join + groupby is one fewer candidate shuffle anyway.

    The sig blobs are recomputed from text in a LAZY map over docs feeding
    the join — never materialized: at 10^12 docs a stored 1 KB/doc sig
    column is ~1 PB of object store; one extra signature pass is the
    cheaper side of that trade (deterministic, so results are identical)."""
    SEP = "\x1f"

    def explode(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        pid = [f"{x}{SEP}{y}" for x, y in zip(a, b)]
        return pa.table(
            {
                "pid": pa.array(pid + pid, pa.string()),
                "url_norm": pa.array(a + b, pa.string()),
            }
        )

    def pack(t: pa.Table) -> pa.Table:
        urls = pc.cast(t["url_norm"], pa.string()).to_pylist()
        blobs = [
            minhash_signature(shingles(x)).astype(np.int64).tobytes()
            for x in t["extracted_text"].to_pylist()
        ]
        return pa.table(
            {
                "url_norm": pa.array(urls, pa.string()),
                "sigblob": pa.array(blobs, pa.binary()),
            }
        )

    from ..bloom import bloom_semi_filter, build_bloom
    from ..rayutil import drop_empty_blocks

    # the pairs side is SMALL (actual candidates) and comes out of a
    # hash shuffle, whose empty blocks are schema-less and crash the
    # acero join below ("No match ... key field reference url_norm");
    # physically dropping them here is a metadata-only scan
    ex = drop_empty_blocks(pairs_ds.map_batches(explode, batch_format="pyarrow"))
    # semi-filter the docs side BEFORE the signature recompute (ADVICE
    # r2): only candidate-pair members are ever consumed by
    # verify_group, so the bloom of the pair urls (built distributedly
    # from the exploded pairs, broadcast once) keeps the minhash
    # recompute and the join shuffle scaled to CANDIDATES, not corpus
    # size.  False positives recompute one wasted signature and then
    # die in the inner join — never a wrong verification.
    bf = build_bloom(ex, "url_norm", capacity=max(ex.count(), 1))
    docs_cand = bloom_semi_filter(
        docs_ds.select_columns(["url_norm", "extracted_text"]), "url_norm", bf
    )
    # drop_empty_blocks: stale-schema 0-row blocks on a join side are
    # the acero key-reference landmine; the materialize this implies is
    # candidates-sized (post bloom filter), not corpus-sized
    packed = drop_empty_blocks(docs_cand.map_batches(pack, batch_format="pyarrow"))
    from ..rayutil import join_partitions

    # ex is materialized (drop_empty_blocks) — count is metadata-only
    j = ex.join(
        packed,
        join_type="inner",
        num_partitions=join_partitions(ex.count()),
        on=("url_norm",),
    )

    def verify_group(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
        if g.num_rows < 2:
            return empty
        a, b = g["pid"].to_pylist()[0].split(SEP)
        urls = g["url_norm"].to_pylist()
        blobs = g["sigblob"].to_pylist()
        # an id may join >1 docs row when the caller skipped exact dedup —
        # pick the MIN blob per id (deterministic, block-order-independent)
        # instead of refusing the group, matching the driver path
        by: dict[str, bytes] = {}
        for u, blob in zip(urls, blobs):
            if u not in by or blob < by[u]:
                by[u] = blob
        if a not in by or b not in by:
            return empty
        sa = np.frombuffer(by[a], dtype=np.int64)
        sb = np.frombuffer(by[b], dtype=np.int64)
        if float((sa == sb).mean()) < threshold:
            return empty
        return pa.table(
            {"a": pa.array([a], pa.string()), "b": pa.array([b], pa.string())}
        )

    return j.groupby("pid").map_groups(verify_group, batch_format="pyarrow")


_DROP_SCHEMA = pa.schema([("url_norm", pa.string())])


def _drop_ds_distributed(band_ds, docs_ds, threshold: float = NEARDUP_JACCARD):
    """Distributed G3+G4, Dataset-valued end to end: band-groupby
    pairing → join-verified edges → cc_label_propagation labels →
    Dataset(url_norm) of the nodes whose component label is not
    themselves.  Nothing corpus-sized EVER lands on the driver — the
    drop side stays in the cluster for ``apply_drop_ds`` (VERDICT r2:
    the old plan collapsed these labels into a Python set, which at a
    30-50% web dup rate is corpus-scale)."""
    import ray.data as rd

    from .cc import cc_label_propagation

    pairs = _pairs_ds_distributed(band_ds)
    if pairs is None:
        return rd.from_arrow(_DROP_SCHEMA.empty_table())
    edges = _verify_pairs_ds(pairs, docs_ds, threshold).materialize()
    if edges.count() == 0:
        return rd.from_arrow(_DROP_SCHEMA.empty_table())
    labels = cc_label_propagation(edges)
    from ..rayutil import drop_empty_blocks

    # drop_empty_blocks (not bare materialize): 0-row label blocks skip
    # the rename map and would surface with the (node, label) schema —
    # downstream joins on url_norm then hit the acero key-reference
    # landmine
    return drop_empty_blocks(
        labels.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["node"], t["label"])))
            .select(["node"])
            .rename_columns(["url_norm"]),
            batch_format="pyarrow",
        )
    )


def _drop_set_driver(band_ds, docs_ds, threshold: float = NEARDUP_JACCARD) -> set[str]:
    """Driver collision-scan plan (measured fastest below millions of
    docs): candidate pairs + signature verify + union-find on the
    driver; returns the url_norm drop set (components keep min)."""
    pairs = candidate_pairs(band_ds)
    verified: list[tuple[str, str, float]] = []
    if pairs:
        sig_of = recompute_sigs(docs_ds, sorted({u for p in pairs for u in p}))
        verified = _verify_with(pairs, sig_of, threshold)
    uf = UnionFind()
    for a, b_, _j in verified:
        uf.union(a, b_)
    drop: set[str] = set()
    comp: dict[str, list[str]] = {}
    for u in uf.parent:
        comp.setdefault(uf.find(u), []).append(u)
    for members in comp.values():
        keep = min(members)
        drop.update(m for m in members if m != keep)
    return drop


def neardup_drop_ds(
    docs_ds, force_path: str | None = None, threshold: float = NEARDUP_JACCARD
):
    """G3+G4 front, Dataset-valued: verified near-dup pairs → connected
    components → Dataset(url_norm) of docs to DROP (components keep
    their min member).  The pipeline-facing form: the drop side never
    has to fit on the driver; pair it with ``apply_drop_ds``.

    Two plans, selected by corpus size (or ``force_path`` ∈
    {"driver", "distributed"} for tests): the driver collision scan
    (measured faster below millions of docs — see module docstring,
    wrapped into a one-column Dataset) and the fully distributed
    band-groupby → join-verify → cc_label_propagation plan."""
    import os

    import ray.data as rd

    band_ds = minhash_band_ds(docs_ds)
    if force_path != "driver":
        limit = int(os.environ.get("KGFORGE_NEARDUP_DIST_ROWS", NEARDUP_DISTRIBUTED_ROWS))
        if force_path == "distributed" or band_ds.count() > limit:
            return _drop_ds_distributed(band_ds, docs_ds, threshold)
    drop = _drop_set_driver(band_ds, docs_ds, threshold)
    return rd.from_arrow(
        pa.table({"url_norm": pa.array(sorted(drop), pa.string())})
    )


def neardup_drop_set(
    docs_ds, force_path: str | None = None, threshold: float = NEARDUP_JACCARD
) -> set[str]:
    """Set-valued convenience form of ``neardup_drop_ds`` — ONLY for
    corpora whose drop side fits on the driver (tests, small shards).
    Pipelines use ``neardup_drop_ds`` + ``apply_drop_ds``.  Plan
    selection lives in ONE place (``neardup_drop_ds``); this just
    collects its one-column result."""
    drop_ds = neardup_drop_ds(docs_ds, force_path, threshold)
    drop: set[str] = set()
    for b in drop_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        drop.update(b["url_norm"].to_pylist())
    return drop


#: at or below this many drop keys ``apply_drop_ds`` gathers them into
#: one broadcast ``is_in`` filter (measured fastest — no join); above
#: it the drop side stays a Dataset and application is a bloom-prefiltered
#: anti-join.  Override via KGFORGE_DROP_APPLY_BROADCAST_ROWS.
DROP_APPLY_BROADCAST_ROWS = 2_000_000


def apply_drop_set(docs_ds, drop: set, key_col: str = "url_norm"):
    """Broadcast anti-join: filter out dropped keys inside map_batches
    (SURVEY §2.D4).  For drop sides that may not fit on the driver use
    ``apply_drop_ds``.  Key type is INFERRED (int ids work, not just
    strings) and cast to each batch's column type, so the broadcast
    strategy accepts exactly the keys the join strategy does."""
    if not drop:
        return docs_ds
    drop_arr = pa.array(sorted(drop))

    def f(t: pa.Table) -> pa.Table:
        col = t[key_col]
        vs = drop_arr if drop_arr.type == col.type else drop_arr.cast(col.type)
        return t.filter(pc.invert(pc.is_in(col, value_set=vs)))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def apply_drop_ds(
    docs_ds,
    drop_ds,
    key_col: str = "url_norm",
    *,
    drop_key: str | None = None,
    strategy: str = "auto",
    num_partitions: int | None = None,
):
    """Anti-join ``docs_ds`` against a Dataset-valued drop side: keep
    the rows whose ``key_col`` is NOT in ``drop_ds``'s ``drop_key``
    column (default: same name as ``key_col``; keys must be distinct in
    ``drop_ds`` — both neardup plans guarantee that).

    ``auto`` gathers small drop sides into the broadcast ``is_in``
    filter (fastest, no shuffle); above KGFORGE_DROP_APPLY_BROADCAST_ROWS
    it switches to the distributed plan: a Bloom filter of the drop
    keys is built IN-CLUSTER (mergeable sketch) and broadcast once —
    rows that miss it survive with no shuffle at all (no false
    negatives); only the hits (actual drops + ~1% false positives) go
    through an exact left-outer join against the drop side, so the join
    shuffles O(dropped docs), never the corpus.  A Bloom false positive
    finds no join match and survives — never a wrong drop."""
    import os

    import ray

    from ..bloom import build_bloom
    from ..rayutil import drop_empty_blocks

    src_key = drop_key or key_col
    if src_key != key_col:
        drop_ds = drop_ds.map_batches(
            lambda t, s=src_key, k=key_col: pa.table({k: t[s]}),
            batch_format="pyarrow",
        )
    drop_ds = drop_ds.materialize()
    n_drop = drop_ds.count()
    if n_drop == 0:
        return docs_ds
    if strategy == "auto":
        limit = int(
            os.environ.get("KGFORGE_DROP_APPLY_BROADCAST_ROWS", DROP_APPLY_BROADCAST_ROWS)
        )
        strategy = "broadcast" if n_drop <= limit else "distributed"
    if strategy == "broadcast":
        drop: set[str] = set()
        for b in drop_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            drop.update(b[key_col].to_pylist())
        return apply_drop_set(docs_ds, drop, key_col)
    if strategy != "distributed":
        raise ValueError(f"unknown strategy {strategy!r}")

    if num_partitions is None:
        from ..rayutil import join_partitions

        # the join moves O(drops); the drop count sizes its partitions
        num_partitions = join_partitions(n_drop)
    bf = build_bloom(drop_ds, key_col, capacity=n_drop)
    words_ref = ray.put(bf.words)
    m, k = bf.m, bf.k
    # two consumers (miss filter + hit join) — materialize once so the
    # upstream lineage doesn't execute twice; blocks spill as needed
    docs_ds = docs_ds.materialize()

    def _mask(t: pa.Table) -> np.ndarray:
        from ..bloom import bloom_hit_mask

        # null-never-matches: a null-key doc can't be in the drop side,
        # so it goes straight to `clean` instead of through the join
        return bloom_hit_mask(words_ref, m, k, t[key_col])

    clean = docs_ds.map_batches(
        lambda t: t.filter(pa.array(~_mask(t))), batch_format="pyarrow"
    )
    # acero joins reject fixed_size_list payload columns (band keys,
    # embeddings): pack them to fixed_size_binary for the join side and
    # unpack on the survivors so `clean` and `survivors` union with the
    # same schema
    from ..rayutil import fsl_pack, fsl_pack_specs, fsl_unpack

    fsl_specs = fsl_pack_specs(docs_ds.schema())
    # drop_empty_blocks: a 0-row doc block skips every upstream
    # map_batches, so it can reach the join below with a schema that
    # predates a caller-appended key column (curation's __nd_key) —
    # the acero "No match for key field reference" landmine
    maybe = drop_empty_blocks(
        docs_ds.map_batches(
            lambda t: fsl_pack(t.filter(pa.array(_mask(t))), fsl_specs),
            batch_format="pyarrow",
        )
    )
    # drop_empty_blocks: 0-row drop blocks skip the marker map and reach
    # the join's RIGHT side without __drop / under a stale key name
    marked = drop_empty_blocks(
        drop_ds.map_batches(
            lambda t: pa.table(
                {
                    key_col: t[key_col],
                    "__drop": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    j = maybe.join(
        marked,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(key_col,),
        left_suffix="",
        right_suffix="_r",
    )
    survivors = drop_empty_blocks(j).map_batches(
        lambda t: fsl_unpack(
            t.filter(pc.is_null(t["__drop"])).drop_columns(["__drop"]), fsl_specs
        ),
        batch_format="pyarrow",
    )
    return clean.union(survivors)


def neardup_dedup(docs_ds):
    """G3+G4 composed: returns (deduped_docs, drop_ds)."""
    drop_ds = neardup_drop_ds(docs_ds)
    return apply_drop_ds(docs_ds, drop_ds), drop_ds
