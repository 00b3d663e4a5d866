"""Deduplication operator family over generic (id, text) / (id, vector)
datasets (task brief: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup). The flagship pipeline's url-keyed variant
lives in kgforge/steps/dedup.py; these are the reusable forms exposed as
``queries()`` entries over the driver ``documents``/``embeddings`` tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min

from .dedup_core import (
    UnionFind,
    bucket_pair_policy,
    simhash,
)


# --- exact dedup ------------------------------------------------------------


def exact_dedup(ds, id_col: str, text_col: str):
    """Hash-partition on content, keep min id (G2 generic form)."""
    return (
        ds.groupby(text_col)
        .aggregate(Min(id_col, alias_name="keeper_id"), Count(alias_name="n_copies"))
    )


# --- minhash-LSH ------------------------------------------------------------


def minhash_candidate_pairs(ds, id_col: str, text_col: str, threshold: float = 0.7):
    """MinHash-LSH near-dup pairs (distinct, est_jaccard ≥ threshold).
    Delegates to the flagship's scale-sane collision engine
    (kgforge.steps.dedup): repeated-band-hash scan, candidate-only
    signature verification — no per-bucket groupby."""
    from .steps.dedup import verified_pairs_from_docs

    str_ds = ds.map_batches(
        lambda t: pa.table(
            {id_col: pa.compute.cast(t[id_col], pa.string()), text_col: t[text_col]}
        ),
        batch_format="pyarrow",
    ).materialize()  # read twice: collision scan + candidate sig recompute
    rows = verified_pairs_from_docs(str_ds, id_col, text_col, threshold)
    return pa.table(
        {
            "a": pa.array([a for a, _, _ in rows], pa.string()),
            "b": pa.array([b for _, b, _ in rows], pa.string()),
            "est_jaccard": pa.array([round(j, 4) for _, _, j in rows], pa.float64()),
        }
    )


def jaccard_pairs_profile(ds, id_col: str, text_col: str, threshold: float = 0.7, k: int = 3):
    """MinHash estimate + exact n-gram Jaccard on the SAME candidate set
    (one driver entry covering both the C4 sketch and the exact-shingle
    verifier): LSH candidates → signature estimate ≥ threshold → exact
    shingle Jaccard for the surviving pairs (texts fetched with a
    broadcast semi-join). Returns (a, b, est_jaccard, exact_jaccard)."""
    import pyarrow.compute as pc

    from .dedup_core import jaccard, shingles as mk_shingles
    from .steps.dedup import verified_pairs_from_docs

    str_ds = ds.map_batches(
        lambda t: pa.table(
            {id_col: pc.cast(t[id_col], pa.string()), text_col: t[text_col]}
        ),
        batch_format="pyarrow",
    ).materialize()
    rows = verified_pairs_from_docs(str_ds, id_col, text_col, threshold)
    empty = pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
         "est_jaccard": pa.array([], pa.float64()),
         "exact_jaccard": pa.array([], pa.float64())}
    )
    if not rows:
        return empty
    cand = sorted({u for a, b, _ in rows for u in (a, b)})
    cand_arr = pa.array(cand, pa.string())
    fetched = str_ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=cand_arr)),
        batch_format="pyarrow",
    )
    # duplicate ids (exact dedup skipped upstream): est_jaccard above came
    # from recompute_sigs, which resolves a duplicated id to the text with
    # the min-by-bytes SIGNATURE — pick exact_jaccard's text by the SAME
    # ordering, or one row could pair an estimate from text T1 with an
    # exact value from text T2 of the same id
    from .dedup_core import minhash_signature

    raw: dict[str, tuple[bytes, str]] = {}
    for bt in fetched.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for i, txt in zip(bt[id_col].to_pylist(), bt[text_col].to_pylist()):
            key = str(i)
            # default shingle size, NOT the param k: the est path's
            # signatures (_sig_rows) always use the default
            sig_b = minhash_signature(mk_shingles(txt)).astype("int64").tobytes()
            if key not in raw or sig_b < raw[key][0]:
                raw[key] = (sig_b, txt)
    texts = {key: mk_shingles(txt, k) for key, (_sb, txt) in raw.items()}
    return pa.table(
        {
            "a": pa.array([a for a, _, _ in rows], pa.string()),
            "b": pa.array([b for _, b, _ in rows], pa.string()),
            "est_jaccard": pa.array([round(j, 4) for _, _, j in rows], pa.float64()),
            "exact_jaccard": pa.array(
                [round(jaccard(texts[a], texts[b]), 4) for a, b, _ in rows],
                pa.float64(),
            ),
        }
    )


def minhash_clusters(ds, id_col: str, text_col: str, threshold: float = 0.7) -> dict[str, str]:
    """Full near-dup clustering: pairs → driver union-find → id→cluster
    (cluster id = min member). Only ids that belong to some pair appear."""
    t = minhash_candidate_pairs(ds, id_col, text_col, threshold)
    uf = UnionFind()
    for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
        uf.union(a, b)
    return uf.canonical_map()


def ngram_jaccard_pairs(ds, id_col: str, text_col: str, threshold: float = 0.5, k: int = 3):
    """Exact n-gram Jaccard near-dup pairs: LSH prunes candidates via the
    shared collision engine; EXACT shingle-set Jaccard is then computed for
    the (few) candidate docs only — their texts are fetched with a
    broadcast semi-join, never shuffled in bulk."""
    import pyarrow.compute as pc

    from .dedup_core import jaccard, shingles as mk_shingles
    from .steps.dedup import candidate_pairs, minhash_band_ds

    str_ds = ds.map_batches(
        lambda t: pa.table(
            {id_col: pc.cast(t[id_col], pa.string()), text_col: t[text_col]}
        ),
        batch_format="pyarrow",
    ).materialize()
    pairs = candidate_pairs(minhash_band_ds(str_ds, id_col, text_col))
    empty = pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
         "jaccard": pa.array([], pa.float64())}
    )
    if not pairs:
        return empty
    cand = sorted({u for p in pairs for u in p})
    cand_arr = pa.array(cand, pa.string())
    fetched = str_ds.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t[id_col], pa.string()), value_set=cand_arr)),
        batch_format="pyarrow",
    )
    # min-by-bytes per duplicated id (exact dedup skipped upstream):
    # deterministic across block arrival orders — same rule as
    # jaccard_pairs_profile / recompute_sigs / fetch_sigs
    raw: dict[str, str] = {}
    for b in fetched.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for i, txt in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            key = str(i)
            if key not in raw or txt.encode() < raw[key].encode():
                raw[key] = txt
    texts = {key: mk_shingles(txt, k) for key, txt in raw.items()}
    a_out, b_out, j_out = [], [], []
    for a, b in sorted(pairs):
        if a in texts and b in texts:
            j = jaccard(texts[a], texts[b])
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(j, 4))
    if not a_out:
        return empty
    return pa.table(
        {"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string()),
         "jaccard": pa.array(j_out, pa.float64())}
    )


# --- SimHash ----------------------------------------------------------------


def simhash_pairs(ds, id_col: str, text_col: str, max_hamming: int = 3):
    """SimHash near-dup: 64-bit fingerprints, bucketed by each of four
    16-bit bands (any pair within hamming ≤ max_hamming shares ≥1 exact
    band when max_hamming ≤ 3); verified by exact hamming distance."""

    def fp_rows(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch[id_col].to_pylist()]
        texts = batch[text_col].to_pylist()
        # simhash() is inherently per-doc; the 4× band explosion below is
        # vectorized (int64 band keys, no per-row string formatting)
        fps = np.array([simhash(t) for t in texts], dtype=np.uint64)
        n = len(fps)
        bks = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            band_val = (fps >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bks[b * n:(b + 1) * n] = (np.int64(b) << np.int64(16)) | band_val.astype(np.int64)
        fp_i64 = (fps - np.uint64(1 << 63)).view(np.int64)  # shift to int64 range
        return pa.table(
            {
                "band_key": pa.array(bks, pa.int64()),
                "doc": pa.array(ids * 4, pa.string()),
                "fp": pa.array(np.tile(fp_i64, 4), pa.int64()),
            }
        )

    def bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "hamming": pa.array([], pa.int64())}
        )
        fp_of: dict[str, int] = {}
        for d, x in zip(group["doc"].to_pylist(), group["fp"].to_pylist()):
            fp_of[d] = int(x) + (1 << 63)
        members = sorted(fp_of)
        if len(members) < 2:
            return empty
        a_out, b_out, h_out = [], [], []
        # shared bucket_pair_policy (VERDICT r1): all pairs for normal
        # buckets, O(n) sorted chain for oversized ones — a
        # boilerplate-heavy 16-bit band at web scale otherwise explodes
        # O(n²) inside one group
        for i, j in bucket_pair_policy(members):
            x, y = members[i], members[j]
            h = bin(fp_of[x] ^ fp_of[y]).count("1")
            if h <= max_hamming:
                a_out.append(x)
                b_out.append(y)
                h_out.append(h)
        if not a_out:
            return empty
        return pa.table(
            {"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string()),
             "hamming": pa.array(h_out, pa.int64())}
        )

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(fp_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# --- embedding-cosine near-dup ---------------------------------------------


def embedding_neardup_pairs(ds, id_col: str, vec_col: str, threshold: float = 0.95, seed: int = 11,
                            dim: int | None = None, n_planes: int = 16, n_tables: int = 2):
    """Near-dup by embedding cosine: random-hyperplane LSH bucket
    (``n_planes`` sign bits per bucket key, ``n_tables`` independent
    hyperplane sets so borderline pairs split across one bucket boundary
    still collide), exact cosine verification within bucket.

    Tune the bucketing to the threshold: P(pair at cosine c shares a
    bucket) = (1 - arccos(c)/π)^n_planes per table.  The defaults
    (16 planes × 2 tables) fit true near-dup thresholds (≥0.9, ~85%
    recall); LOOSER thresholds need shorter keys and more tables (e.g.
    0.4 → 6 planes × 8 tables ≈ 40% per-table-union recall) — fewer
    planes widen buckets, which ``bucket_pair_policy`` keeps O(n).

    ``dim`` defaults to the dataset's vector width (read from the schema /
    first row); the hyperplanes are a deterministic function of
    (seed, dim, n_planes, n_tables) so every batch buckets identically."""
    if n_planes < 1 or n_planes > 32 or n_tables < 1:
        raise ValueError("need 1 <= n_planes <= 32 and n_tables >= 1")
    if dim is None:
        f = ds.schema().base_schema.field(vec_col).type
        if pa.types.is_fixed_size_list(f):
            dim = f.list_size
        else:
            first = ds.limit(1).take_all()
            if not first:
                return pa.table(
                    {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                     "cosine": pa.array([], pa.float64())}
                )
            dim = len(first[0][vec_col])
    rng = np.random.RandomState(seed)
    plane_sets = [
        rng.randn(dim, n_planes).astype(np.float32) for _ in range(n_tables)
    ]

    def bucket_rows(batch: pa.Table) -> pa.Table:
        ids = [str(x) for x in batch[id_col].to_pylist()]
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1, norms)
        n = len(ids)
        # fully vectorized explode: int64 band key = table_idx << 40 | sign
        # bits (n_planes ≤ 32 so keys < 2^32); vectors tiled once, never
        # copied per row
        bks = np.empty(n_tables * n, dtype=np.int64)
        for pi, planes in enumerate(plane_sets):
            bits = (mat @ planes) > 0
            keys = (bits * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
            bks[pi * n:(pi + 1) * n] = (np.int64(pi) << np.int64(40)) | keys
        vecs_flat = np.tile(mat, (n_tables, 1)).reshape(-1)
        return pa.table(
            {
                "band_key": pa.array(bks, pa.int64()),
                "doc": pa.array(ids * n_tables, pa.string()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs_flat, pa.float32()), dim
                ),
            }
        )

    def bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "cosine": pa.array([], pa.float64())}
        )
        docs = group["doc"].to_pylist()
        vecs = group["vec"].to_pylist()
        vec_of: dict[str, np.ndarray] = {}
        for d, v in zip(docs, vecs):
            arr = np.asarray(v, dtype=np.float32)
            # duplicate ids (exact dedup skipped): min-by-bytes pick so the
            # verified cosine is deterministic across group row orders —
            # the same rule every text-based sibling applies
            if d not in vec_of or arr.tobytes() < vec_of[d].tobytes():
                vec_of[d] = arr
        members = sorted(vec_of)
        if len(members) < 2:
            return empty
        # shared bucket_pair_policy (VERDICT r1): a dense embedding
        # region collapsing into one bucket stays O(n) pairs
        idx_pairs = bucket_pair_policy(members)
        a_out, b_out, c_out = [], [], []
        for i, j in idx_pairs:
            x, y = members[i], members[j]
            c = float(vec_of[x] @ vec_of[y])
            if c >= threshold:
                a_out.append(x)
                b_out.append(y)
                c_out.append(round(c, 4))
        if not a_out:
            return empty
        return pa.table(
            {"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string()),
             "cosine": pa.array(c_out, pa.float64())}
        )

    pairs = (
        ds.select_columns([id_col, vec_col])
        .map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("cosine", alias_name="cosine"))


# --- paragraph-level exact dedup (CCNet-style) -------------------------------


def _flat_paragraphs(t: pa.Table, id_col: str, text_col: str, sep: str):
    """Vectorized per-batch paragraph explode: (ids-per-para, 0-based
    pidx, flat paragraph StringArray, parent row indices).  Arrow
    split_pattern + flatten — no Python loop over rows or paragraphs."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    lists = pc.split_pattern(texts, sep)
    parents = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.cumsum(lengths) - lengths
    pidx = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(starts, lengths)
    ids = t[id_col].take(parents)
    return ids, pidx, flat, parents


def _para_hash_factory(seed: int):
    """Within-run-stable vectorized u64 paragraph hash; the driver picks
    the implementation ONCE and closes over it (steps/extract.py
    _hash_urls rationale: heterogeneous workers must not hash
    differently)."""
    try:
        import polars  # noqa: F401

        use_polars = True
    except ImportError:  # pragma: no cover - polars ships in the sandbox
        use_polars = False

    def h(flat: pa.Array, _polars=use_polars, _seed=seed) -> np.ndarray:
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if _polars:
            import polars as pl

            return (
                pl.from_arrow(flat).hash(seed=_seed).to_numpy()
                .astype(np.uint64).view(np.int64)
            )
        from .extract_core import stable_u64

        return np.array(
            [stable_u64(p, f"para{_seed}") - (1 << 63) for p in flat.to_pylist()],
            dtype=np.int64,
        )

    return h


#: above this many input DOCS the collision scan switches from the
#: bounded driver gather (8 B/hash, one np.sort — fastest at bench
#: scale) to the distributed groupby-count>1 plan where only the
#: COLLIDING hashes ever reach the driver; override via
#: KGFORGE_CONTENT_DEDUP_DIST_ROWS
CONTENT_DEDUP_DIST_ROWS = 50_000_000


def _resolve_dedup_strategy(strategy: str, n_docs_hint) -> str:
    """'auto' → 'driver'/'distributed' on the KGFORGE_CONTENT_DEDUP_DIST_ROWS
    doc threshold.  Resolved ONCE per operator call: the same choice
    governs the collision scan AND winner resolution/application (a
    corpus whose hash column overwhelms the driver would overwhelm it
    with winner maps too)."""
    import os

    if strategy == "auto":
        limit = int(
            os.environ.get("KGFORGE_CONTENT_DEDUP_DIST_ROWS", CONTENT_DEDUP_DIST_ROWS)
        )
        # n_docs_hint is a CALLABLE so explicit strategies never pay the
        # extra upstream execution a Dataset.count() costs
        n = n_docs_hint() if callable(n_docs_hint) else n_docs_hint
        strategy = "distributed" if n > limit else "driver"
    if strategy not in ("driver", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    return strategy


def _dup_h1_values(h1_ds, strategy: str) -> np.ndarray:
    """Sorted array of DUPLICATED ``__h1`` values from a one-column
    int64 Dataset.  'driver' gathers every hash (8 B/row) and sorts;
    'distributed' runs groupby(__h1).count() and returns only the
    collisions — the hash column never concentrates on the driver
    (local-mode caveat: Ray 2.49 pays ~7 µs/group on the mostly
    singleton hashes, so 'auto' picks 'driver' below the threshold)."""
    if strategy == "driver":
        chunks = [
            b["__h1"].to_numpy()
            for b in h1_ds.iter_batches(batch_size=262144, batch_format="pyarrow")
            if b.num_rows
        ]
        if not chunks:
            return np.array([], dtype=np.int64)
        allh = np.concatenate(chunks)
        allh.sort()
        if len(allh) < 2:
            return np.array([], dtype=np.int64)
        return np.unique(allh[:-1][allh[:-1] == allh[1:]])
    agg = h1_ds.groupby("__h1").aggregate(Count(alias_name="__n"))
    chunks = [
        b["__h1"].to_numpy()[b["__n"].to_numpy() > 1]
        for b in agg.iter_batches(batch_size=262144, batch_format="pyarrow")
        if b.num_rows
    ]
    if not chunks:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(chunks))


def _paragraph_dedup_distributed(
    ds, id_col: str, text_col: str, sep: str, cand_rows,
    num_partitions: int | None = None,
):
    """Distributed winner resolution + application for paragraph dedup
    (VERDICT r2 item 2): candidate paragraph rows stay a Dataset; the
    per-(h1, h2) winner is picked by a ``map_groups`` over DUPLICATED
    groups only; the non-winner (doc, paragraph-index) rows aggregate
    into per-doc drop lists (``ListAgg``); docs that hold no dropped
    paragraph pass through a broadcast Bloom miss-filter untouched, and
    only the affected docs join their drop list for the local rebuild —
    the winner map never lands on the driver."""
    from .analytic import ListAgg
    from .bloom import build_bloom
    from .rayutil import drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    # three consumers below (cand scan, clean branch, maybe branch) —
    # materialize once so a LAZY caller's upstream lineage doesn't
    # re-execute per consumer (same shape as _exact_filter_distributed)
    ds = ds.materialize()
    # drop_empty_blocks: a 0-row input block skips cand_rows and would
    # reach the winners join still carrying the DOC schema (no __h1) —
    # the acero "No match for key field reference" landmine
    cand = drop_empty_blocks(ds.map_batches(cand_rows, batch_format="pyarrow"))

    def pick(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "__h1": pa.array([], pa.int64()),
                "__h2": pa.array([], pa.int64()),
                "__wid": pa.array([], g.schema.field("__id").type),
                "__wpidx": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        wid, wp = min(zip(g["__id"].to_pylist(), g["__pidx"].to_pylist()))
        return pa.table(
            {
                "__h1": g.column("__h1").slice(0, 1),
                "__h2": g.column("__h2").slice(0, 1),
                "__wid": pa.array([wid], g.schema.field("__id").type),
                "__wpidx": pa.array([int(wp)], pa.int64()),
            }
        )

    winners = drop_empty_blocks(
        cand.groupby(["__h1", "__h2"]).map_groups(pick, batch_format="pyarrow")
    )

    def passthrough(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table(
            {
                id_col: t[id_col],
                text_col: pc.fill_null(texts, ""),
                "n_dropped_paragraphs": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    if winners.count() == 0:
        return ds.map_batches(passthrough, batch_format="pyarrow")

    dj = cand.join(
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=("__h1", "__h2"),
        left_suffix="",
        right_suffix="_r",
    )
    drops = drop_empty_blocks(dj).map_batches(
        lambda t: t.filter(
            pc.invert(
                pc.and_(
                    pc.equal(t["__id"], t["__wid"]),
                    pc.equal(t["__pidx"], t["__wpidx"]),
                )
            )
        ).select(["__id", "__pidx"]),
        batch_format="pyarrow",
    )
    # pack the per-doc pidx list into a binary blob: pyarrow's acero
    # join rejects list<> non-key payloads (same workaround as the sig
    # blobs in steps/dedup._verify_pairs_ds)
    drops_agg = drop_empty_blocks(
        drops.groupby("__id").aggregate(ListAgg("__pidx", alias_name="__drop_pidx"))
    ).map_batches(
        lambda t: pa.table(
            {
                id_col: t["__id"],
                "__drop_blob": pa.array(
                    [
                        np.asarray(x, dtype=np.int64).tobytes()
                        for x in t["__drop_pidx"].to_pylist()
                    ],
                    pa.binary(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_affected = drops_agg.count()
    if n_affected == 0:
        return ds.map_batches(passthrough, batch_format="pyarrow")

    bf = build_bloom(drops_agg, id_col, capacity=n_affected)
    import ray

    words_ref = ray.put(bf.words)
    m, k = bf.m, bf.k

    def _hit_mask(t: pa.Table) -> np.ndarray:
        from .bloom import bloom_hit_mask

        return bloom_hit_mask(words_ref, m, k, t[id_col])

    clean = ds.map_batches(
        lambda t: passthrough(t.filter(pa.array(~_hit_mask(t)))),
        batch_format="pyarrow",
    )
    # drop_empty_blocks: same join-left landmine as `cand` above
    maybe = drop_empty_blocks(
        ds.map_batches(
            lambda t: t.select([id_col, text_col]).filter(pa.array(_hit_mask(t))),
            batch_format="pyarrow",
        )
    )
    mj = maybe.join(
        drops_agg,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_col,),
        left_suffix="",
        right_suffix="_r",
    )

    def rebuild(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ttype = texts.type  # preserve string vs large_string: the clean
        # (passthrough) branch keeps the input type, and a mixed
        # clean.union(rebuilt) schema breaks downstream writes
        texts = pc.fill_null(texts, "").to_pylist()
        blobs = t["__drop_blob"].to_pylist()
        out_texts: list[str] = []
        out_drops = np.zeros(len(texts), dtype=np.int64)
        for r, (txt, blob) in enumerate(zip(texts, blobs)):
            if not blob:  # bloom false positive: no drop list → unchanged
                out_texts.append(txt)
                continue
            paras = txt.split(sep)
            dset = set(np.frombuffer(blob, dtype=np.int64).tolist())
            kept = [p for i2, p in enumerate(paras) if i2 not in dset]
            out_texts.append(sep.join(kept))
            out_drops[r] = len(paras) - len(kept)
        return pa.table(
            {
                id_col: t[id_col],
                text_col: pa.array(out_texts, ttype),
                "n_dropped_paragraphs": pa.array(out_drops, pa.int64()),
            }
        )

    rebuilt = drop_empty_blocks(mj).map_batches(rebuild, batch_format="pyarrow")
    return clean.union(rebuilt)


def paragraph_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n\n",
    min_len: int = 1,
    strategy: str = "auto",
):
    """Corpus-wide paragraph dedup (CCNet-style boilerplate removal): a
    paragraph that occurs more than once survives ONLY at its first
    occurrence in global (id, paragraph-index) order; every doc is
    reassembled from its surviving paragraphs in original order (row
    count preserved — a fully-boilerplate doc becomes an empty string).
    Paragraphs shorter than ``min_len`` are never deduped (default 1:
    empty paragraphs from consecutive separators are structural).

    Scale shape (the neardup-v4 recompute trick, steps/dedup.py): doc
    text NEVER leaves its block. Pass 1 finds duplicated h64 hashes —
    ``strategy='driver'`` gathers 8 B/paragraph and sorts (fastest at
    bench scale), ``'distributed'`` runs groupby(h).count()>1 so only
    COLLIDING hashes reach the driver, ``'auto'`` switches on the
    KGFORGE_CONTENT_DEDUP_DIST_ROWS doc threshold (equivalence-tested).
    Pass 2 refines the h64 candidate set with a second independent hash
    and picks winners, so a wrong drop needs a 128-bit collision. Pass 3
    re-splits each doc locally, recomputes hashes, and keeps (non-dup |
    winner | short) paragraphs.  The resolved ``strategy`` also governs
    winner RESOLUTION and APPLICATION: 'driver' broadcasts a winner map
    (ray.put once; fastest at bench scale), 'distributed' keeps winners
    and per-doc drop lists as Datasets applied by join — see
    ``_paragraph_dedup_distributed``."""
    import ray

    h41 = _para_hash_factory(41)
    h97 = _para_hash_factory(97)

    def para_hashes(t: pa.Table) -> pa.Table:
        _, _, flat, _ = _flat_paragraphs(t, id_col, text_col, sep)
        ok = np.asarray(pc.utf8_length(flat)) >= min_len
        h = h41(flat)[ok] if len(flat) else np.array([], dtype=np.int64)
        return pa.table({"__h1": pa.array(h, pa.int64())})

    # pass 1: candidate duplicate h1 values (driver gather or
    # distributed groupby-count>1 — see _dup_h1_values)
    strategy = _resolve_dedup_strategy(strategy, ds.count)
    winners: dict[tuple[int, int], tuple] = {}
    dup_sorted = _dup_h1_values(
        ds.map_batches(para_hashes, batch_format="pyarrow"), strategy
    )

    def _make_cand_rows(dup: np.ndarray):
        def cand_rows(t: pa.Table) -> pa.Table:
            ids, pidx, flat, _ = _flat_paragraphs(t, id_col, text_col, sep)
            if not len(flat):
                return pa.table(
                    {"__id": ids, "__pidx": pa.array([], pa.int64()),
                     "__h1": pa.array([], pa.int64()), "__h2": pa.array([], pa.int64())}
                )
            h1 = h41(flat)
            pos = np.searchsorted(dup, h1)
            pos[pos == len(dup)] = 0
            mask = (dup[pos] == h1) & (np.asarray(pc.utf8_length(flat)) >= min_len)
            keep = np.nonzero(mask)[0]
            flat_k = flat.take(pa.array(keep))
            return pa.table(
                {
                    "__id": ids.take(pa.array(keep)),
                    "__pidx": pa.array(pidx[keep], pa.int64()),
                    "__h1": pa.array(h1[keep], pa.int64()),
                    "__h2": pa.array(h97(flat_k), pa.int64()),
                }
            )

        return cand_rows

    if strategy == "distributed" and len(dup_sorted):
        return _paragraph_dedup_distributed(
            ds, id_col, text_col, sep, _make_cand_rows(dup_sorted)
        )

    if len(dup_sorted):
        # pass 2: winners among TRUE duplicates only (candidate rows are
        # a tiny fraction of the corpus — the boilerplate)
        cand = ds.map_batches(
            _make_cand_rows(dup_sorted), batch_format="pyarrow"
        ).to_pandas()
        grp: dict[tuple[int, int], list[tuple]] = {}
        for i, j, a, b in zip(cand["__id"], cand["__pidx"], cand["__h1"], cand["__h2"]):
            grp.setdefault((int(a), int(b)), []).append((i, int(j)))
        winners = {k: min(v) for k, v in grp.items() if len(v) > 1}

    winners_ref = ray.put(winners)
    _dup_b = dup_sorted

    def rebuild(t: pa.Table) -> pa.Table:
        wmap = ray.get(winners_ref)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        if not wmap:
            return pa.table(
                {
                    id_col: t[id_col],
                    text_col: texts,
                    "n_dropped_paragraphs": pa.array(
                        np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            )
        ids_flat, pidx, flat, parents_arr = _flat_paragraphs(t, id_col, text_col, sep)
        h1 = h41(flat) if len(flat) else np.array([], dtype=np.int64)
        pos = np.searchsorted(_dup_b, h1)
        pos[pos == len(_dup_b)] = 0
        cand_mask = (_dup_b[pos] == h1) & (np.asarray(pc.utf8_length(flat)) >= min_len)
        if not cand_mask.any():
            # no duplicated paragraph in this batch: rows pass untouched
            return pa.table(
                {
                    id_col: t[id_col],
                    text_col: texts,
                    "n_dropped_paragraphs": pa.array(
                        np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            )
        keep_mask = np.ones(len(flat), dtype=bool)
        h2 = h97(flat)
        ids_py = ids_flat.to_pylist()
        for x in np.nonzero(cand_mask)[0]:
            w = wmap.get((int(h1[x]), int(h2[x])))
            if w is not None and w != (ids_py[x], int(pidx[x])):
                keep_mask[x] = False
        # reassemble per doc (parents come from the one split above)
        parents = parents_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        paras_py = flat.to_pylist()
        kept_per_row: list[list[str]] = [[] for _ in range(t.num_rows)]
        drops = np.zeros(t.num_rows, dtype=np.int64)
        for x in range(len(paras_py)):
            if keep_mask[x]:
                kept_per_row[parents[x]].append(paras_py[x])
            else:
                drops[parents[x]] += 1
        return pa.table(
            {
                id_col: t[id_col],
                # texts.type, not pa.string(): batches with no duplicate
                # pass through with the INPUT type (string vs
                # large_string), and mixed block schemas break writes
                text_col: pa.array([sep.join(ps) for ps in kept_per_row], texts.type),
                "n_dropped_paragraphs": pa.array(drops, pa.int64()),
            }
        )

    return ds.map_batches(rebuild, batch_format="pyarrow")


def _exact_filter_distributed(
    ds, id_col: str, text_col: str, dup_sorted: np.ndarray, h41, h97,
    num_partitions: int,
):
    """Distributed winner resolution + application (VERDICT r2 item 2):
    winners = in-cluster ``groupby(__h1, __h2).min(id)`` over the
    candidate rows (never a driver pandas gather), applied by a
    left-outer join of the CANDIDATE rows only — non-candidates pass
    through a vectorized searchsorted filter with no shuffle, so the
    join moves O(dup-group members), and neither ids nor winner maps
    ever concentrate on the driver."""
    from .rayutil import drop_empty_blocks

    _dup = dup_sorted

    def tag(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        h1 = h41(texts)
        pos = np.searchsorted(_dup, h1)
        pos[pos == len(_dup)] = 0
        cand = _dup[pos] == h1
        return (
            t.append_column("__h1", pa.array(h1, pa.int64()))
            .append_column("__h2", pa.array(h97(texts), pa.int64()))
            .append_column("__cand", pa.array(cand))
        )

    # materialized once: three consumers (winner groupby, clean filter,
    # maybe side) read the tagged blocks, upstream never re-executes
    aug = ds.map_batches(tag, batch_format="pyarrow").materialize()
    winners = (
        aug.map_batches(
            lambda t: t.filter(t["__cand"]).select([id_col, "__h1", "__h2"]),
            batch_format="pyarrow",
        )
        .groupby(["__h1", "__h2"])
        .aggregate(Min(id_col, alias_name="__wid"), Count(alias_name="__n"))
    )
    winners = drop_empty_blocks(
        winners.map_batches(
            lambda t: t.filter(pc.greater(t["__n"], 1)).drop_columns(["__n"]),
            batch_format="pyarrow",
        )
    )
    helper = ["__h1", "__h2", "__cand"]
    if winners.count() == 0:
        return aug.map_batches(
            lambda t: t.drop_columns(helper), batch_format="pyarrow"
        )
    clean = aug.map_batches(
        lambda t: t.filter(pc.invert(t["__cand"])).drop_columns(helper),
        batch_format="pyarrow",
    )
    # drop_empty_blocks BEFORE the join: map_batches never maps 0-row
    # blocks, so an empty input block reaches the join still carrying
    # the PRE-tag schema (no __h1/__h2) and acero fails with "No match
    # for key field reference __h1" (rayutil note; layout-dependent —
    # this was a run-to-run flake until forced by an all-distributed
    # curation run)
    maybe = drop_empty_blocks(
        aug.map_batches(
            lambda t: t.filter(t["__cand"]).drop_columns(["__cand"]),
            batch_format="pyarrow",
        )
    )
    j = maybe.join(
        winners,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("__h1", "__h2"),
        left_suffix="",
        right_suffix="_r",
    )

    def survivors(t: pa.Table) -> pa.Table:
        w = t["__wid"]
        keep = pc.fill_null(
            pc.or_kleene(pc.is_null(w), pc.equal(t[id_col], w)), False
        )
        return t.filter(keep).drop_columns(["__h1", "__h2", "__wid"])

    surv = drop_empty_blocks(j).map_batches(survivors, batch_format="pyarrow")
    return clean.union(surv)


def exact_dedup_filter(
    ds, id_col: str = "doc_id", text_col: str = "text", *, strategy: str = "auto",
    num_partitions: int | None = None,
):
    """Filtering form of exact dedup: keep exactly ONE row (min id) per
    distinct text, streaming the rest out — the form a curation pipeline
    composes (exact_dedup above returns the per-content groups instead).

    Same scale shape as paragraph_dedup: pass 1 gathers 8 B/doc content
    hashes, pass 2 refines h64 candidates with an independent second
    hash and picks min-id winners (wrong drop needs a 128-bit
    collision), pass 3 filters the candidates against the winners — text
    never leaves its block.  The resolved ``strategy`` governs winner
    RESOLUTION and APPLICATION too: 'driver' builds a broadcast winner
    dict (measured fastest at bench scale), 'distributed' keeps winners
    as a Dataset and applies them by join
    (``_exact_filter_distributed``), so nothing dup-group-sized ever
    lands on the driver."""
    import ray

    h41 = _para_hash_factory(141)
    h97 = _para_hash_factory(197)

    def _texts(t: pa.Table) -> pa.Array:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pc.fill_null(texts, "")

    strategy = _resolve_dedup_strategy(strategy, ds.count)
    dup_sorted = _dup_h1_values(
        ds.map_batches(
            lambda t: pa.table({"__h1": pa.array(h41(_texts(t)), pa.int64())}),
            batch_format="pyarrow",
        ),
        strategy,
    )
    if not len(dup_sorted):
        return ds
    if strategy == "distributed":
        from .rayutil import join_partitions

        return _exact_filter_distributed(
            ds, id_col, text_col, dup_sorted, h41, h97,
            join_partitions(len(dup_sorted))
            if num_partitions is None
            else num_partitions,
        )

    _dup = dup_sorted

    def cand_rows(t: pa.Table) -> pa.Table:
        texts = _texts(t)
        h1 = h41(texts)
        pos = np.searchsorted(_dup, h1)
        pos[pos == len(_dup)] = 0
        keep = np.nonzero(_dup[pos] == h1)[0]
        texts_k = texts.take(pa.array(keep))
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "__id": ids.take(pa.array(keep)),
                "__h1": pa.array(h1[keep], pa.int64()),
                "__h2": pa.array(
                    h97(texts_k) if len(keep) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    cand = ds.map_batches(cand_rows, batch_format="pyarrow").to_pandas()
    grp: dict[tuple[int, int], list] = {}
    for i, a, b in zip(cand["__id"], cand["__h1"], cand["__h2"]):
        grp.setdefault((int(a), int(b)), []).append(i)
    winners = {k: min(v) for k, v in grp.items() if len(v) > 1}

    winners_ref = ray.put(winners)
    _dup_b = dup_sorted

    def keep_rows(t: pa.Table) -> pa.Table:
        wmap = ray.get(winners_ref)
        if not wmap:
            return t
        texts = _texts(t)
        h1 = h41(texts)
        pos = np.searchsorted(_dup_b, h1)
        pos[pos == len(_dup_b)] = 0
        cand_mask = _dup_b[pos] == h1
        keep = np.ones(t.num_rows, dtype=bool)
        if cand_mask.any():
            h2 = h97(texts)
            ids = t[id_col].to_pylist()
            for x in np.nonzero(cand_mask)[0]:
                w = wmap.get((int(h1[x]), int(h2[x])))
                if w is not None and w != ids[x]:
                    keep[x] = False
        return t.filter(pa.array(keep))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


# --- incremental (cross-run) exact dedup -------------------------------------


#: bump when the index hash scheme changes — an index parquet written
#: under a different version MUST be rebuilt, never silently mixed
INC_HASH_VERSION = 2  # v2: single blake2b-16 digest split into two u64


def _inc_hash_pair(t: pa.Table, text_col: str):
    """(h1, h2) int64 arrays for a batch's text column — ONE 16-byte
    blake2b digest per doc split into two u64 halves (half the hashing
    cost of two independent digests).  This is the cross-run index
    contract: blake2b, NOT the within-run polars hash (its seed
    schedule is not version-pinned); every producer and consumer of the
    index MUST go through this helper."""
    import hashlib

    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "").to_pylist()
    h1 = np.empty(len(texts), dtype=np.int64)
    h2 = np.empty(len(texts), dtype=np.int64)
    for i, x in enumerate(texts):
        d = hashlib.blake2b(("inc" + x).encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "big") - (1 << 63)
        h2[i] = int.from_bytes(d[8:], "big") - (1 << 63)
    return h1, h2


def content_hashes(ds, text_col: str = "text"):
    """(h1, h2) int64 content hashes per row — the persistable corpus
    index for ``incremental_dedup_filter`` (see ``_inc_hash_pair`` for
    the hash contract).  16 B/doc: a 10^12-doc index is ~16 TB of plain
    parquet, streamed not broadcast."""

    def f(t: pa.Table) -> pa.Table:
        h1, h2 = _inc_hash_pair(t, text_col)
        return pa.table({"h1": pa.array(h1, pa.int64()), "h2": pa.array(h2, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


#: above this many Bloom-hit candidate rows the exact verification and
#: the drop application switch from the driver gather (measured fastest
#: on normal shards, whose candidate count is the re-post rate) to the
#: join-based distributed plan (a backfill shard that is 90% known
#: content would otherwise gather ~the whole shard).  Override via
#: KGFORGE_INC_DEDUP_DIST_ROWS.
INC_DEDUP_DIST_ROWS = 5_000_000


def incremental_dedup_filter(
    new_ds,
    known_hashes,
    *,
    text_col: str = "text",
    fpp: float = 0.01,
    strategy: str = "auto",
    num_partitions: int | None = None,
):
    """Drop NEW docs whose content already exists in an ingested corpus
    (the daily-shard op: never re-deduplicate the whole 100 TB corpus).
    ``known_hashes`` is the (h1, h2) Dataset ``content_hashes`` produced
    for prior shards (read back from parquet).

    Plan: a Bloom filter of the known h1 values is built DISTRIBUTEDLY
    (mergeable BloomSketch) and broadcast once; new docs stream through
    it — misses are definitively novel (no false negatives) and pass
    straight through.  The bloom hits (true dups + ~fpp false
    positives) are verified EXACTLY against the index, and only
    confirmed (h1, h2) matches are dropped — so a Bloom false positive
    can never drop a novel doc, and a wrong drop needs a 128-bit
    collision.  ``strategy='driver'`` broadcasts the candidate keys and
    gathers the touched index rows (fastest while candidates are a
    normal shard's re-post rate); ``'distributed'`` (auto above
    KGFORGE_INC_DEDUP_DIST_ROWS candidates) verifies by JOIN — a second
    Bloom of the candidate h1s prunes the index scan, candidate keys
    meet the touched index rows in one inner join, and the confirmed
    keys anti-join the shard — nothing candidate-sized lands on the
    driver.  Intra-shard duplicates are out of scope: run
    ``exact_dedup_filter`` on the shard first.
    """
    import os

    import ray

    from .bloom import bloom_semi_filter, build_bloom
    from .rayutil import drop_empty_blocks

    n_known = known_hashes.count()
    if n_known == 0:
        return new_ds
    bf = build_bloom(known_hashes, "h1", capacity=n_known, fpp=fpp)

    def add_h(t: pa.Table) -> pa.Table:
        h1, h2 = _inc_hash_pair(t, text_col)
        return t.append_column("__h1", pa.array(h1, pa.int64())).append_column(
            "__h2", pa.array(h2, pa.int64())
        )

    # drop_empty_blocks on hashed: a 0-row input block skips add_h and
    # would reach the candidates join without __h1/__h2 (acero "No match
    # for key field reference" — rayutil note)
    hashed = drop_empty_blocks(new_ds.map_batches(add_h, batch_format="pyarrow"))
    candidates = drop_empty_blocks(bloom_semi_filter(hashed, "__h1", bf))
    n_cand = candidates.count()
    if n_cand == 0:
        return hashed.map_batches(
            lambda t: t.drop_columns(["__h1", "__h2"]), batch_format="pyarrow"
        )
    if strategy == "auto":
        limit = int(os.environ.get("KGFORGE_INC_DEDUP_DIST_ROWS", INC_DEDUP_DIST_ROWS))
        strategy = "distributed" if n_cand > limit else "driver"
    if strategy not in ("driver", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")

    if strategy == "distributed":
        if num_partitions is None:
            from .rayutil import join_partitions

            num_partitions = join_partitions(n_cand)
        # distinct candidate keys, renamed to the index's column names
        cand_keys = drop_empty_blocks(
            candidates.select_columns(["__h1", "__h2"])
            .groupby(["__h1", "__h2"])
            .aggregate(Count(alias_name="__n"))
            .map_batches(
                lambda t: pa.table({"h1": t["__h1"], "h2": t["__h2"]}),
                batch_format="pyarrow",
            )
        )
        # prune the index scan to rows whose h1 might be a candidate,
        # then confirm exactly with ONE inner join (keys only, 16 B/row)
        cbf = build_bloom(cand_keys, "h1", capacity=max(cand_keys.count(), 1))
        known_touch = drop_empty_blocks(
            bloom_semi_filter(known_hashes, "h1", cbf)
            .groupby(["h1", "h2"])
            .aggregate(Count(alias_name="__n"))
            .map_batches(
                lambda t: t.select(["h1", "h2"]), batch_format="pyarrow"
            )
        )
        if known_touch.count() == 0:
            # every Bloom hit was a false positive (no index row touches
            # a candidate h1): nothing can drop — and the inner join
            # below would crash on the schema-less all-empty groupby
            # output (Ray 2.49 loses the (h1, h2) schema when every
            # block is 0 rows; drop_empty_blocks can't recover it)
            return hashed.map_batches(
                lambda t: t.drop_columns(["__h1", "__h2"]), batch_format="pyarrow"
            )
        dup_keys_ds = drop_empty_blocks(
            cand_keys.join(
                known_touch,
                join_type="inner",
                num_partitions=num_partitions,
                on=("h1", "h2"),
                left_suffix="",
                right_suffix="_r",
            )
        ).map_batches(
            lambda t: pa.table(
                {
                    "__h1": t["h1"],
                    "__h2": t["h2"],
                    "__drop": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if dup_keys_ds.count() == 0:
            return hashed.map_batches(
                lambda t: t.drop_columns(["__h1", "__h2"]), batch_format="pyarrow"
            )
        # anti-join application: confirmed keys carry a marker through a
        # left-outer join of the CANDIDATE rows only; Bloom misses are
        # definitively novel and pass through with no shuffle (same
        # shape as steps/dedup.apply_drop_ds)
        words_ref = ray.put(bf.words)
        m, k = bf.m, bf.k

        def miss_rows(t: pa.Table) -> pa.Table:
            from .bloom import bloom_hit_mask

            hit = bloom_hit_mask(words_ref, m, k, t["__h1"])
            return t.filter(pa.array(~hit)).drop_columns(["__h1", "__h2"])

        clean = hashed.map_batches(miss_rows, batch_format="pyarrow")
        j = candidates.join(
            dup_keys_ds,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("__h1", "__h2"),
            left_suffix="",
            right_suffix="_r",
        )
        survivors = drop_empty_blocks(j).map_batches(
            lambda t: t.filter(pc.is_null(t["__drop"])).drop_columns(
                ["__h1", "__h2", "__drop"]
            ),
            batch_format="pyarrow",
        )
        return clean.union(survivors)

    # Driver plan: one CANDIDATE-sized gather builds the exact h1 value
    # set (small — the strategy gate bounds n_cand at a shard's re-post
    # rate), the index is screened IN-CLUSTER with exact is_in, and only
    # exactly-matching index rows stream back (O(true dups)).  A Bloom
    # screen here would instead pass ~fpp × |index| false-positive rows
    # to the driver — a cost that scales with the 100-TB corpus index,
    # not with the shard.
    cand_pd = candidates.select_columns(["__h1", "__h2"]).to_pandas()
    cand_pairs = set(zip(cand_pd["__h1"], cand_pd["__h2"]))
    h1_ref = ray.put(pa.array(sorted({int(a) for a, _ in cand_pairs}), pa.int64()))

    def touch(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["h1"], value_set=ray.get(h1_ref)))

    known_touch = (
        known_hashes.select_columns(["h1", "h2"])
        .map_batches(touch, batch_format="pyarrow")
        .to_pandas()
    )
    # a fully-filtered Dataset can come back as a column-less frame;
    # confirm exact (h1, h2) membership so an h1-only collision between
    # a novel doc and the index can never drop the doc
    dup_keys = (
        set(zip(known_touch["h1"], known_touch["h2"])) & cand_pairs
        if len(known_touch)
        else set()
    )
    dup_ref = ray.put(dup_keys)
    # vectorized h1 pre-screen (the keep fn runs over EVERY shard row, so
    # a per-row Python pair lookup there was the hot path): exact pair
    # membership is only checked for the h1 hits — O(true dups + rare
    # h1-only collisions) Python work per batch
    dup_h1_sorted = np.sort(np.fromiter((a for a, _ in dup_keys), dtype=np.int64,
                                        count=len(dup_keys))) if dup_keys else None

    def keep(t: pa.Table) -> pa.Table:
        if dup_h1_sorted is not None and len(dup_h1_sorted):
            h1 = t["__h1"].to_numpy()
            pos = np.searchsorted(dup_h1_sorted, h1)
            pos[pos == len(dup_h1_sorted)] = 0
            cand_mask = dup_h1_sorted[pos] == h1
            if cand_mask.any():
                dups = ray.get(dup_ref)
                h2 = t["__h2"].to_numpy()
                mask = np.ones(t.num_rows, dtype=bool)
                for x in np.nonzero(cand_mask)[0]:
                    if (int(h1[x]), int(h2[x])) in dups:
                        mask[x] = False
                t = t.filter(pa.array(mask))
        return t.drop_columns(["__h1", "__h2"])

    return hashed.map_batches(keep, batch_format="pyarrow")
