"""Near-duplicate removal: minhash-LSH + union-find (SURVEY §2.G3-G4).

Scale shape: signatures (1 KiB/doc) are computed in a stateless
map_batches, exploded to (band_key, url_norm, sig) rows, hash-shuffled by
band_key; per-bucket verification uses the signature-estimated Jaccard
(``sig_jaccard`` — the same criterion as the oracle). The resulting
candidate-edge set is tiny relative to the corpus (only actual near-dups +
rare band collisions), so union-find runs on the driver; the drop-set is
broadcast back as a filter. The 10^12-scale alternative (iterative
min-label propagation as repeated groupby-min rounds) is documented in
SURVEY §4.5 and keeps the same edge-producing stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup_core import (
    LSH_BANDS,
    NUM_PERM,
    UnionFind,
    lsh_band_keys,
    minhash_signature,
    shingles,
    sig_jaccard,
)

NEARDUP_JACCARD = 0.7


def _band_rows(batch: pa.Table) -> pa.Table:
    """docs → exploded (band_key, url_norm, sig) rows (LSH_BANDS per doc)."""
    urls = batch["url_norm"].to_pylist()
    texts = batch["extracted_text"].to_pylist()
    band_keys: list[str] = []
    out_urls: list[str] = []
    sigs: list[np.ndarray] = []
    for u, t in zip(urls, texts):
        sig = minhash_signature(shingles(t))
        for bk in lsh_band_keys(sig):
            band_keys.append(bk)
            out_urls.append(u)
            sigs.append(sig)
    return pa.table(
        {
            "band_key": pa.array(band_keys, pa.string()),
            "url_norm": pa.array(out_urls, pa.string()),
            "sig": pa.array(
                [s.astype(np.int64) for s in sigs], pa.list_(pa.int64(), NUM_PERM)
            ),
        }
    )


def _bucket_edges(group: pa.Table) -> pa.Table:
    """Per-band-bucket candidate verification → near-dup edges. Buckets are
    tiny (dup clusters + rare collisions); all-pairs within bucket."""
    n = group.num_rows
    if n < 2:
        return pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    urls = group["url_norm"].to_pylist()
    sigs = np.asarray(group["sig"].to_pylist(), dtype=np.int64)
    order = np.argsort(np.array(urls))
    a_out, b_out = [], []
    for ii in range(n):
        for jj in range(ii + 1, n):
            i, j = order[ii], order[jj]
            if urls[i] == urls[j]:
                continue
            if sig_jaccard(sigs[i], sigs[j]) >= NEARDUP_JACCARD:
                a_out.append(urls[i])
                b_out.append(urls[j])
    return pa.table({"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string())})


def neardup_drop_set(docs_ds) -> set[str]:
    """Run the LSH stages and union-find; return the url_norm drop-set
    (each component keeps its lexicographic-min member)."""
    edges = (
        docs_ds.select_columns(["url_norm", "extracted_text"])
        .map_batches(_band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(_bucket_edges, batch_format="pyarrow")
    )
    uf = UnionFind()
    # The edge set is small by construction — driver-side collection is the
    # documented v1 (SURVEY §4.5); take_batch-free streaming consumption.
    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, bb in zip(b["a"].to_pylist(), b["b"].to_pylist()):
            uf.union(a, bb)
    drop: set[str] = set()
    comp: dict[str, list[str]] = {}
    for u in uf.parent:
        comp.setdefault(uf.find(u), []).append(u)
    for members in comp.values():
        keep = min(members)
        drop.update(m for m in members if m != keep)
    return drop


def apply_drop_set(docs_ds, drop: set[str]):
    """Broadcast anti-join: filter out dropped url_norms inside map_batches
    (SURVEY §2.D4). ``drop`` is shipped once per task via closure capture —
    at real scale wrap it in ray.put and resolve in an actor __init__."""
    if not drop:
        return docs_ds
    import pyarrow.compute as pc

    drop_arr = pa.array(sorted(drop), pa.string())
    return docs_ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t["url_norm"], value_set=drop_arr))
        ),
        batch_format="pyarrow",
    )


def neardup_dedup(docs_ds):
    """G3+G4 composed: returns (deduped_docs, drop_set)."""
    drop = neardup_drop_set(docs_ds)
    return apply_drop_set(docs_ds, drop), drop
