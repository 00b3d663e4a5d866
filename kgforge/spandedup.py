"""Exact substring (duplicated-span) dedup — the corpus-wide
"remove every repeated 50-token span, keep its first occurrence" step
of LM training-data pipelines (public knowledge: the suffix-array
substring dedup of Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better", approximated here with rolling n-token window
hashes instead of a suffix array — same spans found for runs >= n
tokens, no giant index build).

Semantics: slide an n-token window over every doc; a window whose
128-bit content hash occurs more than once corpus-wide survives ONLY at
its first occurrence in global (doc id, window position) order.  Every
other occurrence's char span is cut from its doc (overlapping loser
windows merge into one cut — a duplicated RUN of m >= n tokens is
removed as one span).  Row count is preserved; docs gain an
``n_dropped_chars`` column.  Cutting is single-pass: spans created
ACROSS a cut seam are not re-examined (documented approximation — the
suffix-array original has the same property after its byte-range
removal).

Scale shape (same three-pass plan as ``dedup_ops.paragraph_dedup``;
doc text never leaves its block):

1. duplicated window hashes — ``strategy='driver'`` gathers 8 B/window
   and finds repeats with one np.sort; ``'distributed'`` runs the thin
   sort-scan so only colliding hashes reach the driver; ``'auto'``
   switches on the KGFORGE_CONTENT_DEDUP_DIST_ROWS doc threshold.
2. winners among TRUE duplicates, refined by a second INDEPENDENT
   128-bit-combined hash (a wrong cut needs both 64-bit hashes to
   collide): the driver plan broadcasts a winner map; the distributed
   plan picks winners with an in-cluster ``map_groups`` and aggregates
   per-doc cut lists (intervals packed into sorted int64s so ListAgg's
   deterministic sort cannot misalign start/end pairs).
3. per-batch rebuild: recompute windows locally, cut the loser spans,
   emit (id, text, n_dropped_chars).  On the distributed plan docs that
   hold no cut pass through a broadcast Bloom miss-filter untouched and
   only affected docs join their cut list.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extract_core import stable_u64
from .relops import ngram_window_hashes

#: Lee et al. use 50-token spans; shorter windows start cutting common
#: phrases, longer ones miss short boilerplate
DEFAULT_SPAN_NGRAM = 50

#: 'auto' flips to the distributed plan above this many input DOCS.
#: Deliberately ~100× below KGFORGE_CONTENT_DEDUP_DIST_ROWS: this
#: operator's pass-1 driver gather is 8 B per n-token WINDOW (≈ one per
#: token, ~1k per web doc), not per doc/paragraph — 500k docs ≈ a few
#: hundred million windows ≈ low-GB driver memory, the same budget the
#: sibling thresholds encode per row.  Override via
#: KGFORGE_SPAN_DEDUP_DIST_ROWS (and GRAFT_FORCE_DIST zeroes it in the
#: bench).
SPAN_DEDUP_DIST_ROWS = 500_000

_TOK_RE = re.compile(r"\S+")


def _flat_tokens_stable(texts: list, salt: str):
    """Batch-flat (token-hash u64, char start, char end, doc index) with
    CROSS-PROCESS-stable hashes (blake2b over the batch's unique tokens,
    vectorized gather) — repetition.py's batch-local factorize codes
    won't do here: duplicated windows must collide across blocks."""
    import pandas as _pd

    toks, starts, ends, lens = [], [], [], []
    for x in texts:
        ms = list(_TOK_RE.finditer(x or ""))
        lens.append(len(ms))
        for m in ms:
            toks.append(m.group())
            starts.append(m.start())
            ends.append(m.end())
    lens_arr = np.asarray(lens, dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens_arr)
    if not toks:
        e = np.array([], dtype=np.int64)
        return np.array([], dtype=np.uint64), e, e, doc_idx
    codes, uniques = _pd.factorize(np.asarray(toks, dtype=object))
    uhash = np.array([stable_u64(u, salt) for u in uniques], dtype=np.uint64)
    return (
        uhash[codes],
        np.asarray(starts, dtype=np.int64),
        np.asarray(ends, dtype=np.int64),
        doc_idx,
    )


def _span_windows(texts: list, n: int, *, need_h2: bool = True):
    """(h1 u64, h2 u64, doc_idx, char_start, char_end, window_pos) for
    every n-token window that lies inside one doc.  h1/h2 come from two
    independently salted token-hash streams (an h1 collision does not
    imply an h2 collision), rolled with the SHARED
    ``relops.ngram_window_hashes`` kernel.  ``window_pos`` is the
    doc-local token index of the window's first token — the global
    (doc id, window_pos) order defines "first occurrence".
    ``need_h2=False`` (the pass-1 duplicate scan, which only consumes
    h1) skips the second tokenize/hash stream — h2 comes back empty."""
    th1, starts, ends, doc_idx = _flat_tokens_stable(texts, "spandedup1")
    if len(th1) < n:
        e = np.array([], dtype=np.int64)
        return (np.array([], dtype=np.uint64), np.array([], dtype=np.uint64),
                e, e, e, e)
    acc1, valid = ngram_window_hashes(th1, doc_idx, n)
    if need_h2:
        # second independent stream: same tokens, different blake2b salt
        th2, _, _, _ = _flat_tokens_stable(texts, "spandedup2")
        acc2, _ = ngram_window_hashes(th2, doc_idx, n)
    else:
        acc2 = np.zeros(0, dtype=np.uint64)
    L = len(acc1)
    d = doc_idx[:L]
    # doc-local window position = flat index − the doc's first flat index
    first_flat = np.zeros(L, dtype=np.int64)
    if L:
        new_doc = np.r_[True, d[1:] != d[:-1]]
        first_flat = np.maximum.accumulate(
            np.where(new_doc, np.arange(L, dtype=np.int64), -1)
        )
    pos = np.arange(L, dtype=np.int64) - first_flat
    return (
        acc1[valid], acc2[valid] if need_h2 else acc2, d[valid],
        starts[:L][valid], ends[n - 1:][valid], pos[valid],
    )


def _merge_cut(text: str, spans: np.ndarray) -> tuple[str, int]:
    """Cut the union of packed (cs << 32 | ce) spans from ``text``;
    returns (new text, chars dropped).  Packed spans sort by start via
    their high bits, so a plain sort is interval order."""
    spans = np.sort(spans)
    cs = (spans >> np.int64(32)).astype(np.int64)
    ce = (spans & np.int64(0xFFFFFFFF)).astype(np.int64)
    out = []
    cursor = 0
    dropped = 0
    for s, e in zip(cs.tolist(), ce.tolist()):
        if e <= cursor:
            continue
        s = max(s, cursor)
        out.append(text[cursor:s])
        dropped += e - s
        cursor = e
    out.append(text[cursor:])
    return "".join(out), dropped


def _pack_spans(cs: np.ndarray, ce: np.ndarray) -> np.ndarray:
    """(start, end) char offsets → one sortable int64 per interval.
    Offsets must fit 31/32 bits — docs are far below 2^31 chars (Arrow
    string columns cap a VALUE at 2 GB anyway)."""
    return (cs.astype(np.int64) << np.int64(32)) | ce.astype(np.int64)


def _passthrough(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Normalize null text and stamp n_dropped_chars=0; every OTHER
    column passes through unchanged (the operator composes mid-pipeline,
    so payload columns like n_dropped_paragraphs must survive)."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = t.set_column(
        t.schema.get_field_index(text_col), text_col, pc.fill_null(texts, "")
    )
    if "n_dropped_chars" in t.column_names:  # re-application overwrites
        t = t.drop_columns(["n_dropped_chars"])
    return t.append_column(
        "n_dropped_chars", pa.array(np.zeros(t.num_rows, dtype=np.int64))
    )


def _substring_dedup_distributed(
    ds, id_col: str, text_col: str, n: int, dup_sorted: np.ndarray,
    num_partitions: int | None = None,
):
    """Distributed winner resolution + application (the
    ``_paragraph_dedup_distributed`` shape with char-span cut lists):
    candidate windows stay a Dataset; winners are picked in-cluster per
    duplicated (h1, h2) group; loser spans aggregate into per-doc packed
    int64 lists; clean docs pass a broadcast Bloom miss-filter and only
    affected docs join their cut list for the local rebuild."""
    import ray

    from .analytic import ListAgg
    from .bloom import build_bloom
    from .rayutil import drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    ds = ds.materialize()  # three consumers below
    _dup = dup_sorted

    def cand_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "").to_pylist()
        h1, h2, d, cs, ce, pos = _span_windows(texts, n)
        h1i = h1.view(np.int64)
        p = np.searchsorted(_dup, h1i)
        p[p == len(_dup)] = 0
        m = _dup[p] == h1i
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "__id": ids.take(pa.array(d[m])),
                "__pos": pa.array(pos[m], pa.int64()),
                "__span": pa.array(_pack_spans(cs[m], ce[m]), pa.int64()),
                "__h1": pa.array(h1i[m], pa.int64()),
                "__h2": pa.array(h2.view(np.int64)[m], pa.int64()),
            }
        )

    cand = drop_empty_blocks(ds.map_batches(cand_rows, batch_format="pyarrow"))

    def pick(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "__h1": pa.array([], pa.int64()),
                "__h2": pa.array([], pa.int64()),
                "__wid": pa.array([], g.schema.field("__id").type),
                "__wpos": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        wid, wp = min(zip(g["__id"].to_pylist(), g["__pos"].to_pylist()))
        return pa.table(
            {
                "__h1": g.column("__h1").slice(0, 1),
                "__h2": g.column("__h2").slice(0, 1),
                "__wid": pa.array([wid], g.schema.field("__id").type),
                "__wpos": pa.array([int(wp)], pa.int64()),
            }
        )

    winners = drop_empty_blocks(
        cand.groupby(["__h1", "__h2"]).map_groups(pick, batch_format="pyarrow")
    )
    if winners.count() == 0:
        return ds.map_batches(
            lambda t: _passthrough(t, id_col, text_col), batch_format="pyarrow"
        )

    dj = cand.join(
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=("__h1", "__h2"),
        left_suffix="",
        right_suffix="_r",
    )
    losers = drop_empty_blocks(dj).map_batches(
        lambda t: t.filter(
            pc.invert(
                pc.and_(
                    pc.equal(t["__id"], t["__wid"]),
                    pc.equal(t["__pos"], t["__wpos"]),
                )
            )
        ).select(["__id", "__span"]),
        batch_format="pyarrow",
    )
    drops_agg = drop_empty_blocks(
        losers.groupby("__id").aggregate(ListAgg("__span", alias_name="__spans"))
    ).map_batches(
        lambda t: pa.table(
            {
                id_col: t["__id"],
                "__span_blob": pa.array(
                    [
                        np.asarray(x, dtype=np.int64).tobytes()
                        for x in t["__spans"].to_pylist()
                    ],
                    pa.binary(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_affected = drops_agg.count()
    if n_affected == 0:
        return ds.map_batches(
            lambda t: _passthrough(t, id_col, text_col), batch_format="pyarrow"
        )

    bf = build_bloom(drops_agg, id_col, capacity=n_affected)
    words_ref = ray.put(bf.words)
    m_, k_ = bf.m, bf.k

    def _hit(t: pa.Table) -> np.ndarray:
        from .bloom import bloom_hit_mask

        return bloom_hit_mask(words_ref, m_, k_, t[id_col])

    clean = ds.map_batches(
        lambda t: _passthrough(t.filter(pa.array(~_hit(t))), id_col, text_col),
        batch_format="pyarrow",
    )
    maybe = drop_empty_blocks(
        ds.map_batches(
            lambda t: t.filter(pa.array(_hit(t))), batch_format="pyarrow"
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
        ttype = texts.type  # string vs large_string parity with `clean`
        texts_py = pc.fill_null(texts, "").to_pylist()
        blobs = t["__span_blob"].to_pylist()
        out_texts = []
        out_drop = np.zeros(len(texts_py), dtype=np.int64)
        for r, (txt, blob) in enumerate(zip(texts_py, blobs)):
            if not blob:  # bloom false positive
                out_texts.append(txt)
                continue
            new, dropped = _merge_cut(txt, np.frombuffer(blob, dtype=np.int64))
            out_texts.append(new)
            out_drop[r] = dropped
        t = t.drop_columns(["__span_blob"])
        t = t.set_column(
            t.schema.get_field_index(text_col), text_col,
            pa.array(out_texts, ttype),
        )
        if "n_dropped_chars" in t.column_names:  # re-application overwrites
            t = t.drop_columns(["n_dropped_chars"])
        return t.append_column("n_dropped_chars", pa.array(out_drop, pa.int64()))

    rebuilt = drop_empty_blocks(mj).map_batches(rebuild, batch_format="pyarrow")
    return clean.union(rebuilt)


def substring_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = DEFAULT_SPAN_NGRAM,
    strategy: str = "auto",
):
    """Corpus-wide duplicated-span removal (module docstring).  Returns
    a Dataset with the same rows, ``text_col`` rewritten with loser
    spans cut, plus ``n_dropped_chars``.  Docs shorter than ``n`` tokens
    are never touched."""
    import os

    import ray

    from .dedup_ops import _dup_h1_values

    # every plan reads the input more than once (hash pass + candidate
    # pass + rebuild); pin it so a lazy caller's lineage runs once
    ds = ds.materialize()
    if strategy == "auto":
        limit = int(
            os.environ.get("KGFORGE_SPAN_DEDUP_DIST_ROWS", SPAN_DEDUP_DIST_ROWS)
        )
        strategy = "distributed" if ds.count() > limit else "driver"
    if strategy not in ("driver", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def win_hashes(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _h2, _d, _cs, _ce, _p = _span_windows(
            pc.fill_null(texts, "").to_pylist(), n, need_h2=False
        )
        return pa.table({"__h1": pa.array(h1.view(np.int64), pa.int64())})

    dup_sorted = _dup_h1_values(
        ds.map_batches(win_hashes, batch_format="pyarrow"), strategy
    )
    if not len(dup_sorted):
        return ds.map_batches(
            lambda t: _passthrough(t, id_col, text_col), batch_format="pyarrow"
        )
    if strategy == "distributed":
        return _substring_dedup_distributed(ds, id_col, text_col, n, dup_sorted)

    _dup = dup_sorted

    def cand_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "").to_pylist()
        h1, h2, d, _cs, _ce, pos = _span_windows(texts, n)
        h1i = h1.view(np.int64)
        p = np.searchsorted(_dup, h1i)
        p[p == len(_dup)] = 0
        m = _dup[p] == h1i
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "__id": ids.take(pa.array(d[m])),
                "__pos": pa.array(pos[m], pa.int64()),
                "__h1": pa.array(h1i[m], pa.int64()),
                "__h2": pa.array(h2.view(np.int64)[m], pa.int64()),
            }
        )

    cand = ds.map_batches(cand_rows, batch_format="pyarrow").to_pandas()
    grp: dict[tuple[int, int], list] = {}
    for i, p_, a, b in zip(cand["__id"], cand["__pos"], cand["__h1"], cand["__h2"]):
        grp.setdefault((int(a), int(b)), []).append((i, int(p_)))
    winners = {k: min(v) for k, v in grp.items() if len(v) > 1}
    if not winners:
        return ds.map_batches(
            lambda t: _passthrough(t, id_col, text_col), batch_format="pyarrow"
        )
    winners_ref = ray.put(winners)

    def rebuild(t: pa.Table) -> pa.Table:
        wmap = ray.get(winners_ref)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ttype = texts.type
        texts_py = pc.fill_null(texts, "").to_pylist()
        h1, h2, d, cs, ce, pos = _span_windows(texts_py, n)
        h1i = h1.view(np.int64)
        out_texts = list(texts_py)
        out_drop = np.zeros(t.num_rows, dtype=np.int64)
        if len(h1i):
            p = np.searchsorted(_dup, h1i)
            p[p == len(_dup)] = 0
            cm = _dup[p] == h1i
            if cm.any():
                ids_py = t[id_col].to_pylist()
                h2i = h2.view(np.int64)
                spans_of: dict[int, list[int]] = {}
                packed = _pack_spans(cs, ce)
                for x in np.nonzero(cm)[0]:
                    w = wmap.get((int(h1i[x]), int(h2i[x])))
                    row = int(d[x])
                    if w is not None and w != (ids_py[row], int(pos[x])):
                        spans_of.setdefault(row, []).append(int(packed[x]))
                for row, spans in spans_of.items():
                    new, dropped = _merge_cut(
                        texts_py[row], np.asarray(spans, dtype=np.int64)
                    )
                    out_texts[row] = new
                    out_drop[row] = dropped
        t = t.set_column(
            t.schema.get_field_index(text_col), text_col,
            pa.array(out_texts, ttype),
        )
        if "n_dropped_chars" in t.column_names:  # re-application overwrites
            t = t.drop_columns(["n_dropped_chars"])
        return t.append_column("n_dropped_chars", pa.array(out_drop, pa.int64()))

    return ds.map_batches(rebuild, batch_format="pyarrow")
