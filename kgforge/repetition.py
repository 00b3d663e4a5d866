"""Within-document repetition metrics and the Gopher repetition filter.

Public-knowledge design: the "repetitious text" quality rules from the
Gopher paper's Table A1 (duplicate line / paragraph fractions, top
n-gram character fraction for n=2..4, duplicated n-gram character
fraction for n=5..10), as popularized by public reimplementations.
These are per-document metrics — embarrassingly parallel, no shuffle —
so the stage is a single ``map_batches`` whose kernel is vectorized
FLAT across the batch: one token stream with doc offsets, one lexsort
per n to find repeated windows, ``np.maximum.reduceat`` /
``np.bincount`` segment reductions for per-doc maxima and coverage.
Only line/paragraph splitting touches per-doc Python (a ``Counter``
over a handful of lines — the same per-doc-unit-of-work shape as the
regex tokenizers elsewhere in this repo).

Metric contracts (documented because public variants differ):

* ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines (resp.
  ``\\n\\n``-separated paragraphs) that are repeat occurrences (beyond
  the first) of an identical line/paragraph.
* ``dup_line_char_frac`` / ``dup_para_char_frac`` — characters of those
  repeat occurrences over total characters.
* ``top_{n}gram_char_frac`` (n=2,3,4) — characters covered by the most
  frequent token n-gram (count × span length / total chars); 0 when no
  n-gram repeats (a single occurrence is not "repetition").
* ``dup_{n}gram_char_frac`` (n=5..10) — characters covered by the UNION
  of all repeat occurrences (beyond each n-gram's first) of repeated
  n-grams, overlaps counted once.

Tokens are maximal non-whitespace runs; character spans include the
whitespace interior to a window (span = first token start → last token
end), matching the intuitive "how much of the text is this phrase".
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from .relops import _splitmix64

_TOK_RE = re.compile(r"\S+")
_PARA_SPLIT = re.compile(r"\n\n+")

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

# Gopher Table A1 thresholds (max allowed fraction per metric)
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _unit_dup_fracs(units_per_doc: list[list[str]], n_chars: np.ndarray):
    """(dup_frac, dup_char_frac) for line/paragraph units: occurrences
    beyond the first of an identical unit are duplicates."""
    n = len(units_per_doc)
    dup_frac = np.zeros(n)
    dup_char = np.zeros(n)
    for i, units in enumerate(units_per_doc):
        if not units:
            continue
        c = Counter(units)
        dups = sum(k - 1 for k in c.values() if k > 1)
        dchars = sum((k - 1) * len(u) for u, k in c.items() if k > 1)
        dup_frac[i] = dups / len(units)
        dup_char[i] = dchars / n_chars[i] if n_chars[i] else 0.0
    return dup_frac, dup_char


def _flat_tokens(texts: list[str | None]):
    """One flat token stream for the batch: per-token u64 hash, char
    start/end, owning doc index, plus per-doc token counts."""
    import pandas as _pd

    toks, starts, ends, lens = [], [], [], []
    for x in texts:
        ms = list(_TOK_RE.finditer(x or ""))
        lens.append(len(ms))
        for m in ms:
            toks.append(m.group())
            starts.append(m.start())
            ends.append(m.end())
    lens = np.asarray(lens, dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    if not toks:
        e = np.array([], dtype=np.int64)
        return np.array([], dtype=np.uint64), e, e, doc_idx, lens
    # factorize codes mixed through splitmix64: collision-free within
    # the batch (codes are distinct per unique token), and cross-process
    # hash stability is not load-bearing — repetition is WITHIN doc
    codes, _ = _pd.factorize(np.asarray(toks, dtype=object))
    th = _splitmix64(codes.astype(np.uint64) + np.uint64(0x9E37))
    return (
        th,
        np.asarray(starts, dtype=np.int64),
        np.asarray(ends, dtype=np.int64),
        doc_idx,
        lens,
    )


def _window_arrays(th, starts, ends, doc_idx, n):
    """Valid n-token windows: (hash, doc, char_start, char_end) — the
    shared ``relops.ngram_window_hashes`` kernel plus char spans."""
    from .relops import ngram_window_hashes

    acc, valid = ngram_window_hashes(th, doc_idx, n)
    if not len(acc):
        e = np.array([], dtype=np.int64)
        return acc, e, e, e
    L = len(acc)
    return (
        acc[valid],
        doc_idx[:L][valid],
        starts[:L][valid],
        ends[n - 1 :][valid],
    )


def _run_bounds(doc, h):
    """Lexsorted (doc, hash) run structure over window arrays."""
    order = np.lexsort((h, doc))
    d, hh = doc[order], h[order]
    new_run = np.r_[True, (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])]
    return order, new_run


def _top_ngram_cover(h, doc, ws, we, n_docs):
    """Per-doc max over repeated n-grams of count × first-span length."""
    cover = np.zeros(n_docs, dtype=np.int64)
    if not len(h):
        return cover
    order = np.lexsort((ws, h, doc))  # runs sorted by start within run
    d, hh, s, e = doc[order], h[order], ws[order], we[order]
    new_run = np.r_[True, (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])]
    run_start = np.flatnonzero(new_run)
    counts = np.diff(np.r_[run_start, len(d)])
    rep = counts >= 2
    if not rep.any():
        return cover
    span = (e[run_start] - s[run_start])[rep]
    prod = counts[rep] * span
    rd = d[run_start][rep]
    np.maximum.at(cover, rd, prod)
    return cover


def _dup_ngram_cover(h, doc, ws, we, n_docs):
    """Per-doc chars covered by the union of repeat occurrences (beyond
    each n-gram's first) of repeated n-grams."""
    cover = np.zeros(n_docs, dtype=np.int64)
    if not len(h):
        return cover
    order = np.lexsort((ws, h, doc))
    d, hh, s, e = doc[order], h[order], ws[order], we[order]
    new_run = np.r_[True, (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])]
    run_start = np.flatnonzero(new_run)
    counts = np.diff(np.r_[run_start, len(d)])
    # repeat occurrences: every row that is not its run's first, in runs
    # with count >= 2 (equivalently: not new_run)
    sel = ~new_run
    if not sel.any():
        return cover
    ds_, ss_, es_ = d[sel], s[sel], e[sel]
    # union of [ss, es) intervals per doc, fully vectorized: sort by
    # (doc, start); running max of end with per-doc reset via the
    # offset trick (doc * OFF dominates any char offset)
    o2 = np.lexsort((ss_, ds_))
    ds_, ss_, es_ = ds_[o2], ss_[o2], es_[o2]
    OFF = np.int64(1) << 40
    cm = np.maximum.accumulate(es_ + ds_ * OFF)
    prev_end = np.empty_like(es_)
    prev_end[0] = -1
    prev = cm[:-1] - ds_[1:] * OFF  # previous max end, in doc-local chars
    first_of_doc = np.r_[True, ds_[1:] != ds_[:-1]]
    prev_end[1:] = np.where(first_of_doc[1:], -1, prev)
    contrib = np.maximum(0, es_ - np.maximum(ss_, prev_end))
    np.add.at(cover, ds_, contrib)
    return cover


def repetition_batch(
    t: pa.Table,
    text_col: str = "text",
    top_ns=TOP_NS,
    dup_ns=DUP_NS,
) -> pa.Table:
    """Append all repetition metric columns to a batch (pure function —
    reusable outside Ray and by the oracle tests)."""
    texts = t[text_col].to_pylist()
    n_docs = len(texts)
    n_chars = np.array([len(x or "") for x in texts], dtype=np.int64)
    safe_chars = np.maximum(n_chars, 1).astype(np.float64)

    lines = [[ln for ln in (x or "").split("\n") if ln.strip()] for x in texts]
    paras = [
        [p for p in _PARA_SPLIT.split(x or "") if p.strip()] for x in texts
    ]
    dlf, dlc = _unit_dup_fracs(lines, n_chars)
    dpf, dpc = _unit_dup_fracs(paras, n_chars)

    th, ws, we, doc_idx, _ = _flat_tokens(texts)
    cols = {
        "dup_line_frac": dlf,
        "dup_line_char_frac": dlc,
        "dup_para_frac": dpf,
        "dup_para_char_frac": dpc,
    }
    for n in top_ns:
        h, d, s, e = _window_arrays(th, ws, we, doc_idx, n)
        cols[f"top_{n}gram_char_frac"] = (
            _top_ngram_cover(h, d, s, e, n_docs) / safe_chars
        )
    for n in dup_ns:
        h, d, s, e = _window_arrays(th, ws, we, doc_idx, n)
        cols[f"dup_{n}gram_char_frac"] = (
            _dup_ngram_cover(h, d, s, e, n_docs) / safe_chars
        )
    for name, arr in cols.items():
        if name in t.column_names:
            t = t.drop_columns([name])
        t = t.append_column(name, pa.array(arr, pa.float64()))
    return t


def repetition_scores(ds, text_col: str = "text", top_ns=TOP_NS, dup_ns=DUP_NS):
    """Annotate every doc with the Gopher repetition metrics."""
    return ds.map_batches(
        lambda t: repetition_batch(t, text_col, top_ns, dup_ns),
        batch_format="pyarrow",
    )


def gopher_repetition_filter(
    ds,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    annotate: bool = False,
):
    """Drop docs exceeding any repetition threshold (defaults: Gopher
    Table A1).  ``annotate=True`` keeps the metric columns on survivors."""
    import pyarrow.compute as pc

    th = dict(GOPHER_THRESHOLDS if thresholds is None else thresholds)
    unknown = set(th) - set(GOPHER_THRESHOLDS)
    if unknown:
        raise ValueError(f"unknown repetition metrics: {sorted(unknown)}")
    top_ns = tuple(
        n for n in TOP_NS if f"top_{n}gram_char_frac" in th
    )
    dup_ns = tuple(n for n in DUP_NS if f"dup_{n}gram_char_frac" in th)
    scored = repetition_scores(ds, text_col, top_ns=top_ns, dup_ns=dup_ns)
    # drop EVERY computed metric column, not just the thresholded ones —
    # the line/para metrics are always computed, and a subset-thresholds
    # call must still restore the input schema when annotate=False
    metric_cols = [
        "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
    ] + [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]

    def keep(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        for m, lim in th.items():
            mask = pc.and_(mask, pc.less_equal(t[m], pa.scalar(float(lim))))
        t = t.filter(mask)
        return t if annotate else t.drop_columns(metric_cols)

    return scored.map_batches(keep, batch_format="pyarrow")
