"""Benchmark decontamination: n-gram overlap removal against eval sets.

The standard LM-training-data hygiene step (public knowledge: the GPT-3
appendix "13-gram" recipe and its Gopher/Llama descendants): normalize
text, slide an n-token window over every training document, and drop or
flag documents that share any n-gram with an evaluation benchmark.

Ray-Data-first shape — no shuffle at any scale:

* the BENCHMARK side is small by definition (eval sets are thousands of
  rows, not terabytes): its n-gram hash set is built once on the driver
  and broadcast via ``ray.put`` as one sorted ``uint64`` array;
* the CORPUS side streams through a single ``map_batches`` that computes
  rolling token-window hashes fully vectorized (flat per-token hash
  array → ``n`` shifted splitmix mixes → doc-boundary windows masked)
  and probes membership with a ``searchsorted`` binary search against
  the zero-copy broadcast array.  Cost is O(tokens) per batch plus one
  object-store read per task; at 100 TB the corpus never moves.

Normalization is deterministic and locale-free (ASCII lowercase +
``[a-z0-9]+`` tokens — punctuation and case differences between a
benchmark copy and a crawled copy must not hide an overlap), matching
what DuckDB/RE2 can mirror for oracle tests.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np
import pyarrow as pa
import ray

from .relops import ngram_window_hashes, token_hash_stream
from .textops import _ASCII_LOWER

# canonical decontamination window from the GPT-3 appendix; callers
# lower it for short-answer benchmarks (MMLU-style) where 13 never fires
DEFAULT_NGRAM = 13

_WORD_RE = re.compile(r"[a-z0-9]+")


def _tokenize(text: str | None) -> list[str]:
    """ASCII-lower + alnum tokens: case/punctuation-insensitive so a
    crawled copy with different quoting still collides with the
    benchmark original."""
    return _WORD_RE.findall((text or "").translate(_ASCII_LOWER))


def _window_hashes(texts: list[str | None], n: int):
    """Vectorized rolling n-token-window hashes for a batch of docs.

    Returns ``(hashes, doc_idx)`` — one u64 per window position that
    lies entirely inside a single doc, and the doc index each window
    belongs to.  Token→u64 is blake2b over the batch's UNIQUE tokens
    (Zipf reuse makes that cheap) then a vectorized gather; the window
    combine is ``acc = splitmix64(acc ^ tok)`` applied ``n`` times over
    shifted views — order-sensitive, so "a b" and "b a" differ.
    """
    th, doc_idx, _lens = token_hash_stream(
        [_tokenize(x) for x in texts], "decontam"
    )
    if len(th) < n:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    acc, valid = ngram_window_hashes(th, doc_idx, n)
    L = len(acc)
    return acc[valid], doc_idx[:L][valid]


def benchmark_ngram_hashes(
    benchmark: "Iterable[str] | ray.data.Dataset",
    *,
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
) -> np.ndarray:
    """Sorted unique u64 n-gram hashes of an eval benchmark.

    Accepts a list of strings or a (small) Ray Dataset — the benchmark
    side is driver-sized BY CONTRACT (eval sets, not corpora); a Dataset
    is gathered with ``take_all``.  Benchmark entries shorter than ``n``
    tokens contribute nothing (the standard recipe's behavior — pick a
    smaller ``n`` for short-answer benchmarks).
    """
    if hasattr(benchmark, "take_all"):  # ray.data.Dataset
        texts = [r[text_col] for r in benchmark.take_all()]
    else:
        texts = list(benchmark)
    hashes, _ = _window_hashes(texts, n)
    return np.unique(hashes)  # sorted unique


def contamination_counts(
    ds: "ray.data.Dataset",
    benchmark: "Iterable[str] | ray.data.Dataset | np.ndarray",
    *,
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    out_col: str = "contaminated_ngrams",
) -> "ray.data.Dataset":
    """Annotate every doc with its count of benchmark-overlapping
    n-gram window occurrences (0 = clean).  Pass a precomputed
    ``benchmark_ngram_hashes`` array to amortize the build across calls
    (e.g. one benchmark suite, many corpus shards)."""
    if isinstance(benchmark, np.ndarray):
        bench = benchmark
    else:
        bench = benchmark_ngram_hashes(benchmark, text_col=text_col, n=n)
    bench_ref = ray.put(bench)

    def count(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        counts = np.zeros(len(texts), dtype=np.int64)
        b = ray.get(bench_ref)  # zero-copy object-store read
        if len(b):
            hashes, doc_idx = _window_hashes(texts, n)
            if len(hashes):
                pos = np.searchsorted(b, hashes)
                pos_c = np.minimum(pos, len(b) - 1)
                hit = b[pos_c] == hashes
                counts = np.bincount(
                    doc_idx[hit], minlength=len(texts)
                ).astype(np.int64)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, pa.array(counts, pa.int64()))

    return ds.map_batches(count, batch_format="pyarrow")


def decontaminate(
    ds: "ray.data.Dataset",
    benchmark: "Iterable[str] | ray.data.Dataset | np.ndarray",
    *,
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    max_overlap: int = 0,
    annotate: bool = False,
) -> "ray.data.Dataset":
    """Drop docs sharing more than ``max_overlap`` n-gram window
    occurrences with the benchmark (default: any overlap drops).  With
    ``annotate=True`` the count column is kept on the survivors for
    auditing; otherwise the output schema equals the input schema."""
    out_col = "contaminated_ngrams"
    out = contamination_counts(
        ds, benchmark, text_col=text_col, n=n, out_col=out_col
    )
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t[out_col], pa.scalar(max_overlap)))
        return t if annotate else t.drop_columns([out_col])

    return out.map_batches(keep, batch_format="pyarrow")
