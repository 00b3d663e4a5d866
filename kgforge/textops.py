"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting).
All vectorized per batch; usable on any (id, text) columns.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .corpus import LANG_WORDS
from .extract_core import stable_u64

# quality-feature token/punct/case definitions use EXPLICIT ASCII
# classes, not str.split()/str.isalnum()/str.lower(): Python's Unicode
# whitespace/alnum sets and special case mappings (İ → i+combining-dot in
# Python vs i in DuckDB) cannot be mirrored exactly in an RE2-based SQL
# oracle, while these constructs mean the same thing in Python re, Arrow
# and DuckDB (RE2 semantics + 1:1 ASCII translate) on ANY input
_QTOK_RE = re.compile(r"[^ \t\n\r\f\v]+")
_QPUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

_EN_STOP = {
    "the", "and", "of", "a", "to", "in", "is", "was", "for", "on", "with",
    "as", "by", "at", "an", "be", "this", "that", "from", "it", "are",
}
# language → marker word set (the de/es/fr/zh pools from the corpus module
# double as detection gazetteers; a real deployment would load char-n-gram
# profiles the same way — in actor __init__).
_LANG_MARKERS = {lang: set(words) for lang, words in LANG_WORDS.items()}


def _replace_column(t: pa.Table, name: str, arr) -> pa.Table:
    """append_column with last-wins semantics: a plan composing two ops
    that emit the same feature name (e.g. token_count then quality, both
    producing n_tokens) must not create a duplicated field — downstream
    t[name] raises on ambiguous schemas."""
    if name in t.column_names:
        t = t.drop_columns([name])
    return t.append_column(name, arr)


def lang_id_text(text: str) -> str:
    """n-gram/marker-word language heuristic: highest marker hit-rate wins;
     'en' on stopword evidence; 'und' if nothing matches (incl. null)."""
    text = text or ""
    toks = text.lower().split()
    if not toks:
        return "und"
    # CJK check first (zh markers are substrings, not space-separated)
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk >= max(2, len(text) // 20):
        return "zh"
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        if lang == "zh":
            continue
        scores[lang] = sum(1 for t in toks if t in markers) / len(toks)
    scores["en"] = sum(1 for t in toks if t in _EN_STOP) / len(toks)
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0.05 else "und"


def add_lang_id(ds, text_col: str = "text", out_col: str = "lang_pred"):
    def f(t: pa.Table) -> pa.Table:
        return _replace_column(
            t, out_col,
            pa.array([lang_id_text(x) for x in t[text_col].to_pylist()], pa.string()),
        )

    return ds.map_batches(f, batch_format="pyarrow")


def quality_batch(t: pa.Table, text_col: str = "text",
                  round_digits: int | None = 4) -> pa.Table:
    """Quality features: n_chars, n_tokens, punct ratio, stopword ratio,
    distinct-token ratio, mean token length + composite [0,1] score.

    ``round_digits=None`` emits raw float64 ratios — used by the
    SQL-verified driver query, where the oracle mirrors the exact IEEE
    op order so values are bit-identical without rounding."""
    texts = t[text_col].to_pylist()
    n_chars, n_tokens, punct_r, stop_r, distinct_r, mean_len, score = [], [], [], [], [], [], []
    for x in texts:
        x = x or ""  # null text scores as empty, not AttributeError
        toks = _QTOK_RE.findall(x.translate(_ASCII_LOWER))
        nt = len(toks)
        nc = len(x)
        np_ = len(_QPUNCT_RE.findall(x))
        sr = (sum(1 for tk in toks if tk in _EN_STOP) / nt) if nt else 0.0
        dr = (len(set(toks)) / nt) if nt else 0.0
        ml = (sum(len(tk) for tk in toks) / nt) if nt else 0.0
        pr = np_ / nc if nc else 0.0
        # composite: long enough, not punct-heavy, some stopwords, diverse
        s = 0.0
        if nt:
            s = (
                min(1.0, nt / 50.0) * 0.3
                + (1.0 - min(1.0, pr * 4)) * 0.2
                + min(1.0, sr * 5) * 0.2
                + dr * 0.2
                + (1.0 if 3.0 <= ml <= 9.0 else 0.5) * 0.1
            )
        rd_ = (lambda x: round(x, round_digits)) if round_digits is not None else (lambda x: x)
        n_chars.append(nc)
        n_tokens.append(nt)
        punct_r.append(rd_(pr))
        stop_r.append(rd_(sr))
        distinct_r.append(rd_(dr))
        mean_len.append(rd_(ml))
        score.append(rd_(s))
    out = t
    for name, arr in (
        ("n_chars_q", pa.array(n_chars, pa.int64())),
        ("n_tokens", pa.array(n_tokens, pa.int64())),
        ("punct_ratio", pa.array(punct_r, pa.float64())),
        ("stopword_ratio", pa.array(stop_r, pa.float64())),
        ("distinct_ratio", pa.array(distinct_r, pa.float64())),
        ("mean_token_len", pa.array(mean_len, pa.float64())),
        ("quality_score", pa.array(score, pa.float64())),
    ):
        out = _replace_column(out, name, arr)
    return out


def add_quality(ds, text_col: str = "text", round_digits: int | None = 4):
    return ds.map_batches(
        lambda t: quality_batch(t, text_col, round_digits), batch_format="pyarrow"
    )


def fingerprint_text(text: str, window: int = 8) -> str:
    """Rolling polynomial hash fingerprint: min-of-window token hashes
    (a winnowing-style document fingerprint), hex-encoded."""
    toks = (text or "").lower().split()
    if not toks:
        return "0" * 16
    hs = [stable_u64(tk, "fp") for tk in toks]
    if len(hs) <= window:
        return f"{min(hs):016x}"
    mins = []
    for i in range(len(hs) - window + 1):
        mins.append(min(hs[i:i + window]))
    acc = 1469598103934665603
    for m in set(mins):
        acc ^= m
        acc = (acc * 1099511628211) % (1 << 64)
    return f"{acc:016x}"


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    def f(t: pa.Table) -> pa.Table:
        return _replace_column(
            t, out_col,
            pa.array([fingerprint_text(x) for x in t[text_col].to_pylist()], pa.string()),
        )

    return ds.map_batches(f, batch_format="pyarrow")


def token_count_ds(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace token count, fully vectorized (Arrow regex kernel).
    Counts RE2 ``\\S+`` runs on the RAW text — no pre-trim: Arrow's
    utf8_trim_whitespace strips UNICODE whitespace (\\v, NBSP) that RE2's
    \\S considers non-space, which would shift counts vs a pure-RE2
    oracle on texts with such chars at the boundaries."""
    return ds.map_batches(
        lambda t: _replace_column(
            t, out_col,
            pc.cast(
                pc.count_substring_regex(t[text_col], pattern=r"\S+"),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    )


# --- tokenize + fixed-length sequence packing (training-data prep) ----------

_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]+")


def pack_sequences(
    ds,
    text_col: str = "text",
    *,
    seq_len: int = 512,
    eos_id: int = 0,
    vocab_size: int = 50000,
    drop_remainder: bool = True,
):
    """Tokenize docs and pack them into fixed-length id sequences (the
    standard LM training-prep step): within each batch, docs are
    tokenized (the BPE-ish regex classes of q_doc_bpe_token_counts),
    hashed to ids in [1, vocab_size) — id 0 is reserved for the EOS
    separator appended after every doc — concatenated, and chunked to
    ``seq_len``.

    Packing is BATCH-LOCAL by design: a global cross-block carry chain
    would serialize the pipeline at scale; per-batch tail remainders are
    dropped (``drop_remainder=True``, the usual LM choice) or emitted as
    a short final sequence (False — token-conserving under ANY
    partitioning, which the tests exploit).  Token→id is deterministic
    everywhere (blake2b over the batch's UNIQUE tokens only — Zipf reuse
    makes that cheap — then a vectorized gather), so the same corpus
    packs to the same ids on any run, block layout or cluster size.
    A real external tokenizer slots in the same way the multimodal
    decoder does: as an actor-pool ``map_batches`` class with the model
    loaded in ``__init__``.

    Output rows: ``seq`` (list<int32>, length seq_len except an optional
    short final per batch), ``n_tokens`` (int64 — non-pad length).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if not 1 < vocab_size:
        raise ValueError("vocab_size must be > 1")
    if 1 <= eos_id < vocab_size:
        # token ids live in [1, vocab_size); a colliding eos_id would be
        # indistinguishable from real tokens and silently corrupt doc
        # boundaries for consumers that split on it
        raise ValueError("eos_id must be 0, negative, or >= vocab_size")

    import pandas as _pd

    def pack(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks_per_doc = [_BPE_ISH.findall(x or "") for x in texts]
        flat = [tok for toks in toks_per_doc for tok in toks]
        n_docs = len(texts)
        if flat:
            codes, uniques = _pd.factorize(np.asarray(flat, dtype=object))
            ids_u = np.array(
                [1 + stable_u64(u, "tokpack") % (vocab_size - 1) for u in uniques],
                dtype=np.int32,
            )
            flat_ids = ids_u[codes]
        else:
            flat_ids = np.array([], dtype=np.int32)
        # interleave EOS after each doc: positions after cumulative doc lengths
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        stream = np.full(int(lens.sum()) + n_docs, eos_id, dtype=np.int32)
        # token positions: shift each doc's slice right by its doc index
        tok_pos = np.arange(len(flat_ids), dtype=np.int64) + np.repeat(
            np.arange(n_docs, dtype=np.int64), lens
        )
        stream[tok_pos] = flat_ids
        n_full = len(stream) // seq_len
        seqs = [stream[i * seq_len : (i + 1) * seq_len] for i in range(n_full)]
        rem = stream[n_full * seq_len :]
        if len(rem) and not drop_remainder:
            seqs.append(rem)
        if not seqs:
            return pa.table(
                {"seq": pa.array([], pa.list_(pa.int32())),
                 "n_tokens": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "seq": pa.array([s.tolist() for s in seqs], pa.list_(pa.int32())),
                "n_tokens": pa.array([len(s) for s in seqs], pa.int64()),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")


def chunk_documents(
    ds,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap_tokens: int = 0,
    min_chunk_tokens: int = 1,
    out_text_col: str | None = None,
):
    """Split docs into fixed-token-count windows (context-window prep
    for training / retrieval): each output row is one chunk with its
    source id, ``chunk_idx`` (0-based, in document order), the chunk's
    TEXT (the original substring spanning its tokens — whitespace
    between in-chunk tokens is preserved verbatim) and ``n_tokens``.

    Windows step by ``chunk_tokens - overlap_tokens``; a trailing
    window shorter than ``min_chunk_tokens`` is dropped UNLESS it is
    the doc's only window (short docs pass through whole).  Tokens are
    the whitespace tokens of ``token_count_ds`` so chunk token counts
    reconcile with the corpus token accounting.  Batch-local flat-map —
    no shuffle, no cross-doc state; rows with null/empty text emit no
    chunks."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must be in [0, chunk_tokens)")
    if not 1 <= min_chunk_tokens <= chunk_tokens:
        # > chunk_tokens would silently truncate every multi-chunk doc
        # to its first window (all later windows fail the min check)
        raise ValueError("min_chunk_tokens must be in [1, chunk_tokens]")
    step = chunk_tokens - overlap_tokens
    out_text = out_text_col or text_col

    def chunk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        o_ids, o_idx, o_text, o_ntok = [], [], [], []
        for did, x in zip(ids, texts):
            if not x:
                continue
            spans = [m.span() for m in _QTOK_RE.finditer(x)]
            n = len(spans)
            if n == 0:
                continue
            ci = 0
            for start in range(0, n, step):
                end = min(start + chunk_tokens, n)
                if (
                    end - start < min_chunk_tokens
                    and ci > 0
                ):
                    break
                o_ids.append(did)
                o_idx.append(ci)
                o_text.append(x[spans[start][0] : spans[end - 1][1]])
                o_ntok.append(end - start)
                ci += 1
                if end == n:
                    break
        id_arr = pa.array(o_ids, t[id_col].type)
        return pa.table({
            id_col: id_arr,
            "chunk_idx": pa.array(o_idx, pa.int64()),
            out_text: pa.array(o_text, pa.string()),
            "n_tokens": pa.array(o_ntok, pa.int64()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")
