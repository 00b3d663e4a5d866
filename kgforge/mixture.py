"""Training-mixture construction: token-budget sampling and weighted
corpus mixing (the Pile/Dolma-style recipe step — "x% web, y% code,
z% books, N tokens total").

Scale shape: everything is TWO streaming passes and zero shuffles.
Pass 1 is a distributed token-count aggregate (per-batch vectorized
counts → one Sum); pass 2 keeps rows whose deterministic id-hash falls
under the sampling rate — the same splitmix64/blake2b predicate the
repo's stratified sampler uses, so the selection is a pure function of
(id, seed): reproducible on any run, block layout or cluster size, and
a re-run with a bigger budget yields a SUPERSET (hash thresholds nest).
The token target is met in expectation (docs are atomic — the sampler
never splits one); for web-corpus doc-length distributions the relative
error at budget B is ~sqrt(E[len^2]/E[len] / B), vanishing for any
realistic budget.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from .relops import sample_hash_u64
from .textops import _QTOK_RE


def _token_counts(t: pa.Table, text_col: str) -> np.ndarray:
    texts = t[text_col].to_pylist()
    return np.array(
        [len(_QTOK_RE.findall(x or "")) for x in texts], dtype=np.int64
    )


def count_tokens(ds, text_col: str = "text") -> int:
    """Total whitespace-token count — per-batch vectorized partials
    into one Sum aggregate (the only cluster-wide op here)."""

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {"__n_tok": pa.array(_token_counts(t, text_col), pa.int64())}
        )

    row = ds.map_batches(f, batch_format="pyarrow").aggregate(
        Sum("__n_tok", alias_name="s")
    )
    return int(row["s"] or 0)


def sample_token_budget(
    ds,
    token_budget: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    total_tokens: int | None = None,
):
    """Deterministic ~``token_budget``-token subsample: keep docs whose
    id-hash falls under ``budget/total`` of the hash space.  Returns
    ``(sampled_ds, rate)``; ``rate == 1.0`` means the corpus is already
    within budget (kept whole).  Pass a precomputed ``total_tokens`` to
    skip pass 1 (e.g. from a previous ``count_tokens`` or a manifest)."""
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    if token_budget == 0:
        # a zero allocation selects nothing (mix_corpora floors tiny
        # weight fractions to 0 — that recipe edge must report rate 0,
        # not crash)
        return ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        ), 0.0
    total = count_tokens(ds, text_col) if total_tokens is None else total_tokens
    if total <= token_budget:
        return ds, 1.0
    rate = token_budget / total
    threshold = np.uint64(int(rate * float(2**64)))

    def keep(t: pa.Table) -> pa.Table:
        h = sample_hash_u64(t[id_col], seed=seed)
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow"), rate


def mix_corpora(
    parts: "dict[str, tuple]",
    total_tokens: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    source_col: str = "source_corpus",
):
    """Weighted mixture: ``parts`` maps corpus name → ``(ds, weight)``;
    each corpus is token-budget-sampled to ``total_tokens * w_i / Σw``
    and the samples union with a ``source_col`` tag.  Returns
    ``(mixed_ds, report)`` where the report gives each corpus's token
    total, allocated budget and achieved rate — when a corpus is
    SMALLER than its allocation it is kept whole (rate 1.0) and the
    report shows the shortfall rather than silently re-weighting (the
    operator's job is the recipe, the recipe's feasibility is the
    caller's).  Weights must be positive."""
    if not parts:
        raise ValueError("parts must not be empty")
    weights = {k: float(w) for k, (_, w) in parts.items()}
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    wsum = sum(weights.values())
    report: dict[str, dict] = {}
    sampled = []
    for name, (ds, _w) in parts.items():
        budget = int(total_tokens * weights[name] / wsum)
        total = count_tokens(ds, text_col)
        sub, rate = sample_token_budget(
            ds, budget, text_col=text_col, id_col=id_col,
            seed=seed, total_tokens=total,
        )
        tag = name

        def add_src(t: pa.Table, tag=tag) -> pa.Table:
            if source_col in t.column_names:
                t = t.drop_columns([source_col])
            return t.append_column(
                source_col, pa.array([tag] * t.num_rows, pa.string())
            )

        sampled.append(sub.map_batches(add_src, batch_format="pyarrow"))
        report[name] = {
            "corpus_tokens": total,
            "budget_tokens": budget,
            "rate": round(rate, 6),
            "shortfall_tokens": max(0, budget - total),
        }
    out = sampled[0]
    for s in sampled[1:]:
        out = out.union(s)
    return out, report
