"""Hashed n-gram language model with stupid-backoff scoring — the
CCNet-style perplexity filter's engine (public recipe: score every
candidate doc against an LM trained on a trusted reference corpus;
keep the low-perplexity tail).  The learned classifier
(``qualityclf``) asks "does this look like the seed?"; the LM asks
"is this fluent?" — the standard pipeline uses both.

Ray-Data-first shape:

* TRAINING is one streaming pass + one thin shuffle: every batch
  tokenizes, computes rolling window hashes for orders 1..n (the
  shared ``relops.ngram_window_hashes`` kernel), pre-aggregates its
  own gram counts (``np.unique``), and emits (u64 key, count) rows —
  ~unique-grams-per-batch, never per-token.  A single
  ``groupby(key).sum`` merges them; ``min_count`` pruning happens
  IN-CLUSTER before the driver gathers the surviving table (guarded by
  ``max_entries`` — the model must broadcast).
* SCORING is one vectorized ``map_batches``: the model's sorted key /
  count arrays ship through the object store once (``ray.put``), each
  batch probes them with ``searchsorted``, and stupid backoff resolves
  per token position with pure array arithmetic — no shuffle at any
  corpus size.

Stupid backoff (Brants et al. 2007) is deliberately unnormalized —
S(w|ctx) is a score, not a probability — so the per-doc figure is a
PSEUDO-perplexity: exp(-mean log S).  It ranks docs the same way a
Kneser-Ney perplexity does at a fraction of the model size, which is
all the filtering use case needs; thresholds are corpus-relative (pick
them from a scored sample's quantiles, not from KenLM tables).

Tokenization is ``decontam``'s locale-free ASCII fold (a shared
contract: the LM must see the text the same way decontamination does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .decontam import _tokenize
from .relops import _splitmix64, ngram_window_hashes, token_hash_stream

#: canonical stupid-backoff discount per backed-off order
DEFAULT_ALPHA = 0.4
#: in-cluster prune: grams seen fewer times than this never reach the
#: driver (also what keeps the model broadcast-sized on big corpora)
DEFAULT_MIN_COUNT = 2
#: refuse to gather a model bigger than this many surviving grams
DEFAULT_MAX_ENTRIES = 1 << 22

_TOTAL_KEY = np.uint64(0)  # reserved key carrying the corpus token count


class NgramLM:
    """A trained model: one sorted u64 key array (order mixed into the
    hash) + counts, the corpus token total, and the scoring knobs."""

    def __init__(self, keys: np.ndarray, counts: np.ndarray, total: int,
                 n: int, alpha: float = DEFAULT_ALPHA, salt: str = "ngramlm"):
        self.keys = keys
        self.counts = counts
        self.total = int(total)
        self.n = int(n)
        self.alpha = float(alpha)
        self.salt = salt

    def lookup(self, mixed: np.ndarray) -> np.ndarray:
        """Counts for mixed keys (0 for unseen), vectorized.  An empty
        model (everything pruned) answers 0 everywhere — every token
        then scores at the unigram pseudo-count backstop."""
        if not len(mixed) or not len(self.keys):
            return np.zeros(len(mixed), dtype=np.int64)
        pos = np.searchsorted(self.keys, mixed)
        pos_c = np.minimum(pos, len(self.keys) - 1)
        hit = self.keys[pos_c] == mixed
        out = np.zeros(len(mixed), dtype=np.int64)
        out[hit] = self.counts[pos_c[hit]]
        return out


def _mix_order(acc: np.ndarray, order: int) -> np.ndarray:
    """Fold the gram order into the window hash so ALL orders share one
    sorted key space; key 0 is reserved for the total-token row."""
    mixed = _splitmix64(acc ^ np.uint64(0x9E37 + order))
    return np.where(mixed == _TOTAL_KEY, np.uint64(1), mixed)


def _token_stream(texts, salt: str):
    """Batch-flat (token-hash stream, doc index, per-doc lengths) —
    the shared ``relops.token_hash_stream`` prelude over the
    decontamination tokenizer."""
    return token_hash_stream([_tokenize(x) for x in texts], salt)


def train_ngram_lm(
    ds,
    text_col: str = "text",
    n: int = 3,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    max_entries: int = DEFAULT_MAX_ENTRIES,
    alpha: float = DEFAULT_ALPHA,
    salt: str = "ngramlm",
) -> NgramLM:
    """Train on a reference corpus Dataset.  One corpus pass, one thin
    (key, count) shuffle, in-cluster pruning, driver gather of the
    surviving (≤ ``max_entries``) model table."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def count_batch(t: pa.Table) -> pa.Table:
        th, doc_idx, _lens = _token_stream(t[text_col].to_pylist(), salt)
        parts = [np.array([_TOTAL_KEY], dtype=np.uint64)]
        cnts = [np.array([len(th)], dtype=np.int64)]
        for k in range(1, n + 1):
            acc, valid = ngram_window_hashes(th, doc_idx, k)
            keys, c = np.unique(_mix_order(acc[valid], k), return_counts=True)
            parts.append(keys)
            cnts.append(c.astype(np.int64))
        # int64 BIT VIEW of the u64 keys: Ray 2.49's sort/groupby turns
        # uint64 columns into pickled extension objects (no kernel for
        # the later filter); the bits round-trip losslessly
        return pa.table({
            "gh": pa.array(np.concatenate(parts).view(np.int64), pa.int64()),
            "cnt": pa.array(np.concatenate(cnts), pa.int64()),
        })

    from ray.data.aggregate import Sum

    summed = (
        ds.select_columns([text_col])
        .map_batches(count_batch, batch_format="pyarrow")
        .groupby("gh")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    pruned = summed.map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.greater_equal(t["cnt"], min_count),
                pc.equal(t["gh"], pa.scalar(0, pa.int64())),
            )
        ),
        batch_format="pyarrow",
    ).materialize()
    n_rows = pruned.count()
    if n_rows > max_entries + 1:
        raise ValueError(
            f"model has {n_rows - 1} grams > max_entries={max_entries}: raise "
            "min_count (prunes in-cluster) or max_entries deliberately"
        )
    tbl = pruned.to_pandas()
    keys = tbl["gh"].to_numpy().astype(np.int64).view(np.uint64)
    counts = tbl["cnt"].to_numpy().astype(np.int64)
    order = np.argsort(keys)
    keys, counts = keys[order], counts[order]
    is_total = keys == _TOTAL_KEY
    total = int(counts[is_total][0]) if is_total.any() else 0
    return NgramLM(keys[~is_total], counts[~is_total], total, n, alpha, salt)


def _score_stream(th, doc_idx, lens, lm: NgramLM) -> np.ndarray:
    """Per-doc pseudo-perplexity over a batch-flat token stream.

    Backoff at token position i starts at the highest order m_i that
    fits inside the doc (min(n, tokens-into-doc+1)) and discounts
    ``alpha`` per backed-off order — doc-leading tokens are scored by
    the largest available context, not penalized for the missing one."""
    T = len(th)
    ppl = np.full(len(lens), np.nan)
    if T == 0:
        return ppl
    # counts per order at each WINDOW START position (len T-k+1, 0 where
    # the window crosses a doc boundary or is unseen)
    cnt_at = {}
    for k in range(1, lm.n + 1):
        acc, valid = ngram_window_hashes(th, doc_idx, k)
        c = lm.lookup(_mix_order(acc, k))
        c[~valid] = 0
        cnt_at[k] = c
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos_in_doc = np.arange(T, dtype=np.int64) - np.repeat(doc_starts, lens)
    m = np.minimum(lm.n, pos_in_doc + 1)          # max usable order per token
    score = np.zeros(T)
    resolved = np.zeros(T, dtype=bool)
    for k in range(lm.n, 1, -1):
        i = np.arange(k - 1, T)                   # positions with a k-window
        s = i - k + 1                             # its start
        num = cnt_at[k][s]
        den = cnt_at[k - 1][s]
        ok = ~resolved[i] & (num > 0) & (den > 0) & (m[i] >= k)
        sel = i[ok]
        score[sel] = (lm.alpha ** (m[sel] - k)) * num[ok] / den[ok]
        resolved[sel] = True
    # unigram base: count/total, unseen tokens get a 0.5 pseudo-count
    uni = cnt_at[1][:T].astype(np.float64)
    uni[uni == 0] = 0.5
    base = (lm.alpha ** np.maximum(m - 1, 0)) * uni / max(lm.total, 1)
    score[~resolved] = base[~resolved]
    logs = np.log(score)
    sums = np.bincount(doc_idx, weights=logs, minlength=len(lens))
    with np.errstate(divide="ignore", invalid="ignore"):
        ppl = np.exp(-sums / lens)
    ppl[lens == 0] = np.nan
    return ppl


def score_perplexity(
    ds,
    lm: NgramLM,
    text_col: str = "text",
    out_col: str = "lm_ppl",
):
    """Append ``out_col`` = stupid-backoff pseudo-perplexity per doc
    (lower = more reference-like; NaN for empty docs).  The model's
    arrays ship via ``ray.put`` once; each batch reads them zero-copy
    from the object store."""
    import ray

    ref = ray.put((lm.keys, lm.counts, lm.total, lm.n, lm.alpha, lm.salt))

    from .textops import _replace_column

    def f(t: pa.Table) -> pa.Table:
        keys, counts, total, n, alpha, salt = ray.get(ref)
        m = NgramLM(keys, counts, total, n, alpha, salt)
        th, doc_idx, lens = _token_stream(t[text_col].to_pylist(), salt)
        ppl = _score_stream(th, doc_idx, lens, m)
        return _replace_column(t, out_col, pa.array(ppl, pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow")


def perplexity_filter(
    ds,
    lm: NgramLM,
    max_ppl: float,
    text_col: str = "text",
    *,
    keep_score: bool = False,
):
    """Keep docs whose pseudo-perplexity is ≤ ``max_ppl``.  Empty docs
    (NaN) drop — no evidence of fluency.  Pick ``max_ppl`` from a
    scored sample's quantile (the CCNet head/middle/tail split), not
    from absolute KenLM tables — stupid-backoff scores are
    corpus-relative."""
    import pyarrow.compute as pc

    scored = score_perplexity(ds, lm, text_col)
    filtered = scored.map_batches(
        lambda t: t.filter(pc.less_equal(t["lm_ppl"], max_ppl)),
        batch_format="pyarrow",
    )
    if keep_score:
        return filtered
    return filtered.map_batches(
        lambda t: t.drop_columns(["lm_ppl"]), batch_format="pyarrow"
    )


def perplexity_buckets(
    ds,
    lm: NgramLM,
    text_col: str = "text",
    *,
    quantiles: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    sample_fraction: float = 0.05,
    id_col: str | None = None,
    seed: int = 7,
    out_col: str = "ppl_bucket",
):
    """CCNet's head/middle/tail split: tag every doc with the
    perplexity bucket its score falls into, with the bucket EDGES
    estimated from a deterministically hash-sampled subset (scored
    driver-side quantiles — stupid-backoff scores are corpus-relative,
    so the thresholds must come from the corpus itself, exactly the
    CCNet recipe).  Lower perplexity → earlier label ("head" is the
    most reference-like tercile).

    Two passes: the SAMPLE pass scores ~``sample_fraction`` of docs
    (deterministic splitmix64/blake2b id-hash predicate when ``id_col``
    is given, reproducible on any layout; hash of the text otherwise)
    and the full pass scores + tags everything.  Appends ``lm_ppl``
    and ``out_col``; empty docs land in the LAST bucket (no fluency
    evidence)."""
    if len(labels) != len(quantiles) + 1:
        raise ValueError("need exactly len(quantiles)+1 labels")
    if list(quantiles) != sorted(quantiles) or not all(
        0.0 <= q <= 1.0 for q in quantiles
    ):
        raise ValueError("quantiles must be ascending and within [0, 1] — "
                         "searchsorted over unsorted edges mislabels silently")
    from .relops import stratified_sample

    # two consumers (sample pass + full tagging pass): pin the input so
    # a lazy upstream doesn't re-execute per consumer
    ds = ds.materialize()
    key = id_col or text_col
    sample = stratified_sample(ds, key, sample_fraction, seed=seed)
    sc = score_perplexity(sample, lm, text_col).select_columns(["lm_ppl"])
    # the sample's scores gather to the driver for the quantiles —
    # guard it: 5% of a 10^9-doc corpus is NOT driver-sized
    max_sample_rows = 1_000_000
    try:
        rows = sc.take_all(limit=max_sample_rows)
    except ValueError as e:
        raise ValueError(
            f"perplexity_buckets: the quantile sample exceeds "
            f"{max_sample_rows} rows — lower sample_fraction "
            f"(= {sample_fraction}) so the driver-side edge estimate "
            "stays sample-sized"
        ) from e
    vals = np.array([r["lm_ppl"] for r in rows], dtype=np.float64)
    vals = vals[np.isfinite(vals)]
    if not len(vals):
        raise ValueError(
            "perplexity_buckets: the sample scored no non-empty docs — "
            "raise sample_fraction or check the corpus"
        )
    edges = np.quantile(vals, np.asarray(quantiles, dtype=np.float64))
    lab_arr = np.asarray(labels)

    scored = score_perplexity(ds, lm, text_col)

    from .textops import _replace_column

    def tag(t: pa.Table) -> pa.Table:
        p = t["lm_ppl"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, np.nan_to_num(p, nan=np.inf), side="right")
        return _replace_column(t, out_col, pa.array(lab_arr[idx], pa.string()))

    return scored.map_batches(tag, batch_format="pyarrow")


def save_lm(lm: NgramLM, path: str) -> None:
    # write through a file handle: np.savez(path) silently appends
    # '.npz' to extension-less paths, breaking save→load with the same
    # string (and any CLI later pointed at the path the caller chose)
    with open(path, "wb") as f:
        np.savez(
            f, keys=lm.keys, counts=lm.counts,
            total=np.int64(lm.total), n=np.int64(lm.n),
            alpha=np.float64(lm.alpha), salt=np.str_(lm.salt),
        )


def load_lm(path: str) -> NgramLM:
    z = np.load(path, allow_pickle=False)
    return NgramLM(
        z["keys"].astype(np.uint64), z["counts"].astype(np.int64),
        int(z["total"]), int(z["n"]), float(z["alpha"]), str(z["salt"]),
    )
