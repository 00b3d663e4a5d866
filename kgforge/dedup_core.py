"""Pure dedup / similarity primitives shared by engine and oracle
(SURVEY §2.G2-G4, C4): shingling, MinHash signatures, LSH banding,
SimHash, Jaccard, union-find.

Deterministic: hash = blake2b (process-independent), permutation parameters
derived from a fixed seed; identical on every worker.
"""

from __future__ import annotations

import numpy as np

from .extract_core import stable_u64

_MERSENNE_P = (1 << 61) - 1
NUM_PERM = 128
LSH_BANDS = 16
LSH_ROWS = NUM_PERM // LSH_BANDS  # 8
DEFAULT_SHINGLE_K = 3


def _perm_params(num_perm: int = NUM_PERM, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def shingles(text: str, k: int = DEFAULT_SHINGLE_K) -> set[int]:
    """Word k-gram shingle set, each shingle hashed to u64. Word shingles
    (not char) hold up on boilerplate-stripped text and keep sets small.

    Hash scheme (round 4): blake2b over the doc's UNIQUE tokens once
    (token repetition makes that the cheap part), then the shared
    order-sensitive rolling combine ``acc = splitmix64(acc ^ tok_hash)``
    over k shifted views — one vectorized pass instead of a Python
    blake2b call per shingle (the old per-k-gram-string digest was the
    single largest term of the 1.2M-page band pass, ~16 s of 68 s).
    Same k-gram identity → same set element, so set cardinalities,
    intersections and every jaccard() value are unchanged; only the raw
    hash VALUES differ from the pre-round-4 scheme (nothing persists
    them — signatures and bands are always recomputed)."""
    toks = text.lower().split()
    if not toks:
        return set()
    from .relops import _splitmix64, token_hash_stream

    th, _doc_idx, _lens = token_hash_stream([toks], "shingle")
    n = min(k, len(toks))  # short docs: one shingle over all tokens
    L = len(th) - n + 1
    acc = np.zeros(L, dtype=np.uint64)
    for j in range(n):
        acc = _splitmix64(acc ^ th[j : j + L])
    return set(acc.tolist())


def minhash_signature(sh: set[int], num_perm: int = NUM_PERM) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) via (a*x+b) mod 2^61-1 over the
    shingle hashes — fully vectorized (one outer product per doc)."""
    if not sh:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (num_perm, n) — modmul in object-free numpy: use python ints? No:
    # uint64 overflow is fine for hashing purposes IF deterministic; but mod
    # p keeps the min statistics correct. Use uint64 wrap-around multiply,
    # then mod p — deterministic and fast (documented approximation).
    prod = np.multiply.outer(_PERM_A[:num_perm], x)  # wraps mod 2^64
    hv = (prod + _PERM_B[:num_perm, None]) % _MERSENNE_P
    return hv.min(axis=1).astype(np.uint64)


def batch_minhash_bands(
    texts: list, k: int = DEFAULT_SHINGLE_K, num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch minhash: texts → ((n_docs, num_perm) uint64 signature
    matrix, (n_docs, bands) int64 band hashes), with per-doc values
    EXACTLY equal to ``minhash_signature(shingles(t))`` /
    ``lsh_bands(sig)`` (equality-tested) — the per-doc path stays the
    definition, this is its amortized form: ONE factorize + blake2b pass
    over the batch's unique tokens (cross-doc Zipf reuse), ONE rolling
    splitmix window pass over the flat token stream (doc-boundary
    windows masked), then per-doc minima via ``np.minimum.reduceat``
    over doc-contiguous window segments in perm-row chunks (bounded
    temp memory).  Duplicate windows within a doc don't affect a min,
    so no per-doc set is ever built."""
    from .relops import _splitmix64, ngram_window_hashes, token_hash_stream

    n_docs = len(texts)
    sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    toks_per = [(x or "").lower().split() for x in texts]
    # THE shared token-hash prelude (relops) — shingles() goes through
    # the same helper, so the two forms cannot drift
    th, doc_idx, lens = token_hash_stream(toks_per, "shingle")
    acc, valid = ngram_window_hashes(th, doc_idx, k)
    L = len(acc)
    wh = acc[valid] if L else np.array([], dtype=np.uint64)
    wdoc = doc_idx[:L][valid] if L else np.array([], dtype=np.int64)
    # short docs (0 < T < k): one shingle over ALL tokens (shingles()'s
    # n = min(k, T) rule) — rare, handled per doc
    short = np.nonzero((lens > 0) & (lens < k))[0]
    if len(short):
        extra_h, extra_d = [], []
        starts = np.cumsum(lens) - lens
        for d in short:
            s = int(starts[d])
            seg = th[s : s + int(lens[d])]
            a = np.zeros(1, dtype=np.uint64)
            for j in range(len(seg)):
                a = _splitmix64(a ^ seg[j : j + 1])
            extra_h.append(a[0])
            extra_d.append(d)
        wh = np.concatenate([wh, np.array(extra_h, dtype=np.uint64)])
        wdoc = np.concatenate([wdoc, np.array(extra_d, dtype=np.int64)])
    if len(wh):
        order = np.argsort(wdoc, kind="stable")  # doc-contiguous segments
        wh, wdoc = wh[order], wdoc[order]
        seg_starts = np.r_[0, 1 + np.nonzero(wdoc[1:] != wdoc[:-1])[0]]
        seg_ends = np.r_[seg_starts[1:], len(wh)]
        seg_docs = wdoc[seg_starts]
        # per-doc (num_perm × n_i) minhash — deliberately NOT a batched
        # reduceat over a (perm-chunk × all-windows) matrix: that form
        # measured 4.4× faster single-threaded but SLOWER at 32-way
        # parallelism (its ~33 MB temporaries are DRAM-bound and the
        # workers saturate memory bandwidth; the per-doc ~200 KB
        # temporaries stay cache-resident).  The batched token hash +
        # window pass above is where the actual win was.
        A, B = _PERM_A[:num_perm], _PERM_B[:num_perm, None]
        for s, e, d in zip(seg_starts.tolist(), seg_ends.tolist(), seg_docs.tolist()):
            prod = np.multiply.outer(A, wh[s:e])  # wraps mod 2^64
            hv = (prod + B) % _MERSENNE_P
            sigs[d] = hv.min(axis=1)
    return sigs, band_hashes(sigs, bands)


def band_hashes(sigs: np.ndarray, bands: int = LSH_BANDS) -> np.ndarray:
    """(n_docs, num_perm) uint64 signature matrix → (n_docs, bands)
    int64 band hashes, vectorized ACROSS docs: per band, a splitmix64
    chain over its ``rows`` signature components seeded by the band
    index (the round-4 replacement for one blake2b call per (doc, band)
    — 16 digests per doc was a visible slice of the corpus-wide band
    pass).  Equal band content → equal hash; the band seed keeps the
    same content in different band positions from colliding."""
    from .relops import _splitmix64

    n, num_perm = sigs.shape
    rows = num_perm // bands
    out = np.empty((n, bands), dtype=np.int64)
    for b in range(bands):
        with np.errstate(over="ignore"):
            acc = _splitmix64(
                np.full(n, np.uint64((b + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF),
                        dtype=np.uint64)
            )
            for r in range(rows):
                acc = _splitmix64(acc ^ sigs[:, b * rows + r])
        out[:, b] = acc.view(np.int64)
    return out


def lsh_bands(sig: np.ndarray, bands: int = LSH_BANDS) -> list[tuple[str, int]]:
    """Split the signature into bands; per band emit (string key, signed
    int64 hash) — the string key is the exact bucket identity, the int64
    is the same digest as a cheap fixed-width shuffle/filter column. Equal
    keys → LSH candidate pair.  Defined THROUGH ``band_hashes`` so the
    per-doc form and the batch kernel cannot diverge."""
    bh = band_hashes(sig.reshape(1, -1).astype(np.uint64, copy=False), bands)[0]
    return [
        (f"{b}:{int(h) & 0xFFFFFFFFFFFFFFFF:016x}", int(h)) for b, h in enumerate(bh)
    ]


def lsh_band_keys(sig: np.ndarray, bands: int = LSH_BANDS) -> list[str]:
    return [k for k, _ in lsh_bands(sig, bands)]


def sig_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """MinHash-estimated Jaccard = fraction of equal signature components.
    This (not exact shingle Jaccard) is the near-dup verification criterion
    in BOTH the engine and the oracle: at scale only the 1 KiB signature —
    never the shingle set — crosses the shuffle, and sharing the criterion
    keeps the two implementations decision-identical on borderline pairs."""
    return float((a == b).mean())


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash(text: str, dim: int = 64) -> int:
    """64-bit SimHash over word tokens (near-dup fingerprint).  The
    per-token blake2b stays a Python loop (hashed over UNIQUE tokens
    with counts — Zipf reuse makes that cheap); the bit accumulation is
    one vectorized (tokens × dim) pass instead of the old 64-iteration
    inner loop per token."""
    toks = text.lower().split()
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    hs = np.array([stable_u64(t, "simhash") for t in uniq], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(dim, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    return int((np.uint64(1) << np.arange(dim, dtype=np.uint64))[acc > 0].sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


MAX_ALLPAIRS_BUCKET = 64


def bucket_pair_policy(sorted_members: list) -> list[tuple[int, int]]:
    """Candidate-pair policy for an LSH bucket, SHARED by engine and oracle
    so their near-dup decisions are identical: all pairs for small buckets;
    for oversized buckets (boilerplate collisions at web scale) a sorted
    chain — preserving union-find connectivity with O(n) pairs instead of
    O(n²)."""
    n = len(sorted_members)
    if n <= MAX_ALLPAIRS_BUCKET:
        return [(i, j) for i in range(n) for j in range(i + 1, n)]
    return [(i, i + 1) for i in range(n - 1)]


class UnionFind:
    """Array-free dict union-find with path compression + min-id canonical
    representative (SURVEY §2.G4, §4.5)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression (iterative — no recursion limit)
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo  # canonical = lexicographic min

    def canonical_map(self) -> dict[str, str]:
        return {x: self.find(x) for x in list(self.parent)}
