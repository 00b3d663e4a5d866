"""Pure dedup / similarity primitives shared by engine and oracle
(SURVEY §2.G2-G4, C4): shingling, MinHash signatures, LSH banding,
SimHash, Jaccard, union-find.

Deterministic: hash = blake2b (process-independent), permutation parameters
derived from a fixed seed; identical on every worker.
"""

from __future__ import annotations

import hashlib
import struct

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
    (not char) hold up on boilerplate-stripped text and keep sets small."""
    toks = text.lower().split()
    if len(toks) < k:
        return {stable_u64(" ".join(toks), "shingle")} if toks else set()
    return {stable_u64(" ".join(toks[i:i + k]), "shingle") for i in range(len(toks) - k + 1)}


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


def lsh_bands(sig: np.ndarray, bands: int = LSH_BANDS) -> list[tuple[str, int]]:
    """Split the signature into bands; per band emit (string key, signed
    int64 hash) — the string key is the exact bucket identity, the int64
    is the same digest as a cheap fixed-width shuffle/filter column. Equal
    keys → LSH candidate pair."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows:(b + 1) * rows]
        d = hashlib.blake2b(
            struct.pack(f"<{rows}Q", *chunk.tolist()), digest_size=8, salt=bytes([b])
        ).digest()
        h = int.from_bytes(d, "big") - (1 << 63)
        out.append((f"{b}:{d.hex()}", h))
    return out


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
