"""MinHash signatures + LSH banding (pure numpy; no external deps).

Standard construction (Broder 1997; Leskovec et al., *Mining of Massive
Datasets* ch.3): ``num_perm`` universal-hash permutations
``h_i(x) = (a_i * x + b_i) mod p`` over 64-bit shingle hashes, signature
= per-permutation minimum; LSH = split the signature into ``b`` bands of
``r`` rows, hash each band, docs colliding in any band are candidates.

Seeded parameters ⇒ identical signatures across runs/workers — required
for recall parity at fixed config (BASELINE.json north_rule) and for
checkpoint resume.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE61 = np.uint64((1 << 61) - 1)


class MinHasher:
    """Stateful signer: builds the (a, b) permutation tables once.

    Instantiate once per worker/actor (``__init__`` of the actor-pool
    callable), then call :meth:`signature` per document.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        # odd multipliers in [1, p), offsets in [0, p)
        self.a = rng.randint(1, (1 << 61) - 1, num_perm).astype(np.uint64) | np.uint64(1)
        self.b = rng.randint(0, (1 << 61) - 1, num_perm).astype(np.uint64)
        self.empty = np.full(num_perm, _MERSENNE61, np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(n_shingles,) uint64 → (num_perm,) uint64 signature."""
        if shingles.size == 0:
            return self.empty.copy()
        x = (shingles & _MERSENNE61)[:, None]  # keep within the field
        # (n, num_perm) — wraparound mod 2^64 then reduce mod p (Mersenne trick)
        v = x * self.a[None, :] + self.b[None, :]
        v = (v & _MERSENNE61) + (v >> np.uint64(61))
        v = np.where(v >= _MERSENNE61, v - _MERSENNE61, v)
        return v.min(axis=0)

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """Batch variant: list of shingle arrays → (n_docs, num_perm)."""
        out = np.empty((len(shingle_sets), self.num_perm), np.uint64)
        for i, s in enumerate(shingle_sets):
            out[i] = self.signature(s)
        return out


def band_hashes(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n_docs, num_perm) signatures → (n_docs, num_bands) int64 band
    hashes. Each band's rows are hashed with blake2b so distinct bands
    with equal row values don't collide across band ids."""
    n_docs, num_perm = sigs.shape
    r = num_perm // num_bands
    out = np.empty((n_docs, num_bands), np.int64)
    raw = np.ascontiguousarray(sigs)
    for band in range(num_bands):
        block = raw[:, band * r : (band + 1) * r]
        view = np.ascontiguousarray(block).view(np.uint8).reshape(n_docs, -1)
        for i in range(n_docs):
            h = hashlib.blake2b(view[i].tobytes(), digest_size=8,
                                salt=band.to_bytes(8, "little")).digest()
            out[i, band] = int.from_bytes(h, "big", signed=True)
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing permutations — an unbiased Jaccard estimate."""
    return float(np.count_nonzero(sig_a == sig_b)) / len(sig_a)


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique uint64 shingle arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)
