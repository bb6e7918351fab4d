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

    def signatures(
        self, shingle_sets: list[np.ndarray], chunk_shingles: int = 1 << 16
    ) -> np.ndarray:
        """Batch variant: list of shingle arrays → (n_docs, num_perm).

        Concatenates the sets and computes permuted values for many docs
        at once, reducing per-doc minima with ``np.minimum.reduceat`` —
        one big vector op per chunk instead of a per-doc broadcast.
        ``chunk_shingles`` bounds the (chunk × num_perm × 8B) temporary.
        """
        n_docs = len(shingle_sets)
        lens = np.fromiter((s.size for s in shingle_sets), np.int64, n_docs)
        if lens.sum() == 0:
            flat = np.empty(0, np.uint64)
        else:
            flat = np.concatenate([s for s in shingle_sets if s.size])
        return self.signatures_flat(flat, lens, chunk_shingles)

    def signatures_flat(
        self, flat: np.ndarray, lens: np.ndarray, chunk_shingles: int = 1 << 16
    ) -> np.ndarray:
        """Flat form of :meth:`signatures`: concatenated shingle hashes
        (doc-major) + per-doc lengths → (n_docs, num_perm)."""
        n_docs = lens.size
        out = np.full((n_docs, self.num_perm), _MERSENNE61, np.uint64)
        nonempty = np.nonzero(lens > 0)[0]
        if nonempty.size == 0:
            return out
        doc_starts = np.zeros(n_docs, np.int64)
        np.cumsum(lens[:-1], out=doc_starts[1:])
        # chunk document ranges so each (chunk × num_perm) temp stays bounded
        start = 0
        while start < nonempty.size:
            end = start
            total = 0
            while end < nonempty.size and (
                total + lens[nonempty[end]] <= chunk_shingles or end == start
            ):
                total += lens[nonempty[end]]
                end += 1
            docs = nonempty[start:end]
            sub = flat[doc_starts[docs[0]] : doc_starts[docs[-1]] + lens[docs[-1]]]
            x = (sub & _MERSENNE61)[:, None]
            v = x * self.a[None, :] + self.b[None, :]
            v = (v & _MERSENNE61) + (v >> np.uint64(61))
            v = np.where(v >= _MERSENNE61, v - _MERSENNE61, v)
            offsets = np.zeros(len(docs), np.int64)
            np.cumsum(lens[docs][:-1], out=offsets[1:])
            out[docs] = np.minimum.reduceat(v, offsets, axis=0)
            start = end
        return out


class OnePermMinHasher:
    """One-permutation MinHash with rotation densification
    (Li, Owen & Zhang 2012; Shrivastava & Li 2014 "Densifying One
    Permutation Hashing").

    One splitmix64 pass assigns every shingle to one of ``num_perm``
    bins (top bits) and a 57-bit value (low bits); the signature is the
    per-bin minimum, and empty bins borrow circularly from the nearest
    filled bin to the left with an offset tweak. O(n_shingles) total —
    ~num_perm× cheaper than the classic per-permutation construction,
    which is the difference between CPU-bound and memory-bandwidth-bound
    at 10^12-file scale. Collision probability per entry still estimates
    Jaccard, so banding/verification are unchanged.

    Deterministic: signature is a pure function of the shingle set and
    the seed (required for checkpoint resume + recall parity,
    BASELINE.json north_rule).
    """

    #: sentinel for "no shingles at all" (empty doc)
    EMPTY = np.uint64((1 << 63) - 1)
    _DENSIFY_STEP = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, num_perm: int = 128, seed: int = 42):
        if num_perm & (num_perm - 1):
            raise ValueError("num_perm must be a power of two for OPH binning")
        self.num_perm = num_perm
        self.bin_bits = int(num_perm).bit_length() - 1
        self.val_bits = 64 - self.bin_bits
        # seed tweak folded into the mix so different seeds re-permute bins
        self.seed_tweak = np.uint64(
            int.from_bytes(
                hashlib.blake2b(str(seed).encode(), digest_size=8).digest(), "big"
            )
        )
        self.empty = np.full(num_perm, self.EMPTY, np.uint64)

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """list of uint64 shingle arrays → (n_docs, num_perm) uint64."""
        n_docs = len(shingle_sets)
        lens = np.fromiter((s.size for s in shingle_sets), np.int64, n_docs)
        if lens.sum() == 0:
            flat = np.empty(0, np.uint64)
        else:
            flat = np.concatenate([s for s in shingle_sets if s.size])
        return self.signatures_flat(flat, lens)

    def signatures_flat(self, flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Flat form: concatenated shingle hashes + per-doc lengths →
        (n_docs, num_perm) uint64. The per-(doc, bin) minimum runs as
        argsort + ``np.minimum.reduceat`` — ~4× faster than the
        ``np.minimum.at`` unbuffered scatter it replaces (identical
        result: both compute the exact group minimum)."""
        n_docs = lens.size
        k = self.num_perm
        out = np.full((n_docs, k), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
        if flat.size == 0:
            return np.tile(self.empty, (n_docs, 1))
        mixed = _splitmix64(flat ^ self.seed_tweak)
        bins = (mixed >> np.uint64(self.val_bits)).astype(np.int64)
        vals = mixed & ((np.uint64(1) << np.uint64(self.val_bits)) - np.uint64(1))
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        keys = doc_idx * k + bins
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.empty(ks.size, bool)
        starts[0] = True
        np.not_equal(ks[1:], ks[:-1], out=starts[1:])
        group_starts = np.flatnonzero(starts)
        out.reshape(-1)[ks[group_starts]] = np.minimum.reduceat(
            vals[order], group_starts
        )
        return self._densify(out, lens)

    def _densify(self, out: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Optimal densification (Shrivastava, ICML 2017): each empty
        bin j probes bins in a (j, attempt)-keyed pseudorandom order —
        identical across docs — and copies the first filled bin's value.
        Independent probe sequences per bin break the run-correlation
        that makes rotation densification high-variance on sparse docs
        (empirically ~3× lower estimator std at 40 filled / 128 bins)."""
        k = np.uint64(self.num_perm)
        unfilled = out == np.uint64(0xFFFFFFFFFFFFFFFF)
        have_any = lens > 0
        need = unfilled & have_any[:, None]
        if need.any():
            filled = ~unfilled
            rows, cols = np.nonzero(need)
            rows = rows.astype(np.int64)
            cols = cols.astype(np.uint64)
            pending = np.arange(rows.size)
            attempt = 1
            while pending.size:
                tweak = np.uint64(
                    (attempt * 0xA24BAED4963EE407) & 0xFFFFFFFFFFFFFFFF
                )
                src = (
                    _splitmix64(
                        cols[pending] * np.uint64(0xD6E8FEB86659FD93) + tweak
                        ^ self.seed_tweak
                    )
                    % k
                ).astype(np.int64)
                hit = filled[rows[pending], src]
                hit_idx = pending[hit]
                out[rows[hit_idx], cols[hit_idx].astype(np.int64)] = out[
                    rows[hit_idx], src[hit]
                ]
                pending = pending[~hit]
                attempt += 1
        out[~have_any] = self.empty
        return out


def make_hasher(scheme: str, num_perm: int, seed: int):
    """'oph' (default, O(n) one-permutation + densification) or
    'classic' (num_perm independent permutations)."""
    if scheme == "classic":
        return MinHasher(num_perm, seed)
    if scheme == "oph":
        return OnePermMinHasher(num_perm, seed)
    raise ValueError(f"unknown minhash scheme: {scheme}")


# canonical splitmix64 (functions/hashing); alias keeps call sites short
from cloud_dedup_ray.functions.hashing import splitmix64 as _splitmix64  # noqa: E402


def band_hashes(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n_docs, num_perm) signatures → (n_docs, num_bands) int64 band
    hashes, fully vectorized: a per-position splitmix64 mix folded with
    XOR across each band's rows. Equal bands ⇒ equal hashes; the LSH
    grouping key is (band_id, band_hash), so cross-band collisions are
    harmless — within-band collision odds are ~2^-64 per bucket pair."""
    n_docs, num_perm = sigs.shape
    r = num_perm // num_bands
    blocks = sigs.reshape(n_docs, num_bands, r)
    # distinct per-position tweak so permuted row orders hash differently
    tweak = np.arange(r, dtype=np.uint64) * np.uint64(0xD6E8FEB86659FD93)
    mixed = _splitmix64(blocks ^ tweak[None, None, :])
    folded = np.bitwise_xor.reduce(mixed, axis=2)
    return _splitmix64(folded).view(np.int64)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing permutations — an unbiased Jaccard estimate."""
    return float(np.count_nonzero(sig_a == sig_b)) / len(sig_a)


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique uint64 shingle arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)
