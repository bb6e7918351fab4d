"""Mergeable cardinality sketches (HyperLogLog) and the vectorized
string hashing they ride on.

The 100-TB pattern: every ``map_batches`` task folds its batch's token
hashes into a tiny fixed-size register array (2^p bytes), the ONLY
thing that moves through the shuffle is one register row per
(batch, group), and a single ``groupby(key).map_groups`` merges with
elementwise max — associative, commutative, idempotent, so block order,
retries and partial re-execution can never change the answer. Accuracy
is ~1.04/sqrt(2^p) (Flajolet et al. 2007, public algorithm), with the
standard linear-counting small-range correction.

The token hash is a segmented polynomial over the UTF-8 bytes of an
Arrow string array, computed WITHOUT a per-string Python loop: with an
odd base B (invertible mod 2^64) a global prefix scan of
``sum(c_i * B^i)`` turns every substring hash into two lookups and one
multiply by ``B^{-start}`` — O(total bytes) numpy, no ragged loops.
Finalized with splitmix64 so the structured polynomial values are safe
as HLL / partition keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cloud_dedup_ray.functions.hashing import splitmix64

_BASE = 0x9E3779B97F4A7C15  # odd golden-ratio multiplier → invertible mod 2^64
_BASE_INV = pow(_BASE, -1, 1 << 64)
_U64 = np.uint64


def hash_strings_u64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit hash per string, fully vectorized over the flat UTF-8
    buffer (segmented polynomial + splitmix64 finalizer; length XORed in
    so a NUL-padded byte tail can't alias). Nulls hash as empty strings.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, _U64)
    # large_string gives int64 offsets and (via cast) a compacted buffer
    arr = arr.cast(pa.large_string())
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=np.int64, count=n + 1, offset=8 * arr.offset
    )
    starts, ends = offsets[:-1], offsets[1:]
    lo, hi = int(offsets[0]), int(offsets[-1])
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=hi - lo, offset=lo)
    starts = (starts - lo).astype(np.int64)
    ends = (ends - lo).astype(np.int64)
    return hash_byte_segments_u64(data, starts, ends)


def hash_byte_segments_u64(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """Hash arbitrary [start, end) segments of a flat uint8 buffer —
    the shared kernel behind :func:`hash_strings_u64` (segments =
    string offsets) and the CDC chunk hasher (segments = content-
    defined chunk boundaries). One O(total bytes) prefix scan serves
    every segment."""
    if data.size == 0:
        h = np.zeros(len(starts), _U64)
    else:
        # powers B^i as a full prefix scan; inverse powers B^-start only
        # at the n_segments start positions via vectorized binary pow —
        # transient memory is 16 B/input byte + 8 B/segment, not 24 B/byte
        with np.errstate(over="ignore"):
            pows = np.empty(data.size, _U64)
            pows[0] = 1
            np.cumprod(np.full(data.size - 1, _BASE, _U64), out=pows[1:])
            prefix = np.zeros(data.size + 1, _U64)
            np.cumsum(data.astype(_U64) * pows, out=prefix[1:])
            # sum_{i in [s,e)} c_i B^{i-s} = (P[e]-P[s]) * B^{-s}
            h = (prefix[ends] - prefix[starts]) * _pow_u64(
                _U64(_BASE_INV), starts.astype(np.uint64)
            )
    h ^= (ends - starts).astype(_U64)
    return splitmix64(h)


def _pow_u64(base: np.uint64, exps: np.ndarray) -> np.ndarray:
    """Vectorized base**exps mod 2^64 (binary exponentiation over the
    exponent array — O(len * log(max_exp)) multiplies)."""
    out = np.ones(exps.shape, _U64)
    b = _U64(base)
    e = exps.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        while e.any():
            odd = (e & _U64(1)) != 0
            out[odd] *= b
            b *= b
            e >>= _U64(1)
    return out


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 for 0) — exact, no float64
    round-to-power-of-two hazard near 2^53."""
    r = np.zeros(x.shape, np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = (v >> _U64(s)) != 0
        r[m] += s
        v[m] >>= _U64(s)
    r += (v != 0).astype(np.int64)
    return r


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold 64-bit hashes into a fresh 2^p-register HLL (uint8 array).
    Register index = top p bits; rho = leading-zero count of the
    remaining 64-p bits + 1."""
    m = 1 << p
    reg = np.zeros(m, np.uint8)
    if hashes.size:
        h = hashes.astype(_U64, copy=False)
        idx = (h >> _U64(64 - p)).astype(np.int64)
        suffix = h & _U64((1 << (64 - p)) - 1)
        rho = ((64 - p) - _bit_length_u64(suffix) + 1).astype(np.uint8)
        np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(registers: np.ndarray) -> np.ndarray:
    """Merge a (k, m) stack of register arrays — elementwise max, the
    associative/commutative/idempotent combine that makes the sketch
    safe under any partitioning, task retry or merge-tree shape."""
    return np.maximum.reduce(np.atleast_2d(registers))


def hll_estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range
    linear-counting correction (large-range correction is moot with a
    64-bit hash)."""
    m = reg.size
    alpha = 0.7213 / (1.0 + 1.079 / m)  # valid for m >= 128
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -reg.astype(np.int64))))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Bloom filter: broadcast membership screen for semi-/anti-joins.
# Partial filters are plain uint64 word arrays, merged with bitwise OR —
# associative/commutative/idempotent like the HLL registers above, so
# they tree-reduce safely under any partitioning. Double hashing
# (Kirsch & Mitzenmacher 2006): k probe positions from two 64-bit
# hashes, no k independent hash functions needed.
# ---------------------------------------------------------------------------

_BLOOM_SALT = _U64(0xA076_1D64_78BD_642F)  # decorrelates h2 from h1


def _bloom_probes(hashes: np.ndarray, m_bits: int, k: int):
    """Yield the k probe bit-positions for each hash (each an int64
    array). m_bits must be a power of two."""
    h1 = hashes.astype(_U64, copy=False)
    h2 = splitmix64(h1 ^ _BLOOM_SALT) | _U64(1)  # odd → full-period stride
    mask = _U64(m_bits - 1)
    with np.errstate(over="ignore"):
        for i in range(k):
            yield ((h1 + _U64(i) * h2) & mask).astype(np.int64)


def bloom_build(hashes: np.ndarray, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Fold 64-bit key hashes into a fresh bloom filter (uint64 word
    array of m_bits/64 words). Size for ~10 bits/key at the expected
    keyset for ~1% false positives."""
    assert m_bits % 64 == 0 and (m_bits & (m_bits - 1)) == 0
    words = np.zeros(m_bits // 64, _U64)
    if hashes.size:
        for pos in _bloom_probes(hashes, m_bits, k):
            np.bitwise_or.at(words, pos >> 6, _U64(1) << (pos & 63).astype(_U64))
    return words


def bloom_merge(filters: np.ndarray) -> np.ndarray:
    """OR-merge a (n, words) stack of partial filters."""
    return np.bitwise_or.reduce(np.atleast_2d(filters))


def bloom_contains(words: np.ndarray, hashes: np.ndarray, k: int = 4) -> np.ndarray:
    """Vectorized membership test: True = possibly present (verify
    exactly downstream), False = DEFINITELY absent."""
    m_bits = words.size * 64
    out = np.ones(hashes.shape, bool)
    for pos in _bloom_probes(hashes, m_bits, k):
        out &= (words[pos >> 6] >> (pos & 63).astype(_U64)) & _U64(1) != 0
    return out
