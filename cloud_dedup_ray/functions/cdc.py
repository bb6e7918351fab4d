"""Content-defined chunking (CDC) with a Gear rolling hash — the
storage-dedup primitive: chunk boundaries follow CONTENT, not offsets,
so inserting one byte near the start of a document shifts only the
chunk containing the edit while every later chunk re-aligns and hashes
identically (FastCDC / Gear family, Xia et al. 2016, public algorithm).

The Gear recurrence h_i = (h_{i-1} << 1) + G[b_i] (mod 2^64) means h_i
depends on only the last 64 bytes — a 64-wide weighted window. We
vectorize it with 6 doubling passes instead of a per-byte Python loop:
    S_1[i]    = G[b_i]
    S_2m[i]   = S_m[i] + (S_m[i-m] << m)
so S_64 IS the gear hash at every position, computed in O(6·N) numpy
over the whole flat batch buffer. Min-size enforcement (>= 64) makes
cross-document window pollution irrelevant: any candidate within 64
bytes of a document start is below min_size and ignored.
"""

from __future__ import annotations

import numpy as np

from cloud_dedup_ray.functions.hashing import splitmix64

_U64 = np.uint64
# deterministic per-byte gear table; changing it changes every chunk hash
_GEAR = splitmix64(np.arange(256, dtype=np.uint64))


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Gear rolling-hash value at every byte position of a flat uint8
    buffer (vectorized 64-byte window via doubling)."""
    s = _GEAR[data]
    with np.errstate(over="ignore"):
        for m in (1, 2, 4, 8, 16, 32):
            shifted = np.zeros_like(s)
            shifted[m:] = s[:-m] << _U64(m)
            s = s + shifted
    return s


def cdc_cut_points(
    doc_starts: np.ndarray,
    doc_ends: np.ndarray,
    candidates: np.ndarray,
    min_size: int = 256,
    max_size: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Turn mask-hit candidate positions into per-document chunk
    [start, end) arrays under min/max size rules: the next cut is the
    first candidate >= prev+min_size, else prev+max_size, else the
    document end. Returns (chunk_starts, chunk_ends, doc_index) —
    the only Python-level loop runs once per CHUNK (bytes/avg_size),
    not per byte."""
    starts: list[int] = []
    ends: list[int] = []
    docidx: list[int] = []
    for d in range(len(doc_starts)):
        lo, hi = int(doc_starts[d]), int(doc_ends[d])
        pos = lo
        while pos < hi:
            limit = min(pos + max_size, hi)
            ci = np.searchsorted(candidates, pos + min_size, side="left")
            if ci < len(candidates) and candidates[ci] < limit:
                cut = int(candidates[ci]) + 1  # cut AFTER the hit byte
            else:
                cut = limit
            starts.append(pos)
            ends.append(cut)
            docidx.append(d)
            pos = cut
    return (
        np.asarray(starts, np.int64),
        np.asarray(ends, np.int64),
        np.asarray(docidx, np.int64),
    )


def cdc_chunks(
    data: np.ndarray,
    doc_starts: np.ndarray,
    doc_ends: np.ndarray,
    min_size: int = 256,
    avg_bits: int = 10,
    max_size: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Content-defined chunk [start, end) + doc index over a flat
    buffer holding multiple documents. A position is a boundary
    candidate when the low ``avg_bits`` bits of its gear hash are zero
    (expected chunk size ~= 2^avg_bits past min_size)."""
    assert min_size >= 64, "min_size < 64 exposes cross-doc window pollution"
    if data.size == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    h = gear_hashes(data)
    mask = _U64((1 << avg_bits) - 1)
    candidates = np.flatnonzero((h & mask) == 0)
    return cdc_cut_points(doc_starts, doc_ends, candidates, min_size, max_size)
