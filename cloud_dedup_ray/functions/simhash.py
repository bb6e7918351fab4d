"""SimHash (Charikar 2002) 64-bit near-dup fingerprints.

Each token/feature hashes to 64 bits; the fingerprint's bit *j* is 1 iff
the (weighted) sum of ±1 votes from feature bits *j* is positive. Docs
within a small Hamming distance are near-duplicates (Manku et al.,
WWW'07 used k=3 at 64 bits for web-scale dedup).
"""

from __future__ import annotations

import hashlib

import numpy as np

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def token_hash64(feature: str) -> int:
    """64-bit feature hash: little-endian first 8 bytes of md5 — chosen
    to equal DuckDB's ``md5_number_upper(s)`` so the docs_simhash /
    docs_simhash_pairs pipelines have pure-SQL oracle twins. (The
    MinHash tier keeps its own blake2b token hash; only SimHash routes
    through this.)"""
    return int.from_bytes(hashlib.md5(feature.encode()).digest()[:8], "little")


def _md5_token_cache():
    """text.TokenHashCache parameterized with SimHash's md5-based
    :func:`token_hash64` (shared memo/bounding implementation)."""
    from cloud_dedup_ray.functions.text import TokenHashCache

    return TokenHashCache(hash_fn=token_hash64)


def simhash64(features: list[str], weights: list[int] | None = None) -> int:
    """64-bit SimHash of a feature list (unsigned int result)."""
    if not features:
        return 0
    votes = np.zeros(64, np.int64)
    for idx, f in enumerate(features):
        h = np.uint64(token_hash64(f))
        bits = ((h & _BITS) != 0).astype(np.int64) * 2 - 1
        votes += bits * (weights[idx] if weights else 1)
    return int(((votes > 0).astype(np.uint64) * _BITS).sum(dtype=np.uint64))


def simhash_tokens(text: str) -> int:
    """SimHash over whitespace tokens of pre-normalized text."""
    return simhash64(text.split(" ")) if text else 0


def simhash_tokens_batch(texts: list[str | None], cache=None) -> np.ndarray:
    """Vectorized batch SimHash over whitespace tokens: token hashes come
    from a memoized md5 cache (:func:`token_hash64`), the ±1 bit votes
    are one (n_tokens, 64) numpy reduction per doc. Matches
    :func:`simhash_tokens` bit-for-bit (verified in tests)."""
    cache = cache or _md5_token_cache()
    out = np.zeros(len(texts), np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        h = cache.hash_tokens(t.split(" "))
        bits = (h[:, None] & _BITS) != 0          # (n_tok, 64)
        votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(h)
        out[i] = ((votes > 0).astype(np.uint64) * _BITS).sum(dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # numpy>=2 has bit_count on integer arrays via np.bitwise_count
    try:
        return np.bitwise_count(x)
    except AttributeError:  # numpy<2 fallback
        v = x.copy()
        cnt = np.zeros(v.shape, np.uint64)
        while v.any():
            cnt += v & np.uint64(1)
            v >>= np.uint64(1)
        return cnt
