"""Content hashing.

The reference streams MD5 over file bytes *per pair*
(/root/reference/src/cloud_duplicate_analyzer.py:100-111, invoked at
:257-258 — recomputed for every pair a file participates in). The
rebuild hashes ONCE per row in a vectorized stage; only hash equality
is ever compared (:264), so this is semantically identical and strictly
cheaper. We carry sha256 as the per-row parity invariant
(BASELINE.json ``input_hint``) and md5 for reference parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(contents: pa.Array) -> pa.Array:
    """sha256 hexdigest per row. hashlib releases the GIL per call; the
    loop is C-bound, not Python-bound, and runs inside map_batches tasks."""
    # to_pylist on a string array is one C pass; hashing dominates.
    return pa.array(
        [hashlib.sha256(s.encode()).hexdigest() if s is not None else None
         for s in contents.to_pylist()],
        pa.string(),
    )


def md5_hex(contents: pa.Array) -> pa.Array:
    return pa.array(
        [hashlib.md5(s.encode()).hexdigest() if s is not None else None
         for s in contents.to_pylist()],
        pa.string(),
    )


def stable_id64(
    repos: pa.Array, paths: pa.Array, commits: pa.Array | None = None
) -> pa.Array:
    """Deterministic 63-bit doc id from (repo, path[, commit]) — stable
    across runs/retries (block order independent), unlike a
    zip-with-index. ``commits`` MUST be passed when the table carries
    one row per file VERSION: two commits of the same path are distinct
    documents with distinct content, and collapsing them onto one id
    makes every id-keyed join/cluster ambiguous (which version's
    signature wins depends on block arrival order). Null commits hash
    as ''. Collision odds at 10^12 docs are ~2^-20 per pair under 63
    bits; the scale path widens to 2x64 stored as
    fixed_size_binary(16)."""
    out = np.empty(len(repos), np.int64)
    rl, pl = repos.to_pylist(), paths.to_pylist()
    cl = commits.to_pylist() if commits is not None else None
    for i in range(len(rl)):
        key = f"{rl[i]}\0{pl[i]}"
        if cl is not None:
            key += f"\0{cl[i] or ''}"
        h = hashlib.sha1(key.encode()).digest()
        out[i] = int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF
    return pa.array(out, pa.int64())


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain mixing constants) — THE
    canonical integer mixer for partition keys, bucket keys and OPH bin
    assignment (stages/coarse and functions/minhash import this one;
    text.char_ngrams_hashed deliberately applies only the add-free
    finalizer over its polynomial values). Input is treated as uint64;
    changing these constants changes every hash-partitioned artifact."""
    x = x.astype(np.uint64, copy=True) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))
