"""Coarse-partition groupby helpers.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per group —
perfect for few fat groups, pathological for millions of tiny ones
(LSH buckets, (name,size) blocking keys): per-group Python + Arrow
overhead dominates. The scalable pattern used here:

    1. add ``__part = deterministic_hash(key) % P`` (vectorized),
    2. ``groupby("__part").map_groups(partition_fn)`` — P fat groups,
    3. inside ``partition_fn``, process ALL groups of the partition
       vectorized (np.lexsort / pandas factorize + reduceat), touching
       Python only for the rare groups that survive cheap prefilters.

The partition hash must be deterministic ACROSS worker processes
(Python's builtin ``hash`` is per-process salted — never use it for a
shuffle key); we use crc32 for strings and splitmix64 for ints.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


# canonical splitmix64 lives in functions/hashing (one mixer, one set
# of constants); re-exported here for the existing coarse.splitmix64
# callers
from cloud_dedup_ray.functions.hashing import splitmix64  # noqa: E402,F401


def int_partition(col: np.ndarray, num_partitions: int) -> np.ndarray:
    return (splitmix64(col.view(np.uint64)) % np.uint64(num_partitions)).astype(
        np.int32
    )


def str_partition(strings: list[str], num_partitions: int) -> np.ndarray:
    out = np.empty(len(strings), np.int32)
    for i, s in enumerate(strings):
        out[i] = zlib.crc32(s.encode()) % num_partitions
    return out


def str_int_partition(
    strings: list[str], ints: np.ndarray, num_partitions: int
) -> np.ndarray:
    mixed = splitmix64(ints.astype(np.int64).view(np.uint64))
    out = np.empty(len(strings), np.int64)
    for i, s in enumerate(strings):
        out[i] = zlib.crc32(s.encode())
    return ((out.view(np.uint64) ^ mixed) % np.uint64(num_partitions)).astype(np.int32)


def group_slices(sort_idx: np.ndarray, sorted_keys: np.ndarray) -> list[slice]:
    """Boundaries of equal-key runs in a sorted key array → slices into
    ``sort_idx``. ``sorted_keys`` may be an (n, k) stacked column array."""
    n = len(sort_idx)
    if n == 0:
        return []
    if sorted_keys.ndim == 1:
        change = sorted_keys[1:] != sorted_keys[:-1]
    else:
        change = (sorted_keys[1:] != sorted_keys[:-1]).any(axis=1)
    bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [n]])
    return [slice(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
