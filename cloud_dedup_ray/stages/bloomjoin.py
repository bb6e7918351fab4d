"""Distributed bloom-filter construction for screened semi-/anti-joins.

``build_bloom`` folds a key-hash column of a Dataset into ONE merged
bloom filter: every batch emits a fixed-size partial (uint64 words),
one map_batches level OR-merges with fan-in ``batch_size`` so the
driver receives n_batches/fan_in rows instead of one filter per block,
and the final OR runs on the driver over that reduced set. The result
is ``ray.put`` once by the caller and read inside every screen task —
the broadcast-small-side pattern (filter size is m_bits/8 bytes,
independent of key count).

Used by ``textops.docs_novel_vs_train`` (string content hashes) and
``relational.customers_without_big_orders`` (splitmix64 int keys).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

from cloud_dedup_ray.functions.sketch import bloom_build, bloom_merge

# The ONE hash-count the build and probe sides must agree on: a filter
# built with k set-bits per key yields false NEGATIVES (dropped rows in
# the "exact" anti-joins) if probed with a different k. Every
# ``bloom_contains`` call against a ``build_bloom`` filter must pass
# this same constant explicitly.
BLOOM_K = 4


def build_bloom(
    ds: ray.data.Dataset,
    hash_batch: Callable[[pa.Table], np.ndarray],
    m_bits: int = 1 << 20,
    fan_in: int = 64,
    k: int = BLOOM_K,
) -> np.ndarray:
    """Merged bloom filter over ``hash_batch(batch)`` uint64 keys of
    every batch of ``ds``. Dedup inside the batch keeps the per-batch
    bit-set cost proportional to distinct keys. Probe the result with
    ``bloom_contains(words, hashes, k=<same k>)`` — pass ``BLOOM_K``
    at both ends so the build/probe coupling is explicit."""
    n_words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        words = bloom_build(np.unique(hash_batch(t)), m_bits, k=k)
        return pa.table(
            {"bloom": pa.array([words.tobytes()], pa.binary(8 * n_words))}
        )

    def combine(t: pa.Table) -> pa.Table:
        stack = np.frombuffer(
            b"".join(t["bloom"].to_pylist()), np.uint64
        ).reshape(len(t), n_words)
        return pa.table(
            {"bloom": pa.array(
                [bloom_merge(stack).tobytes()], pa.binary(8 * n_words)
            )}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=fan_in)
        .take_all()
    )
    if not rows:
        return np.zeros(n_words, np.uint64)
    return bloom_merge(
        np.frombuffer(
            b"".join(r["bloom"] for r in rows), np.uint64
        ).reshape(len(rows), n_words)
    )
