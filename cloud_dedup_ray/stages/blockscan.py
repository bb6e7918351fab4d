"""Flat task waves over a materialized dataset's block refs.

A Dataset job launch costs 1-2 s of serial driver time on this Ray
version; when the input blocks already sit in the object store, a flat
``ray.remote`` task per block costs ~100 ms end to end. These helpers
are the main lever on the per-run serial floor (scaling efficiency):
semi-joins, filters and tiny aggregations over an already-materialized
dataset should use a task wave, not a ``map_batches → iter_batches``
round trip.
"""

from __future__ import annotations

import ray
import ray.data


def is_materialized(ds: ray.data.Dataset) -> bool:
    from ray.data.dataset import MaterializedDataset

    return isinstance(ds, MaterializedDataset)


def coalesce_small_blocks(
    ds: ray.data.Dataset,
    target_bytes: int = 64 << 20,
    min_blocks: int | None = None,
) -> ray.data.Dataset:
    """Coalesce a materialized dataset made of many tiny blocks.

    A sort-based shuffle (groupby / sort) over B map blocks and R reduce
    partitions moves B × R micro-objects; with hundreds of sub-MB blocks
    (small input files, row-group splits) the exchange is pure scheduling
    overhead — measured 7× slower than the same shuffle over
    CPU-count-sized blocks at 114k rows. Repartition (split/merge, no
    sort) down to ``max(min_blocks or cluster CPUs, size/target_bytes)``
    whenever the current count is more than 2× that. At real block sizes
    (≥ target_bytes) this is a no-op, so the 100-TB path never pays it.
    """
    if not is_materialized(ds):
        ds = ds.materialize()
    nb = ds.num_blocks()
    size = ds.size_bytes() or 0
    cpus = int(ray.cluster_resources().get("CPU", 8))
    want = max(min_blocks or cpus, -(-size // target_bytes))
    if nb > 2 * want:
        return ds.repartition(want).materialize()
    return ds


def exchange_blocks(
    ds: ray.data.Dataset, map_fn, reduce_fn, num_partitions: int,
    reduce_extra: list | None = None,
) -> list:
    """Two-wave hash-exchange over a materialized dataset's block refs —
    a flat-task map/shuffle/reduce that skips the Dataset-job launch and
    sort machinery (1-2 s serial each on this Ray build).

    Wave 1 runs ``map_fn(block_table) -> [part_0, ..., part_{P-1}]`` as
    one task per block with ``num_returns=P`` — each partition's slice
    becomes its own object, so the exchange is store-to-store (the
    driver never touches data, only refs). Wave 2 runs
    ``reduce_fn(*parts)`` once per partition over that partition's B
    slices. Returns the P reduce results.

    ``reduce_extra`` (optional, len == P) appends one per-partition
    argument to the reduce call: ``reduce_fn(*parts, extra_p)`` — the
    hook for partition-specific work lists (e.g. "this partition's
    candidate pairs") without routing them through the map wave.

    Scale note: this is the same B × R exchange pattern Ray Data's sort
    shuffle performs, minus its spilling/streaming integration — callers
    should keep the Dataset groupby as the checkpointable/very-large
    path and bound B × P here (see ``cluster_corpus``).
    """
    refs = ds.to_arrow_refs()
    if not refs:
        return []
    P = num_partitions
    if P == 1:
        mapper = ray.remote(num_cpus=1)(lambda t: map_fn(t)[0])
        waves = [[mapper.remote(r)] for r in refs]
    else:
        mapper = ray.remote(num_cpus=1, num_returns=P)(map_fn)
        waves = [mapper.remote(r) for r in refs]
    reducer = ray.remote(num_cpus=1)(reduce_fn)
    futures = [
        reducer.remote(
            *[w[p] for w in waves],
            *(() if reduce_extra is None else (reduce_extra[p],)),
        )
        for p in range(P)
    ]
    return ray.get(futures)


def scan_blocks(ds: ray.data.Dataset, fn, *args) -> list:
    """Run ``fn(block_table, *args)`` as one flat Ray task per block of
    an already-materialized dataset. ``args`` may contain object refs
    (broadcast once, auto-dereferenced in the task). NOTE: blocks
    produced by a ``filter`` can carry an EMPTY schema — ``fn`` must
    guard ``t.num_rows == 0 or "col" not in t.schema.names``."""
    task = ray.remote(num_cpus=1)(fn)
    return ray.get([task.remote(ref, *args) for ref in ds.to_arrow_refs()])
