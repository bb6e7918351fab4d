"""MinHash signing stage — the stateful actor-pool stage of the
near-dup tier.

``MinHashSigner`` is a callable CLASS passed to ``map_batches(...,
concurrency=(m, n))``: the permutation tables (seeded → identical on
every actor) are built once per actor in ``__init__``; each ``__call__``
normalizes, shingles and signs one Arrow batch. Output drops the wide
``content`` column — downstream shuffles move only doc ids + signatures
(num_perm × 8 bytes/doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.minhash import band_hashes, make_hasher
from cloud_dedup_ray.stages import coarse
from cloud_dedup_ray.functions.text import (
    TokenHashCache,
    token_shingles_hashed_batch,
)


class MinHashSigner:
    """corpus batch (doc_id, content) → (doc_id, n_shingles, sig, bands,
    anchors).

    * ``sig``: fixed-width list<uint64>[num_perm] MinHash signature
    * ``bands``: list<int64>[num_bands] LSH band hashes
    * ``anchors``: bottom-k shingle hashes (containment-pass blocking keys)
    """

    def __init__(self, cfg: DedupConfig | None = None):
        self.cfg = cfg or DedupConfig()
        self.hasher = make_hasher(
            self.cfg.minhash_scheme, self.cfg.num_perm, self.cfg.seed
        )
        self.token_cache = TokenHashCache()  # amortized across batches

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        flat, lens = token_shingles_hashed_batch(
            batch["content"], cfg.shingle_k, self.token_cache,
            cfg.min_doc_chars,
        )
        sigs = self.hasher.signatures_flat(flat, lens)
        bands = band_hashes(sigs, cfg.num_bands)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64)), cfg.num_perm
        )
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1)), cfg.num_bands
        )
        # anchors: first `containment_anchors` of each doc's sorted-unique
        # shingles, sliced straight out of the flat buffer as a ListArray
        doc_off = np.zeros(lens.size, np.int64)
        np.cumsum(lens[:-1], out=doc_off[1:])
        rep = np.minimum(lens, cfg.containment_anchors)
        offs = np.zeros(lens.size + 1, np.int32)
        np.cumsum(rep, out=offs[1:])
        within = np.arange(int(offs[-1])) - offs[:-1][np.repeat(
            np.arange(lens.size), rep
        )]
        take = doc_off[np.repeat(np.arange(lens.size), rep)] + within
        anchor_col = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(flat[take].view(np.int64))
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_shingles": pa.array(lens),
                "sig": sig_col,
                "bands": band_col,
                "anchors": anchor_col,
            }
        )


# --------------------------------------------------------------------------
# task-pool signing: per-worker-PROCESS signer cache
# --------------------------------------------------------------------------
#
# The signer's state is deterministic from the config (seeded permutation
# tables + an empty memo cache), so it doesn't need actor identity — it can
# live in a module-level cache inside whatever worker process runs the task.
# Ray REUSES task workers across dataset executions, while a map_batches
# actor pool starts fresh actor processes per execution; on hosts where
# process startup is expensive (lazily-backed VMs pay ~0.5–1 s of
# first-touch page faults per fresh process) the task form removes that
# recurring warmup from every run after the first. Keyed by the config
# fingerprint so concurrent pipelines with different configs coexist.
_SIGNER_CACHE: dict[str, MinHashSigner] = {}


def make_sign_fn(cfg: DedupConfig):
    """Plain-function form of the signing stage for a task-pool
    ``map_batches`` (``cfg.signer_mode == "task"``)."""
    key = cfg.fingerprint()

    def sign_batch(batch: pa.Table) -> pa.Table:
        signer = _SIGNER_CACHE.get(key)
        if signer is None:
            signer = _SIGNER_CACHE[key] = MinHashSigner(cfg)
        return signer(batch)

    return sign_batch


def explode_bands(batch: pa.Table) -> pa.Table:
    """(doc_id, bands[list]) → one row per (bucket_key, doc_id), where
    ``bucket_key = splitmix64(band_hash ^ f(band_id))`` packs the
    (band_id, band_hash) bucket identity into a single u64 — half the
    shuffle width of two key columns. Cross-bucket key collisions
    (~n_buckets²/2⁶⁴) would only merge two buckets into one candidate
    pool, and every candidate pair is verified downstream, so packing is
    safe. Skips empty docs (n_shingles == 0)."""
    num_bands = batch["bands"].type.list_size
    mask = np.asarray(batch["n_shingles"]) > 0
    doc_ids = np.asarray(batch["doc_id"])[mask]
    bands = np.asarray(
        batch["bands"].combine_chunks().flatten()
    ).reshape(-1, num_bands)[mask]
    n = len(doc_ids)
    band_tweak = (
        np.arange(num_bands, dtype=np.uint64) * np.uint64(0xD6E8FEB86659FD93)
    )
    keys = coarse.splitmix64(
        bands.view(np.uint64) ^ band_tweak[None, :]
    ).reshape(-1)
    return pa.table(
        {
            "bucket_key": keys.view(np.int64),
            "doc_id": np.repeat(doc_ids, num_bands),
        }
    )


def add_bucket_partition(num_partitions: int):
    """Vectorized ``__part = bucket_key % P`` column so the LSH shuffle
    moves P fat partitions instead of one Ray group per bucket (see
    stages/coarse.py); the key is already splitmix64-mixed."""

    def _add(t: pa.Table) -> pa.Table:
        key = np.asarray(t["bucket_key"], np.int64).view(np.uint64)
        part = (key % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part))

    return _add


def bucket_pairs_arrays(
    bk: np.ndarray, ids: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Candidate-pair kernel over ONE partition's (bucket_key, doc_id)
    rows → (a, b, size_vals, size_counts). Shared verbatim by the
    Dataset ``emit_bucket_pairs`` form and the flat-task exchange form
    (``neardup._collect_edges_flat``), so the two execution paths emit
    byte-identical edge sets. See ``emit_bucket_pairs`` for the pairing
    and skew-cap semantics.

    Vectorized group-by-size (a prior version looped Python over every
    bucket — including the singleton majority — at ~5 s per 600k-row
    partition): one lexsort dedups (bucket, id) pairs and yields every
    bucket's sorted-unique member run; buckets of equal size b ≤ cap
    emit their C(b,2) pairs as ONE fancy-indexed gather per distinct
    size (chunked so the pair temp stays bounded); only over-cap
    buckets (rare by construction) take a per-bucket path."""
    order = np.lexsort((ids, bk))
    kb, ki = bk[order], ids[order]
    n = kb.size
    if n == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    # sorted-unique members per bucket in one sweep
    first = np.empty(n, bool)
    first[0] = True
    first[1:] = (kb[1:] != kb[:-1]) | (ki[1:] != ki[:-1])
    ub, ui = kb[first], ki[first]
    bstart = np.empty(ub.size, bool)
    bstart[0] = True
    bstart[1:] = ub[1:] != ub[:-1]
    starts = np.flatnonzero(bstart)
    sizes = np.diff(np.append(starts, ub.size)).astype(np.int64)
    a_out, b_out = [], []
    for v in np.unique(sizes):
        v = int(v)
        if v < 2:
            continue
        rows = starts[sizes == v]
        if v <= cap:
            ai, bi = np.triu_indices(v, k=1)
            # bound the (m_chunk × C(v,2)) pair temp to ~4M entries
            step = max(1, 4_000_000 // max(len(ai), 1))
            for c in range(0, len(rows), step):
                mat = ui[rows[c : c + step, None] + np.arange(v)]
                a_out.append(mat[:, ai].ravel())
                b_out.append(mat[:, bi].ravel())
        else:
            for s in rows:
                members = ui[s : s + v]
                rep = members[0]
                a = np.concatenate([members[:-1], np.full(v - 1, rep)])
                bb = np.concatenate([members[1:], members[1:]])
                keep = a != bb
                a_out.append(a[keep])
                b_out.append(bb[keep])
    size_vals, size_counts = np.unique(sizes, return_counts=True)
    if a_out:
        # in-task dedup: the same pair recurs across bands that hash
        # into this partition — dropping repeats here shrinks what
        # the driver has to unique by the per-partition multiplicity
        pairs = np.unique(
            np.stack([np.concatenate(a_out), np.concatenate(b_out)], axis=1),
            axis=0,
        )
        pa_a, pa_b = pairs[:, 0], pairs[:, 1]
    else:
        pa_a = pa_b = np.empty(0, np.int64)
    return pa_a, pa_b, size_vals, size_counts.astype(np.int64)


def emit_bucket_pairs(cap: int):
    """map_groups body over ONE coarse partition holding many
    (band_id, band_hash) buckets → candidate edges (a, b), a < b, plus
    bucket-size HISTOGRAM rows (a = −1, b = count, bucket_size = size)
    so skew statistics come out of the same shuffle without shipping
    one metrics row per bucket to the driver (millions at scale).

    All buckets of the partition are delineated with one np.lexsort;
    Python touches only non-singleton buckets (rare).

    Skew guard (SURVEY.md §7.5): a bucket of b docs normally emits all
    C(b,2) pairs; buckets larger than ``cap`` (boilerplate license
    files) emit a chain + star over the sorted doc ids — O(2b) edges
    whose transitive closure under union-find preserves connectivity
    when members verify (which near-identical boilerplate does). This
    caps worst-case pair volume at the cost of recall only for buckets
    that mix dissimilar docs above the cap size.
    """

    def _pairs(table: pa.Table) -> pa.Table:
        bk = np.asarray(table["bucket_key"], np.int64)
        ids = np.asarray(table["doc_id"], np.int64)
        pa_a, pa_b, size_vals, size_counts = bucket_pairs_arrays(bk, ids, cap)
        n_pairs = len(pa_a)
        return pa.table(
            {
                "a": np.concatenate(
                    [pa_a, np.full(len(size_vals), -1, np.int64)]
                ),
                "b": np.concatenate([pa_b, size_counts]),
                "bucket_size": np.concatenate(
                    [np.zeros(n_pairs, np.int64), size_vals]
                ),
            }
        )

    _pairs.__name__ = "emit_bucket_pairs"
    return _pairs
