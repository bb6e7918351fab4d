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
from cloud_dedup_ray.functions.minhash import MinHasher, band_hashes
from cloud_dedup_ray.functions.text import normalize, token_shingles_hashed


class MinHashSigner:
    """corpus batch (doc_id, content) → (doc_id, n_shingles, sig, bands,
    anchors).

    * ``sig``: fixed-width list<uint64>[num_perm] MinHash signature
    * ``bands``: list<int64>[num_bands] LSH band hashes
    * ``anchors``: bottom-k shingle hashes (containment-pass blocking keys)
    """

    def __init__(self, cfg: DedupConfig | None = None):
        self.cfg = cfg or DedupConfig()
        self.hasher = MinHasher(self.cfg.num_perm, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = normalize(batch["content"]).to_pylist()
        n = len(texts)
        sigs = np.empty((n, cfg.num_perm), np.uint64)
        n_shingles = np.empty(n, np.int64)
        anchors: list[list[int]] = []
        for i, t in enumerate(texts):
            if t is None or len(t) < cfg.min_doc_chars:
                shingles = np.empty(0, np.uint64)
            else:
                shingles = token_shingles_hashed(t, cfg.shingle_k)
            n_shingles[i] = shingles.size
            sigs[i] = self.hasher.signature(shingles)
            anchors.append(
                shingles[: cfg.containment_anchors].astype(np.int64).tolist()
            )
        bands = band_hashes(sigs, cfg.num_bands)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64)), cfg.num_perm
        )
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1)), cfg.num_bands
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_shingles": pa.array(n_shingles),
                "sig": sig_col,
                "bands": band_col,
                "anchors": pa.array(anchors, pa.list_(pa.int64())),
            }
        )


def explode_bands(batch: pa.Table) -> pa.Table:
    """(doc_id, bands[list]) → one row per (band_id, band_hash, doc_id).
    Skips empty docs (n_shingles == 0) — they never produce candidates."""
    num_bands = batch["bands"].type.list_size
    mask = np.asarray(batch["n_shingles"]) > 0
    doc_ids = np.asarray(batch["doc_id"])[mask]
    bands = np.asarray(
        batch["bands"].combine_chunks().flatten()
    ).reshape(-1, num_bands)[mask]
    n = len(doc_ids)
    return pa.table(
        {
            "band_id": np.tile(np.arange(num_bands, dtype=np.int32), n),
            "band_hash": bands.reshape(-1),
            "doc_id": np.repeat(doc_ids, num_bands),
        }
    )


def emit_bucket_pairs(cap: int):
    """map_groups body over (band_id, band_hash) buckets → candidate
    edges (a, b), a < b.

    Skew guard (SURVEY.md §7.5): a bucket of b docs normally emits all
    C(b,2) pairs; buckets larger than ``cap`` (boilerplate license
    files) emit a chain + star over the sorted doc ids — O(2b) edges
    whose transitive closure under union-find preserves connectivity
    when members verify (which near-identical boilerplate does). This
    caps worst-case pair volume at the cost of recall only for buckets
    that mix dissimilar docs above the cap size.
    """

    def _pairs(table: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(table["doc_id"]))
        b = len(ids)
        if b < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if b <= cap:
            ai, bi = np.triu_indices(b, k=1)
            return pa.table({"a": ids[ai], "b": ids[bi]})
        rep = ids[0]
        chain_a, chain_b = ids[:-1], ids[1:]
        star_b = ids[1:]
        a = np.concatenate([chain_a, np.full(len(star_b), rep)])
        bb = np.concatenate([chain_b, star_b])
        keep = a != bb
        return pa.table({"a": a[keep], "b": bb[keep]})

    _pairs.__name__ = "emit_bucket_pairs"
    return _pairs
