"""Near-duplicate clustering pipeline — the north-star tier.

    corpus → map_batches(MinHash signer; task pool with a
             per-worker-process state cache, or actor pool)  [stateful]
           → flat_map band rows → groupby(band, hash)      [shuffle]
           → capped candidate pairs → signature verify
           → (+ suffix-array containment pass)             [shuffle]
           → union-find → (doc_id, cluster_id)

Skew handling: oversized LSH buckets emit chain+star edge sets
(``emit_bucket_pairs``); per-bucket sizes are collected into the
metrics dict (histogram + top-k) so skew is observable, not silent
(BASELINE.json north_rule "per-partition throughput/skew metrics").

Union-find runs on the driver: the verified edge list is orders of
magnitude smaller than the corpus. The 10^12-scale upgrade path
(iterative min-label propagation / BTS) is documented in
``state/union_find.py`` behind the same API.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.suffixarray import SuffixArray
from cloud_dedup_ray.functions.text import normalize
from cloud_dedup_ray.stages import coarse
from cloud_dedup_ray.stages.minhash_stage import (
    MinHashSigner,
    add_bucket_partition,
    bucket_pairs_arrays,
    emit_bucket_pairs,
    explode_bands,
    make_sign_fn,
)
from cloud_dedup_ray.state.union_find import UnionFind


# shared task-wave helpers (stages/blockscan.py); aliased to keep the
# established local names
from cloud_dedup_ray.stages.blockscan import (  # noqa: E402
    coalesce_small_blocks as _coalesce_small_blocks,
    exchange_blocks as _exchange_blocks,
    is_materialized as _is_materialized,
    scan_blocks as _scan_blocks,
)


def _split_by_partition(
    part: np.ndarray, num_partitions: int, *cols: np.ndarray
) -> list[tuple[np.ndarray, ...]]:
    """Map-side split for a flat exchange: stable-sort rows by partition
    id and slice each column into ``num_partitions`` contiguous views.
    (Thin wrapper over the shared ``_split_with_indices`` kernel.)"""
    _, idx_parts = _split_with_indices(part, num_partitions, part)
    return [tuple(c[sel] for c in cols) for sel in idx_parts]


def _collect_edges_flat(
    signed: ray.data.Dataset, cfg: DedupConfig, num_parts: int
) -> tuple[np.ndarray, np.ndarray, dict[int, int]]:
    """Flat-task form of the banding shuffle + edge collection: one
    exchange_blocks round (explode bands → hash-split by bucket_key →
    per-partition ``bucket_pairs_arrays``) instead of a Dataset
    groupby job + iter_batches round trip. Emits the identical edge set
    (same kernel, same per-bucket semantics — tested equivalent); used
    when the run is not checkpointing the bucket stage and B × P stays
    bounded (see ``cluster_corpus``)."""
    cap = cfg.bucket_pair_cap
    P = num_parts

    def _map(t: pa.Table):
        if t.num_rows == 0 or "bands" not in t.schema.names:
            e = np.empty(0, np.int64)
            return [(e, e)] * P
        rows = explode_bands(t)
        key = np.asarray(rows["bucket_key"], np.int64)
        ids = np.asarray(rows["doc_id"], np.int64)
        part = (key.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return _split_by_partition(part, P, key, ids)

    def _reduce(*parts):
        bk = np.concatenate([p[0] for p in parts])
        ids = np.concatenate([p[1] for p in parts])
        return bucket_pairs_arrays(bk, ids, cap)

    results = _exchange_blocks(signed, _map, _reduce, P)
    hist: dict[int, int] = {}
    a_parts, b_parts = [], []
    for pa_a, pa_b, size_vals, size_counts in results:
        a_parts.append(pa_a)
        b_parts.append(pa_b)
        for s, c in zip(size_vals.tolist(), size_counts.tolist()):
            hist[s] = hist.get(s, 0) + c
    if not a_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64), {}
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    if a.size:
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = pairs[:, 0], pairs[:, 1]
    return a, b, hist


@dataclass
class NearDupResult:
    #: Dataset of (doc_id, cluster_id); singletons keep cluster_id == doc_id
    assignments: ray.data.Dataset
    #: verified (a, b) edges — LSH + containment
    n_edges: int
    n_clusters: int
    metrics: dict = field(default_factory=dict)


def _collect_edges_and_sizes(
    pair_rows: ray.data.Dataset,
) -> tuple[np.ndarray, np.ndarray, dict[int, int]]:
    """Stream the pair/metrics rows to the driver: → (a, b, size_hist)
    with duplicate edges removed (different bands produce repeats).
    Histogram marker rows are (a = −1, b = count, bucket_size = size)."""
    a_parts, b_parts = [], []
    hist: dict[int, int] = {}
    for t in pair_rows.iter_batches(batch_format="pyarrow"):
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        sz = np.asarray(t["bucket_size"], np.int64)
        marker = a == -1
        a_parts.append(a[~marker])
        b_parts.append(b[~marker])
        for s, c in zip(sz[marker], b[marker]):
            hist[int(s)] = hist.get(int(s), 0) + int(c)
    if not a_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64), {}
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    if a.size:
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = pairs[:, 0], pairs[:, 1]
    return a, b, hist


def _hist_stats(hist: dict[int, int]) -> dict:
    """Skew metrics from a bucket-size histogram: total buckets, max,
    weighted p99, and the 10 largest bucket sizes (with multiplicity)."""
    if not hist:
        return {"lsh_buckets": 0, "lsh_bucket_max": 0, "lsh_bucket_p99": 0.0,
                "lsh_top10_buckets": []}
    sizes = np.fromiter(hist.keys(), np.int64, len(hist))
    counts = np.fromiter((hist[int(s)] for s in sizes), np.int64, len(hist))
    order = np.argsort(sizes)
    sizes, counts = sizes[order], counts[order]
    total = int(counts.sum())
    cum = np.cumsum(counts)
    p99 = float(sizes[np.searchsorted(cum, 0.99 * total)])
    top: list[int] = []
    for s, c in zip(sizes[::-1], counts[::-1]):
        top.extend([int(s)] * min(int(c), 10 - len(top)))
        if len(top) >= 10:
            break
    return {
        "lsh_buckets": total,
        "lsh_bucket_max": int(sizes[-1]),
        "lsh_bucket_p99": p99,
        "lsh_top10_buckets": top,
    }


def _fetch_signatures(
    signed: ray.data.Dataset, wanted: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Semi-join the signatures of ``wanted`` doc_ids out of ``signed``
    (broadcast id-array ``np.isin`` filter) → (ids, sigs) sorted by id.
    Task wave over block refs when materialized, Dataset job otherwise.

    This is the SMALL-side path only: both call sites (``_verify_edges``
    and the containment signature screen) switch to the partitioned
    pairs × signatures hash join (``_estimate_pairs_distributed``) when
    the candidate id set exceeds ``cfg.distributed_estimate_threshold``
    — above that, broadcasting ``wanted`` and returning the gathered
    matrix to the driver would be the scale-killer. Equivalence of the
    two branches is forced-path tested
    (tests/test_neardup.py::test_distributed_estimate_matches_driver_path,
    threshold=0 with containment on)."""
    cand_ref = ray.put(wanted)

    def _sig_block(t: pa.Table, want: np.ndarray):
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            e = np.empty(0, np.int64)
            return e, np.empty((0, 1), np.uint64)
        ids = np.asarray(t["doc_id"], np.int64)
        mask = np.isin(ids, want)
        col = t["sig"].combine_chunks()
        num_perm = col.type.list_size
        sigs = np.asarray(col.flatten()).reshape(-1, num_perm)
        return ids[mask], sigs[mask]

    id_parts: list[np.ndarray] = []
    sig_parts: list[np.ndarray] = []
    if _is_materialized(signed):
        # blocks are in the object store → flat task wave, no Dataset job
        for ids_part, sig_part in _scan_blocks(signed, _sig_block, cand_ref):
            if ids_part.size:
                id_parts.append(ids_part)
                sig_parts.append(sig_part)
    else:

        def _sig_filter(t: pa.Table) -> pa.Table:
            want = ray.get(cand_ref)
            mask = np.isin(np.asarray(t["doc_id"], np.int64), want)
            return t.filter(pa.array(mask)).select(["doc_id", "sig"])

        for bt in signed.map_batches(
            _sig_filter, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if bt.num_rows == 0:
                continue
            id_parts.append(np.asarray(bt["doc_id"], np.int64))
            num_perm = bt["sig"].type.list_size
            sig_parts.append(
                np.asarray(bt["sig"].combine_chunks().flatten()).reshape(-1, num_perm)
            )
    if not id_parts:
        return np.empty(0, np.int64), np.empty((0, 1), np.uint64)
    all_ids = np.concatenate(id_parts)
    all_sigs = np.concatenate(sig_parts)
    order = np.argsort(all_ids)
    return all_ids[order], np.take(all_sigs, order, axis=0)


def _estimate_pair_jaccard(
    all_ids: np.ndarray, all_sigs: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Signature-estimated Jaccard per (a, b) pair against an id-sorted
    signature matrix. np.take, chunked: numpy's 2D fancy-indexing gather
    takes a slow element-wise path (~30× slower than take on this
    workload), and chunking bounds the (pairs × num_perm) temporaries."""
    est = np.empty(len(a), np.float64)
    # ids absent from the signature matrix estimate as -1 (rejected) —
    # without the guard searchsorted's insertion point would score the
    # pair against an unrelated doc's signature (or np.take would raise
    # past the end). Mirrors the distributed twin's missing-id handling.
    if not len(all_ids):
        est[:] = -1.0
        return est
    hi = len(all_ids) - 1
    idx_a = np.searchsorted(all_ids, a).clip(0, hi)
    idx_b = np.searchsorted(all_ids, b).clip(0, hi)
    found = (all_ids[idx_a] == a) & (all_ids[idx_b] == b)
    # small chunk + preallocated gather buffers: on this lazily-backed
    # VM a fresh worker faults new pages at ~100 MB/s, so a 1<<17 chunk
    # (2 × 134 MB of temporaries per iteration, fresh each time) cost
    # seconds of fault time per task; a 16k chunk reusing the SAME
    # buffers faults ~33 MB once and runs warm thereafter
    chunk = 1 << 14
    n_perm = all_sigs.shape[1]
    k0 = min(chunk, len(a))
    buf_a = np.empty((k0, n_perm), all_sigs.dtype)
    buf_b = np.empty((k0, n_perm), all_sigs.dtype)
    for i in range(0, len(a), chunk):
        k = min(chunk, len(a) - i)
        sa = np.take(all_sigs, idx_a[i : i + k], axis=0, out=buf_a[:k])
        sb = np.take(all_sigs, idx_b[i : i + k], axis=0, out=buf_b[:k])
        est[i : i + k] = (sa == sb).mean(axis=1)
    est[~found] = -1.0
    return est


def _estimate_pairs_distributed(
    signed: ray.data.Dataset,
    a: np.ndarray,
    b: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    num_parts: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed signature-estimate for candidate pairs — the scale
    form of ``_fetch_signatures`` + ``_estimate_pair_jaccard``: a
    partitioned hash join of pairs × signatures on doc_id, as three flat
    task waves (signatures hash-split out of the signed blocks and kept
    in the object store; pairs routed by hash(a) to pick up sig_a, then
    re-routed by hash(b) to pick up sig_b and estimate). The driver
    never holds a signature; per-task memory is one hash partition of
    the signature matrix plus its pairs. Returns
    ``(accepted, uncertain)`` pair arrays: accepted where est ≥ hi[i],
    uncertain where lo[i] ≤ est < hi[i] (pass lo == hi for a pure
    accept/reject screen). Pair ids missing from ``signed`` estimate as
    rejected."""
    P = num_parts

    def _hash_part(ids: np.ndarray) -> np.ndarray:
        return (ids.view(np.uint64) % np.uint64(P)).astype(np.int64)

    def _sig_split(t: pa.Table):
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            e = np.empty(0, np.int64)
            s = np.empty((0, 1), np.uint64)
            return [(e, s)] * P
        ids = np.asarray(t["doc_id"], np.int64)
        col = t["sig"].combine_chunks()
        num_perm = col.type.list_size
        sigs = np.asarray(col.flatten()).reshape(-1, num_perm)
        out = []
        for pids, in_idx in zip(
            *_split_with_indices(_hash_part(ids), P, ids)
        ):
            out.append((pids, np.take(sigs, in_idx, axis=0)))
        return out

    def _sig_consolidate(*parts):
        # drop zero-row parts: empty/schema-less blocks emit a (0, 1)
        # placeholder whose width must not join the concatenate
        live = [p for p in parts if len(p[0])]
        if not live:
            return np.empty(0, np.int64), np.empty((0, 1), np.uint64)
        ids = np.concatenate([p[0] for p in live])
        sigs = np.concatenate([p[1] for p in live])
        order = np.argsort(ids)
        return ids[order], np.take(sigs, order, axis=0)

    refs = signed.to_arrow_refs()
    splitter = ray.remote(num_cpus=1, num_returns=P)(_sig_split)
    waves = [splitter.remote(r) for r in refs]
    consolidate = ray.remote(num_cpus=1)(_sig_consolidate)
    # per-partition (ids_sorted, sig_matrix) — stays in the object store
    sig_parts = [consolidate.remote(*[w[p] for w in waves]) for p in range(P)]

    def _attach_a(sig_part, pa_, pb, plo, phi):
        ids_s, sigs_s = sig_part
        idx = np.searchsorted(ids_s, pa_).clip(0, max(len(ids_s) - 1, 0))
        found = ids_s[idx] == pa_ if len(ids_s) else np.zeros(len(pa_), bool)
        pa_, pb, plo, phi, idx = (
            pa_[found], pb[found], plo[found], phi[found], idx[found]
        )
        sa = np.take(sigs_s, idx, axis=0)
        part = _hash_part(pb)
        order = np.argsort(part, kind="stable")
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [
            (
                pa_[order[l:h]], pb[order[l:h]], plo[order[l:h]],
                phi[order[l:h]], np.take(sa, order[l:h], axis=0),
            )
            for l, h in zip(bounds[:-1], bounds[1:])
        ]

    def _finish(sig_part, *slices):
        ids_s, sigs_s = sig_part
        # drop zero-row slices: an empty source partition hands _attach_a a
        # (0, 1) signature placeholder, so its slices carry width-1 ``sa``
        # arrays that must not join the concatenate with (k, num_perm) ones
        live = [s for s in slices if len(s[0])]
        if not live:
            empty = np.empty((0, 2), np.int64)
            return empty, empty
        pa_ = np.concatenate([s[0] for s in live])
        pb = np.concatenate([s[1] for s in live])
        plo = np.concatenate([s[2] for s in live])
        phi = np.concatenate([s[3] for s in live])
        sa = np.concatenate([s[4] for s in live])
        idx = np.searchsorted(ids_s, pb).clip(0, max(len(ids_s) - 1, 0))
        found = ids_s[idx] == pb if len(ids_s) else np.zeros(len(pb), bool)
        est = np.full(len(pb), -1.0)
        if found.any():
            sb = np.take(sigs_s, idx[found], axis=0)
            est[found] = (sa[found] == sb).mean(axis=1)
        acc = est >= phi
        unc = (~acc) & (est >= plo)
        return (
            np.stack([pa_[acc], pb[acc]], axis=1) if acc.any() else np.empty((0, 2), np.int64),
            np.stack([pa_[unc], pb[unc]], axis=1) if unc.any() else np.empty((0, 2), np.int64),
        )

    part_a = _hash_part(a)
    order = np.argsort(part_a, kind="stable")
    bounds = np.searchsorted(part_a[order], np.arange(P + 1))
    attach = ray.remote(num_cpus=1, num_returns=P)(_attach_a)
    wave2 = []
    for p, (l, h) in enumerate(zip(bounds[:-1], bounds[1:])):
        sl = order[l:h]
        wave2.append(
            attach.remote(sig_parts[p], a[sl], b[sl], lo[sl], hi[sl])
        )
    finisher = ray.remote(num_cpus=1)(_finish)
    results = ray.get(
        [
            finisher.remote(sig_parts[q], *[wave2[p][q] for p in range(P)])
            for q in range(P)
        ]
    )
    acc = np.concatenate([r[0] for r in results]) if results else np.empty((0, 2), np.int64)
    unc = np.concatenate([r[1] for r in results]) if results else np.empty((0, 2), np.int64)
    return acc, unc


def _split_with_indices(
    part: np.ndarray, num_partitions: int, ids: np.ndarray
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Split ``ids`` by partition id, also returning the source indices
    of each slice (for gathering aligned 2-D payloads with np.take)."""
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(num_partitions + 1))
    id_parts, idx_parts = [], []
    for lo_, hi_ in zip(bounds[:-1], bounds[1:]):
        sel = order[lo_:hi_]
        id_parts.append(ids[sel])
        idx_parts.append(sel)
    return id_parts, idx_parts


def _verify_edges(
    a: np.ndarray,
    b: np.ndarray,
    signed: ray.data.Dataset,
    corpus: ray.data.Dataset,
    cfg: DedupConfig,
) -> tuple[list[tuple[int, int]], dict]:
    """Hybrid candidate verification.

    Tier 1 (free): signature-estimated Jaccard. Estimates clearly above
    threshold (≥ thr + margin) are accepted, clearly below
    (< thr − margin) rejected. Tier 2: the uncertain band — where the
    ±1σ·z estimator noise could flip the decision — is re-checked with
    EXACT shingle Jaccard over the normalized content (distributed
    chunked tasks). This makes the threshold decision exact while
    keeping the expensive path proportional to borderline pairs only.

    Signatures of candidate docs are semi-joined out of ``signed``
    (broadcast id-array ``np.isin`` filter). Scale path: partitioned
    hash join of edges × signatures on doc_id (same code shape, no
    broadcast).
    """
    if len(a) == 0:
        return [], {"n_candidates": 0, "n_verified": 0, "n_exact_checked": 0}
    t0 = time.perf_counter()
    margin = cfg.verify_margin
    cand_ids = np.unique(np.concatenate([a, b]))
    if len(cand_ids) > cfg.distributed_estimate_threshold:
        # scale path: partitioned hash join of pairs × signatures —
        # driver never holds the signature matrix. Fetch and estimate are
        # fused inside the join, so report one combined metric instead of
        # a fetch/estimate split that would misattribute the wall time.
        acc_pairs, unc_pairs = _estimate_pairs_distributed(
            signed, a, b,
            np.full(len(a), cfg.jaccard_threshold - margin),
            np.full(len(a), cfg.jaccard_threshold + margin),
        )
        verified = list(map(tuple, acc_pairs.tolist()))
        uncertain_list = list(map(tuple, unc_pairs.tolist()))
        t_est = time.perf_counter()
        timing = {"sec_verify_join": round(t_est - t0, 3)}
    else:
        all_ids, all_sigs = _fetch_signatures(signed, cand_ids)
        t_fetch = time.perf_counter()
        est = _estimate_pair_jaccard(all_ids, all_sigs, a, b)
        accept = est >= cfg.jaccard_threshold + margin
        uncertain = (~accept) & (est >= cfg.jaccard_threshold - margin)
        verified = list(zip(a[accept].tolist(), b[accept].tolist()))
        uncertain_list = list(zip(a[uncertain].tolist(), b[uncertain].tolist()))
        t_est = time.perf_counter()
        timing = {
            "sec_verify_sig_fetch": round(t_fetch - t0, 3),
            "sec_verify_estimate": round(t_est - t_fetch, 3),
        }
    n_exact = len(uncertain_list)
    if n_exact:
        exact_ok = _exact_jaccard_edges(corpus, uncertain_list, cfg)
        verified.extend(exact_ok)
    return verified, {
        "n_candidates": len(a),
        "n_verified": len(verified),
        "n_exact_checked": n_exact,
        **timing,
        "sec_verify_exact": round(time.perf_counter() - t_est, 3),
    }


def _routed_text_exchange(
    corpus: ray.data.Dataset,
    chunk_needs: list[np.ndarray],
    reduce_fn,
    reduce_extra: list,
    col: str = "content",
) -> list:
    """Store-to-store normalized-text routing: partition P's verifier
    needs the docs in ``chunk_needs[P]``. One flat exchange over the
    corpus blocks selects + normalizes each needed doc ONCE per block,
    splits the rows by destination partition (a doc pair-listed in k
    partitions ships k times — k is small and bounded by the chunking),
    and runs ``reduce_fn(*text_tables, reduce_extra[P])`` per partition.
    The driver never touches text — it sees only the reduce results
    (edge lists), which removes the fetch-to-driver + re-pickle-per-chunk
    round trip that made the old path driver-bandwidth-bound."""
    route_ids = np.concatenate(chunk_needs)
    route_parts = np.concatenate(
        [np.full(len(n), p, np.int64) for p, n in enumerate(chunk_needs)]
    )
    order = np.argsort(route_ids, kind="stable")
    route_ids, route_parts = route_ids[order], route_parts[order]
    P = len(chunk_needs)
    route_ref = ray.put((route_ids, route_parts))

    def _map(t: pa.Table):
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "norm": pa.array([], pa.string())}
        )
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return [empty] * P
        rids, rparts = ray.get(route_ref)
        ids = np.asarray(t["doc_id"], np.int64)
        lo = np.searchsorted(rids, ids)
        hi = np.searchsorted(rids, ids, side="right")
        sel_mask = hi > lo
        if not sel_mask.any():
            return [empty] * P
        sel = t.filter(pa.array(sel_mask))
        norm = normalize(sel[col].combine_chunks())
        sids = ids[sel_mask]
        lo, hi = lo[sel_mask], hi[sel_mask]
        row_idx = np.repeat(np.arange(len(sids)), hi - lo)
        flat = (
            np.concatenate([rparts[a:b] for a, b in zip(lo, hi)])
            if len(sids)
            else np.empty(0, np.int64)
        )
        o = np.argsort(flat, kind="stable")
        bounds = np.searchsorted(flat[o], np.arange(P + 1))
        out = []
        for p in range(P):
            sl = o[bounds[p] : bounds[p + 1]]
            if sl.size == 0:
                out.append(empty)
                continue
            ridx = row_idx[sl]
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(sids[ridx], pa.int64()),
                        "norm": norm.take(pa.array(ridx, pa.int64())),
                    }
                )
            )
        return out

    return _exchange_blocks(corpus, _map, reduce_fn, P, reduce_extra=reduce_extra)


def _docs_of_tables(parts) -> dict[int, str]:
    """Assemble a doc_id → normalized-text dict from routed text tables."""
    docs: dict[int, str] = {}
    for tb in parts:
        if tb.num_rows:
            docs.update(
                zip(
                    tb["doc_id"].to_pylist(),
                    (s or "" for s in tb["norm"].to_pylist()),
                )
            )
    return docs


def _exact_jaccard_edges(
    corpus: ray.data.Dataset,
    pairs: list[tuple[int, int]],
    cfg: DedupConfig,
) -> list[tuple[int, int]]:
    """Exact shingle-Jaccard check for borderline pairs: the pair list is
    chunked, each chunk's normalized texts are routed store-to-store to
    its verify task (``_routed_text_exchange``), each doc is shingled
    once per task, pairs intersected vectorized. No text ever lands on
    the driver."""
    from cloud_dedup_ray.functions.minhash import exact_jaccard
    from cloud_dedup_ray.functions.text import TokenHashCache, token_shingles_hashed

    shingle_k, thr, min_chars = cfg.shingle_k, cfg.jaccard_threshold, cfg.min_doc_chars

    def _check(*args) -> list[tuple[int, int]]:
        *parts, chunk = args
        docs = _docs_of_tables(parts)
        cache = TokenHashCache()
        sh: dict[int, np.ndarray] = {}
        out = []
        for x, y in chunk:
            for d in (x, y):
                if d not in sh:
                    t = docs.get(d, "")
                    sh[d] = (
                        token_shingles_hashed(t, shingle_k, cache)
                        if len(t) >= min_chars
                        else np.empty(0, np.uint64)
                    )
            if sh[x].size and sh[y].size and exact_jaccard(sh[x], sh[y]) >= thr:
                out.append((x, y))
        return out

    chunk_size = max(64, len(pairs) // 32)
    chunks = [pairs[i : i + chunk_size] for i in range(0, len(pairs), chunk_size)]
    needs = [
        np.unique(np.asarray([d for p in c for d in p], np.int64)) for c in chunks
    ]
    out: list[tuple[int, int]] = []
    for res in _routed_text_exchange(corpus, needs, _check, chunks):
        out.extend(res)
    return out


def containment_edges(
    corpus: ray.data.Dataset,
    signed: ray.data.Dataset,
    cfg: DedupConfig,
    precomp: dict[int, int] | None = None,
    metrics_out: dict | None = None,
) -> list[tuple[int, int]]:
    """Suffix-array containment pass: block docs on shared bottom-k
    shingle anchors, then verify exact substring containment per group
    with a suffix array over the larger doc.

    Recall: if A ⊆ B, every shingle of A is in B, so an anchor of B
    falls in A with probability ≈ k·|A|/|B| — high for substantial
    containment, and the exact tier already catches |A| == |B|.

    ``precomp`` (doc → cluster from the LSH tier) prunes the pass:
    members already in one cluster are collapsed to a single
    representative, and groups that collapse to <2 representatives are
    skipped before any text is fetched — this removes boilerplate
    clusters (all mutually near-identical) from the suffix-array work
    entirely.
    """
    groups = _containment_discover_groups(signed, cfg, metrics_out)
    return _containment_verify(corpus, signed, cfg, groups, precomp, metrics_out)


def _anchor_groups_arrays(
    anc: np.ndarray, ids: np.ndarray, cap: int
) -> dict[int, np.ndarray]:
    """Anchor-group kernel over ONE partition's (anchor, doc_id) rows:
    member groups of size 2..cap per distinct anchor, PACKED by size —
    {size s: (k, s) int64 matrix of ascending member rows}. Shared by
    the Dataset and flat-exchange discovery forms (identical groups).
    The packed form is the driver-memory contract: groups never
    materialize as Python tuples, only as int64 matrices."""
    if anc.size == 0:
        return {}
    # vectorized group-by-size (same shape as the LSH bucket-pair
    # kernel): one lexsort dedups (anchor, id) rows and yields each
    # anchor's sorted-unique member run; equal-size groups pack into
    # one (k, s) gather per distinct size
    order = np.lexsort((ids, anc))
    ka, ki = anc[order], ids[order]
    first = np.empty(ka.size, bool)
    first[0] = True
    first[1:] = (ka[1:] != ka[:-1]) | (ki[1:] != ki[:-1])
    ua, ui = ka[first], ki[first]
    astart = np.empty(ua.size, bool)
    astart[0] = True
    astart[1:] = ua[1:] != ua[:-1]
    starts = np.flatnonzero(astart)
    sizes = np.diff(np.append(starts, ua.size))
    out: dict[int, np.ndarray] = {}
    for v in np.unique(sizes):
        v = int(v)
        if not 2 <= v <= cap:
            continue
        mat = ui[starts[sizes == v][:, None] + np.arange(v)]
        out[v] = np.unique(mat, axis=0)
    return out


def _merge_group_mats(
    parts: list[dict[int, np.ndarray]]
) -> dict[int, np.ndarray]:
    """Union of packed group dicts with global per-size dedup (the same
    member set can arise from different anchors in different
    partitions)."""
    merged: dict[int, list[np.ndarray]] = {}
    for p in parts:
        for s, mat in p.items():
            if len(mat):
                merged.setdefault(s, []).append(mat)
    return {
        s: np.unique(np.vstack(mats), axis=0) for s, mats in merged.items()
    }


def _n_groups(groups: dict[int, np.ndarray]) -> int:
    return sum(len(m) for m in groups.values())


def _explode_anchor_arrays(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    col = t["anchors"].combine_chunks()
    flat = np.asarray(col.flatten(), np.int64)
    lens = np.asarray(pa.compute.list_value_length(col), np.int64)
    ids = np.repeat(np.asarray(t["doc_id"], np.int64), lens)
    return flat, ids


def _containment_discover_groups(
    signed: ray.data.Dataset,
    cfg: DedupConfig,
    metrics_out: dict | None = None,
    flat: bool = False,
) -> dict[int, np.ndarray]:
    """Anchor-group discovery (the shuffle half of the containment
    pass): docs sharing a bottom-k shingle anchor, capped at
    ``bucket_pair_cap`` members. Independent of the LSH verify results,
    so ``cluster_corpus`` overlaps this shuffle with edge collection +
    verification; the cluster-representative pruning happens afterwards
    on the driver (see ``_containment_verify``) with identical results.

    Returns groups PACKED by size — {s: (k, s) int64 matrix of
    ascending, deduped member rows}. The driver never holds groups as
    Python tuples (8 B/int packed vs ~100 B/int boxed), the same
    bounded-driver contract as the candidate-pair arrays.

    ``flat=True`` runs the same exchange as flat task waves over the
    materialized signed blocks (see ``_collect_edges_flat``)."""
    cap = cfg.bucket_pair_cap
    t0 = time.perf_counter()

    if flat:
        P = 64

        def _map(t: pa.Table):
            if t.num_rows == 0 or "anchors" not in t.schema.names:
                e = np.empty(0, np.int64)
                return [(e, e)] * P
            flat_anc, ids = _explode_anchor_arrays(t)
            part = coarse.int_partition(flat_anc, P).astype(np.int64)
            return _split_by_partition(part, P, flat_anc, ids)

        def _reduce(*parts):
            anc = np.concatenate([p[0] for p in parts])
            ids = np.concatenate([p[1] for p in parts])
            return _anchor_groups_arrays(anc, ids, cap)

        groups = _merge_group_mats(_exchange_blocks(signed, _map, _reduce, P))
        if metrics_out is not None:
            metrics_out["n_groups_raw"] = _n_groups(groups)
            metrics_out["sec_cont_groups"] = round(time.perf_counter() - t0, 3)
        return groups

    def _explode_anchors(t: pa.Table) -> pa.Table:
        flat_anc, ids = _explode_anchor_arrays(t)
        return pa.table({"anchor": flat_anc, "doc_id": ids})

    anchors = signed.map_batches(_explode_anchors, batch_format="pyarrow")

    # candidate groups: docs sharing an anchor (drop singleton anchors).
    # Coarse-partitioned: anchors are near-unique, so a per-anchor
    # map_groups would dominate on group overhead (stages/coarse.py).
    def _add_part(t: pa.Table) -> pa.Table:
        part = coarse.int_partition(np.asarray(t["anchor"], np.int64), 64)
        return t.append_column("__part", pa.array(part))

    def _group_ids(t: pa.Table) -> pa.Table:
        out = _anchor_groups_arrays(
            np.asarray(t["anchor"], np.int64),
            np.asarray(t["doc_id"], np.int64),
            cap,
        )
        rows = [m for s in sorted(out) for m in out[s]]
        return pa.table({"ids": pa.array(rows, pa.list_(pa.int64()))})

    _group_ids.__name__ = "anchor_group"
    # stream the group batches into packed per-size matrices — no
    # take_all of Python row dicts; each batch's list column is split
    # by length with vectorized gathers
    parts: list[dict[int, np.ndarray]] = []
    for bt in (
        anchors.map_batches(_add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_group_ids, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        col = bt["ids"].combine_chunks()
        flat_ids = np.asarray(col.flatten(), np.int64)
        lens = np.asarray(pa.compute.list_value_length(col), np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        packed: dict[int, np.ndarray] = {}
        for s in np.unique(lens):
            rows = np.flatnonzero(lens == s)
            idx = offs[rows][:, None] + np.arange(s)
            packed[int(s)] = flat_ids[idx]
        parts.append(packed)
    groups = _merge_group_mats(parts)
    if metrics_out is not None:
        metrics_out["n_groups_raw"] = _n_groups(groups)
        metrics_out["sec_cont_groups"] = round(time.perf_counter() - t0, 3)
    return groups


@ray.remote
def _screen_pairs_chunk(
    sig: tuple[np.ndarray, np.ndarray],
    a: np.ndarray,
    b: np.ndarray,
    cut: np.ndarray,
) -> np.ndarray:
    """Signature containment screen for one pair chunk: estimate the
    Jaccard of each (a, b) pair from the broadcast signature matrix and
    return the accept mask (est ≥ per-pair cut)."""
    sig_ids, sig_mat = sig
    return _estimate_pair_jaccard(sig_ids, sig_mat, a, b) >= cut


def _containment_verify(
    corpus: ray.data.Dataset,
    signed: ray.data.Dataset,
    cfg: DedupConfig,
    groups: list[tuple[int, ...]],
    precomp: dict[int, int] | None = None,
    metrics_out: dict | None = None,
) -> list[tuple[int, int]]:
    """Verification half of the containment pass: collapse group members
    to one representative per LSH cluster (``precomp``), ratio-prune,
    fetch normalized text for surviving pair members only, suffix-array
    check per big doc."""
    # NOTE: normalized content is fetched lazily AFTER candidate-group
    # pruning (filter → normalize, not normalize-all → filter), so the
    # normalize kernel runs only over docs that are members of some
    # candidate group.
    cont_metrics: dict = {}
    if precomp:
        pk = np.fromiter(precomp.keys(), np.int64, len(precomp))
        pv = np.fromiter(precomp.values(), np.int64, len(precomp))
        o = np.argsort(pk)
        pk_s, pv_s = pk[o], pv[o]
        # vectorized per size class: map members to their LSH cluster,
        # keep the min member per cluster per row (rows are ascending,
        # so a stable row-wise argsort by cluster puts it first), bucket
        # the surviving representative rows by rep count
        pruned_parts: list[dict[int, np.ndarray]] = []
        for s, mat in groups.items():
            if not len(mat):
                continue
            idx = np.searchsorted(pk_s, mat).clip(0, max(len(pk_s) - 1, 0))
            hit = pk_s[idx] == mat if len(pk_s) else np.zeros(mat.shape, bool)
            clusters = np.where(hit, pv_s[idx], mat)
            o2 = np.argsort(clusters, axis=1, kind="stable")
            cs = np.take_along_axis(clusters, o2, axis=1)
            ms = np.take_along_axis(mat, o2, axis=1)
            first = np.concatenate(
                [np.ones((len(mat), 1), bool), cs[:, 1:] != cs[:, :-1]],
                axis=1,
            )
            counts = first.sum(axis=1)
            part: dict[int, np.ndarray] = {}
            for r in np.unique(counts):
                if r < 2:
                    continue
                rows = counts == r
                reps = ms[rows][first[rows]].reshape(-1, int(r))
                reps.sort(axis=1)
                part[int(r)] = reps
            pruned_parts.append(part)
        groups = _merge_group_mats(pruned_parts)
    cont_metrics["n_groups"] = _n_groups(groups)
    if not cont_metrics["n_groups"]:
        if metrics_out is not None:
            metrics_out.update(cont_metrics)
        return []
    t0 = time.perf_counter()

    # ---- pair extraction + pruning --------------------------------------
    # The same doc pair recurs in up to ``containment_anchors`` groups →
    # dedup pairs globally. A contained pair with |A|/|B| ≥ τ has exact
    # Jaccard |A|/|B| ≥ τ and is the LSH tier's responsibility (banding
    # collision ≥ 0.9998 at τ with 32×4), so only pairs whose shingle
    # counts differ by more than the threshold ratio are suffix-checked.
    member_ids = np.unique(
        np.concatenate([m.reshape(-1) for m in groups.values()])
    )
    mem_ref = ray.put(member_ids)

    def _len_block(t: pa.Table, wanted: np.ndarray):
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            e = np.empty(0, np.int64)
            return e, e
        ids = np.asarray(t["doc_id"], np.int64)
        mask = np.isin(ids, wanted)
        return ids[mask], np.asarray(t["n_shingles"], np.int64)[mask]

    nsh: dict[int, int] = {}
    if _is_materialized(signed):
        for ids_part, len_part in _scan_blocks(signed, _len_block, mem_ref):
            nsh.update(zip(ids_part.tolist(), len_part.tolist()))
        cont_metrics["sec_cont_nsh"] = round(time.perf_counter() - t0, 3)
    else:

        def _len_filter(t: pa.Table) -> pa.Table:
            wanted = ray.get(mem_ref)
            mask = np.isin(np.asarray(t["doc_id"], np.int64), wanted)
            return t.filter(pa.array(mask)).select(["doc_id", "n_shingles"])

        for bt in signed.map_batches(
            _len_filter, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for d, n in zip(bt["doc_id"].to_pylist(), bt["n_shingles"].to_pylist()):
                nsh[d] = n

    # Pair extraction, vectorized by group size: groups of equal size s
    # stack into a (k, s) matrix and emit all k·C(s,2) pairs with two
    # fancy-index gathers — the per-pair Python loop this replaces was
    # ~10 s of serial driver time at 1M candidate pairs (a constant term
    # that capped scaling efficiency).
    ratio_cap = cfg.jaccard_threshold
    nsh_keys = np.fromiter(nsh.keys(), np.int64, len(nsh))
    nsh_vals = np.fromiter(nsh.values(), np.int64, len(nsh))
    ko = np.argsort(nsh_keys)
    nsh_keys, nsh_vals = nsh_keys[ko], nsh_vals[ko]

    def _counts_of(ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(nsh_keys, ids).clip(0, max(len(nsh_keys) - 1, 0))
        hit = nsh_keys[idx] == ids if len(nsh_keys) else np.zeros(len(ids), bool)
        return np.where(hit, nsh_vals[idx], 0)

    t_px = time.perf_counter()
    xs_parts, ys_parts = [], []
    for s, mat in groups.items():  # already packed (k, s) per size
        ii, jj = np.triu_indices(s, k=1)
        xs_parts.append(mat[:, ii].reshape(-1))
        ys_parts.append(mat[:, jj].reshape(-1))
    xs = np.concatenate(xs_parts)
    ys = np.concatenate(ys_parts)
    nx, ny = _counts_of(xs), _counts_of(ys)
    # orient (small, big) by shingle count, prune empties and pairs the
    # LSH tier owns (ratio ⇒ J ≥ τ if contained)
    keep = (nx > 0) & (ny > 0) & (np.minimum(nx, ny) < ratio_cap * np.maximum(nx, ny))
    swap = nx > ny
    small = np.where(swap, ys, xs)[keep]
    big = np.where(swap, xs, ys)[keep]
    if small.size:
        pairs_arr = np.unique(np.stack([big, small], axis=1), axis=0)
    else:
        pairs_arr = np.empty((0, 2), np.int64)
    cont_metrics["n_cont_pairs"] = len(pairs_arr)
    cont_metrics["sec_cont_pairx"] = round(time.perf_counter() - t_px, 3)
    if not len(pairs_arr):
        if metrics_out is not None:
            metrics_out.update(cont_metrics)
        return []

    # ---- signature containment screen ------------------------------------
    # If small ⊆ big in shingle space (the same premise the anchor
    # blocking's recall argument rests on), the true Jaccard equals the
    # shingle-count ratio r = |small|/|big| exactly — so the signature
    # estimate of a genuinely contained pair concentrates at r (±
    # estimator noise ~sqrt(r(1−r)/num_perm)). Pairs whose estimate
    # falls more than ``containment_sig_margin`` below their own r
    # cannot be contained and are dropped BEFORE any text is fetched or
    # a suffix array is built. Pairs with r ≤ margin pass for free (no
    # pruning power there), so small-vs-huge pairs keep full recall.
    sig_margin = cfg.containment_sig_margin
    if sig_margin >= 0:
        pair_members = np.unique(pairs_arr)
        nb = _counts_of(pairs_arr[:, 0]).astype(np.float64)
        ns = _counts_of(pairs_arr[:, 1]).astype(np.float64)
        r = np.divide(ns, nb, out=np.zeros_like(ns), where=nb > 0)
        cut = r - sig_margin
        if len(pair_members) > cfg.distributed_estimate_threshold:
            # scale path: pure accept/reject screen (lo == hi) via the
            # partitioned pairs × signatures hash join; restore the
            # big-major row order the grouping below depends on
            acc, _ = _estimate_pairs_distributed(
                signed, pairs_arr[:, 0], pairs_arr[:, 1], cut, cut
            )
            pairs_arr = np.unique(acc, axis=0) if len(acc) else acc
        else:
            t_sf = time.perf_counter()
            sig_ids, sig_mat = _fetch_signatures(signed, pair_members)
            cont_metrics["sec_cont_sigfetch"] = round(
                time.perf_counter() - t_sf, 3
            )
            # the estimate itself is ~1.5 s of single-thread numpy at
            # ~200k pairs, but it runs while every core is busy with
            # the overlapped tiers, so the DRIVER thread is CPU-starved
            # (and pays first-touch faults on ~200 MB of temporaries:
            # measured 13.5 s driver-side vs 1.5 s as a scheduled
            # task). Chunked Ray tasks get real CPU slots and
            # parallelize the screen.
            sig_ref = ray.put((sig_ids, sig_mat))
            C = 16384
            masks = ray.get(
                [
                    _screen_pairs_chunk.remote(
                        sig_ref,
                        pairs_arr[i : i + C, 0],
                        pairs_arr[i : i + C, 1],
                        cut[i : i + C],
                    )
                    for i in range(0, len(pairs_arr), C)
                ]
            )
            pairs_arr = pairs_arr[np.concatenate(masks)]
            cont_metrics["sec_cont_screen"] = round(
                time.perf_counter() - t_sf
                - cont_metrics["sec_cont_sigfetch"], 3
            )
        cont_metrics["n_cont_pairs_screened"] = len(pairs_arr)
        if not len(pairs_arr):
            if metrics_out is not None:
                metrics_out.update(cont_metrics)
            return []

    # group by big doc so each suffix array is built exactly once
    # (pairs_arr is sorted by big — contiguous slices per big doc)
    bigs = pairs_arr[:, 0]
    bounds = np.flatnonzero(np.concatenate([[True], bigs[1:] != bigs[:-1]]))
    bounds = np.append(bounds, len(bigs))
    groups = [
        (int(bigs[lo]), tuple(np.sort(pairs_arr[lo:hi, 1]).tolist()))
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]

    # verification as one routed text exchange over CHUNKED (big, smalls)
    # work items: each chunk's normalized texts ship store-to-store to
    # its verify task (never through the driver), each big doc's suffix
    # array is built exactly once inside its task.
    def _verify_chunk(*args) -> list[tuple[int, int]]:
        *parts, chunk = args
        docs = _docs_of_tables(parts)
        out = []
        for big, smalls in chunk:
            bt = docs.get(big, "")
            if not bt:
                continue
            sa = None
            for small in smalls:
                st = docs.get(small, "")
                if not st or len(st) >= len(bt):
                    continue
                if sa is None:
                    sa = SuffixArray(bt)
                if sa.contains(st):
                    out.append((min(big, small), max(big, small)))
        return out

    cont_metrics["n_docs_fetched"] = len(
        np.unique(np.concatenate([pairs_arr[:, 0], pairs_arr[:, 1]]))
    )
    cont_metrics["sec_cont_fetch"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    # contiguous chunks over the big-sorted groups: all of one big doc's
    # pairs stay in one chunk (one suffix array), and a doc recurring
    # across chunks ships once per chunk (bounded duplication)
    n_chunks = min(64, len(groups))
    step = -(-len(groups) // n_chunks)
    chunks = [groups[i : i + step] for i in range(0, len(groups), step)]
    needs = [
        np.fromiter(
            sorted({d for big_doc, smalls in c for d in (big_doc, *smalls)}),
            np.int64,
        )
        for c in chunks
    ]
    edges: list[tuple[int, int]] = []
    for res in _routed_text_exchange(corpus, needs, _verify_chunk, chunks):
        edges.extend(res)
    cont_metrics["sec_cont_verify"] = round(time.perf_counter() - t0, 3)
    if metrics_out is not None:
        metrics_out.update(cont_metrics)
    return sorted(set(edges))


def sign_dataset(corpus: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    """The MinHash signing stage over Arrow batches.

    ``cfg.signer_mode`` picks the execution form: ``"task"`` (default)
    runs a plain task-pool ``map_batches`` whose signer state is cached
    per worker process (``stages/minhash_stage.make_sign_fn``) — Ray
    reuses task workers across executions, so repeated runs skip the
    per-run actor startup; ``"actor"`` is the classic stateful actor
    pool. Both produce byte-identical signatures (seeded state)."""
    if cfg.signer_mode == "task":
        return corpus.map_batches(
            make_sign_fn(cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            num_cpus=1,
        )
    return corpus.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.signer_concurrency,
        num_cpus=1,
    )


def cluster_corpus_resumable(
    corpus_dir: str,
    cfg: DedupConfig,
    num_partitions: int = 8,
    with_containment: bool = True,
    partition_by: str = "chunks",
) -> NearDupResult:
    """Near-dup clustering with PER-PARTITION signature checkpoints
    (north rule): the corpus' parquet files are split into
    ``num_partitions`` groups, each signed and checkpointed
    independently (``sig_part_NNNN/_lineage.json``), so a killed run
    resumes by re-signing only incomplete partitions. Per-partition
    rows/sec metrics are recorded in ``metrics["partitions"]``.

    ``partition_by="chunks"`` (default) slices the sorted file list into
    ``num_partitions`` groups; any file-set change shifts the mapping
    and invalidates every partition (safe, non-incremental).
    ``partition_by="file"`` checkpoints PER SHARD FILE with a stage name
    derived from the file name and a scope from its (size, mtime) — the
    incremental-ingest mode: appending new shard files to the corpus
    re-signs only the new files; modified files invalidate only
    themselves. ``num_partitions`` is ignored in file mode.
    """
    import glob as _glob

    from cloud_dedup_ray.sources.corpus import read_corpus
    from cloud_dedup_ray.stages.project import project_corpus
    from cloud_dedup_ray.state.checkpoint import StageCheckpoint

    assert cfg.checkpoint_dir, "cluster_corpus_resumable requires checkpoint_dir"
    ckpt = StageCheckpoint(cfg.checkpoint_dir, cfg.fingerprint())
    files = sorted(_glob.glob(os.path.join(corpus_dir, "*.parquet")))
    if not files:
        raise ValueError(
            f"no *.parquet corpus files found under {corpus_dir!r}"
        )
    if partition_by == "file":
        n_parts = len(files)
        groups = [[f] for f in files]
    else:
        n_parts = max(1, min(num_partitions, len(files)))
        groups = [list(g) for g in np.array_split(np.asarray(files), n_parts)]

    def _prep(paths: list[str]) -> ray.data.Dataset:
        # use_checksum=False: the near-dup tier never reads the content
        # sha/md5 columns, and computing them here would pay two full
        # cryptographic passes over the corpus for nothing
        return (
            project_corpus(
                read_corpus(paths),
                skip_hidden=cfg.skip_hidden,
                use_checksum=False,
                drop_content=False,
            )
            .filter(expr="is_symlink == False")
        )

    def _sign_partition(i: int, g: list[str]):
        if partition_by == "file":
            # file-stable identity: the stage name depends only on the
            # shard file name, the scope on its (size, mtime) — appended
            # corpus files leave existing checkpoints valid (incremental
            # ingest), a rewritten file invalidates only itself.
            base = os.path.basename(g[0])
            st = os.stat(g[0])
            stage = "sig_file_" + hashlib.sha256(base.encode()).hexdigest()[:12]
            # ns-resolution mtime plus inode and ctime close the rsync
            # quick-check blind spot: a shard rewritten in place with
            # preserved (size, coarse mtime) still invalidates — the
            # rewrite lands a new inode or at least a new ctime
            scope = hashlib.sha256(
                json.dumps(
                    {
                        "file": base,
                        "size": st.st_size,
                        "mtime_ns": st.st_mtime_ns,
                        "ino": st.st_ino,
                        "ctime_ns": st.st_ctime_ns,
                    }
                ).encode()
            ).hexdigest()[:16]
        else:
            stage = f"sig_part_{i:04d}"
            # Scope ties the checkpoint to this partition's exact file
            # slice: adding/removing corpus files or changing
            # num_partitions shifts the file→partition mapping and must
            # invalidate stale parts.
            scope = hashlib.sha256(
                json.dumps({"n_parts": n_parts, "files": g}).encode()
            ).hexdigest()[:16]
        tp = time.perf_counter()
        ds_part, was = ckpt.run(
            stage, lambda: sign_dataset(_prep(g), cfg), scope=scope
        )
        n_rows = ds_part.count()
        dt = time.perf_counter() - tp
        metric = {
            "partition": i,
            "n_files": len(g),
            "n_rows": n_rows,
            "sec": round(dt, 3),
            "rows_per_sec": round(n_rows / dt, 1) if dt > 0 else None,
            "resumed": was,
        }
        return ds_part, was, stage, metric

    # partitions sign CONCURRENTLY (bounded driver threads, one Dataset
    # job each — Ray shares the CPU pool): per-file mode over a
    # many-shard corpus would otherwise serialize n_files job launches
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, n_parts)) as pool:
        results = list(pool.map(lambda ig: _sign_partition(*ig), enumerate(groups)))
    parts = [r[0] for r in results]
    resumed: list[str] = [r[2] for r in results if r[1]]
    part_metrics: list[dict] = [r[3] for r in results]
    signed = parts[0]
    for p in parts[1:]:
        signed = signed.union(p)
    corpus = _prep(files).materialize()
    # identity of the WHOLE input: scopes the downstream (bucket) stage
    # checkpoints so a grown/changed corpus never reuses them
    corpus_scope = hashlib.sha256(
        json.dumps(
            [
                (
                    os.path.basename(f),
                    os.stat(f).st_size,
                    os.stat(f).st_mtime_ns,
                    os.stat(f).st_ino,
                )
                for f in files
            ]
        ).encode()
    ).hexdigest()[:16]
    res = cluster_corpus(
        corpus,
        cfg,
        with_containment=with_containment,
        signed=signed.materialize(),
        resumed_stages=resumed,
        input_scope=corpus_scope,
    )
    res.metrics["partitions"] = part_metrics
    return res


def _corpus_identity_scope(corpus: ray.data.Dataset) -> str:
    """Order-independent identity of a corpus Dataset for checkpoint
    scoping: row count + a wrap-around sum of a per-row COUPLED hash —
    splitmix64(doc_id ^ float64-bits(mtime) ^ sha256-prefix), folded per
    batch so only a few ints reach the driver. Coupling the fields
    inside one mixed value (rather than summing each column
    independently) means multiset-preserving edits — two files swapping
    content, compensating mtime touches — still change the scope, and
    using the raw float64 bit pattern keeps sub-second mtime changes
    visible. Any row added/removed/edited (with checksums on) or
    touched (mtime) changes the scope."""
    names = corpus.schema().names
    cols = ["doc_id"] + [c for c in ("mtime", "content_sha256") if c in names]

    M63 = (1 << 63) - 1  # keep every accumulator inside Arrow int64

    def fold(t: pa.Table) -> pa.Table:
        from cloud_dedup_ray.functions.hashing import splitmix64

        key = np.asarray(t["doc_id"], np.int64).view(np.uint64).copy()
        if "mtime" in t.schema.names:
            mt = np.nan_to_num(np.asarray(t["mtime"], np.float64))
            key ^= mt.view(np.uint64)
        if "content_sha256" in t.schema.names:
            sha = t["content_sha256"].to_pylist()
            key ^= np.array(
                [int(s[:16], 16) if s else 0 for s in sha], np.uint64
            )
        mixed = splitmix64(key)
        return pa.table(
            {
                "n": [t.num_rows],
                "mixsum": [int(mixed.sum(dtype=np.uint64)) & M63],
            }
        )

    totals: dict[str, int] = {}
    for bt in corpus.select_columns(cols).map_batches(
        fold, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        # iter_batches may coalesce several fold outputs into one
        # multi-row batch — fold over EVERY row, not just the first
        for c in bt.schema.names:
            totals[c] = (totals.get(c, 0) + sum(bt[c].to_pylist())) & M63
    return hashlib.sha256(
        json.dumps(totals, sort_keys=True).encode()
    ).hexdigest()[:16]


def cluster_corpus(
    corpus: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    with_containment: bool = True,
    signed: ray.data.Dataset | None = None,
    resumed_stages: list[str] | None = None,
    input_scope: str = "",
) -> NearDupResult:
    """Full near-dup clustering over a corpus Dataset that has
    ``doc_id:int64`` and ``content:string`` columns (symlink rows should
    be filtered out by the caller or carry empty content). Pass a
    pre-signed dataset (``signed``) to skip the signing stage — used by
    :func:`cluster_corpus_resumable`.

    Scale boundary (documented, by design): signatures, band/bucket
    rows, verification texts and the signature-estimate all stay in the
    object store; what the driver holds is the CANDIDATE-PAIR id arrays
    (16 bytes/pair, cap-bounded ≈ O(corpus) pairs) and the verified edge
    list. Component resolution above
    ``cfg.distributed_components_threshold`` edges runs as distributed
    label propagation. Pushing the pair arrays themselves to a Dataset
    would buy nothing here: every downstream consumer (union-find
    pruning, containment pair dedup) needs the global pair set once,
    and 10⁹ pairs ≈ 16 GB — a driver-RAM-bounded, not cluster-bounded,
    term."""
    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()
    ckpt = None
    resumed: list[str] = list(resumed_stages or [])
    if cfg.checkpoint_dir:
        from cloud_dedup_ray.state.checkpoint import StageCheckpoint

        ckpt = StageCheckpoint(cfg.checkpoint_dir, cfg.fingerprint())
        if not input_scope:
            # No caller-provided identity (direct call, e.g. CLI
            # directory mode): derive one from the corpus itself so a
            # re-run over CHANGED input never reuses stale signature /
            # bucket checkpoints (scope "" would always match).
            input_scope = _corpus_identity_scope(corpus)

    def _build_signed() -> ray.data.Dataset:
        return sign_dataset(corpus, cfg)

    if signed is not None:
        pass
    elif ckpt:
        signed, was = ckpt.run("signatures", _build_signed, scope=input_scope)
        signed = signed.materialize()
        if was:
            resumed.append("signatures")
    else:
        signed = _build_signed().materialize()
    # signed inherits the corpus's block structure; tiny blocks make the
    # banding sort-shuffle below overhead-bound (B×R micro-transfers)
    signed = _coalesce_small_blocks(signed)
    t_sign = time.perf_counter()

    num_parts = 64
    # Flat-exchange fast path: when the bucket stage isn't being
    # checkpointed and B × P stays bounded, both the banding shuffle and
    # the anchor-group shuffle run as two flat task waves over the
    # materialized signed blocks (exchange_blocks) — saving the 1-2 s
    # Dataset-job launch + sort machinery of each groupby, the dominant
    # non-scaling term of this stage. The Dataset groupby remains the
    # checkpointable / unbounded-B path (Ray Data's shuffle spills;
    # num_returns-based exchanges hold B × P objects at once).
    use_flat = (
        ckpt is None
        and _is_materialized(signed)
        and signed.num_blocks() * num_parts <= (1 << 16)
    )

    def _build_pairs() -> ray.data.Dataset:
        band_rows = signed.map_batches(
            explode_bands, batch_format="pyarrow"
        ).map_batches(add_bucket_partition(num_parts), batch_format="pyarrow")
        return band_rows.groupby("__part").map_groups(
            emit_bucket_pairs(cfg.bucket_pair_cap), batch_format="pyarrow"
        )

    pair_rows = None
    if use_flat:
        pass
    elif ckpt:
        # Scope the bucket checkpoint to the INPUT identity: without it
        # a grown/changed corpus would silently reuse the previous
        # corpus' bucket stage (stale-candidate bug — same class as the
        # per-partition signature scopes above).
        pair_rows, was = ckpt.run("lsh_buckets", _build_pairs, scope=input_scope)
        if was:
            resumed.append("lsh_buckets")
    else:
        pair_rows = _build_pairs()

    # Containment anchor-group discovery depends only on `signed`, so
    # its shuffle runs CONCURRENTLY with edge collection + verification
    # (two driver threads sharing the Ray CPU pool) — the cluster-rep
    # pruning that needs the verified components happens afterwards on
    # the driver with identical results (see _containment_discover_groups).
    from concurrent.futures import ThreadPoolExecutor

    cont_detail: dict = {}
    f_groups = None
    pool = None
    if with_containment:
        pool = ThreadPoolExecutor(max_workers=1)
        f_groups = pool.submit(
            _containment_discover_groups, signed, cfg, cont_detail,
            use_flat,
        )
    if use_flat:
        edge_a, edge_b, size_hist = _collect_edges_flat(signed, cfg, num_parts)
    else:
        edge_a, edge_b, size_hist = _collect_edges_and_sizes(pair_rows)
    verified, vmetrics = _verify_edges(edge_a, edge_b, signed, corpus, cfg)
    t_lsh = time.perf_counter()

    # Component resolution: the driver union-find and the distributed
    # min-label propagation are ALTERNATIVES (same node → min-component
    # contract, tested equivalent) — never both. The containment pass
    # needs the LSH-tier components as its pruning precomp, so when it
    # runs the driver UF exists anyway and label propagation would be
    # pure duplicate work; the distributed path takes over exactly when
    # the driver never had to own the edges.
    uf: UnionFind | None = None
    if with_containment or len(verified) <= cfg.distributed_components_threshold:
        uf = UnionFind()
        uf.add_edges(verified)

    cont_edges: list[tuple[int, int]] = []
    if with_containment:
        raw_groups = f_groups.result()
        pool.shutdown()
        cont_edges = _containment_verify(
            corpus, signed, cfg, raw_groups, uf.components(),
            metrics_out=cont_detail,
        )
        uf.add_edges(cont_edges)
    t_cont = time.perf_counter()

    if uf is not None:
        comp = uf.components()
    else:
        from cloud_dedup_ray.state.union_find import (
            label_propagation_components,
        )

        ea = np.fromiter((e[0] for e in verified), np.int64, len(verified))
        eb = np.fromiter((e[1] for e in verified), np.int64, len(verified))
        comp = label_propagation_components(
            ray.data.from_arrow(pa.table({"a": ea, "b": eb}))
        )
    comp_keys = np.fromiter(comp.keys(), np.int64, len(comp))
    comp_vals = np.fromiter(comp.values(), np.int64, len(comp))
    korder = np.argsort(comp_keys)
    comp_ref = ray.put((comp_keys[korder], comp_vals[korder]))

    def _assign(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(comp_ref)
        ids = np.asarray(t["doc_id"], np.int64)
        idx = np.searchsorted(keys, ids).clip(0, max(len(keys) - 1, 0))
        if len(keys):
            hit = keys[idx] == ids
            cluster = np.where(hit, vals[idx], ids)
        else:
            cluster = ids
        return pa.table({"doc_id": t["doc_id"], "cluster_id": pa.array(cluster)})

    assignments = corpus.map_batches(_assign, batch_format="pyarrow")

    # skew metrics from the bucket-size histogram (shipped as ~tens of
    # rows per partition, not one row per bucket)
    n_clusters = len(set(comp.values()))
    metrics = {
        **vmetrics,
        "resumed_stages": resumed,
        "n_containment_edges": len(cont_edges),
        **cont_detail,
        "n_docs_clustered": len(comp),
        "n_clusters": n_clusters,
        **_hist_stats(size_hist),
        "sec_sign": round(t_sign - t0, 3),
        "sec_lsh_verify": round(t_lsh - t_sign, 3),
        "sec_containment": round(t_cont - t_lsh, 3),
    }
    return NearDupResult(
        assignments=assignments,
        n_edges=len(verified) + len(cont_edges),
        n_clusters=n_clusters,
        metrics=metrics,
    )
