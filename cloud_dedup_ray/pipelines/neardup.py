"""Near-duplicate clustering pipeline — the north-star tier.

    corpus → map_batches(MinHashSigner actor pool)        [stateful]
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

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.suffixarray import SuffixArray
from cloud_dedup_ray.functions.text import normalize
from cloud_dedup_ray.stages.minhash_stage import (
    MinHashSigner,
    emit_bucket_pairs,
    explode_bands,
)
from cloud_dedup_ray.state.union_find import UnionFind


@dataclass
class NearDupResult:
    #: Dataset of (doc_id, cluster_id); singletons keep cluster_id == doc_id
    assignments: ray.data.Dataset
    #: verified (a, b) edges — LSH + containment
    n_edges: int
    n_clusters: int
    metrics: dict = field(default_factory=dict)


def _dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (a, b) pairs via a grouped head-1 (bands emit repeats)."""

    def _first(t: pa.Table) -> pa.Table:
        return t.slice(0, 1)

    _first.__name__ = "dedup_edge"
    return edges.groupby(["a", "b"]).map_groups(_first, batch_format="pyarrow")


def _verify_edges(
    edges: ray.data.Dataset,
    signed: ray.data.Dataset,
    cfg: DedupConfig,
) -> tuple[list[tuple[int, int]], dict]:
    """Signature-estimated Jaccard filter over candidate edges.

    The signatures of candidate docs are semi-joined out of ``signed``
    (broadcast id-set filter) and shipped once via ``ray.put``; each
    verify task looks them up per batch. Scale path: partitioned hash
    join of edges × signatures on doc_id (same code shape, no broadcast).
    """
    edge_tbl = pa.concat_tables(
        [b.select(["a", "b"]) for b in edges.iter_batches(batch_format="pyarrow")]
        or [pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})]
    )
    a = np.asarray(edge_tbl["a"], np.int64)
    b = np.asarray(edge_tbl["b"], np.int64)
    if len(a) == 0:
        return [], {"n_candidates": 0, "n_verified": 0}
    cand_ids = np.unique(np.concatenate([a, b]))
    cand_ref = ray.put(set(cand_ids.tolist()))

    def _sig_filter(t: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        mask = pa.array([d in wanted for d in t["doc_id"].to_pylist()])
        return t.filter(mask).select(["doc_id", "sig"])

    sig_map: dict[int, np.ndarray] = {}
    for bt in signed.map_batches(_sig_filter, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        ids = np.asarray(bt["doc_id"], np.int64)
        num_perm = bt["sig"].type.list_size
        sigs = np.asarray(bt["sig"].combine_chunks().flatten()).reshape(-1, num_perm)
        for i, d in enumerate(ids):
            sig_map[int(d)] = sigs[i]

    sa = np.stack([sig_map[int(x)] for x in a])
    sb = np.stack([sig_map[int(x)] for x in b])
    est = (sa == sb).mean(axis=1)
    keep = est >= cfg.jaccard_threshold
    verified = list(zip(a[keep].tolist(), b[keep].tolist()))
    return verified, {"n_candidates": len(a), "n_verified": len(verified)}


def containment_edges(
    corpus: ray.data.Dataset, signed: ray.data.Dataset, cfg: DedupConfig
) -> list[tuple[int, int]]:
    """Suffix-array containment pass: block docs on shared bottom-k
    shingle anchors, then verify exact substring containment per group
    with a suffix array over the larger doc.

    Recall: if A ⊆ B, every shingle of A is in B, so an anchor of B
    falls in A with probability ≈ k·|A|/|B| — high for substantial
    containment, and the exact tier already catches |A| == |B|.
    """
    norm = corpus.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "content_norm": normalize(t["content"])}
        ),
        batch_format="pyarrow",
    )

    anchors = signed.map_batches(
        lambda t: pa.table(
            {
                "anchor": pa.array(
                    [a for row in t["anchors"].to_pylist() for a in row],
                    pa.int64(),
                ),
                "doc_id": pa.array(
                    [
                        d
                        for d, row in zip(
                            t["doc_id"].to_pylist(), t["anchors"].to_pylist()
                        )
                        for _ in row
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    # candidate groups: docs sharing an anchor (drop singleton anchors)
    def _group_ids(t: pa.Table) -> pa.Table:
        ids = sorted(set(t["doc_id"].to_pylist()))
        if len(ids) < 2 or len(ids) > cfg.bucket_pair_cap:
            ids = []
        return pa.table({"ids": pa.array([ids], pa.list_(pa.int64()))}) if ids else \
            pa.table({"ids": pa.array([], pa.list_(pa.int64()))})

    _group_ids.__name__ = "anchor_group"
    groups = [
        tuple(r["ids"])
        for r in anchors.groupby("anchor").map_groups(
            _group_ids, batch_format="pyarrow"
        ).take_all()
    ]
    groups = sorted(set(groups))
    if not groups:
        return []

    # fetch normalized contents for all group members (semi-join broadcast)
    needed = sorted({d for g in groups for d in g})
    need_ref = ray.put(set(needed))

    def _content_filter(t: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = pa.array([d in wanted for d in t["doc_id"].to_pylist()])
        return t.filter(mask)

    texts: dict[int, str] = {}
    for bt in norm.map_batches(_content_filter, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for d, c in zip(bt["doc_id"].to_pylist(), bt["content_norm"].to_pylist()):
            texts[d] = c

    # distribute group verification as ray tasks (each group independent)
    @ray.remote
    def _verify_group(ids: tuple[int, ...], docs: dict[int, str]) -> list[tuple[int, int]]:
        out = []
        members = sorted(ids, key=lambda d: -len(docs.get(d, "")))
        arrays: dict[int, SuffixArray] = {}
        for i, big in enumerate(members):
            bt = docs.get(big, "")
            if not bt:
                continue
            for small in members[i + 1 :]:
                st = docs.get(small, "")
                if not st or len(st) >= len(bt):
                    continue
                if big not in arrays:
                    arrays[big] = SuffixArray(bt)
                if arrays[big].contains(st):
                    out.append((min(big, small), max(big, small)))
        return out

    docs_ref = ray.put(texts)
    futures = [_verify_group.remote(g, docs_ref) for g in groups]
    edges: list[tuple[int, int]] = []
    for res in ray.get(futures):
        edges.extend(res)
    return sorted(set(edges))


def cluster_corpus(
    corpus: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    with_containment: bool = True,
) -> NearDupResult:
    """Full near-dup clustering over a corpus Dataset that has
    ``doc_id:int64`` and ``content:string`` columns (symlink rows should
    be filtered out by the caller or carry empty content)."""
    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()

    signed = corpus.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.signer_concurrency,
        num_cpus=1,
    ).materialize()
    t_sign = time.perf_counter()

    band_rows = signed.map_batches(explode_bands, batch_format="pyarrow")
    bucket_sizes = (
        band_rows.groupby(["band_id", "band_hash"]).count().materialize()
    )
    edges_raw = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        emit_bucket_pairs(cfg.bucket_pair_cap), batch_format="pyarrow"
    )
    edges = _dedup_edges(edges_raw)
    verified, vmetrics = _verify_edges(edges, signed, cfg)
    t_lsh = time.perf_counter()

    cont_edges: list[tuple[int, int]] = []
    if with_containment:
        cont_edges = containment_edges(corpus, signed, cfg)
    t_cont = time.perf_counter()

    uf = UnionFind()
    uf.add_edges(verified)
    uf.add_edges(cont_edges)
    comp = uf.components()
    comp_ref = ray.put(comp)

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(comp_ref)
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_id": pa.array([c.get(d, d) for d in ids], pa.int64()),
            }
        )

    assignments = corpus.map_batches(_assign, batch_format="pyarrow")

    # skew metrics: bucket-size histogram + top-k heaviest buckets
    sizes = np.array([r["count()"] for r in bucket_sizes.take_all()], np.int64)
    top = np.sort(sizes)[::-1][:10].tolist() if sizes.size else []
    n_clusters = len(set(comp.values()))
    metrics = {
        **vmetrics,
        "n_containment_edges": len(cont_edges),
        "n_docs_clustered": len(comp),
        "n_clusters": n_clusters,
        "lsh_buckets": int(sizes.size),
        "lsh_bucket_max": int(sizes.max()) if sizes.size else 0,
        "lsh_bucket_p99": float(np.percentile(sizes, 99)) if sizes.size else 0.0,
        "lsh_top10_buckets": top,
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
