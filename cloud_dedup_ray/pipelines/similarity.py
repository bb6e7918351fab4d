"""Similarity search over the ``embeddings`` table (list<float> column).

* ``emb_knn_bruteforce`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one float64 matmul
  against it (vectorized; zero-copy Arrow list column → numpy), partial
  top-k per batch, final merge on the driver. This is the baseline and
  the oracle-checkable path (DuckDB ``list_cosine_similarity`` twin).
* ``emb_knn_lsh`` / ``emb_knn_ivf`` — ANN over bucket-/centroid-
  partitioned Parquet (the scale path): the index is written once
  (hive-partitioned by LSH table+bucket resp. IVF centroid), a query
  reads ONLY its probed partitions and exact-re-ranks inside them, so
  query cost is ∝ probed rows, not corpus rows. Recall measured against
  brute force in tests; reads-∝-probes asserted in tests too.
* ``emb_neardup_pairs`` — embedding-cosine near-dup pairs ≥ threshold,
  exact: LSH-sorted blocks in the object store, bounding-cone pruning
  of block pairs, one bounded-memory matmul task per surviving pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _emb(
    sf_dir: str, columns: tuple[str, ...] = ("vec_id", "embedding")
) -> ray.data.Dataset:
    """Pruned read of the embeddings table — every similarity operator
    needs only (vec_id, embedding), so extra columns (e.g. ``label``)
    never leave storage."""
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=list(columns)
    )


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    if t.num_rows == 0:
        # offsets has a single entry on an empty list column — guard
        # before indexing so empty batches flow through as (0, 0)
        return np.empty(0, np.int64), np.empty((0, 0), np.float64)
    ids = np.asarray(t["vec_id"], np.int64)
    col = t["embedding"].combine_chunks()
    flat = np.asarray(col.flatten(), np.float64)
    offsets = np.asarray(col.offsets)
    dim = offsets[1] - offsets[0]
    return ids, flat.reshape(len(ids), dim)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def emb_knn_bruteforce(
    sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> pd.DataFrame:
    """Exact top-k by cosine against the embedding of ``query_vec_id``."""
    ds = _emb(sf_dir)
    q = None
    for t in ds.iter_batches(batch_format="pyarrow"):
        ids, m = _batch_matrix(t)
        hit = np.nonzero(ids == query_vec_id)[0]
        if hit.size:
            q = m[hit[0]]
            break
    assert q is not None, f"query vec_id {query_vec_id} not found"
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def topk_partial(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, m = _batch_matrix(t)
        keep = ids != query_vec_id
        ids, m = ids[keep], m[keep]
        sims = _normalize_rows(m) @ qv
        # partial top-k cut in the SQL twin's TOTAL order (cos_sim
        # DESC, vec_id ASC) — a stable sort on -sims alone would break
        # boundary ties by storage order, which can diverge from the
        # global merge when >= k+1 equal sims straddle a batch cut
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({"vec_id": ids[order], "cos_sim": sims[order]})

    parts = ray.get(
        [ref for ref in ds.map_batches(topk_partial, batch_format="pyarrow").to_arrow_refs()]
    )
    allp = pa.concat_tables(parts).to_pandas()
    allp = allp.sort_values(
        ["cos_sim", "vec_id"], ascending=[False, True]
    ).head(k)
    allp["cos_sim"] = allp["cos_sim"].round(4)
    return allp.reset_index(drop=True)


def emb_knn_batch(sf_dir: str, n_queries: int = 20, k: int = 5) -> pd.DataFrame:
    """Batched exact kNN: top-k by cosine for EVERY query in a query set
    (vec_id < n_queries) in ONE scan — the realistic production shape
    (queries arrive in batches, not one at a time). The normalized query
    matrix is broadcast once (``ray.put``); each data batch does a single
    (batch × dim) @ (dim × n_queries) matmul, masks self-matches and
    emits its per-query partial top-k; the driver merges
    n_blocks × n_queries × k candidate rows (≪ corpus)."""
    ds = _emb(sf_dir)
    qids_l, qvecs_l = [], []
    for t in ds.iter_batches(batch_format="pyarrow"):
        ids, m = _batch_matrix(t)
        hit = ids < n_queries
        if hit.any():
            qids_l.append(ids[hit])
            qvecs_l.append(m[hit])
    if not qids_l:
        raise ValueError(
            f"no query vectors with vec_id < {n_queries} in {sf_dir!r}"
        )
    qid = np.concatenate(qids_l)
    order = np.argsort(qid)
    qid = qid[order]
    qm = _normalize_rows(np.concatenate(qvecs_l)[order])
    q_ref = ray.put((qid, qm))

    def topk_partial(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(q_ref)
        ids, m = _batch_matrix(t)
        sims = _normalize_rows(m) @ qm_.T  # (batch, n_queries)
        pos = np.searchsorted(qids_, ids).clip(0, len(qids_) - 1)
        self_rows = qids_[pos] == ids
        sims[self_rows, pos[self_rows]] = -np.inf
        kk = min(k, sims.shape[0])
        # vectorized per-query top-k with 'cos_sim DESC, vec_id ASC'
        # tie-break: pre-sort rows by vec_id once, then ONE stable
        # column-wise argsort on -sims keeps ties in vec_id order
        # (replacing a per-query lexsort loop)
        row_order = np.argsort(ids, kind="stable")
        ids_s = ids[row_order]
        sims_s = sims[row_order]
        top = np.argsort(-sims_s, axis=0, kind="stable")[:kk]
        out_id = ids_s[top]                              # (kk, n_queries)
        out_sim = np.take_along_axis(sims_s, top, axis=0)
        out_q = np.broadcast_to(qids_, (kk, len(qids_)))
        return pa.table(
            {
                "query_id": pa.array(out_q.T.reshape(-1)),
                "vec_id": pa.array(out_id.T.reshape(-1)),
                "sim": pa.array(out_sim.T.reshape(-1)),
            }
        )

    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(topk_partial, batch_format="pyarrow").to_arrow_refs()
        )
    )
    df = parts.to_pandas()
    df = df[np.isfinite(df["sim"])]
    df = df.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    df["rank"] = (df.groupby("query_id").cumcount() + 1).astype(np.int64)
    df = df[df["rank"] <= k].copy()
    df["cos_sim"] = df["sim"].round(4)
    return df[["query_id", "vec_id", "cos_sim", "rank"]].reset_index(drop=True)


class HyperplaneLSH:
    """Random-hyperplane signer: one seeded projection matrix per actor."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket(self, m: np.ndarray) -> np.ndarray:
        return ((m @ self.planes) > 0) @ self.weights

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        return pa.table({"vec_id": ids, "bucket": self.bucket(m)})


def _lookup_query_vec(sf_dir: str, query_vec_id: int) -> np.ndarray:
    """Fetch one query embedding by id (stops at the first batch that
    contains it — this is query acquisition, not the search)."""
    for t in _emb(sf_dir).iter_batches(batch_format="pyarrow"):
        ids, m = _batch_matrix(t)
        hit = np.nonzero(ids == query_vec_id)[0]
        if hit.size:
            return m[hit[0]]
    raise AssertionError(f"query vec_id {query_vec_id} not found")


# ---------------------------------------------------------------------
# Bucket-partitioned ANN index storage (the scale path).
#
# ``build_lsh_index`` / ``build_ivf_index`` write the corpus ONCE as
# bucket-/centroid-partitioned Parquet (hive layout: ``table=T/bucket=B``
# resp. ``cent=C`` directories). A query then reads ONLY its probed
# partitions — cost ∝ probed-partition rows, not corpus rows. The LSH
# layout stores the embedding once per table (the classic multi-table
# space-for-time trade: ×n_tables storage buys sublinear query reads);
# IVF stores each vector exactly once. At petabyte scale the build adds
# ``min_rows_per_file``-style compaction per partition; here each write
# task emits one file per (block, partition) which is the same layout.
# ---------------------------------------------------------------------


def _ann_cache_dir(sf_dir: str, tag: str, params: list) -> str:
    """Deterministic index location keyed on the source file identity
    (size + mtime_ns) and the index parameters, so a changed corpus or
    config never reuses a stale index."""
    import hashlib
    import json
    import os

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha256(
        json.dumps(
            {"src": src, "size": st.st_size, "mtime_ns": st.st_mtime_ns,
             "params": params},
            sort_keys=True,
        ).encode()
    ).hexdigest()[:16]
    return f"/tmp/cdr_ann/{tag}_{key}"


def _atomic_build(index_dir: str, build) -> None:
    """Build into a scratch dir and rename into place: a crashed or
    concurrent build can never leave a half-written index that a later
    write_parquet would append duplicate rows into."""
    import os
    import shutil

    tmp = f"{index_dir}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(index_dir), exist_ok=True)
    build(tmp)
    try:
        os.rename(tmp, index_dir)
    except OSError:
        # another process won the race — use its index
        shutil.rmtree(tmp, ignore_errors=True)


def _read_meta(index_dir: str) -> dict | None:
    import json
    import os

    path = f"{index_dir}/meta.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _write_meta(index_dir: str, meta: dict) -> None:
    import json
    import os

    tmp = f"{index_dir}/meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{index_dir}/meta.json")


def _partition_files(paths: list[str]) -> list[str]:
    """Parquet files under the probed partition dirs (read_parquet with
    a multi-path list expects files, not directories)."""
    import os

    out = []
    for p in paths:
        for root, _, files in os.walk(p):
            out.extend(
                os.path.join(root, fn)
                for fn in sorted(files)
                if fn.endswith(".parquet")
            )
    return out


def _probe_partition_stats(paths: list[str]) -> dict:
    """Bytes/files under the probed partition dirs — the 'reads ∝ probed
    partitions' evidence surfaced through ``metrics_out``."""
    import os

    files = _partition_files(paths)
    return {
        "n_probed_files": len(files),
        "n_probed_bytes": sum(os.path.getsize(f) for f in files),
    }


def build_lsh_index(
    sf_dir: str, index_dir: str,
    n_planes: int = 6, n_tables: int = 8, seed_base: int = 1000,
) -> str:
    """Write the embeddings as ``table=T/bucket=B``-partitioned Parquet:
    each vector appears once per LSH table, under its sign-pattern
    bucket. One streaming pass; the partitioned write is the only wide
    step (Ray fans rows out to per-partition files)."""
    ds = _emb(sf_dir)
    probe = ds.take(1)
    dim = len(probe[0]["embedding"]) if probe else 0
    signers_ref = ray.put(
        [HyperplaneLSH(dim, n_planes, seed_base + t) for t in range(n_tables)]
    )

    def explode(t: pa.Table) -> pa.Table:
        sgs = ray.get(signers_ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], t["embedding"].type),
                 "table": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64())}
            )
        parts = []
        for ti, s in enumerate(sgs):
            parts.append(
                pa.table(
                    {
                        "vec_id": t["vec_id"],
                        "embedding": t["embedding"],
                        "table": pa.array(
                            np.full(len(ids), ti, np.int64)
                        ),
                        "bucket": pa.array(s.bucket(m)),
                    }
                )
            )
        return pa.concat_tables(parts)

    ds.map_batches(explode, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["table", "bucket"]
    )
    _write_meta(
        index_dir,
        {"kind": "lsh", "dim": dim, "n_planes": n_planes,
         "n_tables": n_tables, "seed_base": seed_base},
    )
    return index_dir


def query_lsh_index(
    index_dir: str, qvec: np.ndarray, k: int = 10,
    exclude_id: int | None = None, metrics_out: dict | None = None,
    probe_all: bool = False,
) -> pd.DataFrame:
    """Top-k from a built LSH index: compute the query's bucket per
    table, read ONLY those ``table=T/bucket=B`` partitions, exact-cosine
    re-rank of the (deduplicated) candidates. Rows/bytes read are
    proportional to the probed partitions, never the corpus.

    ``probe_all=True`` is the EXACT mode (the LSH analog of IVF
    nprobe=all): probe every bucket of table 0 — each vector lives in
    exactly one table-0 bucket, so the candidate set is the whole
    corpus read once through the index layout and the answer equals
    brute force. That is what makes the query oracle-checkable against
    the brute-force SQL twin; the sublinear default path is recall-
    tested in tests/test_similarity.py."""
    import os

    meta = _read_meta(index_dir)
    assert meta and meta["kind"] == "lsh", f"no LSH index at {index_dir}"
    signers = [
        HyperplaneLSH(meta["dim"], meta["n_planes"], meta["seed_base"] + t)
        for t in range(meta["n_tables"])
    ]
    if probe_all:
        t0 = f"{index_dir}/table=0"
        paths = sorted(
            os.path.join(t0, d)
            for d in os.listdir(t0)
            if d.startswith("bucket=")
        ) if os.path.isdir(t0) else []
    else:
        paths = []
        for ti, s in enumerate(signers):
            b = int(s.bucket(qvec[None, :])[0])
            p = f"{index_dir}/table={ti}/bucket={b}"
            if os.path.isdir(p):
                paths.append(p)
    empty = pd.DataFrame(
        {"vec_id": pd.Series(dtype="int64"),
         "cos_sim": pd.Series(dtype="float64")}
    )
    if metrics_out is not None:
        metrics_out.update(_probe_partition_stats(paths))
        metrics_out["n_probed_partitions"] = len(paths)
    files = _partition_files(paths)
    if not files:
        return empty
    cand = ray.data.read_parquet(files, columns=["vec_id", "embedding"])
    qn = qvec / np.linalg.norm(qvec)
    q_ref = ray.put(qn)

    def rerank(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, m = _batch_matrix(t)
        # within-batch dedupe first (a vector can sit in several probed
        # tables) so duplicates can't crowd a distinct row out of the
        # batch's partial top-k
        _, first_idx = np.unique(ids, return_index=True)
        ids, m = ids[first_idx], m[first_idx]
        if exclude_id is not None:
            keep = ids != exclude_id
            ids, m = ids[keep], m[keep]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64())}
            )
        sims = _normalize_rows(m) @ qv
        # partial top-k cut in the SQL twin's TOTAL order (cos_sim
        # DESC, vec_id ASC) — a stable sort on -sims alone would break
        # boundary ties by storage order, which can diverge from the
        # global merge when >= k+1 equal sims straddle a batch cut
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({"vec_id": ids[order], "cos_sim": sims[order]})

    rows = cand.map_batches(rerank, batch_format="pyarrow").to_pandas()
    if metrics_out is not None:
        metrics_out["n_candidate_rows"] = int(cand.count())
    if rows.empty:
        return empty
    out = (
        rows.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
        .drop_duplicates("vec_id")
        .head(k)
    )
    out["cos_sim"] = out["cos_sim"].round(4)
    return out.reset_index(drop=True)


def emb_knn_lsh(
    sf_dir: str, query_vec_id: int = 0, k: int = 10,
    n_planes: int = 6, n_tables: int = 8,
    metrics_out: dict | None = None, probe_all: bool = False,
) -> pd.DataFrame:
    """ANN top-k: multi-table random-hyperplane LSH candidate
    generation over BUCKET-PARTITIONED PARQUET (built once per
    (corpus, params), cached on source size+mtime_ns), exact cosine
    re-rank of candidates. Query cost ∝ probed-partition rows.
    ``probe_all=True`` probes every table-0 bucket — exact, equals the
    brute-force answer (see query_lsh_index)."""
    import os

    index_dir = _ann_cache_dir(sf_dir, "lsh", [n_planes, n_tables, 1000])
    if _read_meta(index_dir) is None:
        _atomic_build(
            index_dir,
            lambda d: build_lsh_index(sf_dir, d, n_planes, n_tables),
        )
    q = _lookup_query_vec(sf_dir, query_vec_id)
    return query_lsh_index(
        index_dir, q, k, exclude_id=query_vec_id, metrics_out=metrics_out,
        probe_all=probe_all,
    )


@ray.remote
def _block_cone(t: pa.Table) -> tuple[np.ndarray, float]:
    """Per-block angular summary: the mean direction of the block's
    normalized vectors and the max angle (radians) of any member to it —
    a bounding cone for exact block-pair pruning."""
    _, m = _batch_matrix(t)
    mn = _normalize_rows(m)
    c = mn.mean(axis=0)
    norm = np.linalg.norm(c)
    c = c / norm if norm > 0 else c
    cos_to_c = np.clip(mn @ c, -1.0, 1.0)
    return c, float(np.arccos(cos_to_c.min()))


@ray.remote
def _block_pair_sims(
    ta: pa.Table, tb: pa.Table, same: bool, threshold: float
) -> pa.Table:
    """Exact cosine pairs ≥ threshold between two blocks (one matmul;
    triu when the blocks coincide). Per-task memory = 2 blocks × dim,
    independent of corpus size."""
    ids_a, ma = _batch_matrix(ta)
    ids_b, mb = _batch_matrix(tb)
    sims = _normalize_rows(ma) @ _normalize_rows(mb).T
    mask = sims >= threshold
    if same:
        # mask (not zero) the diagonal+lower triangle: zeroing via
        # np.triu would leak lower-triangle cells as spurious 0.0-sim
        # pairs whenever threshold <= 0
        mask &= np.triu(np.ones_like(mask), k=1).astype(bool)
    ii, jj = np.nonzero(mask)
    a, b = ids_a[ii], ids_b[jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo < hi
    return pa.table(
        {
            "vec_a": lo[keep],
            "vec_b": hi[keep],
            "cos_sim": np.round(sims[ii, jj][keep], 4),
        }
    )


def _cone_pruned_block_pairs(
    centroids: np.ndarray,
    radii: np.ndarray,
    threshold: float,
    group_size: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Two-level exact cone pruning over LSH-sorted block cones.

    Level 1 groups ``group_size`` consecutive blocks under one covering
    cone (centroid = normalized mean of member centroids, radius =
    max(angle-to-member + member radius) — every vector of every member
    block lies inside it, so the group-pair bound
    cos(max(0, θ − Rᵢ − Rⱼ)) is a true upper bound and pruning stays
    EXACT). Level 2 applies the per-block bound only inside surviving
    group pairs. Returns (block_i, block_j, n_block_pairs_enumerated):
    the surviving i ≤ j block pairs plus how many block-level bounds
    were actually evaluated — the driver-memory metric that replaces
    the old full B×B matrix (worst case it degrades to B²/2, but only when
    nothing is prunable, i.e. the data is angularly uniform)."""
    n = len(radii)
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e, 0
    n_groups = -(-n // group_size)
    g_cent = np.empty((n_groups, centroids.shape[1]))
    g_rad = np.empty(n_groups)
    for g in range(n_groups):
        sl = slice(g * group_size, min((g + 1) * group_size, n))
        mc, mr = centroids[sl], radii[sl]
        c = mc.mean(axis=0)
        norm = np.linalg.norm(c)
        c = c / norm if norm > 0 else mc[0]
        ang = np.arccos(np.clip(mc @ c, -1.0, 1.0))
        g_cent[g], g_rad[g] = c, float((ang + mr).max())
    g_theta = np.arccos(np.clip(g_cent @ g_cent.T, -1.0, 1.0))
    g_best = np.cos(np.maximum(0.0, g_theta - g_rad[:, None] - g_rad[None, :]))
    gi, gj = np.triu_indices(n_groups)
    g_live = g_best[gi, gj] >= threshold
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    n_enumerated = 0
    for a, b in zip(gi[g_live], gj[g_live]):
        bi = np.arange(a * group_size, min((a + 1) * group_size, n))
        bj = np.arange(b * group_size, min((b + 1) * group_size, n))
        th = np.arccos(np.clip(centroids[bi] @ centroids[bj].T, -1.0, 1.0))
        best = np.cos(
            np.maximum(0.0, th - radii[bi][:, None] - radii[bj][None, :])
        )
        mask = best >= threshold
        if a == b:
            mask &= np.triu(np.ones_like(mask, dtype=bool))
        n_enumerated += mask.size if a != b else len(bi) * (len(bi) + 1) // 2
        ii, jj = np.nonzero(mask)
        if len(ii):
            out_i.append(bi[ii])
            out_j.append(bj[jj])
    if not out_i:
        e = np.empty(0, np.int64)
        return e, e, n_enumerated
    return np.concatenate(out_i), np.concatenate(out_j), n_enumerated


def emb_neardup_pairs(
    sf_dir: str,
    threshold: float = 0.38,
    block_rows: int = 4096,
    n_planes: int = 12,
    group_size: int = 64,
    metrics_out: dict | None = None,
) -> pd.DataFrame:
    """All pairs with cosine ≥ threshold — EXACT (recall 1.0 by
    construction, so the DuckDB oracle hash-matches) with memory
    independent of corpus size everywhere:

    1. Sign every vector with one hyperplane-LSH bucket key and SORT the
       dataset by it (a distributed shuffle) — vectors in the same
       orthant cone become block-neighbors, so blocks are angularly
       coherent.
    2. Blocks stay in the object store (``to_arrow_refs``); the driver
       holds only references. A tiny task per block computes its
       bounding cone (mean direction + max member angle).
    3. Block-pair pruning, exact: the best possible cosine between
       blocks i and j is cos(max(0, θ(cᵢ,cⱼ) − rᵢ − rⱼ)); pairs whose
       bound is below threshold are skipped without reading the blocks.
       The LSH sort is what gives the cones pruning power — unsorted
       blocks have radius ≈ π/2 and nothing prunes.
    4. Surviving block pairs each run one matmul task reading exactly
       two blocks zero-copy.

    The O(n²) worst case is inherent to exact all-pairs output; this
    distributes it as bounded-memory tasks and prunes the angularly
    impossible quadrant of the work. The approximate scale path (top-k
    per query) is ``emb_knn_lsh`` / ``emb_knn_ivf``.

    Block-pair enumeration is HIERARCHICAL (two-level cones): blocks
    are grouped into runs of ``group_size`` consecutive LSH-sorted
    blocks, each group gets its own bounding cone (covering every
    member cone, so the group-pair bound is still an exact upper
    bound), and per-block cone checks run only inside surviving group
    pairs. The driver therefore holds O(G²) + Σ surviving
    (group_size)² bounds instead of the full B×B matrix — at 10⁹
    vectors (B ≈ 244k blocks, G ≈ 4k groups) that is ~10⁷ group
    bounds, not 3·10¹⁰ block pairs."""
    ds = _emb(sf_dir)
    probe = ds.take(1)
    if not probe:
        # empty corpus: nothing to sign/sort — return the typed empty
        # frame rather than letting the first-batch probe StopIteration
        return pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
    dim = len(probe[0]["embedding"])
    signer_ref = ray.put(HyperplaneLSH(dim, n_planes, seed=7))

    def add_bucket(t: pa.Table) -> pa.Table:
        s = ray.get(signer_ref)
        _, m = _batch_matrix(t)
        return t.append_column("__bucket", pa.array(s.bucket(m)))

    sorted_ds = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .sort("__bucket")
        .map_batches(lambda t: t.drop_columns("__bucket"),
                     batch_format="pyarrow")
        .materialize()
    )
    # order-preserving split into ~block_rows blocks (repartition without
    # shuffle only splits/coalesces, so the LSH-sorted locality survives)
    num_blocks = max(1, -(-sorted_ds.count() // block_rows))
    refs = sorted_ds.repartition(num_blocks).to_arrow_refs()
    cones = ray.get([_block_cone.remote(r) for r in refs])
    n = len(refs)
    centroids = np.stack([c for c, _ in cones]) if n else np.zeros((0, dim))
    radii = np.array([r for _, r in cones])
    live_i, live_j, n_enumerated = _cone_pruned_block_pairs(
        centroids, radii, threshold, group_size
    )
    futures = [
        _block_pair_sims.remote(refs[i], refs[j], i == j, threshold)
        for i, j in zip(live_i, live_j)
    ]
    if metrics_out is not None:
        metrics_out.update(
            {
                "n_blocks": n,
                "n_block_pairs_total": n * (n + 1) // 2,
                "n_block_pairs_enumerated": n_enumerated,
                "n_block_pairs_pruned": n * (n + 1) // 2 - len(live_i),
            }
        )
    parts = [t for t in ray.get(futures) if t.num_rows]
    if not parts:
        return pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
    out = pa.concat_tables(parts).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


class IVFIndex:
    """IVF (inverted-file) coarse quantizer: k-means centroids trained
    once on a sample (driver), then every vector is assigned to its
    nearest centroid — the classic FAISS-style IVF layout (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", 2011 — coarse
    stage only, no PQ compression). Queries probe the ``nprobe`` nearest
    centroid lists and re-rank exactly.

    Distributed shape: centroid training is a driver-side numpy k-means
    over a bounded sample; assignment is a broadcast matmul inside
    ``map_batches``; each batch's rows are bucketed by centroid id — at
    scale the assignment output is written as centroid-partitioned
    Parquet so a query only reads its probed partitions.
    """

    def __init__(self, n_centroids: int = 16, n_iter: int = 10, seed: int = 42):
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def train(self, sample: np.ndarray) -> "IVFIndex":
        """Lloyd's k-means on L2-normalized vectors (cosine ⇒ spherical
        k-means with renormalized means)."""
        rng = np.random.RandomState(self.seed)
        x = _normalize_rows(sample.astype(np.float64))
        k = min(self.n_centroids, len(x))
        cent = x[rng.choice(len(x), k, replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _normalize_rows(cent)
        self.centroids = cent
        return self

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize_rows(m) @ self.centroids.T, axis=1)


def build_ivf_index(
    sf_dir: str, index_dir: str,
    n_centroids: int = 16, n_iter: int = 10, seed: int = 42,
) -> str:
    """Train the coarse quantizer on a bounded driver-side sample, then
    write the embeddings as ``cent=C``-partitioned Parquet (each vector
    in exactly one centroid list). Centroids persist in meta.json so a
    query never retrains."""
    ds = _emb(sf_dir)
    sample = None
    for t in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        _, sample = _batch_matrix(t)
        break
    assert sample is not None and len(sample), f"empty embeddings in {sf_dir}"
    index = IVFIndex(n_centroids=n_centroids, n_iter=n_iter, seed=seed).train(
        sample
    )
    cent_ref = ray.put(index.centroids)

    def assign_batch(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        _, m = _batch_matrix(t)
        if len(m) == 0:
            return t.append_column("cent", pa.array([], pa.int64()))
        assign = np.argmax(_normalize_rows(m) @ cents.T, axis=1).astype(
            np.int64
        )
        return t.append_column("cent", pa.array(assign))

    ds.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cent"]
    )
    _write_meta(
        index_dir,
        {"kind": "ivf", "dim": int(sample.shape[1]),
         "n_centroids": n_centroids,
         "centroids": index.centroids.tolist()},
    )
    return index_dir


def query_ivf_index(
    index_dir: str, qvec: np.ndarray, k: int = 10, nprobe: int = 4,
    exclude_id: int | None = None, metrics_out: dict | None = None,
) -> pd.DataFrame:
    """Top-k from a built IVF index: rank centroids against the query,
    read ONLY the ``nprobe`` nearest ``cent=C`` partitions, exact-cosine
    re-rank inside them."""
    import os

    meta = _read_meta(index_dir)
    assert meta and meta["kind"] == "ivf", f"no IVF index at {index_dir}"
    centroids = np.asarray(meta["centroids"], np.float64)
    qn = qvec / np.linalg.norm(qvec)
    probe = np.argsort(-(qn @ centroids.T))[:nprobe]
    paths = [
        p
        for p in (f"{index_dir}/cent={int(c)}" for c in probe)
        if os.path.isdir(p)
    ]
    empty = pd.DataFrame(
        {"vec_id": pd.Series(dtype="int64"),
         "cos_sim": pd.Series(dtype="float64")}
    )
    if metrics_out is not None:
        metrics_out.update(_probe_partition_stats(paths))
        metrics_out["n_probed_partitions"] = len(paths)
    files = _partition_files(paths)
    if not files:
        return empty
    cand = ray.data.read_parquet(files, columns=["vec_id", "embedding"])
    q_ref = ray.put(qn)

    def rerank(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, m = _batch_matrix(t)
        if exclude_id is not None:
            keep = ids != exclude_id
            ids, m = ids[keep], m[keep]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64())}
            )
        sims = _normalize_rows(m) @ qv
        # partial top-k cut in the SQL twin's TOTAL order (cos_sim
        # DESC, vec_id ASC) — a stable sort on -sims alone would break
        # boundary ties by storage order, which can diverge from the
        # global merge when >= k+1 equal sims straddle a batch cut
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({"vec_id": ids[order], "cos_sim": sims[order]})

    rows = cand.map_batches(rerank, batch_format="pyarrow").to_pandas()
    if metrics_out is not None:
        metrics_out["n_candidate_rows"] = int(cand.count())
    if rows.empty:
        return empty
    out = (
        rows.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
        .head(k)
    )
    out["cos_sim"] = out["cos_sim"].round(4)
    return out.reset_index(drop=True)


def emb_knn_ivf(
    sf_dir: str, query_vec_id: int = 0, k: int = 10,
    n_centroids: int = 16, nprobe: int = 4,
    metrics_out: dict | None = None,
) -> pd.DataFrame:
    """ANN top-k via IVF over CENTROID-PARTITIONED PARQUET (built once
    per (corpus, params), cached on source size+mtime_ns): rank
    centroids, read only the ``nprobe`` probed partitions, exact re-rank
    inside them. Query cost ∝ probed-partition rows. Recall vs brute
    force is measured in tests."""
    import os

    index_dir = _ann_cache_dir(sf_dir, "ivf", [n_centroids, 10, 42])
    if _read_meta(index_dir) is None:
        _atomic_build(
            index_dir, lambda d: build_ivf_index(sf_dir, d, n_centroids)
        )
    q = _lookup_query_vec(sf_dir, query_vec_id)
    return query_ivf_index(
        index_dir, q, k, nprobe=nprobe, exclude_id=query_vec_id,
        metrics_out=metrics_out,
    )


def emb_centroid_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language embedding centroids: fact-fact shuffle join of the
    ``embeddings`` table with ``documents`` on vec_id == doc_id, then a
    vectorized per-batch partial (sum vector + count per language) and a
    tiny ``groupby(lang, dim)`` rollup — the join is the only wide step;
    the 64-dim vector sums leave each batch as at most
    ``n_langs × dim`` partial rows. Long output (lang, dim, centroid,
    n_vectors) keeps every column scalar (oracle-hashable)."""
    from ray.data.aggregate import Sum

    def pack(t: pa.Table) -> pa.Table:
        # Arrow's hash join rejects list<float> payload columns — pack
        # the vector into fixed-size binary for the shuffle (vectorized
        # view, no per-row Python), unpack on the far side.
        ids, mat = _batch_matrix(t)
        rows = np.ascontiguousarray(mat.astype(np.float32))
        width = rows.shape[1] * 4
        packed = pa.Array.from_buffers(
            pa.binary(width), len(ids), [None, pa.py_buffer(rows.tobytes())]
        )
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "vec": packed})

    emb = _emb(sf_dir).map_batches(pack, batch_format="pyarrow")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    joined = emb.join(docs, join_type="inner", num_partitions=16, on=("doc_id",))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        col = t["vec"].combine_chunks()
        width = col.type.byte_width
        dim = width // 4
        raw = np.frombuffer(col.buffers()[1], np.uint8)
        start = col.offset * width
        mat = (
            raw[start : start + len(col) * width]
            .view(np.float32)
            .reshape(len(col), dim)
            .astype(np.float64)
        )
        langs = np.asarray(t["lang"])
        uniq, inv = np.unique(langs, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(np.repeat(uniq, dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.reshape(-1)),
                "c": pa.array(np.repeat(counts, dim)),
            }
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="n_vectors"))
        .to_pandas()
    )
    out["centroid"] = (out["s"] / out["n_vectors"]).round(6)
    out = out.drop(columns=["s"])
    return out.sort_values(["lang", "dim"]).reset_index(drop=True)


def emb_semantic_dedup(sf_dir: str, threshold: float = 0.38) -> pd.DataFrame:
    """Semantic dedup assignment: connected components over the exact
    cosine>=threshold pair graph (``emb_neardup_pairs``), every vector
    labeled with its component's minimum vec_id as the representative
    (singletons represent themselves). The pair list is the documented
    driver boundary (16 B/pair); components use the shared
    ``state.union_find.UnionFind`` up to the same edge threshold as
    the text tier, above which the distributed min-label-propagation
    swap-in takes over (same node → min-id contract). Keep/drop policy
    downstream is then one vectorized comparison: keep iff
    vec_id == rep_id."""
    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.state.union_find import (
        UnionFind,
        label_propagation_components,
    )

    pairs = emb_neardup_pairs(sf_dir, threshold=threshold)
    if len(pairs) > DedupConfig().distributed_components_threshold:
        edges = ray.data.from_pandas(
            pd.DataFrame(
                {"a": pairs["vec_a"].to_numpy(np.int64),
                 "b": pairs["vec_b"].to_numpy(np.int64)}
            )
        )
        comp = label_propagation_components(edges)
    else:
        uf = UnionFind()
        uf.add_edges(zip(pairs["vec_a"].to_numpy(), pairs["vec_b"].to_numpy()))
        comp = uf.components()

    ids_ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    # broadcast the component map as two sorted arrays: the per-batch
    # lookup is then one searchsorted, no Python-level dict probing
    comp_keys = np.fromiter(comp.keys(), np.int64, len(comp))
    comp_vals = np.fromiter(comp.values(), np.int64, len(comp))
    order = np.argsort(comp_keys)
    comp_ref = ray.put((comp_keys[order], comp_vals[order]))

    def assign(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(comp_ref)
        ids = np.asarray(t["vec_id"], np.int64)
        reps = ids.copy()
        if len(keys):
            idx = np.searchsorted(keys, ids).clip(0, len(keys) - 1)
            found = keys[idx] == ids
            reps[found] = vals[idx[found]]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "rep_id": pa.array(reps, pa.int64()),
                "is_rep": pa.array((reps == ids).astype(np.int64), pa.int64()),
            }
        )

    out = ids_ds.map_batches(assign, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)
