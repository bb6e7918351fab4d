"""Training-data text operators over the ``documents`` table:
exact dedup, MinHash-LSH / SimHash / n-gram-Jaccard near-dup, language
ID, quality scoring, token counting, fingerprinting.

SQL-checkable ops (exact dedup, token counts, fingerprints, stats) have
DuckDB oracle twins; sketch-based ops are verified by their own pytest
harnesses (planted truth / brute-force ground truth) and get rows-only
driver checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.hashing import md5_hex
from cloud_dedup_ray.functions.simhash import (
    hamming64,
    simhash_tokens,
    simhash_tokens_batch,
)
from cloud_dedup_ray.functions.text import (
    char_ngrams,
    fingerprint64,
    lang_id,
    normalize,
    quality_features,
    quality_score,
    token_count,
)


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def docs_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash-partition on md5(text), keep min doc_id as the
    representative (groupby shuffle on the digest — the E3 pattern)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def hashed(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "content_hash": md5_hex(t["text"])})

    from ray.data.aggregate import Count, Min

    out = (
        ds.map_batches(hashed, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies"))
        .to_pandas()
    )
    return out.sort_values("content_hash").reset_index(drop=True)


def docs_token_count(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_tokens": token_count(t["text"])}),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_fingerprint(sf_dir: str) -> pd.DataFrame:
    """md5 fingerprint of whitespace-normalized lowercase text (an exact
    SQL twin exists); the rolling-hash winnowing fingerprint rides along
    for the rows-only variant."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "fingerprint": md5_hex(normalize(t["text"]))}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_fingerprint64(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "fp64": fingerprint64(t["text"])}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Mean

    out = (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars"))
        .to_pandas()
    )
    out["avg_chars"] = out["avg_chars"].round(4)
    return out.sort_values("lang").reset_index(drop=True)


def docs_lang_id(sf_dir: str) -> pd.DataFrame:
    """Heuristic n-gram language ID (stateless vectorized stage)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "lang_pred": lang_id(t["text"])}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_quality(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        f = quality_features(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                **{k: v for k, v in f.items()},
                "quality": quality_score(f),
            }
        )

    out = ds.map_batches(feats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_minhash_clusters(sf_dir: str, cfg: DedupConfig | None = None) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering over documents.text, reusing the
    full near-dup pipeline (actor-pool signer → banded groupby →
    union-find)."""
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus

    cfg = cfg or DedupConfig(shingle_k=3, jaccard_threshold=0.6)
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "content": t["text"]}),
        batch_format="pyarrow",
    ).materialize()
    res = cluster_corpus(ds, cfg, with_containment=False)
    out = res.assignments.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per doc (bit-cast to int64 for Arrow transport)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sh(t: pa.Table) -> pa.Table:
        vals = simhash_tokens_batch(normalize(t["text"]).to_pylist())
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(vals.view(np.int64))})

    out = ds.map_batches(sh, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_simhash_pairs(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup pairs within Hamming ≤ k, blocked on PAIRS of
    8-bit fingerprint chunks (Manku et al. WWW'07 multi-table scheme):
    with the 64-bit fingerprint split into 8 chunks, ≤6 differing bits
    leave at least 8−6 = 2 chunks exactly equal (pigeonhole), so every
    true pair collides in at least one of the C(8,2) = 28 chunk-pair
    tables. (Blocking on single 16-bit chunks — the obvious variant —
    only guarantees recall for Hamming ≤ 3.)

    Distributed shape mirrors the MinHash-LSH tier: simhash map_batches
    → 28 (table_id, key16, doc_id, fp) rows per doc → coarse-partitioned
    groupby → per-bucket pair emission + exact Hamming verify inside the
    group task (vectorized), dedup on the driver. Zero-fingerprint
    (empty) docs are excluded — they are all mutually "identical" and
    belong to the exact tier."""
    from itertools import combinations as _combos

    from cloud_dedup_ray.stages import coarse

    ds = _docs(sf_dir, ["doc_id", "text"])
    combos = list(_combos(range(8), 2))

    def sh_rows(t: pa.Table) -> pa.Table:
        vals = simhash_tokens_batch(normalize(t["text"]).to_pylist())
        ids = np.asarray(t["doc_id"], np.int64)
        nonzero = vals != 0
        vals, ids = vals[nonzero], ids[nonzero]
        n = len(ids)
        chunks = np.stack(
            [((vals >> np.uint64(8 * c)) & np.uint64(0xFF)).astype(np.int64)
             for c in range(8)],
            axis=1,
        )  # (n, 8)
        tids, keys = [], []
        for tid, (ci, cj) in enumerate(combos):
            tids.append(np.full(n, tid, np.int32))
            keys.append(chunks[:, ci] << 8 | chunks[:, cj])
        k = len(combos)
        return pa.table(
            {
                "chunk_id": np.concatenate(tids),
                "chunk_val": np.concatenate(keys),
                "doc_id": np.tile(ids, k),
                "fp": np.tile(vals.view(np.int64), k),
            }
        )

    def _add_part(t: pa.Table) -> pa.Table:
        key = (
            np.asarray(t["chunk_val"], np.int64).view(np.uint64)
            ^ (np.asarray(t["chunk_id"]).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        )
        part = (coarse.splitmix64(key) % np.uint64(32)).astype(np.int32)
        return t.append_column("__part", pa.array(part))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        cid = np.asarray(t["chunk_id"], np.int64)
        cval = np.asarray(t["chunk_val"], np.int64)
        ids = np.asarray(t["doc_id"], np.int64)
        fps = np.asarray(t["fp"], np.int64).view(np.uint64)
        order = np.lexsort((ids, cval, cid))
        keys = np.stack([cid[order], cval[order]], axis=1)
        a_out, b_out, h_out = [], [], []
        for sl in coarse.group_slices(order, keys):
            idx = order[sl]
            mem_ids, first = np.unique(ids[idx], return_index=True)
            if len(mem_ids) < 2:
                continue
            mem_fps = fps[idx][first]
            ii, jj = np.triu_indices(len(mem_ids), k=1)
            h = hamming64(mem_fps[ii], mem_fps[jj])
            keep = h <= max_hamming
            a_out.append(mem_ids[ii][keep])
            b_out.append(mem_ids[jj][keep])
            h_out.append(h[keep].astype(np.int64))
        if not a_out:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_a": np.concatenate(a_out),
                "doc_b": np.concatenate(b_out),
                "hamming": np.concatenate(h_out),
            }
        )

    bucket_pairs.__name__ = "simhash_bucket_pairs"
    out = (
        ds.map_batches(sh_rows, batch_format="pyarrow")
        .map_batches(_add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    # a pair can collide in several chunks → dedup on the driver
    return (
        out.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def docs_ngram_jaccard_pairs(
    sf_dir: str, n: int = 5, threshold: float = 0.75
) -> pd.DataFrame:
    """Character-n-gram Jaccard near-dup pairs. Candidate blocking via
    MinHash-LSH (reuses the signer at n-gram granularity is overkill at
    doc counts here; we block on doc-length buckets — |J ≥ τ| implies a
    length ratio bound — then verify exactly, vectorized per pair)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    rows = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "norm": normalize(t["text"])}
        ),
        batch_format="pyarrow",
    ).take_all()
    grams = {r["doc_id"]: char_ngrams(r["norm"], n) for r in rows}
    ids = sorted(grams, key=lambda d: len(grams[d]))
    out = []
    for i, a in enumerate(ids):
        ga = grams[a]
        if not ga:
            continue
        for b in ids[i + 1 :]:
            gb = grams[b]
            if len(ga) < threshold * len(gb):
                break
            inter = len(ga & gb)
            j = inter / (len(ga) + len(gb) - inter)
            if j >= threshold:
                out.append((min(a, b), max(a, b), round(j, 6)))
    return (
        pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
