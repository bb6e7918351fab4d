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
from cloud_dedup_ray.functions.simhash import hamming64, simhash_tokens
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
        vals = np.array(
            [simhash_tokens(x) for x in normalize(t["text"]).to_pylist()],
            np.uint64,
        )
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(vals.view(np.int64))})

    out = ds.map_batches(sh, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_simhash_pairs(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup candidate pairs within Hamming ≤ k, blocked on
    16-bit fingerprint chunks (Manku et al. WWW'07 table approach: a
    pair within Hamming 6 of 64 bits shares at least one of 4 16-bit
    chunks exactly)."""
    sh = docs_simhash(sf_dir)
    ids = sh["doc_id"].to_numpy()
    fps = sh["simhash"].to_numpy().view(np.uint64)
    from collections import defaultdict

    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, f in enumerate(fps):
        for c in range(4):
            chunk = int((f >> np.uint64(16 * c)) & np.uint64(0xFFFF))
            buckets[(c, chunk)].append(i)
    cand = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for ii in range(len(members)):
            for jj in range(ii + 1, len(members)):
                cand.add((members[ii], members[jj]))
    rows = []
    for i, j in cand:
        d = int(hamming64(fps[i : i + 1], fps[j])[0])
        if d <= max_hamming:
            a, b = int(ids[i]), int(ids[j])
            rows.append((min(a, b), max(a, b), d))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
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
