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


def docs_dedup_keep_best(sf_dir: str) -> pd.DataFrame:
    """Quality-ranked dedup: group docs by the md5 of their whitespace-
    normalized lowercase text (so copies that differ only in case or
    spacing collide) and keep the highest-quality copy per group, tie
    broken to the min doc_id — the "keep best extraction, not first
    seen" policy a training-data pipeline wants. One shuffle: per-batch
    (fingerprint, quality) partials → groupby(fingerprint) argmax."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scored(t: pa.Table) -> pa.Table:
        f = quality_features(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": md5_hex(normalize(t["text"])),
                "quality": quality_score(f),
            }
        )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["quality", "doc_id"], ascending=[False, True])
        top = df.iloc[0]
        return pd.DataFrame(
            {
                "fingerprint": [top["fingerprint"]],
                "best_doc_id": [int(top["doc_id"])],
                "best_quality": [float(top["quality"])],
                "n_copies": [len(df)],
            }
        )

    out = (
        ds.map_batches(scored, batch_format="pyarrow")
        .groupby("fingerprint")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("fingerprint").reset_index(drop=True)


def docs_token_count(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_tokens": token_count(t["text"])}),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_token_count_bpe(sf_dir: str) -> pd.DataFrame:
    """LLM token-budget proxy: GPT-2-style pre-tokenizer regex count per
    doc (see ``functions.text.token_count_bpe``) — stateless vectorized
    map, pruned read."""
    from cloud_dedup_ray.functions.text import token_count_bpe

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": token_count_bpe(t["text"])}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_train_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-based train/val/test assignment — the
    standard leakage-safe split for training corpora (stable across
    runs and cluster sizes, no shuffle, no state): bucket on the first
    hex digit of md5(doc_id) → 12/16 train, 2/16 val, 2/16 test.
    Stateless vectorized map; SQL twin uses the same md5 text form."""
    ds = _docs(sf_dir, ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        as_str = pc.cast(t["doc_id"], pa.string())
        first = np.asarray(pc.utf8_slice_codeunits(md5_hex(as_str), 0, 1))
        split = np.where(first < "c", "train", np.where(first < "e", "val", "test"))
        return pa.table({"doc_id": t["doc_id"], "split": pa.array(split)})

    out = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
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


def docs_simhash_pairs(
    sf_dir: str, max_hamming: int = 6, pair_chunk_rows: int = 1024
) -> pd.DataFrame:
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
        row_chunk = pair_chunk_rows  # bound the (chunk × bucket) temporaries
        for sl in coarse.group_slices(order, keys):
            idx = order[sl]
            mem_ids, first = np.unique(ids[idx], return_index=True)
            if len(mem_ids) < 2:
                continue
            mem_fps = fps[idx][first]
            # chunked upper-triangle emission: still COMPLETE (unlike the
            # LSH tier's capped buckets, simhash pairs are a final answer
            # with a brute-force-equality contract), but a boilerplate
            # bucket of b docs allocates O(row_chunk × b) not O(b²)
            n = len(mem_ids)
            for lo_r in range(0, n - 1, row_chunk):
                hi_r = min(lo_r + row_chunk, n - 1)
                ii, jj = np.triu_indices(hi_r - lo_r, k=1, m=n - lo_r)
                ii = ii + lo_r
                jj = jj + lo_r
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


class _NGramSigner:
    """Actor-pool stage: (doc_id, text) batch → (doc_id, n_shingles,
    bands). Hashes char n-grams once per doc and MinHash-signs them; the
    output schema matches the token-shingle signer so the LSH band
    explode/partition/pair stages are reused verbatim."""

    def __init__(self, n: int, num_perm: int, num_bands: int, seed: int):
        from cloud_dedup_ray.functions.minhash import make_hasher

        self.n = n
        self.num_bands = num_bands
        self.hasher = make_hasher("oph", num_perm, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        from cloud_dedup_ray.functions.minhash import band_hashes
        from cloud_dedup_ray.functions.text import char_ngrams_hashed

        texts = normalize(t["text"]).to_pylist()
        gram_sets = [char_ngrams_hashed(x or "", self.n) for x in texts]
        n_grams = np.fromiter((g.size for g in gram_sets), np.int64, len(gram_sets))
        sigs = self.hasher.signatures(gram_sets)
        bands = band_hashes(sigs, self.num_bands)
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1)), self.num_bands
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_shingles": pa.array(n_grams),
                "bands": band_col,
            }
        )


def docs_ngram_jaccard_pairs(
    sf_dir: str,
    n: int = 5,
    threshold: float = 0.75,
    num_perm: int = 128,
    num_bands: int = 32,
    bucket_cap: int = 1024,
) -> pd.DataFrame:
    """Character-n-gram Jaccard near-dup pairs, fully distributed:
    MinHash-LSH over hashed char n-grams generates candidates (signer
    actor pool → band explode → coarse-partitioned bucket groupby, the
    same path as the token-shingle tier), then every candidate pair is
    verified with EXACT gram-set Jaccard in chunked Ray tasks — no
    driver-side O(n²) loop and no whole-corpus materialization; the
    driver holds only the candidate edge list (≪ corpus).

    Recall: r = num_perm/num_bands = 4 rows/band → a J = 0.75 pair is
    missed with probability (1−0.75⁴)³² ≈ 5·10⁻⁶. Precision is exact
    (every emitted pair is verified). Buckets above ``bucket_cap`` emit
    chain+star edges (skew guard) — that under-enumerates *pairs* for
    mega-buckets, so the cap is set well above the dedup tier's; a
    corpus where thousands of docs share a bucket genuinely has O(b²)
    qualifying pairs and that output volume is the query's semantics."""
    from cloud_dedup_ray.stages.minhash_stage import (
        add_bucket_partition,
        emit_bucket_pairs,
        explode_bands,
    )

    ds = _docs(sf_dir, ["doc_id", "text"])
    cand = (
        ds.map_batches(
            _NGramSigner,
            fn_constructor_kwargs={
                "n": n, "num_perm": num_perm, "num_bands": num_bands, "seed": 42,
            },
            batch_format="pyarrow",
            concurrency=(1, 8),
            num_cpus=1,
        )
        .map_batches(explode_bands, batch_format="pyarrow")
        .map_batches(add_bucket_partition(32), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(emit_bucket_pairs(bucket_cap), batch_format="pyarrow")
        .to_pandas()
    )
    cand = cand[cand["a"] >= 0]  # drop bucket-size histogram rows
    pairs = list(
        cand[["a", "b"]].drop_duplicates().itertuples(index=False, name=None)
    )
    out = _exact_ngram_jaccard(ds, pairs, n, threshold)
    return (
        pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _exact_ngram_jaccard(
    docs: ray.data.Dataset,
    pairs: list[tuple[int, int]],
    n: int,
    threshold: float,
) -> list[tuple[int, int, float]]:
    """Exact char-n-gram Jaccard for candidate pairs: the pair list is
    chunked, each chunk's normalized texts routed store-to-store to its
    scoring task (``neardup._routed_text_exchange`` — no text lands on
    the driver), each doc's grams hashed once per task."""
    if not pairs:
        return []
    from cloud_dedup_ray.functions.text import char_ngrams_hashed
    from cloud_dedup_ray.pipelines.neardup import (
        _docs_of_tables,
        _routed_text_exchange,
    )

    def _score(*args):
        *parts, chunk = args
        docs_map = _docs_of_tables(parts)
        grams: dict[int, np.ndarray] = {}
        out = []
        for x, y in chunk:
            for d in (x, y):
                if d not in grams:
                    grams[d] = char_ngrams_hashed(docs_map.get(d, ""), n)
            gx, gy = grams[x], grams[y]
            if not gx.size or not gy.size:
                continue
            inter = np.intersect1d(gx, gy, assume_unique=True).size
            j = inter / (gx.size + gy.size - inter)
            if j >= threshold:
                out.append((min(x, y), max(x, y), round(j, 6)))
        return out

    chunk_size = max(64, len(pairs) // 32)
    chunks = [pairs[i : i + chunk_size] for i in range(0, len(pairs), chunk_size)]
    needs = [
        np.unique(np.asarray([d for p in c for d in p], np.int64)) for c in chunks
    ]
    out: list[tuple[int, int, float]] = []
    for res in _routed_text_exchange(docs, needs, _score, chunks, col="text"):
        out.extend(res)
    return out
