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
    simhash_tokens_batch,
)
from cloud_dedup_ray.functions.sketch import hash_strings_u64
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


def _sink_or_pandas(ds: ray.data.Dataset, sort_keys, out_dir: str | None):
    """Terminal step shared by the per-document pipelines: at driver /
    test scale the result funnels to a sorted pandas frame (the
    ``queries()`` contract), but per-row output at 100× scale must
    never materialize on the driver — pass ``out_dir`` and the workers
    stream the result straight to partitioned parquet (one file per
    block, resumable layout), returning the path instead of a frame.
    The two paths carry identical rows; ``tests/test_textops.py::
    test_parquet_sink_twin_matches_dataframe_path`` pins the parquet
    twin byte-for-byte against the DataFrame path per family."""
    if out_dir is not None:
        ds.write_parquet(out_dir)
        return out_dir
    out = ds.to_pandas()
    return out.sort_values(sort_keys).reset_index(drop=True)


def docs_exact_dedup(sf_dir: str, out_dir: str | None = None):
    """Exact dedup: hash-partition on md5(text), keep min doc_id as the
    representative (groupby shuffle on the digest — the E3 pattern)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def hashed(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "content_hash": md5_hex(t["text"])})

    from ray.data.aggregate import Count, Min

    return _sink_or_pandas(
        ds.map_batches(hashed, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(
            Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies")
        ),
        "content_hash",
        out_dir,
    )


def docs_dedup_keep_best(sf_dir: str, out_dir: str | None = None):
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

    return _sink_or_pandas(
        ds.map_batches(scored, batch_format="pyarrow")
        .groupby("fingerprint")
        .map_groups(best, batch_format="pandas"),
        "fingerprint",
        out_dir,
    )


def docs_token_count(sf_dir: str, out_dir: str | None = None):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return _sink_or_pandas(
        ds.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "n_tokens": token_count(t["text"])}
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        out_dir,
    )


def docs_token_count_bpe(sf_dir: str, out_dir: str | None = None):
    """LLM token-budget proxy: GPT-2-style pre-tokenizer regex count per
    doc (see ``functions.text.token_count_bpe``) — stateless vectorized
    map, pruned read."""
    from cloud_dedup_ray.functions.text import token_count_bpe

    ds = _docs(sf_dir, ["doc_id", "text"])
    return _sink_or_pandas(
        ds.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "n_bpe_tokens": token_count_bpe(t["text"])}
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        out_dir,
    )


def docs_train_split(sf_dir: str, out_dir: str | None = None):
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

    return _sink_or_pandas(
        ds.map_batches(assign, batch_format="pyarrow"), "doc_id", out_dir
    )


def docs_fingerprint(sf_dir: str, out_dir: str | None = None):
    """md5 fingerprint of whitespace-normalized lowercase text (an exact
    SQL twin exists); the rolling-hash winnowing fingerprint rides along
    for the rows-only variant."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return _sink_or_pandas(
        ds.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "fingerprint": md5_hex(normalize(t["text"]))}
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        out_dir,
    )


def docs_fingerprint64(sf_dir: str, out_dir: str | None = None):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return _sink_or_pandas(
        ds.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "fp64": fingerprint64(t["text"])}
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        out_dir,
    )


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


def docs_lang_id(sf_dir: str, out_dir: str | None = None):
    """Heuristic n-gram language ID (stateless vectorized stage)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return _sink_or_pandas(
        ds.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "lang_pred": lang_id(t["text"])}
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        out_dir,
    )


def docs_quality(sf_dir: str, out_dir: str | None = None):
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

    return _sink_or_pandas(
        ds.map_batches(feats, batch_format="pyarrow"), "doc_id", out_dir
    )


def docs_minhash_clusters(
    sf_dir: str, cfg: DedupConfig | None = None, out_dir: str | None = None
):
    """MinHash-LSH near-dup clustering over documents.text, reusing the
    full near-dup pipeline (actor-pool signer → banded groupby →
    union-find). With ``out_dir`` the assignments Dataset streams to
    partitioned parquet (the same sink shape ``cli.py`` uses for corpus
    clusters) instead of funneling through driver pandas."""
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus

    cfg = cfg or DedupConfig(shingle_k=3, jaccard_threshold=0.6)
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "content": t["text"]}),
        batch_format="pyarrow",
    ).materialize()
    res = cluster_corpus(ds, cfg, with_containment=False)
    return _sink_or_pandas(res.assignments, "doc_id", out_dir)


def docs_simhash(sf_dir: str, out_dir: str | None = None):
    """64-bit SimHash per doc (bit-cast to int64 for Arrow transport)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sh(t: pa.Table) -> pa.Table:
        vals = simhash_tokens_batch(normalize(t["text"]).to_pylist())
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(vals.view(np.int64))})

    return _sink_or_pandas(
        ds.map_batches(sh, batch_format="pyarrow"), "doc_id", out_dir
    )


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
        a_out, b_out, h_out = [], [], []
        if len(ids) == 0:
            order = np.empty(0, np.int64)
        else:
            order = np.lexsort((ids, cval, cid))
        # vectorized group-by-size (same shape as the LSH bucket-pair
        # kernel): dedup (bucket, id) rows — a doc's fp is constant, so
        # keep-first is exact — then emit equal-size buckets' pairs +
        # Hamming verify as ONE matrix op per distinct size
        if len(order):
            c1, c2, ki = cid[order], cval[order], ids[order]
            kf = fps[order]
            first = np.empty(ki.size, bool)
            first[0] = True
            first[1:] = (
                (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1]) | (ki[1:] != ki[:-1])
            )
            u1, u2 = c1[first], c2[first]
            ui, uf = ki[first], kf[first]
            bstart = np.empty(u1.size, bool)
            bstart[0] = True
            bstart[1:] = (u1[1:] != u1[:-1]) | (u2[1:] != u2[:-1])
            starts = np.flatnonzero(bstart)
            sizes = np.diff(np.append(starts, u1.size))
        else:
            starts = sizes = np.empty(0, np.int64)
        row_chunk = pair_chunk_rows  # bound the (chunk × bucket) temporaries
        for v in np.unique(sizes):
            v = int(v)
            if v < 2:
                continue
            rows = starts[sizes == v]
            npairs = v * (v - 1) // 2
            if npairs <= 4_000_000:
                ii, jj = np.triu_indices(v, k=1)
                step = max(1, 4_000_000 // npairs)
                for c in range(0, len(rows), step):
                    sel = rows[c : c + step, None] + np.arange(v)
                    mi, mf = ui[sel], uf[sel]
                    h = hamming64(mf[:, ii].ravel(), mf[:, jj].ravel())
                    keep = h <= max_hamming
                    a_out.append(mi[:, ii].ravel()[keep])
                    b_out.append(mi[:, jj].ravel()[keep])
                    h_out.append(h[keep].astype(np.int64))
            else:
                # giant bucket: chunked upper-triangle emission — still
                # COMPLETE (unlike the LSH tier's capped buckets, simhash
                # pairs are a final answer with a brute-force-equality
                # contract), but allocates O(row_chunk × v) not O(v²)
                for s in rows:
                    mem_ids = ui[s : s + v]
                    mem_fps = uf[s : s + v]
                    for lo_r in range(0, v - 1, row_chunk):
                        hi_r = min(lo_r + row_chunk, v - 1)
                        ii, jj = np.triu_indices(hi_r - lo_r, k=1, m=v - lo_r)
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


#: RE2 patterns shared verbatim with the DuckDB oracle (both engines are
#: RE2, so \s/\S and char classes behave identically)
URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def scrub_pii(texts: pa.Array) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Mask URLs then emails (order matters: emails inside URLs are
    already masked by the URL pass) — vectorized RE2 kernels. Returns
    (scrubbed, n_urls, n_emails)."""
    n_urls = pc.count_substring_regex(texts, URL_RE)
    no_urls = pc.replace_substring_regex(texts, URL_RE, "<URL>")
    n_emails = pc.count_substring_regex(no_urls, EMAIL_RE)
    scrubbed = pc.replace_substring_regex(no_urls, EMAIL_RE, "<EMAIL>")
    return scrubbed, n_urls, n_emails


def docs_scrub_pii(sf_dir: str, out_dir: str | None = None):
    """PII scrubbing (URL/email masking) over documents. The synthetic
    corpus carries no PII, so the query INJECTS deterministic
    doc_id-derived URL+email tokens before scrubbing — the oracle twin
    injects identically, making the masking verification non-trivial
    (an unscrubbed token fails the value hash). Stateless vectorized
    map; at scale this is a pure streaming transform."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        idstr = pc.cast(t["doc_id"], pa.string())
        injected = pc.binary_join_element_wise(
            t["text"], " contact u", idstr, "@mail.example.com or ",
            "https://docs.example.org/item/", idstr, "?ref=x done", "",
        )
        scrubbed, n_urls, n_emails = scrub_pii(injected)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_scrubbed": scrubbed,
                "n_urls": pc.cast(n_urls, pa.int64()),
                "n_emails": pc.cast(n_emails, pa.int64()),
            }
        )

    return _sink_or_pandas(
        ds.map_batches(scrub, batch_format="pyarrow"), "doc_id", out_dir
    )


def docs_repetition_stats(sf_dir: str, out_dir: str | None = None):
    """Gopher-style repetition signals per doc over normalized
    whitespace words: distinct-word ratio, duplicate-occurrence char
    ratio, top-word frequency ratio. Stateless per-doc map, vectorized
    with one lexsort over the exploded (doc, word) pairs per batch —
    no per-row Python loop."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        norm = normalize(t["text"])
        nonempty = np.asarray(pc.not_equal(norm, ""))
        words_col = pc.split_pattern(norm, " ").combine_chunks()
        lens = np.asarray(pc.list_value_length(words_col), np.int64)
        lens = np.where(nonempty, lens, 0)  # '' splits to [''] — drop it
        n_docs = len(lens)
        flat = np.asarray(words_col.flatten(), dtype=object)
        wchars = np.asarray(pc.utf8_length(words_col.flatten()), np.int64)
        # rebuild doc index honoring the zeroed empty docs
        raw_lens = np.asarray(pc.list_value_length(words_col), np.int64)
        docidx = np.repeat(np.arange(n_docs), raw_lens)
        keep = np.repeat(nonempty, raw_lens)
        flat, wchars, docidx = flat[keep], wchars[keep], docidx[keep]
        if len(flat):
            order = np.lexsort((flat, docidx))
            fs, ws, ds_ = flat[order], wchars[order], docidx[order]
            new_doc = np.concatenate([[True], ds_[1:] != ds_[:-1]])
            new_word = np.concatenate([[True], fs[1:] != fs[:-1]]) | new_doc
            n_distinct = np.bincount(ds_[new_word], minlength=n_docs)
            tot_chars = np.bincount(ds_, weights=ws, minlength=n_docs)
            dis_chars = np.bincount(
                ds_[new_word], weights=ws[new_word], minlength=n_docs
            )
            # run lengths of identical (doc, word) → top word per doc
            bounds = np.flatnonzero(new_word)
            run_len = np.diff(np.append(bounds, len(fs)))
            top_cnt = np.zeros(n_docs, np.int64)
            np.maximum.at(top_cnt, ds_[bounds], run_len)
        else:  # batch of only empty/whitespace docs
            n_distinct = np.zeros(n_docs, np.int64)
            tot_chars = np.zeros(n_docs, np.float64)
            dis_chars = np.zeros(n_docs, np.float64)
            top_cnt = np.zeros(n_docs, np.int64)
        n = lens.astype(np.float64)
        safe_n = np.where(n > 0, n, 1.0)
        safe_c = np.where(tot_chars > 0, tot_chars, 1.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(lens),
                "distinct_word_ratio": np.round(
                    np.where(n > 0, n_distinct / safe_n, 0.0), 6
                ),
                "dup_char_ratio": np.round(
                    np.where(
                        tot_chars > 0, (tot_chars - dis_chars) / safe_c, 0.0
                    ),
                    6,
                ),
                "top_word_ratio": np.round(
                    np.where(n > 0, top_cnt / safe_n, 0.0), 6
                ),
            }
        )

    return _sink_or_pandas(
        ds.map_batches(stats, batch_format="pyarrow"), "doc_id", out_dir
    )


def corpus_line_dedup(corpus_dir: str) -> pd.DataFrame:
    """C4/RefinedWeb-style LINE dedup over the source-code corpus: every
    non-empty line is kept only at its globally-first occurrence
    (ordered by repo, path, commit, line_no — boilerplate headers and
    license blocks collapse to one copy); empty lines always survive
    (document structure). Two shuffles: groupby(line) marks winners,
    groupby(file) reassembles. Empty lines never enter the line shuffle
    (they would form one giant skewed group), they rejoin via union.
    Output per file: line counts + sha256 of the deduped text (pins the
    exact reassembly, not just counts)."""
    import hashlib

    # pruned scan: the stage keys and reassembles on exactly these five
    # columns — lang/size/mtime/symlink_target never leave storage
    ds = ray.data.read_parquet(
        corpus_dir,
        columns=["repo", "path", "commit", "content", "is_symlink"],
    )

    def explode(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["is_symlink"], False), pc.is_valid(t["content"])
        )
        t = t.filter(mask)
        lines_col = pc.split_pattern(t["content"], "\n").combine_chunks()
        lens = np.asarray(pc.list_value_length(lines_col), np.int64)
        rep = np.repeat(np.arange(len(lens)), lens)
        line_no = np.arange(lens.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        return pa.table(
            {
                "repo": pc.take(t["repo"], pa.array(rep)),
                "path": pc.take(t["path"], pa.array(rep)),
                "commit": pc.take(t["commit"], pa.array(rep)),
                "line_no": pa.array(line_no),
                "line": lines_col.flatten(),
            }
        )

    lines = ds.map_batches(explode, batch_format="pyarrow")
    nonempty = lines.filter(expr="line != ''")
    empties = lines.filter(expr="line == ''").map_batches(
        lambda t: t.append_column("keep", pa.array(np.ones(t.num_rows, bool))),
        batch_format="pyarrow",
    )

    # COARSE-partitioned shuffles (stages/coarse.py rationale): lines
    # resp. files are near-unique keys, so a per-key map_groups would be
    # group-overhead-bound (21k Python group calls at n=600 measured
    # ~70 s). Both shuffles key on a 64-way deterministic hash partition
    # and each group call handles its whole partition vectorized. All
    # wide stages are Arrow-native end-to-end: the partition key is
    # functions/sketch.hash_strings_u64 (vectorized over the flat UTF-8
    # buffer, process-stable), sorts are Table.sort_by, and adjacency
    # marks compare slice(1) vs slice(0, n-1) — the string-heavy line
    # table never round-trips through pandas.
    P = 64

    def _adjacent_neq(col: pa.ChunkedArray) -> np.ndarray:
        """keep[i] = row i differs from row i-1 (exact string compare,
        vectorized; row 0 always True). Input must be pre-sorted."""
        arr = col.combine_chunks()
        n = len(arr)
        if n == 0:
            return np.empty(0, bool)
        neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        return np.concatenate([[True], np.asarray(neq)])

    def _file_key(t: pa.Table) -> pa.ChunkedArray:
        # fill_null first: binary_join_element_wise emits NULL if ANY
        # input is null, and a null key would make _adjacent_neq's
        # boolean mask null-bearing — silently merging a null-keyed
        # file into its neighbour. Nulls hash as empty strings
        # everywhere else (stable_id64's rule), so mirror that here.
        return pc.binary_join_element_wise(
            pc.fill_null(t["repo"], ""),
            pc.fill_null(t["path"], ""),
            pc.fill_null(t["commit"], ""),
            "\x1f",
        )

    def _add_line_part(t: pa.Table) -> pa.Table:
        part = (hash_strings_u64(t["line"]) % np.uint64(P)).astype(np.int64)
        return t.append_column("__part", pa.array(part))

    def _mark_part(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("line", "ascending"), ("repo", "ascending"),
             ("path", "ascending"), ("commit", "ascending"),
             ("line_no", "ascending")]
        )
        keep = _adjacent_neq(t["line"])
        return t.drop_columns(["__part"]).append_column(
            "keep", pa.array(keep)
        )

    marked = (
        nonempty.map_batches(_add_line_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_mark_part, batch_format="pyarrow")
    )

    def _add_file_part(t: pa.Table) -> pa.Table:
        part = (hash_strings_u64(_file_key(t)) % np.uint64(P)).astype(np.int64)
        return t.append_column("__fpart", pa.array(part))

    def _reassemble_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"repo": pa.array([], pa.string()),
             "path": pa.array([], pa.string()),
             "commit": pa.array([], pa.string()),
             "n_lines": pa.array([], pa.int64()),
             "n_kept": pa.array([], pa.int64()),
             "dedup_sha256": pa.array([], pa.string())}
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("repo", "ascending"), ("path", "ascending"),
             ("commit", "ascending"), ("line_no", "ascending")]
        )
        n = t.num_rows
        starts = np.flatnonzero(_adjacent_neq(_file_key(t)))
        bounds = np.append(starts, n)
        keep_v = np.asarray(t["keep"].combine_chunks())
        n_lines = np.diff(bounds)
        n_kept = np.add.reduceat(keep_v.astype(np.int64), bounds[:-1])
        # per-file deduped text: kept rows grouped into one list per
        # file (offsets = kept-row prefix counts at the boundaries),
        # joined in C++; only the per-FILE sha256 calls are Python
        kept_lines = t["line"].combine_chunks().filter(pa.array(keep_v))
        kept_pfx = np.concatenate([[0], np.cumsum(keep_v, dtype=np.int64)])
        offsets = kept_pfx[bounds]
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), kept_lines.cast(pa.large_string())
            ),
            pa.scalar("\n", pa.large_string()),
        )
        shas = [
            hashlib.sha256(s.encode()).hexdigest() for s in joined.to_pylist()
        ]
        first = pa.array(starts, pa.int64())
        return pa.table(
            {"repo": pc.take(t["repo"], first),
             "path": pc.take(t["path"], first),
             "commit": pc.take(t["commit"], first),
             "n_lines": pa.array(n_lines, pa.int64()),
             "n_kept": pa.array(n_kept, pa.int64()),
             "dedup_sha256": pa.array(shas, pa.string())}
        )

    out = (
        marked.union(empties)
        .map_batches(_add_file_part, batch_format="pyarrow")
        .groupby("__fpart")
        .map_groups(_reassemble_part, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["repo", "path", "commit"]).reset_index(drop=True)


def docs_dup_spans(sf_dir: str, win: int = 40, stride: int = 20) -> pd.DataFrame:
    """Exact substring-duplication signal (the Lee et al. "Deduplicating
    Training Data" shape at window granularity): every ``win``-char
    window at ``stride`` offsets is duplicated iff the identical text
    occurs in more than one distinct document anywhere in the corpus;
    per doc, report the duplicated-window fraction. Two shuffles, both
    COARSE hash-partitioned (stages/coarse.py rationale — windows are a
    near-unique key): groupby(hash(win)) marks duplicates vectorized,
    groupby(doc_id) aggregates the per-doc ratio. The explode loop is
    over window OFFSETS (len/stride iterations, each a vectorized Arrow
    slice over the whole batch), never over rows."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        n = np.asarray(pc.utf8_length(t["text"]), np.int64)
        n_wins = np.where(n >= win, (n - win) // stride + 1, 0)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "win": pa.array([], pa.string())}
        )
        max_w = int(n_wins.max()) if len(n_wins) else 0
        parts = []
        for j in range(max_w):
            mask = pa.array(n_wins > j)
            sub = t.filter(mask)
            off = j * stride
            parts.append(
                pa.table(
                    {
                        "doc_id": sub["doc_id"],
                        "win": pc.utf8_slice_codeunits(sub["text"], off, off + win),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else empty

    P = 64

    # Arrow-native wide stages (no pandas round-trip on the window
    # table — it is the widest data in the pipeline): the partition key
    # is the vectorized flat-buffer string hash, the group stage sorts
    # with Table.sort_by and marks window/doc boundaries by comparing
    # slice(1) vs slice(0, n-1) — only tiny int64/bool vectors reach
    # numpy, never the window strings.
    def _add_part(t: pa.Table) -> pa.Table:
        part = (hash_strings_u64(t["win"]) % np.uint64(P)).astype(np.int64)
        return t.append_column("__part", pa.array(part))

    def _mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "dup": pa.array([], pa.int64())}
            )
        t = t.sort_by([("win", "ascending"), ("doc_id", "ascending")])
        w = t["win"].combine_chunks()
        d = np.asarray(t["doc_id"], np.int64)
        n = len(w)
        new_win = np.concatenate(
            [[True], np.asarray(pc.not_equal(w.slice(1), w.slice(0, n - 1)))]
        )
        new_pair = new_win | np.concatenate([[True], d[1:] != d[:-1]])
        grp = np.cumsum(new_win) - 1
        ndocs = np.bincount(grp[new_pair])
        return pa.table(
            {"doc_id": pa.array(d),
             "dup": pa.array((ndocs[grp] > 1).astype(np.int64))}
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(_add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_windows"),
            Sum("dup", alias_name="n_dup_windows"),
        )
        .to_pandas()
    )
    out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
    out["dup_win_ratio"] = (out["n_dup_windows"] / out["n_windows"]).round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_ngram_df_topk(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Top-k word trigrams by DOCUMENT frequency (boilerplate detection:
    the n-grams shared by the most documents are the license headers /
    navigation chrome a corpus pipeline wants to spot). Pre-aggregated:
    each batch emits per-batch partial DF counts over its *distinct*
    (doc, gram) pairs — docs never span batches, so within-batch
    dedup is exact — then ONE small groupby(gram) sums partials and a
    sort+limit takes the head. The shuffle carries grams × batches, not
    grams × docs."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial_df(t: pa.Table) -> pa.Table:
        norm = normalize(t["text"])
        words_col = pc.split_pattern(norm, " ").combine_chunks()
        raw_lens = np.asarray(pc.list_value_length(words_col), np.int64)
        flat = np.asarray(words_col.flatten(), dtype=object)
        docidx = np.repeat(np.arange(len(raw_lens)), raw_lens)
        empty = pa.table(
            {"gram": pa.array([], pa.string()),
             "df_partial": pa.array([], pa.int64())}
        )
        if len(flat) < 3:
            return empty
        same_doc = docidx[:-2] == docidx[2:]
        if not same_doc.any():
            return empty
        grams = (
            flat[:-2][same_doc] + " " + flat[1:-1][same_doc]
            + " " + flat[2:][same_doc]
        )
        gdoc = docidx[:-2][same_doc]
        order = np.lexsort((grams, gdoc))
        gs, ds_ = grams[order], gdoc[order]
        uniq = np.concatenate([[True], (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])])
        vals, counts = np.unique(gs[uniq].astype(str), return_counts=True)
        return pa.table(
            {"gram": pa.array(vals), "df_partial": pa.array(counts, pa.int64())}
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("df_partial", alias_name="df"))
        .sort(["df", "gram"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["df"] = out["df"].astype("int64")
    return out.reset_index(drop=True)


def docs_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-language length quantiles via the VALUE-HISTOGRAM
    pattern: the wide step is a tiny groupby((lang, n_chars)) count —
    cardinality is languages × distinct lengths, independent of row
    count — and the driver walks the cumulative histogram to the exact
    ``quantile_disc`` indices (1-based ceil(p·n), verified against
    DuckDB). This is how exact medians stay cheap at 100 TB: no sort of
    the data, only of the distinct values."""
    from ray.data.aggregate import Count

    hist = (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    rows = []
    # exact rational quantiles so ceil(p*n) never drifts on float error
    qs = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)]
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy()
        cum = np.cumsum(g["n"].to_numpy())
        n = int(cum[-1])
        row = {"lang": lang}
        for name, num, den in qs:
            target = -(-num * n // den)  # ceil(num*n/den) in integers
            row[name] = int(vals[np.searchsorted(cum, target)])
        rows.append(row)
    out = pd.DataFrame(rows, columns=["lang", "p25", "p50", "p75", "p90"])
    return out.sort_values("lang").reset_index(drop=True)


def docs_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified downsampling (corpus rebalancing: keep
    10% of the dominant 'en', 50% of everything else) on a Knuth
    multiplicative hash of doc_id — stable across runs, batch sizes and
    cluster layouts, no shuffle, no RNG state. Thresholds are integers
    so the SQL twin is bit-identical."""
    ds = _docs(sf_dir, ["doc_id", "lang"])
    EN_T, OTHER_T = 429496729, 2147483648  # 10% / 50% of 2^32

    def samp(t: pa.Table) -> pa.Table:
        h = (np.asarray(t["doc_id"], np.int64) * 2654435761) % 4294967296
        thresh = np.where(np.asarray(pc.equal(t["lang"], "en")), EN_T, OTHER_T)
        return t.filter(pa.array(h < thresh))

    out = ds.map_batches(samp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _lang_token_partials(t: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """Shared tokenizer for the vocabulary operators: normalized
    whitespace tokens with their per-token language, empty tokens (from
    blank docs) dropped. Returns (lang_per_token, token_array)."""
    norm = normalize(t["text"])
    words = pc.split_pattern(norm, " ").combine_chunks()
    lens = np.asarray(pc.list_value_length(words), np.int64)
    flat = words.flatten()
    keep = np.asarray(pc.utf8_length(flat), np.int64) > 0
    langs = np.repeat(np.asarray(t["lang"], dtype=object), lens)[keep]
    return langs, flat.filter(pa.array(keep))


def _lang_token_count_partial(t: pa.Table) -> pa.Table:
    """Per-batch distinct (lang, token) counts — the shared combiner
    feeding both the exact-vocabulary rollup and the per-language
    heavy-hitter ranking."""
    langs, toks = _lang_token_partials(t)
    if len(toks) == 0:
        return pa.table(
            {"lang": pa.array([], pa.string()),
             "token": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
    g = (
        pd.DataFrame({"lang": langs, "token": np.asarray(toks, dtype=object)})
        .groupby(["lang", "token"], sort=False)
        .size()
        .reset_index(name="cnt")
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def docs_distinct_tokens_by_lang(sf_dir: str) -> pd.DataFrame:
    """EXACT per-language vocabulary size + token volume. The classic
    exact-distinct shape: each batch pre-aggregates its own distinct
    (lang, token) counts (vocabulary repeats heavily, so the shuffle
    carries distinct-pairs-per-batch, not every token), ONE
    groupby((lang, token)) sums the partials, and the per-language
    rollup runs over the already-tiny distinct-pair table. Compare
    :func:`docs_hll_tokens_by_lang` for the sketch that answers the
    same question in 2^p bytes per group."""
    ds = _docs(sf_dir, ["lang", "text"])

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(_lang_token_count_partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("cnt", alias_name="n_occ"))
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_distinct_tokens"),
            Sum("n_occ", alias_name="n_tokens_total"),
        )
        .to_pandas()
    )
    out["n_distinct_tokens"] = out["n_distinct_tokens"].astype("int64")
    out["n_tokens_total"] = out["n_tokens_total"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def docs_hll_tokens_by_lang(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Approximate per-language vocabulary via a mergeable HyperLogLog:
    each batch emits ONE 2^p-byte register row per language it saw
    (registers folded vectorized from the segmented-polynomial token
    hashes), and groupby(lang).map_groups merges with elementwise max.
    At 100 TB the shuffle moves batches x languages x 2^p bytes —
    independent of vocabulary size — where the exact twin above moves
    the distinct vocabulary itself. Deterministic (fixed hash, max-merge
    is order-free), so the pytest harness pins both the estimate error
    vs the exact count and byte-identical reruns."""
    from cloud_dedup_ray.functions.sketch import (
        hash_strings_u64,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    m = 1 << p
    ds = _docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs, toks = _lang_token_partials(t)
        out_langs: list[str] = []
        regs: list[bytes] = []
        if len(toks):
            hashes = hash_strings_u64(toks)
            order = np.argsort(langs, kind="stable")
            sl, sh = langs[order], hashes[order]
            bounds = np.flatnonzero(
                np.concatenate([[True], sl[1:] != sl[:-1]])
            )
            for i, b in enumerate(bounds):
                e = bounds[i + 1] if i + 1 < len(bounds) else len(sl)
                out_langs.append(sl[b])
                regs.append(hll_registers(sh[b:e], p).tobytes())
        return pa.table(
            {
                "lang": pa.array(out_langs, pa.string()),
                "registers": pa.array(regs, pa.binary(m)),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        stack = np.frombuffer(
            b"".join(df["registers"]), np.uint8
        ).reshape(len(df), m)
        est = hll_estimate(hll_merge(stack))
        return pd.DataFrame(
            {"lang": [df["lang"].iloc[0]], "n_distinct_hll": [int(round(est))]}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out["n_distinct_hll"] = out["n_distinct_hll"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def docs_novel_vs_train(sf_dir: str, m_bits: int = 1 << 20) -> pd.DataFrame:
    """Incremental-corpus admission: which val/test ("new shard") docs
    carry content NEVER seen in the train split? Exact answer, bloom-
    accelerated — the canonical broadcast-screen anti-join:

    1. one hashing pass tags every doc (side, md5 of normalized text);
    2. the train side folds into per-batch bloom partials (uint64
       words), OR-merged through a map_batches tree level before the
       driver touches them — what crosses to the driver is fan-in-
       reduced filter rows, never hashes;
    3. the merged filter is ``ray.put`` ONCE and read by every screen
       task: bloom-negative new docs are PROVABLY novel with zero
       shuffle; only bloom-positive ones (true matches + ~m/n FP) enter
       the exact groupby(content_hash) verify against the train hashes.

    At 100 TB the shuffle carries train hashes + the screened sliver of
    the new side instead of new x train; the filter is m_bits/8 bytes
    broadcast once per node. Output is exact regardless of m_bits —
    sizing only moves work between the free screen and the paid verify.
    """
    from cloud_dedup_ray.functions.sketch import bloom_contains, hash_strings_u64
    from cloud_dedup_ray.stages.bloomjoin import BLOOM_K, build_bloom

    ds = _docs(sf_dir, ["doc_id", "text"])

    def hashed(t: pa.Table) -> pa.Table:
        as_str = pc.cast(t["doc_id"], pa.string())
        first = np.asarray(pc.utf8_slice_codeunits(md5_hex(as_str), 0, 1))
        side = np.where(first < "c", "train", "new")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "content_hash": md5_hex(normalize(t["text"])),
                "side": pa.array(side),
            }
        )

    tagged = ds.map_batches(hashed, batch_format="pyarrow").materialize()

    def train_hashes(t: pa.Table) -> np.ndarray:
        mask = pc.equal(t["side"], "train")
        return hash_strings_u64(t.filter(mask)["content_hash"])

    bloom = build_bloom(tagged, train_hashes, m_bits, k=BLOOM_K)
    bloom_ref = ray.put(bloom)

    # ONE screen pass: the rehash + bloom probes run once per document;
    # the verdict column on the materialized result feeds both branches
    def screen(t: pa.Table) -> pa.Table:
        filt = ray.get(bloom_ref)
        maybe = bloom_contains(
            filt, hash_strings_u64(t["content_hash"]), k=BLOOM_K
        )
        return t.append_column("maybe", pa.array(maybe))

    screened = tagged.map_batches(screen, batch_format="pyarrow").materialize()

    def take_verify(t: pa.Table) -> pa.Table:
        """Rows the exact shuffle must see: every train row + the
        bloom-positive sliver of the new side."""
        is_new = np.asarray(pc.equal(t["side"], "new"))
        maybe = np.asarray(t["maybe"])
        return t.filter(pa.array(~is_new | maybe)).select(
            ["doc_id", "content_hash", "side"]
        )

    def take_novel(t: pa.Table) -> pa.Table:
        """Bloom-negative new rows: provably novel, no shuffle."""
        is_new = np.asarray(pc.equal(t["side"], "new"))
        maybe = np.asarray(t["maybe"])
        return t.filter(pa.array(is_new & ~maybe)).select(
            ["doc_id", "content_hash"]
        )

    def judge(t: pa.Table) -> pa.Table:
        """Group = one content_hash; its new rows are known iff any
        train row shares the hash."""
        is_train = np.asarray(pc.equal(t["side"], "train"))
        keep = t.filter(pa.array(~is_train))
        return pa.table(
            {
                "doc_id": pc.cast(keep["doc_id"], pa.int64()),
                "content_hash": keep["content_hash"],
                "is_novel": pa.array(
                    np.full(len(keep), 0 if is_train.any() else 1, np.int64)
                ),
            }
        )

    def _typed(df: pd.DataFrame) -> pd.DataFrame:
        """On a degenerate corpus Ray returns a column-less empty frame;
        rebuild the typed schema so astype/sort below can't KeyError
        (same guard as customers_without_big_orders)."""
        if df.empty and "doc_id" not in df.columns:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "content_hash": pd.Series([], dtype=object),
                 "is_novel": pd.Series([], dtype="int64")}
            )
        return df

    verified = _typed(
        screened.map_batches(take_verify, batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(judge, batch_format="pyarrow")
        .to_pandas()
    )
    novel_neg = _typed(
        screened.map_batches(take_novel, batch_format="pyarrow").to_pandas()
    )
    novel_neg["is_novel"] = np.int64(1)
    novel_neg["doc_id"] = novel_neg["doc_id"].astype("int64")
    out = pd.concat([verified, novel_neg], ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_cdc_dedup(
    sf_dir: str,
    min_size: int = 256,
    avg_bits: int = 10,
    max_size: int = 4096,
) -> pd.DataFrame:
    """Storage-style corpus dedup ratio via content-defined chunking:
    how many bytes would a chunk store hold for this corpus? Each batch
    gear-chunks its documents' UTF-8 bytes (vectorized rolling hash
    over the flat Arrow buffer, boundaries follow content so shared
    SPANS dedup even when documents differ elsewhere), hashes chunks
    with the shared segment kernel, and pre-aggregates per-batch
    distinct chunk counts; ONE groupby(chunk_hash) merges, and the
    per-corpus rollup is a driver-side fold of four scalars. Output is
    a single summary row — exact for the fixed chunk parameters,
    verified by the pure-Python chunker oracle in pytest."""
    from cloud_dedup_ray.functions.cdc import cdc_chunks
    from cloud_dedup_ray.functions.sketch import hash_byte_segments_u64

    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks().cast(pa.large_string())
        n = len(arr)
        empty = pa.table(
            {"chunk_hash": pa.array([], pa.int64()),
             "length": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], np.int64, count=n + 1,
                                offset=8 * arr.offset)
        lo = int(offsets[0])
        data = np.frombuffer(bufs[2], np.uint8, count=int(offsets[-1]) - lo,
                             offset=lo)
        doc_starts = (offsets[:-1] - lo).astype(np.int64)
        doc_ends = (offsets[1:] - lo).astype(np.int64)
        cs, ce, _ = cdc_chunks(data, doc_starts, doc_ends,
                               min_size, avg_bits, max_size)
        if len(cs) == 0:
            return empty
        h = hash_byte_segments_u64(data, cs, ce).view(np.int64)
        lens = ce - cs
        order = np.argsort(h, kind="stable")
        hs, ls = h[order], lens[order]
        starts = np.flatnonzero(np.concatenate([[True], hs[1:] != hs[:-1]]))
        cnt = np.diff(np.append(starts, len(hs)))
        return pa.table(
            {"chunk_hash": pa.array(hs[starts], pa.int64()),
             "length": pa.array(ls[starts], pa.int64()),
             "cnt": pa.array(cnt, pa.int64())}
        )

    from ray.data.aggregate import Min, Sum

    distinct = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("chunk_hash")
        .aggregate(Sum("cnt", alias_name="n_refs"), Min("length", alias_name="length"))
    )

    def rollup(t: pa.Table) -> pa.Table:
        refs = np.asarray(t["n_refs"], np.int64)
        lens = np.asarray(t["length"], np.int64)
        return pa.table(
            {"n_chunks": pa.array([int(refs.sum())], pa.int64()),
             "n_unique_chunks": pa.array([len(refs)], pa.int64()),
             "total_bytes": pa.array([int((refs * lens).sum())], pa.int64()),
             "unique_bytes": pa.array([int(lens.sum())], pa.int64())}
        )

    parts = distinct.map_batches(rollup, batch_format="pyarrow").to_pandas()
    row = parts.sum()
    total = int(row["total_bytes"])
    uniq = int(row["unique_bytes"])
    return pd.DataFrame(
        {
            "n_chunks": [int(row["n_chunks"])],
            "n_unique_chunks": [int(row["n_unique_chunks"])],
            "total_bytes": [total],
            "unique_bytes": [uniq],
            "dedup_ratio": [round(uniq / total, 6) if total else 1.0],
        }
    )


def docs_uniform_sample_k(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Deterministic uniform sample of EXACTLY k documents (corpus
    eval-set carving): rank by md5(doc_id) — stable across runs, batch
    sizes and cluster layouts — and keep the k smallest. Distributed
    top-k without a full sort: every batch keeps only its own k
    smallest keys, so the final sort touches k x n_batches rows, not
    the corpus."""
    ds = _docs(sf_dir, ["doc_id", "lang"])

    def partial_topk(t: pa.Table) -> pa.Table:
        key = md5_hex(pc.cast(t["doc_id"], pa.string()))
        keys = np.asarray(key, dtype=object)
        if len(keys) > k:
            keep = np.argsort(keys, kind="stable")[:k]
            t = t.take(pa.array(keep))
            key = key.take(pa.array(keep))
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "sample_key": key}
        )

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .sort("sample_key")
        .limit(k)
        .to_pandas()
    )
    return out.sort_values("sample_key").reset_index(drop=True)


def docs_top_tokens_per_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-language heavy hitters: the k most frequent tokens per
    language (tie broken to the lexicographically smaller token).
    Same partial-count shape as the vocabulary ops — the shuffle
    carries distinct (lang, token) pairs per batch — then the per-lang
    top-k is a map_groups over the already-aggregated count table."""
    ds = _docs(sf_dir, ["lang", "text"])

    from ray.data.aggregate import Sum

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "token"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["lang", "token", "n", "rank"]]

    out = (
        ds.map_batches(_lang_token_count_partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("cnt", alias_name="n"))
        .groupby("lang")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


def docs_prep_funnel(sf_dir: str, quality_threshold: float = 0.7) -> pd.DataFrame:
    """The canonical corpus-prep pipeline as ONE flagship query —
    language agreement gate → quality gate → exact dedup — reporting
    the survivor count after each stage. Everything rides a single
    map_batches pass and ONE shuffle: each batch emits its stage-count
    partials as a sentinel row ('__counts__' cannot collide with an
    md5 hex fingerprint) alongside its distinct surviving
    fingerprints, so the groupby simultaneously sums the counts and
    dedups the fingerprints. The DuckDB twin recomposes the published
    lang-ID and quality oracle SQL as CTEs — stage semantics are
    pinned to the same published kernels, not re-derived."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        lp = np.asarray(lang_id(t["text"]), dtype=object)
        q = np.asarray(quality_score(quality_features(t["text"])), np.float64)
        lang_ok = lp == np.asarray(t["lang"], dtype=object)
        qual_ok = lang_ok & (q >= quality_threshold)
        fps = np.unique(
            np.asarray(md5_hex(normalize(t["text"])), dtype=object)[qual_ok]
        )
        return pa.table(
            {
                "fingerprint": pa.array(
                    np.concatenate([["__counts__"], fps]).astype(object),
                    pa.string(),
                ),
                "n_total": pa.array(
                    [len(t)] + [0] * len(fps), pa.int64()
                ),
                "n_lang": pa.array(
                    [int(lang_ok.sum())] + [0] * len(fps), pa.int64()
                ),
                "n_qual": pa.array(
                    [int(qual_ok.sum())] + [0] * len(fps), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fingerprint")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_lang", alias_name="n_lang"),
            Sum("n_qual", alias_name="n_qual"),
        )
        .to_pandas()
    )
    if agg.empty or "fingerprint" not in agg.columns:
        # empty corpus: no batches reached the groupby (an empty
        # aggregate also loses its column names)
        counts = {"n_total": 0, "n_lang": 0, "n_qual": 0}
        n_dedup = 0
    else:
        counts = agg[agg["fingerprint"] == "__counts__"].iloc[0]
        n_dedup = int((agg["fingerprint"] != "__counts__").sum())
    return pd.DataFrame(
        {
            "stage_idx": pd.array([0, 1, 2, 3], dtype="int64"),
            "stage": ["total", "lang_match", "quality", "exact_dedup"],
            "n_docs": pd.array(
                [int(counts["n_total"]), int(counts["n_lang"]),
                 int(counts["n_qual"]), n_dedup],
                dtype="int64",
            ),
        }
    )
