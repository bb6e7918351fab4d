"""Near-dup tier: MinHash/LSH clustering + suffix-array containment on
the planted-truth synthetic corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.suffixarray import SuffixArray
from cloud_dedup_ray.pipelines.neardup import cluster_corpus
from cloud_dedup_ray.stages.project import project_corpus


def test_suffix_array_contains():
    sa = SuffixArray("the quick brown fox jumps over the lazy dog")
    assert sa.contains("quick brown")
    assert sa.contains("the lazy dog")
    assert sa.contains("t")
    assert not sa.contains("wolf")
    assert not sa.contains("dog!")
    assert SuffixArray("").contains("")
    assert not SuffixArray("").contains("x")


def test_suffix_array_matches_python_in():
    import random

    rng = random.Random(3)
    text = "".join(rng.choice("abcab ") for _ in range(500))
    sa = SuffixArray(text)
    for _ in range(50):
        i = rng.randrange(len(text))
        j = i + rng.randrange(1, 20)
        pat = text[i:j]
        assert sa.contains(pat)
    for _ in range(20):
        pat = "".join(rng.choice("xyz") for _ in range(4))
        assert sa.contains(pat) == (pat in text)


@pytest.fixture(scope="module")
def clustered(small_corpus):
    ds = ray.data.from_arrow(small_corpus)
    proj = project_corpus(ds, drop_content=False)
    corpus = proj.filter(expr="is_symlink == False").materialize()
    cfg = DedupConfig(bucket_pair_cap=32)
    res = cluster_corpus(corpus, cfg)
    rows = {r["doc_id"]: r["cluster_id"] for r in res.assignments.take_all()}
    # doc_id → (repo, path, content)
    meta = {
        r["doc_id"]: (r["repo"], r["path"])
        for r in corpus.select_columns(["doc_id", "repo", "path"]).take_all()
    }
    return res, rows, meta, small_corpus


def _ids_by_path(meta, pred):
    return [d for d, (repo, path) in meta.items() if pred(repo, path)]


def test_exact_clones_share_cluster(clustered, small_corpus):
    res, rows, meta, corpus = clustered
    # every content duplicated across repos (same path in 2 repos from datagen
    # "exact clones") must cluster together
    import collections

    by_content = collections.defaultdict(list)
    tbl = corpus.to_pylist()
    for r in tbl:
        if r["is_symlink"] or len(r["content"]) < 50:
            continue
        by_content[r["content"]].append((r["repo"], r["path"]))
    path_to_doc = {(repo, p): d for d, (repo, p) in meta.items()}
    n_groups = 0
    for content, locs in by_content.items():
        if len(locs) < 2:
            continue
        ids = [path_to_doc[l] for l in locs if l in path_to_doc]
        if len(ids) < 2:
            continue
        n_groups += 1
        assert len({rows[d] for d in ids}) == 1, f"clones split: {locs}"
    assert n_groups > 5


def test_license_boilerplate_single_cluster(clustered):
    res, rows, meta, _ = clustered
    lic = _ids_by_path(meta, lambda repo, p: "LICENSE" in p)
    assert len(lic) > 3
    assert len({rows[d] for d in lic}) == 1


def test_near_dups_cluster(clustered):
    res, rows, meta, _ = clustered
    # vendor/<orig path> rows are small mutations of the original
    vendor = _ids_by_path(meta, lambda repo, p: p.startswith("vendor/"))
    path_to_doc = {(repo, p): d for d, (repo, p) in meta.items()}
    hits = total = 0
    for d, (repo, p) in meta.items():
        if not p.startswith("vendor/"):
            continue
        orig = p[len("vendor/"):]
        origs = [dd for dd, (r2, p2) in meta.items() if p2 == orig]
        if not origs:
            continue
        total += 1
        if any(rows[d] == rows[o] for o in origs):
            hits += 1
    assert total > 5
    assert hits / total >= 0.9, f"near-dup recall {hits}/{total}"


def test_containment_detected(clustered):
    res, rows, meta, _ = clustered
    # bundle files embed a base file verbatim
    bundles = _ids_by_path(meta, lambda repo, p: p.startswith("bundle/"))
    assert bundles
    n_joined = sum(
        1 for d in bundles
        if any(rows[d] == rows[o] and o != d for o in rows)
    )
    assert n_joined >= 1


def test_non_dups_stay_singletons(clustered):
    res, rows, meta, _ = clustered
    # a majority of base files are unique → their clusters are singletons
    import collections

    sizes = collections.Counter(rows.values())
    singleton_docs = sum(1 for d, c in rows.items() if sizes[c] == 1)
    assert singleton_docs > len(rows) * 0.4


def test_metrics_present(clustered):
    res, _, _, _ = clustered
    for k in (
        "n_candidates n_verified n_clusters lsh_buckets lsh_bucket_max "
        "lsh_top10_buckets sec_sign sec_lsh_verify"
    ).split():
        assert k in res.metrics
    assert res.metrics["n_verified"] <= res.metrics["n_candidates"]


def test_deterministic_across_runs(small_corpus):
    ds = ray.data.from_arrow(small_corpus)
    proj = project_corpus(ds, drop_content=False)
    corpus = proj.filter(expr="is_symlink == False").materialize()
    cfg = DedupConfig()
    r1 = cluster_corpus(corpus, cfg, with_containment=False)
    r2 = cluster_corpus(corpus, cfg, with_containment=False)
    a1 = {r["doc_id"]: r["cluster_id"] for r in r1.assignments.take_all()}
    a2 = {r["doc_id"]: r["cluster_id"] for r in r2.assignments.take_all()}
    assert a1 == a2


def test_simhash_pairs_complete_vs_bruteforce():
    """The 28-table chunk-pair blocking must find EVERY pair within
    Hamming ≤ 6 (pigeonhole guarantee) — compared against brute force
    over all fingerprint pairs."""
    import numpy as np

    from cloud_dedup_ray.functions.simhash import hamming64
    from cloud_dedup_ray.pipelines.textops import docs_simhash, docs_simhash_pairs

    sf = "/root/testdata/sf0.001"
    df = docs_simhash_pairs(sf)
    sh = docs_simhash(sf)
    ids = sh["doc_id"].to_numpy()
    fps = sh["simhash"].to_numpy().view(np.uint64)
    truth = set()
    for i in range(len(ids)):
        if fps[i] == 0:
            continue
        rest = fps[i + 1:]
        d = hamming64(rest, fps[i])
        for j in np.nonzero((d <= 6) & (rest != 0))[0]:
            a, b = int(ids[i]), int(ids[i + 1 + j])
            truth.add((min(a, b), max(a, b)))
    got = set(zip(df.doc_a, df.doc_b))
    assert got == truth

    # chunked pair emission (pair_chunk_rows smaller than the buckets)
    # must stay COMPLETE — same pair set as the single-chunk path
    df_chunked = docs_simhash_pairs(sf, pair_chunk_rows=2)
    assert set(zip(df_chunked.doc_a, df_chunked.doc_b)) == truth


def test_distributed_components_swapin_matches_driver_uf(small_corpus):
    """Forcing the label-propagation reducer (threshold 0) must yield
    byte-identical cluster assignments to the driver union-find."""
    import dataclasses

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus
    from cloud_dedup_ray.stages.project import project_corpus

    corpus = (
        project_corpus(ray.data.from_arrow(small_corpus), drop_content=False)
        .filter(expr="is_symlink == False")
        .materialize()
    )
    base = DedupConfig()
    forced = dataclasses.replace(base, distributed_components_threshold=0)
    # with_containment=False: the containment pass needs the driver UF
    # as its precomp, so label propagation only takes over without it
    a1 = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_corpus(
            corpus, base, with_containment=False
        ).assignments.take_all()
    }
    a2 = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_corpus(
            corpus, forced, with_containment=False
        ).assignments.take_all()
    }
    assert a1 == a2


def test_ngram_jaccard_pairs_match_bruteforce():
    """The distributed pipeline (char-n-gram MinHash-LSH blocking +
    exact chunked verify) must emit exactly the brute-force pair set
    WITH identical jaccard values — hashed-gram Jaccard equals
    string-set Jaccard."""
    import pandas as pd
    import pyarrow as pa

    from cloud_dedup_ray.functions.text import char_ngrams, normalize
    from cloud_dedup_ray.pipelines.textops import docs_ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    got = docs_ngram_jaccard_pairs(sf)

    df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    norm = normalize(pa.array(df.text.tolist())).to_pylist()
    grams = {d: char_ngrams(t or "", 5) for d, t in zip(df.doc_id, norm)}
    ids = sorted(grams)
    truth = []
    for i, a in enumerate(ids):
        ga = grams[a]
        if not ga:
            continue
        for b in ids[i + 1:]:
            gb = grams[b]
            if not gb:
                continue
            inter = len(ga & gb)
            j = inter / (len(ga) + len(gb) - inter)
            if j >= 0.75:
                truth.append((a, b, round(j, 6)))
    assert list(got.itertuples(index=False, name=None)) == sorted(truth)


def test_task_and_actor_signers_byte_identical(small_corpus):
    """signer_mode='task' (per-worker-process cached state) and
    signer_mode='actor' (stateful actor pool) must produce byte-identical
    signatures, bands and anchors — the state is deterministic from the
    config either way."""
    from cloud_dedup_ray.pipelines.neardup import sign_dataset

    ds = ray.data.from_arrow(small_corpus)
    proj = project_corpus(ds, drop_content=False)
    corpus = proj.filter(expr="is_symlink == False").materialize()

    def rows(mode):
        cfg = DedupConfig(signer_mode=mode, signer_concurrency=(2, 2))
        out = sign_dataset(corpus, cfg).to_pandas()
        return {
            r.doc_id: (tuple(r.sig), tuple(r.bands), tuple(r.anchors),
                       r.n_shingles)
            for r in out.itertuples()
        }

    assert rows("task") == rows("actor")


def test_flat_exchange_matches_dataset_shuffle(small_corpus):
    """The flat-task exchange (exchange_blocks) and the Dataset groupby
    must emit the IDENTICAL candidate-edge set, bucket histogram and
    anchor groups — they share the per-partition kernels."""
    from cloud_dedup_ray.pipelines.neardup import (
        _collect_edges_and_sizes,
        _collect_edges_flat,
        _containment_discover_groups,
        sign_dataset,
    )
    from cloud_dedup_ray.stages.minhash_stage import (
        add_bucket_partition,
        emit_bucket_pairs,
        explode_bands,
    )

    ds = ray.data.from_arrow(small_corpus)
    corpus = (
        project_corpus(ds, drop_content=False)
        .filter(expr="is_symlink == False")
        .materialize()
    )
    cfg = DedupConfig(bucket_pair_cap=32)
    signed = sign_dataset(corpus, cfg).materialize()

    a_f, b_f, hist_f = _collect_edges_flat(signed, cfg, 64)
    pair_rows = (
        signed.map_batches(explode_bands, batch_format="pyarrow")
        .map_batches(add_bucket_partition(64), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(emit_bucket_pairs(cfg.bucket_pair_cap), batch_format="pyarrow")
    )
    a_d, b_d, hist_d = _collect_edges_and_sizes(pair_rows)
    assert set(zip(a_f.tolist(), b_f.tolist())) == set(
        zip(a_d.tolist(), b_d.tolist())
    )
    assert len(a_f) > 0
    assert hist_f == hist_d

    g_flat = _containment_discover_groups(signed, cfg, flat=True)
    g_ds = _containment_discover_groups(signed, cfg, flat=False)
    assert set(g_flat) == set(g_ds) and len(g_flat) > 0
    for s in g_flat:
        assert np.array_equal(g_flat[s], g_ds[s])
    # bounded-driver contract: groups arrive PACKED as int64 matrices
    # (8 B/member), never as Python tuples — both discovery forms
    for g in (g_flat, g_ds):
        for s, mat in g.items():
            assert isinstance(mat, np.ndarray)
            assert mat.dtype == np.int64 and mat.ndim == 2
            assert mat.shape[1] == s
            # rows ascending and deduped (np.unique(axis=0) canonical)
            assert (np.diff(mat, axis=1) > 0).all()
            assert len(np.unique(mat, axis=0)) == len(mat)


def test_distributed_estimate_matches_driver_path(small_corpus):
    """Forcing the partitioned pairs × signatures hash join (threshold
    0) must yield identical cluster assignments AND containment edges
    to the driver-side broadcast estimate."""
    import dataclasses

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus
    from cloud_dedup_ray.stages.project import project_corpus

    corpus = (
        project_corpus(ray.data.from_arrow(small_corpus), drop_content=False)
        .filter(expr="is_symlink == False")
        .materialize()
    )
    base = DedupConfig(bucket_pair_cap=32)
    forced = dataclasses.replace(base, distributed_estimate_threshold=0)
    r1 = cluster_corpus(corpus, base, with_containment=True)
    r2 = cluster_corpus(corpus, forced, with_containment=True)
    a1 = {r["doc_id"]: r["cluster_id"] for r in r1.assignments.take_all()}
    a2 = {r["doc_id"]: r["cluster_id"] for r in r2.assignments.take_all()}
    assert a1 == a2
    assert r1.n_edges == r2.n_edges
    assert r1.metrics["n_containment_edges"] == r2.metrics["n_containment_edges"]


def test_distributed_estimate_with_empty_partitions():
    """A corpus with fewer docs than hash partitions leaves most of the
    32 doc_id partitions empty; the (0, 1) signature placeholders those
    partitions emit must not poison _finish's concatenate (the width-1
    ``sa`` slices crashed np.concatenate before the zero-row guard)."""
    from cloud_dedup_ray.pipelines.neardup import (
        _estimate_pairs_distributed,
        _estimate_pair_jaccard,
        _fetch_signatures,
        sign_dataset,
    )

    corpus = ray.data.from_items(
        [
            {
                "doc_id": i,
                "content": ("lorem ipsum dolor sit amet " * 8) + tail,
            }
            for i, tail in enumerate(
                ["", "", "alpha beta", "gamma delta epsilon", "zeta " * 12]
            )
        ]
    )
    cfg = DedupConfig()
    signed = sign_dataset(corpus, cfg).materialize()
    ids = np.arange(5, dtype=np.int64)
    # all unordered pairs, plus one pair with a missing doc_id
    a, b = np.triu_indices(5, k=1)
    a = np.concatenate([ids[a], [np.int64(99)]])
    b = np.concatenate([ids[b], [np.int64(0)]])
    lo = np.full(len(a), 0.3)
    hi = np.full(len(a), 0.8)
    acc, unc = _estimate_pairs_distributed(signed, a, b, lo, hi)

    all_ids, all_sigs = _fetch_signatures(signed, np.unique(np.concatenate([a, b])))
    est = _estimate_pair_jaccard(all_ids, all_sigs, a, b)
    exp_acc = set(zip(a[est >= hi].tolist(), b[est >= hi].tolist()))
    exp_unc = set(
        zip(a[(est < hi) & (est >= lo)].tolist(), b[(est < hi) & (est >= lo)].tolist())
    )
    assert set(map(tuple, acc.tolist())) == exp_acc
    assert set(map(tuple, unc.tolist())) == exp_unc
    assert len(exp_acc) > 0  # the identical-text pair must be accepted

    # all-empty input: no pairs, empty signed partitions everywhere
    e = np.empty(0, np.int64)
    acc0, unc0 = _estimate_pairs_distributed(signed, e, e, e.astype(float), e.astype(float))
    assert acc0.shape == (0, 2) and unc0.shape == (0, 2)


def test_lsh_bucket_cap_forced_path_adversarial_skew():
    """Skew guard at the level the 100 TB story assumes: ONE bucket more
    than 10x larger than ``bucket_pair_cap`` (the license-file scenario
    — thousands of near-identical boilerplate files landing in every
    band bucket together). The cap must (a) bound emitted candidate
    pairs at O(2b) instead of C(b,2), and (b) keep the bucket CONNECTED
    through the chain+star edge set, so after verification all members
    still resolve to one cluster."""
    from cloud_dedup_ray.stages.minhash_stage import bucket_pairs_arrays
    from cloud_dedup_ray.state.union_find import UnionFind

    # --- kernel level: b = 200 members, cap = 16 (bucket 12.5x cap) ---
    b, cap = 200, 16
    ids = np.arange(1000, 1000 + b, dtype=np.int64)
    bk = np.zeros(b, np.int64)
    a, bb, size_vals, size_counts = bucket_pairs_arrays(bk, ids, cap)
    # chain (b-1) + star (b-1) share exactly one edge (rep -> members[1])
    assert len(a) == 2 * b - 3
    assert size_vals.tolist() == [b] and size_counts.tolist() == [1]
    uf = UnionFind()
    uf.add_edges(zip(a.tolist(), bb.tolist()))
    assert len({uf.find(int(d)) for d in ids}) == 1

    # --- end-to-end: 200 identical license docs + 40 distinct docs ---
    lic = (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software and associated documentation "
    ) * 3
    texts = [lic] * 200 + [
        f"unique document number {i} carries its own words {i * 7} and "
        f"token {i * 13}" for i in range(40)
    ]
    tbl = pa.table(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "content": pa.array(texts),
        }
    )
    cfg = DedupConfig(bucket_pair_cap=16, shingle_k=3, jaccard_threshold=0.6)
    res = cluster_corpus(
        ray.data.from_arrow(tbl).materialize(), cfg, with_containment=False
    )
    rows = {r["doc_id"]: r["cluster_id"] for r in res.assignments.take_all()}
    # connectivity survived the cap: one cluster holds every license doc
    assert len({rows[d] for d in range(200)}) == 1
    # the giant bucket is visible in the skew histogram
    assert res.metrics["lsh_bucket_max"] == 200
    # pair volume bounded: C(200,2) = 19,900 all-pairs edges would have
    # been emitted uncapped; chain+star emits 397 per bucket (deduped
    # across bands), plus whatever the 40 distinct docs contribute
    assert res.metrics["n_candidates"] < 2000
