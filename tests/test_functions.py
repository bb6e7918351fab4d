"""Unit tests for pure kernels: path utils, classify, minhash, simhash,
text analysis, union-find."""

import numpy as np
import pyarrow as pa
import pytest

from cloud_dedup_ray.functions import pathutils
from cloud_dedup_ray.functions.classify import Rec, classify_pair, reduce_group
from cloud_dedup_ray.functions.minhash import (
    MinHasher,
    band_hashes,
    estimate_jaccard,
    exact_jaccard,
)
from cloud_dedup_ray.functions.simhash import hamming64, simhash_tokens
from cloud_dedup_ray.functions.text import (
    lang_id_one,
    normalize,
    token_count,
    token_shingles_hashed,
)
from cloud_dedup_ray.state.union_find import UnionFind


def rec(repo="a", path="x/f.txt", size=5, mtime=1000.0, is_symlink=False,
        target=None, h="h1", name=None):
    base = path.rsplit("/", 1)[-1]
    return Rec(
        repo=repo, path=path, name=(name or base.lower()), name_orig=base,
        folder=path.rsplit("/", 1)[0] if "/" in path else pathutils.ROOT,
        size=size, mtime=mtime, is_symlink=is_symlink,
        symlink_target=target, content_hash=h,
    )


# ---- path utils ----

def test_basename_dirname():
    arr = pa.array(["a/b/c.txt", "top.txt", "x/y"])
    assert pathutils.basename(arr).to_pylist() == ["c.txt", "top.txt", "y"]
    assert pathutils.dirname(arr).to_pylist() == ["a/b", "(root)", "x"]


def test_ancestors():
    assert pathutils.ancestors("a/b/c") == ["a", "a/b"]
    assert pathutils.ancestors("a") == []
    assert pathutils.ancestors(pathutils.ROOT) == []


def test_hidden_masks():
    arr = pa.array([".hidden", "a/.git/x", "ok/file", "a/.DS_Store", "sub/.DS_Store"])
    assert pathutils.hidden_mask(arr).to_pylist() == [True, True, False, True, True]
    assert pathutils.ds_store_mask(arr).to_pylist() == [False, False, False, True, True]


# ---- classify_pair truth table (reference :203-268 semantics) ----

def test_classify_identical_same():
    assert classify_pair(rec(), rec(repo="b", mtime=1003.0), 5.0, True) == (
        "identical", "same")


def test_classify_identical_diverged():
    assert classify_pair(rec(), rec(repo="b", mtime=99999.0), 5.0, True) == (
        "identical", "diverged")


def test_classify_different_phantom_and_diverged():
    a, b = rec(), rec(repo="b", h="h2")
    assert classify_pair(a, b, 5.0, True) == ("different", "phantom")
    b2 = rec(repo="b", h="h2", mtime=9999.0)
    assert classify_pair(a, b2, 5.0, True) == ("different", "diverged")


def test_classify_empty_always_identical_same():
    a = rec(size=0, mtime=1000.0, h="ha")
    b = rec(repo="b", size=0, mtime=99999.0, h="hb")
    assert classify_pair(a, b, 5.0, True) == ("identical", "same")


def test_classify_no_checksum_unverified():
    a, b = rec(h=None), rec(repo="b", h=None)
    assert classify_pair(a, b, 5.0, False) == ("unverified", "same")
    assert classify_pair(rec(), rec(repo="b"), 5.0, False) == ("unverified", "same")


def test_classify_hash_failure_unverified():
    assert classify_pair(rec(h=None), rec(repo="b"), 5.0, True) == (
        "unverified", "same")


def test_classify_symlinks():
    a = rec(size=-1, is_symlink=True, target="/t1", h=None)
    b = rec(repo="b", size=-1, is_symlink=True, target="/t1", h=None)
    assert classify_pair(a, b, 5.0, True) == ("symlink", "target_identical")
    c = rec(repo="b", size=-1, is_symlink=True, target="/t2", h=None)
    assert classify_pair(a, c, 5.0, True) == ("symlink", "target_diverged")
    d = rec(repo="b", size=-1, is_symlink=True, target=None, h=None)
    assert classify_pair(a, d, 5.0, True) == ("symlink", "target_diverged")


def test_classify_mixed_type():
    a = rec(is_symlink=True, size=-1, target="/t", h=None)
    b = rec(repo="b")
    assert classify_pair(a, b, 5.0, True) == ("mixed_type", "conflict")


def test_classify_name_size_mismatch_none():
    assert classify_pair(rec(), rec(repo="b", size=9), 5.0, True) is None


def test_reduce_group_precedence():
    assert reduce_group([("identical", "same"), ("different", "diverged")]) == (
        "different", "diverged")
    assert reduce_group([("unverified", "phantom"), ("identical", "same")]) == (
        "unverified", "phantom")


# ---- minhash ----

def test_minhash_jaccard_estimate_accuracy():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 1 << 62, 600).astype(np.uint64)
    a = base[:500]
    b = base[100:600]  # true J = 400/700
    mh = MinHasher(256, seed=1)
    est = estimate_jaccard(mh.signature(a), mh.signature(b))
    true = exact_jaccard(np.unique(a), np.unique(b))
    assert abs(est - true) < 0.08


def test_minhash_deterministic_across_instances():
    x = np.arange(100, dtype=np.uint64) * 7919
    s1 = MinHasher(128, seed=42).signature(x)
    s2 = MinHasher(128, seed=42).signature(x)
    assert (s1 == s2).all()


def test_band_hashes_identical_docs_collide():
    mh = MinHasher(128, seed=42)
    x = np.arange(50, dtype=np.uint64) * 31 + 7
    sigs = np.vstack([mh.signature(x), mh.signature(x)])
    bh = band_hashes(sigs, 16)
    assert bh.shape == (2, 16)
    assert (bh[0] == bh[1]).all()


def test_band_hashes_distinct_band_ids_differ():
    mh = MinHasher(128, seed=42)
    x = np.arange(50, dtype=np.uint64) * 31 + 7
    bh = band_hashes(mh.signature(x)[None, :], 16)
    # all 16 bands hashing the same doc should not be all-equal
    assert len(set(bh[0].tolist())) > 1


# ---- simhash ----

def test_simhash_near_texts_close():
    t1 = "the quick brown fox jumps over the lazy dog " * 10
    t2 = t1.replace("lazy", "sleepy")
    h1, h2 = simhash_tokens(t1.strip()), simhash_tokens(t2.strip())
    d = hamming64(np.array([h1], np.uint64), np.uint64(h2))[0]
    assert d <= 12
    t3 = "completely unrelated words banana apple cherry grape " * 10
    d2 = hamming64(np.array([h1], np.uint64), np.uint64(simhash_tokens(t3.strip())))[0]
    assert d2 > d


# ---- text ----

def test_normalize_and_token_count():
    arr = pa.array(["  Hello   World ", "", "one two\tthree\nfour"])
    assert normalize(arr).to_pylist() == ["hello world", "", "one two three four"]
    assert token_count(arr).to_pylist() == [2, 0, 4]


def test_token_shingles():
    s = token_shingles_hashed("a b c d e f", 3)
    assert len(s) == 4  # 6 tokens → 4 shingles
    assert token_shingles_hashed("", 3).size == 0
    # short doc → one shingle of the whole text
    assert len(token_shingles_hashed("a b", 3)) == 1


def test_lang_id():
    assert lang_id_one("the cat and the dog is in the house that is red") == "en"
    assert lang_id_one("el perro de la casa que está en los árboles") == "es"
    assert lang_id_one("这是一个中文句子这是一个中文句子") == "zh"
    assert lang_id_one("") == "und"


# ---- union-find ----

def test_union_find_components():
    uf = UnionFind()
    uf.add_edges([(1, 2), (2, 3), (10, 11)])
    comp = uf.components()
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert 99 not in comp


# ---- one-permutation minhash (OPH) ----

def test_oph_deterministic_and_batch_consistent():
    from cloud_dedup_ray.functions.minhash import OnePermMinHasher

    oph = OnePermMinHasher(128, seed=42)
    x = np.arange(200, dtype=np.uint64) * 7919 + 3
    s1 = oph.signatures([x])
    s2 = OnePermMinHasher(128, seed=42).signatures([x.copy(), x.copy()])
    assert (s1[0] == s2[0]).all() and (s2[0] == s2[1]).all()
    # different seed → different signature
    s3 = OnePermMinHasher(128, seed=43).signatures([x])
    assert (s1[0] != s3[0]).any()


def test_oph_jaccard_estimate_accuracy_small_and_large():
    from cloud_dedup_ray.functions.minhash import OnePermMinHasher

    rng = np.random.RandomState(5)
    oph = OnePermMinHasher(128, seed=42)
    for n in (40, 600):  # sparse (most bins empty → densified) and dense
        errs = []
        for _ in range(40):
            a = np.unique(rng.randint(0, 1 << 62, n).astype(np.uint64))
            b = np.unique(
                np.concatenate(
                    [a[: int(0.9 * a.size)],
                     rng.randint(0, 1 << 62, max(1, n // 10)).astype(np.uint64)]
                )
            )
            true = exact_jaccard(a, b)
            s = oph.signatures([a, b])
            errs.append((s[0] == s[1]).mean() - true)
        errs = np.asarray(errs)
        assert abs(errs.mean()) < 0.03, f"biased at n={n}: {errs.mean()}"
        assert errs.std() < 0.08, f"too noisy at n={n}: {errs.std()}"


def test_oph_empty_and_tiny_docs():
    from cloud_dedup_ray.functions.minhash import OnePermMinHasher

    oph = OnePermMinHasher(128, seed=42)
    sigs = oph.signatures(
        [np.empty(0, np.uint64), np.array([12345], np.uint64)]
    )
    assert (sigs[0] == OnePermMinHasher.EMPTY).all()
    # single-shingle doc: every bin resolves to the one filled bin's value
    assert (sigs[1] != OnePermMinHasher.EMPTY).all()
    # identical single-shingle docs produce identical signatures
    sigs2 = oph.signatures([np.array([12345], np.uint64)])
    assert (sigs[1] == sigs2[0]).all()


def test_simhash_batch_matches_scalar():
    from cloud_dedup_ray.functions.simhash import (
        simhash_tokens,
        simhash_tokens_batch,
    )

    texts = ["the quick brown fox", "jumps over the lazy dog", "", None,
             "def main(): return 42"]
    batch = simhash_tokens_batch(texts)
    for t, b in zip(texts, batch):
        assert int(b) == (simhash_tokens(t) if t else 0)


def test_label_propagation_matches_union_find():
    """The distributed min-label-propagation reducer must produce the
    same components as the driver-side union-find on random graphs,
    including a long chain (propagation depth) and a star."""
    import pyarrow as pa
    import ray.data

    from cloud_dedup_ray.state.union_find import (
        UnionFind,
        label_propagation_components,
    )

    rng = np.random.RandomState(11)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 120, (150, 2)) if a != b]
    edges += [(1000 + i, 1001 + i) for i in range(12)]       # chain
    edges += [(5000, 5000 + i) for i in range(1, 20)]        # star

    uf = UnionFind()
    uf.add_edges(edges)
    want = uf.components()

    ds = ray.data.from_arrow(
        pa.table(
            {"a": pa.array([a for a, _ in edges], pa.int64()),
             "b": pa.array([b for _, b in edges], pa.int64())}
        )
    )
    got = label_propagation_components(ds, num_partitions=4)
    assert got == want


def test_stable_id64_distinguishes_commits():
    """One row per (repo, path, commit) version ⇒ one doc identity per
    version. Collapsing commits onto hash(repo, path) made every
    id-keyed join ambiguous (regression: two commits of lib/f05037.py
    shared a doc_id, so which version's MinHash signature represented
    the id depended on block arrival order)."""
    import pyarrow as pa

    from cloud_dedup_ray.functions.hashing import stable_id64

    repos = pa.array(["r", "r", "r"])
    paths = pa.array(["a.py", "a.py", "a.py"])
    commits = pa.array(["c1", "c2", None])
    ids = stable_id64(repos, paths, commits).to_pylist()
    assert len(set(ids)) == 3          # every version distinct
    # stable: same key → same id, and null commit hashes like ''
    ids2 = stable_id64(repos, paths, pa.array(["c1", "c2", ""])).to_pylist()
    assert ids == ids2
    # two-arg form (version-less tables) unchanged and distinct from
    # any commit-qualified id
    base = stable_id64(repos, paths).to_pylist()
    assert len(set(base)) == 1 and base[0] not in ids


def test_projected_doc_ids_unique_per_version(tmp_path):
    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.sources.corpus import read_corpus
    from cloud_dedup_ray.stages.project import project_corpus

    d = write_corpus(str(tmp_path / "c"), seed=7, n_files=400, n_repos=2,
                     n_shards=4)
    df = (
        project_corpus(read_corpus(d))
        .select_columns(["doc_id"])
        .to_pandas()
    )
    assert df["doc_id"].nunique() == len(df)


def test_token_count_bpe_matches_re2_oracle_and_python_reference():
    """token_count_bpe now counts with Arrow's RE2 engine — the same
    engine the DuckDB regexp_extract_all twin uses. It must equal the
    straightforward Python re.ASCII reference everywhere EXCEPT \\x0b
    (ASCII \\s includes \\v, RE2's \\s does not — the documented fix),
    where it must equal DuckDB instead."""
    import random
    import re

    import duckdb

    from cloud_dedup_ray.functions.text import token_count_bpe

    pat = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    py = re.compile(pat, re.ASCII)
    rng = random.Random(5)
    alphabet = "abc XY 01 .!? '\t\n\xa0日é"
    pool = [None, "", "don't stop", "it's 123!!", " lead", "a'll we've",
            "'s", "x" * 300] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 200)))
        for _ in range(40)
    ]
    arr = pa.array(pool, pa.string())
    got = token_count_bpe(arr).to_pylist()
    want = [len(py.findall(t)) if t else 0 for t in
            (x if x is not None else "" for x in pool)]
    assert got == want
    # sliced + chunked inputs
    assert token_count_bpe(
        pa.array(["p", "q"] + pool, pa.string()).slice(2)
    ).to_pylist() == want
    assert token_count_bpe(
        pa.chunked_array([pool[:4], pool[4:]])
    ).to_pylist() == want
    # the \x0b divergence: pipeline now sides with its own SQL twin
    vt = ["\x0bvert", "a\x0bb"]
    con = duckdb.connect()
    duck = [con.execute(
        "SELECT len(regexp_extract_all(?, ?))", [t, pat]).fetchone()[0]
        for t in vt]
    assert token_count_bpe(pa.array(vt)).to_pylist() == duck
    assert duck != [len(py.findall(t)) for t in vt]  # and the old Python differed


def test_quality_features_vectorization_matches_per_doc_reference():
    """The batch-vectorized quality_features (list_flatten + bincount,
    unique-codepoint isalpha lookup) must be bit-identical to the
    per-document reference loop on adversarial inputs: nulls, empties,
    whitespace-only, multi-byte UTF-8, stopword-dense text — across
    batch order, slicing and chunking."""
    import random

    import pyarrow.compute as pc

    from cloud_dedup_ray.functions.text import _STOPWORDS, quality_features

    def ref(texts):
        toks_col = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(texts), r"\s+"
        ).to_pylist()
        py = texts.to_pylist()
        m = np.zeros(len(py)); al = np.zeros(len(py)); st = np.zeros(len(py))
        for i, t in enumerate(py):
            if not t:
                continue
            toks = [w for w in (toks_col[i] or []) if w]
            if toks:
                m[i] = sum(len(w) for w in toks) / len(toks)
                low = [w.lower() for w in toks]
                st[i] = sum(w in _STOPWORDS for w in low) / len(toks)
            al[i] = sum(ch.isalpha() for ch in t) / len(t)
        return m, al, st

    rng = random.Random(23)
    words = ("the and of to in is THE On with 日本語 ぁけコ é ß ﬀ Ⅻ 123 !?. x"
             "\t\n").split(" ")
    pool = [None, "", " ", "\t\n", "the the the", "a b c", "日本語 テキスト",
            "ﬀⅫß", "123 456", "."] + [
        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 80)))
        for _ in range(40)
    ]
    for trial in range(6):
        batch = [rng.choice(pool) for _ in range(rng.randrange(1, 50))]
        arr = pa.array(batch, pa.string())
        f = quality_features(arr)
        m, al, st = ref(arr)
        assert np.array_equal(np.asarray(f["mean_token_len"]), m)
        assert np.array_equal(np.asarray(f["alpha_ratio"]), al)
        assert np.array_equal(np.asarray(f["stopword_ratio"]), st)
        sliced = pa.array(["pad", "pad2"] + batch, pa.string()).slice(2)
        fs = quality_features(sliced)
        assert np.array_equal(np.asarray(fs["alpha_ratio"]), al)
        assert np.array_equal(np.asarray(fs["mean_token_len"]), m)
    chunked = pa.chunked_array([pool[:5], pool[5:10]])
    flat = pa.array(pool[:10], pa.string())
    fc, ff = quality_features(chunked), quality_features(flat)
    for k in ("mean_token_len", "alpha_ratio", "stopword_ratio", "n_tokens"):
        a, b = fc[k], ff[k]
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        assert a.to_pylist() == b.to_pylist()  # null-safe (n_tokens keeps nulls)
    empty = quality_features(pa.array([], pa.string()))
    assert len(empty["mean_token_len"]) == 0


def test_minhash_signer_batch_vectorization_matches_per_doc_reference():
    """The batch signer (fused lower+\\s+ split, dictionary-encoded token
    hashing, global k-window polynomial, segment-sort unique, flat OPH
    signatures) must produce the SAME table — n_shingles, signatures,
    band hashes, anchors — as the per-document construction
    (normalize → token_shingles_hashed → hasher.signatures) on
    adversarial batches: nulls, empties, whitespace-only, sub-k-token
    docs, below-min_doc_chars docs, messy whitespace runs, multi-byte
    UTF-8, chunked columns, empty batches."""
    import random

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.functions.minhash import band_hashes, make_hasher
    from cloud_dedup_ray.functions.text import (
        TokenHashCache,
        token_shingles_hashed,
    )
    from cloud_dedup_ray.functions.text import normalize as _norm
    from cloud_dedup_ray.stages.minhash_stage import MinHashSigner

    def ref_call(batch, cfg):
        hasher = make_hasher(cfg.minhash_scheme, cfg.num_perm, cfg.seed)
        cache = TokenHashCache()
        texts = _norm(batch["content"]).to_pylist()
        n = len(texts)
        sets, n_sh, anchors = [], np.empty(n, np.int64), []
        for i, t in enumerate(texts):
            if t is None or len(t) < cfg.min_doc_chars:
                sh = np.empty(0, np.uint64)
            else:
                sh = token_shingles_hashed(t, cfg.shingle_k, cache)
            sets.append(sh)
            n_sh[i] = sh.size
            anchors.append(
                sh[: cfg.containment_anchors].astype(np.int64).tolist()
            )
        sigs = hasher.signatures(sets)
        return n_sh, sigs, band_hashes(sigs, cfg.num_bands), anchors

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(300)] + list("(){};=") + ["日本", "é"]

    def mktext():
        r = rng.random()
        if r < 0.05:
            return None
        if r < 0.10:
            return ""
        if r < 0.15:
            return "  \t\n "
        if r < 0.20:  # fewer tokens than shingle_k
            return " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 5)))
        if r < 0.25:
            return "xy"  # below min_doc_chars
        if r < 0.30:
            return "  lead\t\ttabs  and   runs\nnewline  "
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 300)))

    cfg = DedupConfig()
    for trial in range(5):
        texts = [mktext() for _ in range(rng.randrange(1, 300))]
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "content": pa.array(texts, pa.string()),
            }
        )
        out = MinHashSigner(cfg)(batch)
        n_sh, sigs, bands, anchors = ref_call(batch, cfg)
        assert out["n_shingles"].to_pylist() == n_sh.tolist()
        got_sigs = np.asarray(
            out["sig"].combine_chunks().flatten()
        ).view(np.uint64).reshape(-1, cfg.num_perm)
        assert np.array_equal(got_sigs, sigs)
        got_bands = np.asarray(
            out["bands"].combine_chunks().flatten()
        ).reshape(-1, cfg.num_bands)
        assert np.array_equal(got_bands, bands)
        assert out["anchors"].to_pylist() == anchors
    # chunked content column + empty batch
    texts = [mktext() for _ in range(60)]
    batch = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "content": pa.chunked_array([texts[:30], texts[30:]], pa.string()),
        }
    )
    out = MinHashSigner(cfg)(batch)
    n_sh, _, _, anchors = ref_call(batch, cfg)
    assert out["n_shingles"].to_pylist() == n_sh.tolist()
    assert out["anchors"].to_pylist() == anchors
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "content": pa.array([], pa.string())}
    )
    assert MinHashSigner(cfg)(empty).num_rows == 0


def test_bucket_pairs_arrays_vectorization_matches_per_bucket_reference():
    """The group-by-size vectorized bucket-pair kernel must emit the
    SAME (a, b, size_vals, size_counts) as the per-bucket reference
    loop — including duplicate (bucket, id) rows, singleton-majority
    distributions, over-cap chain+star buckets, and the empty input."""
    from cloud_dedup_ray.stages import coarse
    from cloud_dedup_ray.stages.minhash_stage import bucket_pairs_arrays

    def ref(bk, ids, cap):
        order = np.lexsort((ids, bk))
        keys = bk[order]
        a_out, b_out, sizes = [], [], []
        for sl in coarse.group_slices(order, keys):
            members = np.unique(ids[order[sl]])
            b = len(members)
            sizes.append(b)
            if b < 2:
                continue
            if b <= cap:
                ai, bi = np.triu_indices(b, k=1)
                a, bb = members[ai], members[bi]
            else:
                rep = members[0]
                a = np.concatenate([members[:-1], np.full(b - 1, rep)])
                bb = np.concatenate([members[1:], members[1:]])
                keep = a != bb
                a, bb = a[keep], bb[keep]
            a_out.append(a)
            b_out.append(bb)
        size_vals, size_counts = np.unique(
            np.asarray(sizes, np.int64), return_counts=True
        )
        if a_out:
            pairs = np.unique(
                np.stack(
                    [np.concatenate(a_out), np.concatenate(b_out)], axis=1
                ),
                axis=0,
            )
            return pairs[:, 0], pairs[:, 1], size_vals, size_counts.astype(np.int64)
        e = np.empty(0, np.int64)
        return e, e, size_vals, size_counts.astype(np.int64)

    rng = np.random.default_rng(5)
    for trial in range(6):
        n_buckets = int(rng.integers(1, 20_000))
        sizes = rng.choice([1, 1, 1, 1, 2, 2, 3, 4, 7], size=n_buckets)
        if trial % 2 == 0 and n_buckets > 10:
            sizes[:3] = [40, 15, 9]  # over-cap buckets for cap=8
        bk = np.repeat(rng.integers(0, 2**62, n_buckets), sizes).astype(np.int64)
        ids = rng.integers(0, 5_000, bk.size).astype(np.int64)
        for cap in (8, 1600):
            got = bucket_pairs_arrays(bk, ids, cap)
            want = ref(bk, ids, cap)
            for g, w in zip(got, want):
                assert np.array_equal(g, w)
    empty = bucket_pairs_arrays(np.empty(0, np.int64), np.empty(0, np.int64), 8)
    assert all(len(x) == 0 for x in empty)


def test_anchor_groups_arrays_vectorization_matches_per_group_reference():
    """The vectorized anchor-group kernel must pack the SAME
    {size: unique (k, size) member matrix} dict as the per-anchor
    reference loop — duplicate (anchor, id) rows, out-of-range sizes
    (1 and >cap skipped), and empty input included."""
    from cloud_dedup_ray.pipelines.neardup import _anchor_groups_arrays
    from cloud_dedup_ray.stages import coarse

    def ref(anc, ids, cap):
        order = np.lexsort((ids, anc))
        by_size = {}
        for sl in coarse.group_slices(order, anc[order]):
            members = np.unique(ids[order[sl]])
            if 2 <= len(members) <= cap:
                by_size.setdefault(len(members), []).append(members)
        return {
            s: np.unique(np.vstack(rows), axis=0)
            for s, rows in by_size.items()
        }

    rng = np.random.default_rng(11)
    for trial in range(6):
        n_anchors = int(rng.integers(1, 5_000))
        sizes = rng.choice([1, 1, 1, 2, 2, 3, 5, 9], size=n_anchors)
        anc = np.repeat(rng.integers(0, 2**62, n_anchors), sizes).astype(np.int64)
        ids = rng.integers(0, 2_000, anc.size).astype(np.int64)
        for cap in (4, 64):
            got = _anchor_groups_arrays(anc, ids, cap)
            want = ref(anc, ids, cap)
            assert sorted(got) == sorted(want)
            for s in want:
                assert np.array_equal(got[s], want[s])
    assert _anchor_groups_arrays(
        np.empty(0, np.int64), np.empty(0, np.int64), 8
    ) == {}


def test_shingle_batch_property_matches_per_doc_reference():
    """Property test: on arbitrary unicode documents (nulls, blanks,
    any whitespace mix, sub-k-token docs, duplicated tokens) the batch
    shingler must return exactly the concatenation of
    ``token_shingles_hashed(normalize(t), k)`` per active doc — the
    signer, LSH tier and containment anchors all consume this kernel."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cloud_dedup_ray.functions.text import (
        TokenHashCache,
        normalize as _norm,
        token_shingles_hashed,
        token_shingles_hashed_batch,
    )

    token = st.text(alphabet="ab1.é日", min_size=1, max_size=6)
    doc = st.one_of(
        st.none(),
        st.just(""),
        st.text(alphabet=" \t\n", max_size=4),
        st.lists(token, min_size=1, max_size=30).map(" ".join),
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=25),
           st.integers(min_value=1, max_value=6),
           st.integers(min_value=0, max_value=10))
    def check(docs, k, min_chars):
        arr = pa.array(docs, pa.string())
        flat, lens = token_shingles_hashed_batch(
            arr, k, TokenHashCache(), min_chars
        )
        norm = _norm(arr).to_pylist()
        want_sets = [
            token_shingles_hashed(t, k)
            if (t is not None and len(t) >= min_chars and t)
            else np.empty(0, np.uint64)
            for t in norm
        ]
        # NOTE: per-doc fn returns empty for blank t regardless of
        # min_chars (''.split(' ') == ['']) — mirrored by `and t`
        assert lens.tolist() == [s.size for s in want_sets]
        np.testing.assert_array_equal(
            flat, np.concatenate(want_sets) if want_sets else flat
        )

    check()


def test_bucket_pairs_property_matches_per_bucket_reference():
    """Property test over arbitrary (bucket, id) multisets and caps:
    the vectorized pair kernel equals the per-bucket reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cloud_dedup_ray.stages import coarse
    from cloud_dedup_ray.stages.minhash_stage import bucket_pairs_arrays

    def ref(bk, ids, cap):
        order = np.lexsort((ids, bk))
        keys = bk[order]
        a_out, b_out, sizes = [], [], []
        for sl in coarse.group_slices(order, keys):
            members = np.unique(ids[order[sl]])
            b = len(members)
            sizes.append(b)
            if b < 2:
                continue
            if b <= cap:
                ai, bi = np.triu_indices(b, k=1)
                a, bb = members[ai], members[bi]
            else:
                rep = members[0]
                a = np.concatenate([members[:-1], np.full(b - 1, rep)])
                bb = np.concatenate([members[1:], members[1:]])
                keep = a != bb
                a, bb = a[keep], bb[keep]
            a_out.append(a)
            b_out.append(bb)
        sv, sc = np.unique(np.asarray(sizes, np.int64), return_counts=True)
        if a_out:
            pairs = np.unique(
                np.stack([np.concatenate(a_out), np.concatenate(b_out)], 1), axis=0
            )
            return pairs[:, 0], pairs[:, 1], sv, sc.astype(np.int64)
        e = np.empty(0, np.int64)
        return e, e, sv, sc.astype(np.int64)

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 20)), max_size=80
        ),
        st.integers(min_value=2, max_value=6),
    )
    def check(rows, cap):
        bk = np.array([r[0] for r in rows], np.int64)
        ids = np.array([r[1] for r in rows], np.int64)
        got = bucket_pairs_arrays(bk, ids, cap)
        want = ref(bk, ids, cap)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    check()
