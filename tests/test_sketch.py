"""HyperLogLog sketch + vectorized segmented string hashing: the hash
is pinned against a per-string pure-Python reference, HLL accuracy is
checked across cardinality regimes (linear-counting and raw-estimate),
merge is associativity/partition-shape-free, and the two vocabulary
pipelines agree with each other and with a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cloud_dedup_ray.functions.sketch import (
    _BASE,
    hash_strings_u64,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _ref_hash(s: str) -> int:
    """Per-string reference of the segmented polynomial + splitmix64."""
    data = s.encode()
    h = 0
    for i, c in enumerate(data):
        h = (h + c * pow(_BASE, i, 1 << 64)) % (1 << 64)
    h ^= len(data)
    x = (h + 0x9E3779B97F4A7C15) % (1 << 64)
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % (1 << 64)
    return x ^ (x >> 31)


def test_hash_strings_matches_reference():
    strs = ["", "a", "ab", "ba", "hello world", "héllo", "日本語テキスト",
            "x" * 300, "a\x01b", "\x01ab"]
    got = hash_strings_u64(pa.array(strs))
    want = np.array([_ref_hash(s) for s in strs], np.uint64)
    np.testing.assert_array_equal(got, want)
    # sliced / offset arrays hash identically to fresh ones
    sliced = pa.array(["pad"] + strs).slice(1)
    np.testing.assert_array_equal(hash_strings_u64(sliced), want)
    # chunked input
    chunked = pa.chunked_array([strs[:4], strs[4:]])
    np.testing.assert_array_equal(hash_strings_u64(chunked), want)


def test_hash_strings_null_and_empty():
    got = hash_strings_u64(pa.array(["x", None, ""]))
    assert got[1] == got[2] == _ref_hash("")
    assert len(hash_strings_u64(pa.array([], pa.string()))) == 0


def test_hash_strings_no_collisions_on_vocab():
    # 200k distinct short strings → 64-bit collisions essentially
    # impossible; any dupe here means the segmented arithmetic is wrong
    vocab = pa.array([f"tok{i}" for i in range(200_000)])
    h = hash_strings_u64(vocab)
    assert len(np.unique(h)) == len(vocab)


@pytest.mark.parametrize("true_n", [50, 1_000, 20_000, 200_000])
def test_hll_accuracy(true_n):
    h = hash_strings_u64(pa.array([f"item-{i}" for i in range(true_n)]))
    est = hll_estimate(hll_registers(h, p=12))
    # 1.04/sqrt(4096) ≈ 1.6% std error; 5x margin keeps this test
    # deterministic-tight without being flaky on the fixed inputs
    assert abs(est - true_n) / true_n < 0.08


def test_hll_merge_partition_invariant():
    h = hash_strings_u64(pa.array([f"w{i}" for i in range(30_000)]))
    whole = hll_registers(h, p=12)
    for n_parts in (2, 7, 64):
        parts = np.array_split(h, n_parts)
        merged = hll_merge(np.stack([hll_registers(x, p=12) for x in parts]))
        np.testing.assert_array_equal(merged, whole)
    # idempotent + duplicate-insensitive
    np.testing.assert_array_equal(hll_merge(np.stack([whole, whole])), whole)
    dup = hll_registers(np.concatenate([h, h]), p=12)
    np.testing.assert_array_equal(dup, whole)


def test_hll_empty():
    reg = hll_registers(np.empty(0, np.uint64), p=12)
    assert hll_estimate(reg) == 0.0


def _write_vocab_corpus(tmp_path, n_docs=200, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"word{i}" for i in range(3_000)]
    rows = []
    for d in range(n_docs):
        lang = ["en", "de", "fr"][d % 3]
        words = rng.choice(vocab, size=rng.integers(20, 120))
        rows.append({"doc_id": d, "lang": lang, "text": " ".join(words)})
    # edge cases: blank doc, whitespace-only doc, repeated-token doc
    rows.append({"doc_id": n_docs, "lang": "en", "text": ""})
    rows.append({"doc_id": n_docs + 1, "lang": "de", "text": "   "})
    rows.append({"doc_id": n_docs + 2, "lang": "fr", "text": "Dup  dup\tDUP"})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    return pd.DataFrame(rows)


def test_distinct_tokens_by_lang_vs_pandas_oracle(ray_session, tmp_path):
    from cloud_dedup_ray.pipelines.textops import docs_distinct_tokens_by_lang

    df = _write_vocab_corpus(tmp_path)
    out = docs_distinct_tokens_by_lang(str(tmp_path))

    toks = (
        df.assign(tok=df["text"].str.lower().str.split())
        .explode("tok")
        .dropna(subset=["tok"])
    )
    want = (
        toks.groupby("lang")
        .agg(n_distinct_tokens=("tok", "nunique"), n_tokens_total=("tok", "size"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want.astype(
        {"n_distinct_tokens": "int64", "n_tokens_total": "int64"}))
    # the normalize edge cases: 'Dup dup DUP' is ONE distinct token x3
    fr = out[out["lang"] == "fr"].iloc[0]
    assert fr["n_tokens_total"] == want[want["lang"] == "fr"].iloc[0]["n_tokens_total"]


def test_hll_pipeline_tracks_exact_and_is_deterministic(ray_session, tmp_path):
    from cloud_dedup_ray.pipelines.textops import (
        docs_distinct_tokens_by_lang,
        docs_hll_tokens_by_lang,
    )

    _write_vocab_corpus(tmp_path)
    exact = docs_distinct_tokens_by_lang(str(tmp_path))
    hll = docs_hll_tokens_by_lang(str(tmp_path))
    assert list(hll.columns) == ["lang", "n_distinct_hll"]
    j = exact.merge(hll, on="lang")
    rel = (j["n_distinct_hll"] - j["n_distinct_tokens"]).abs() / j[
        "n_distinct_tokens"
    ]
    assert rel.max() < 0.08
    assert docs_hll_tokens_by_lang(str(tmp_path)).equals(hll)


def test_bloom_no_false_negatives_and_fp_rate():
    from cloud_dedup_ray.functions.sketch import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    keys = hash_strings_u64(pa.array([f"k{i}" for i in range(20_000)]))
    others = hash_strings_u64(pa.array([f"x{i}" for i in range(20_000)]))
    filt = bloom_build(keys, m_bits=1 << 18, k=4)  # ~13 bits/key
    assert bloom_contains(filt, keys).all()  # zero false negatives, always
    fp = bloom_contains(filt, others).mean()
    assert fp < 0.02  # theory ~0.2% at 13 bits/key; generous margin
    # OR-merge of partials == single-pass build
    parts = np.array_split(keys, 5)
    merged = bloom_merge(np.stack([bloom_build(x, 1 << 18) for x in parts]))
    np.testing.assert_array_equal(merged, filt)


def _write_novelty_corpus(tmp_path):
    """Corpus with planted cross-split duplicates. Side is derived from
    md5(str(doc_id)) first hex digit (< 'c' → train), same rule as
    docs_train_split."""
    import hashlib

    side = lambda d: "train" if hashlib.md5(str(d).encode()).hexdigest()[0] < "c" else "new"
    train_ids = [d for d in range(400) if side(d) == "train"]
    new_ids = [d for d in range(400) if side(d) == "new"]
    assert len(train_ids) > 20 and len(new_ids) > 20
    texts = {}
    for i, d in enumerate(train_ids):
        texts[d] = f"train document number {i} with shared words"
    expected = {}
    for i, d in enumerate(new_ids):
        if i % 3 == 0:  # exact copy of a train doc → known
            texts[d] = texts[train_ids[i % len(train_ids)]]
            expected[d] = 0
        elif i % 3 == 1:  # case/whitespace variant → same normalized hash
            texts[d] = texts[train_ids[i % len(train_ids)]].upper() + "  "
            expected[d] = 0
        else:  # genuinely novel
            texts[d] = f"completely new content {i} never seen"
            expected[d] = 1
    pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    ).to_parquet(tmp_path / "documents.parquet")
    return expected


@pytest.mark.parametrize("m_bits", [1 << 10, 1 << 20])
def test_docs_novel_vs_train_exact_even_with_tiny_bloom(
    ray_session, tmp_path, m_bits
):
    """m_bits = 2^10 forces heavy bloom false positives; the answer
    must stay exact because FPs only route rows into the exact verify."""
    from cloud_dedup_ray.pipelines.textops import docs_novel_vs_train

    expected = _write_novelty_corpus(tmp_path)
    out = docs_novel_vs_train(str(tmp_path), m_bits=m_bits)
    assert len(out) == len(expected)
    got = dict(zip(out["doc_id"], out["is_novel"]))
    assert got == expected


def test_events_user_stats_hash_style_ids(ray_session, tmp_path):
    """Regression: 63-bit and negative user ids must group correctly
    (the partial dedup lexsorts (type, user) — no arithmetic packing
    that could wrap int64 and misattribute groups)."""
    big = 0x7FFF_FFFF_FFFF_F000
    df = pd.DataFrame(
        {
            "event_type": ["a", "b", "a", "b", "a", "a"],
            "user_id": [big, big, big + 1, -5, -5, big],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "ts": pd.to_datetime(["2024-01-01"] * 6),
            "event_id": range(6),
            "props": [""] * 6,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    from cloud_dedup_ray.pipelines.relational import events_user_stats_by_type

    out = events_user_stats_by_type(str(tmp_path))
    want = (
        df.groupby("event_type")
        .agg(n_users=("user_id", "nunique"), n_events=("user_id", "size"),
             sum_value=("value", "sum"))
        .reset_index()
    )
    want["sum_value"] = want["sum_value"].round(4)
    pd.testing.assert_frame_equal(
        out, want.astype({"n_users": "int64", "n_events": "int64"}))


def test_build_bloom_empty_dataset(ray_session):
    """An empty build side yields an all-zeros filter: every probe is
    bloom-negative, so the anti-join's screened path sees zero rows."""
    import ray.data

    from cloud_dedup_ray.functions.sketch import bloom_contains
    from cloud_dedup_ray.stages.bloomjoin import build_bloom

    ds = ray.data.from_arrow(
        pa.table({"h": pa.array([], pa.int64())})
    )
    filt = build_bloom(
        ds, lambda t: np.asarray(t["h"], np.int64).astype(np.uint64),
        m_bits=1 << 12,
    )
    assert filt.sum() == 0
    probes = np.arange(100, dtype=np.uint64)
    assert not bloom_contains(filt, probes).any()


def test_hll_pipeline_end_to_end_python_oracle(ray_session, tmp_path):
    """Full-pipeline oracle: recompute each language's HLL estimate
    with an independent per-token pure-Python implementation (reference
    string hash, per-hash register fold, float estimate) and require
    the distributed answer to match EXACTLY — not within tolerance."""
    import math

    from cloud_dedup_ray.pipelines.textops import docs_hll_tokens_by_lang

    df = _write_vocab_corpus(tmp_path, n_docs=120, seed=31)
    out = docs_hll_tokens_by_lang(str(tmp_path))

    p, m = 12, 1 << 12
    regs: dict[str, list[int]] = {}
    for _, row in df.iterrows():
        toks = [t for t in row["text"].lower().split() if t]
        r = regs.setdefault(row["lang"], [0] * m)
        for t in toks:
            h = _ref_hash(t)
            idx = h >> (64 - p)
            suffix = h & ((1 << (64 - p)) - 1)
            rho = (64 - p) - suffix.bit_length() + 1
            if rho > r[idx]:
                r[idx] = rho
    want = {}
    for lang, r in regs.items():
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / sum(2.0 ** -x for x in r)
        zeros = r.count(0)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        want[lang] = int(round(est))
    got = dict(zip(out["lang"], out["n_distinct_hll"]))
    assert got == want


def test_hash_strings_property_matches_scalar_reference():
    """Property test: on arbitrary unicode strings (plus nulls, empties,
    NUL bytes, sliced/offset arrays) the vectorized segmented hash must
    equal the per-string scalar reference. Three shuffle families key on
    this kernel (line dedup, windowed events, coarse partitions), so its
    offset arithmetic is load-bearing. The >2 GiB regime itself can't be
    allocated in a test; the cast to large_string (int64 offsets) plus
    the slicing cases here pin the arithmetic that regime relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.text(max_size=80),
                st.text(alphabet="\x00\x01ab é日", max_size=300),
            ),
            max_size=40,
        ),
        st.integers(min_value=0, max_value=5),
    )
    def check(strs, offset):
        want = np.array(
            [_ref_hash(s if s is not None else "") for s in strs], np.uint64
        )
        got = hash_strings_u64(pa.array(strs, pa.string()))
        np.testing.assert_array_equal(got, want)
        # sliced (non-zero offset) array must hash identically
        padded = pa.array(["pad"] * offset + strs, pa.string()).slice(offset)
        np.testing.assert_array_equal(hash_strings_u64(padded), want)

    check()
