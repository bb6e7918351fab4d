"""New training-data text operators: PII scrubbing, repetition
signals, corpus line-level dedup (first-occurrence / C4-style).
Oracle-grade checks live in scripts/check_correctness.py; these
tests pin kernel edge cases and the brute-force semantics."""


def test_scrub_pii_kernel():
    import pyarrow as pa

    from cloud_dedup_ray.pipelines.textops import scrub_pii

    texts = pa.array(
        [
            "see https://a.example/x?y=1 or mail bob.smith+x@corp.example.org now",
            "no pii here",
            "",
            "http://plain.example and u@d.io trailing",
        ]
    )
    scrubbed, n_urls, n_emails = scrub_pii(texts)
    assert scrubbed.to_pylist() == [
        "see <URL> or mail <EMAIL> now",
        "no pii here",
        "",
        "<URL> and <EMAIL> trailing",
    ]
    assert n_urls.to_pylist() == [1, 0, 0, 1]
    assert n_emails.to_pylist() == [1, 0, 0, 1]


def test_docs_repetition_stats_known_values(tmp_path):
    import pandas as pd

    from cloud_dedup_ray.pipelines.textops import docs_repetition_stats

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a a b",            # 3 words, 2 distinct, top 'a' x2
                "x",                # singleton
                "   ",              # normalizes to '' -> zero words
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = docs_repetition_stats(str(tmp_path))
    r0 = out[out["doc_id"] == 0].iloc[0]
    assert r0["n_words"] == 3
    assert r0["distinct_word_ratio"] == round(2 / 3, 6)
    # chars: total 3 ('a','a','b'), distinct-first 2 -> dup ratio 1/3
    assert r0["dup_char_ratio"] == round(1 / 3, 6)
    assert r0["top_word_ratio"] == round(2 / 3, 6)
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert (
        r1["n_words"], r1["distinct_word_ratio"], r1["dup_char_ratio"],
        r1["top_word_ratio"],
    ) == (1, 1.0, 0.0, 1.0)
    r2 = out[out["doc_id"] == 2].iloc[0]
    assert (r2["n_words"], r2["distinct_word_ratio"]) == (0, 0.0)


def test_corpus_line_dedup_first_occurrence(tmp_path):
    import hashlib

    import pandas as pd

    from cloud_dedup_ray.pipelines.textops import corpus_line_dedup

    files = [
        # (repo, path, commit, content) — rA/a.py is globally first
        ("rA", "a.py", "c1", "import os\n\ndef f():\n    return 1"),
        ("rA", "b.py", "c1", "import os\n\ndef g():\n    return 1"),
        ("rB", "a.py", "c1", "import os\n\ndef f():\n    return 1"),
    ]
    pd.DataFrame(
        {
            "repo": [f[0] for f in files],
            "path": [f[1] for f in files],
            "commit": [f[2] for f in files],
            "lang": ["py"] * 3,
            "content": [f[3] for f in files],
            "size": [len(f[3]) for f in files],
            "mtime": [1.0] * 3,
            "is_symlink": [False] * 3,
            "symlink_target": [None] * 3,
        }
    ).to_parquet(tmp_path / "c.parquet")
    out = corpus_line_dedup(str(tmp_path))
    assert len(out) == 3
    # brute-force twin
    seen: set[str] = set()
    expect = {}
    for repo, path, commit, content in sorted(files):
        kept = []
        lines = content.split("\n")
        for ln in lines:
            if ln == "" or ln not in seen:
                kept.append(ln)
                if ln != "":
                    seen.add(ln)
        expect[(repo, path, commit)] = (
            len(lines), len(kept),
            hashlib.sha256("\n".join(kept).encode()).hexdigest(),
        )
    for _, row in out.iterrows():
        e = expect[(row["repo"], row["path"], row["commit"])]
        assert (row["n_lines"], row["n_kept"], row["dedup_sha256"]) == e
    # the duplicated 'import os' and 'return 1' lines survive once each:
    # rA/a.py keeps everything, the others lose their shared lines
    first = out[(out["repo"] == "rA") & (out["path"] == "a.py")].iloc[0]
    assert first["n_kept"] == first["n_lines"]
    other = out[(out["repo"] == "rB")].iloc[0]
    assert other["n_kept"] < other["n_lines"]


def test_fingerprint64_blake2b_branch_flags_sql_twin(tmp_path):
    """Texts whose NORMALIZED form is 1..16 bytes take fingerprint64's
    blake2b branch, which the DuckDB twin deliberately cannot express:
    the twin emits rows only for n == 0 and n > 16, so a corpus with a
    short doc must (a) get the correct blake2b value from the Ray
    pipeline and (b) make the twin's row count drop — the loud
    row-count flag the fp64 oracle comment promises, proven here with
    an actual short-normalized-text row."""
    import hashlib

    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from cloud_dedup_ray.pipelines.textops import docs_fingerprint64

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "  Short ONE  ",          # normalizes to 'short one' (9 B)
                "",                        # n == 0 branch: fp64 = 0
                "long enough to take the rolling-hash branch " * 3,
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    got = docs_fingerprint64(str(tmp_path))
    assert len(got) == 3

    # (a) the blake2b branch value is pinned directly
    want_short = int.from_bytes(
        hashlib.blake2b(b"short one", digest_size=8).digest(), "big"
    )
    assert np.uint64(got.loc[got["doc_id"] == 0, "fp64"].iloc[0]) == np.uint64(
        want_short
    )
    assert got.loc[got["doc_id"] == 1, "fp64"].iloc[0] == 0

    # (b) the SQL twin drops the short row -> row-count mismatch fires
    con = duckdb.connect()
    con.register("documents", docs)
    twin = con.execute(entry.oracle_sql()["docs_fingerprint64"]).df()
    assert len(twin) == 2
    assert set(twin["doc_id"]) == {1, 2}
    # rows the twin does emit agree with the pipeline
    merged = twin.merge(got, on="doc_id", suffixes=("_sql", "_ray"))
    assert (merged["fp64_sql"] == merged["fp64_ray"]).all()


import pytest as _pytest


@_pytest.mark.parametrize(
    "fn_name,sort_key",
    [
        ("docs_token_count", "doc_id"),
        ("docs_token_count_bpe", "doc_id"),
        ("docs_train_split", "doc_id"),
        ("docs_fingerprint", "doc_id"),
        ("docs_fingerprint64", "doc_id"),
        ("docs_lang_id", "doc_id"),
        ("docs_quality", "doc_id"),
        ("docs_scrub_pii", "doc_id"),
        ("docs_repetition_stats", "doc_id"),
        ("docs_simhash", "doc_id"),
        ("docs_minhash_clusters", "doc_id"),
        ("docs_exact_dedup", "content_hash"),
        ("docs_dedup_keep_best", "fingerprint"),
    ],
)
def test_parquet_sink_twin_matches_dataframe_path(fn_name, sort_key, tmp_path):
    """Every per-document pipeline has a distributed parquet sink twin
    (``out_dir=``): workers stream the result straight to parquet and
    nothing funnels through driver pandas — the 100x-scale path. The
    twin must carry byte-identical rows to the DataFrame path."""
    import pandas as pd

    from cloud_dedup_ray.pipelines import textops

    fn = getattr(textops, fn_name)
    sf = "/root/testdata/sf0.001"
    df = fn(sf)
    out_dir = str(tmp_path / fn_name)
    assert fn(sf, out_dir=out_dir) == out_dir
    back = (
        pd.read_parquet(out_dir)
        .sort_values(sort_key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        back[df.columns.tolist()], df, check_exact=True
    )


def test_fingerprint64_batch_vectorization_matches_per_doc_reference():
    """The batch-vectorized fingerprint64 (flat-buffer window hashes +
    reduceat winnowing) must be byte-identical to the straightforward
    per-document reference on adversarial inputs: nulls, empties,
    whitespace-only (normalizes to ''), exactly-window-byte texts
    (blake2b branch), window+1 boundary, multi-byte UTF-8, and long
    random docs — across batch compositions (order and neighbors must
    not matter) and sliced arrays."""
    import hashlib
    import random

    import numpy as np
    import pyarrow as pa

    from cloud_dedup_ray.functions.text import fingerprint64, normalize

    def ref(texts: pa.Array, window: int = 16) -> list[int]:
        out = np.zeros(len(texts), np.uint64)
        for i, t in enumerate(normalize(texts).to_pylist()):
            if not t:
                continue
            data = t.encode()
            if len(data) <= window:
                out[i] = np.uint64(int.from_bytes(
                    hashlib.blake2b(data, digest_size=8).digest(), "big"))
                continue
            arr = np.frombuffer(data, np.uint8).astype(np.uint64)
            base = np.uint64(1099511628211)
            pows = np.empty(window, np.uint64)
            pows[-1] = 1
            with np.errstate(over="ignore"):
                for j in range(window - 2, -1, -1):
                    pows[j] = pows[j + 1] * base
                n_win = len(arr) - window + 1
                hashes = np.zeros(n_win, np.uint64)
                for j in range(window):
                    hashes += arr[j: j + n_win] * pows[j]
            n_chunks = (n_win + window - 1) // window
            acc = np.uint64(0)
            for c in range(n_chunks):
                acc ^= hashes[c * window: (c + 1) * window].min()
            out[i] = acc
        return out.view(np.int64).tolist()

    rng = random.Random(17)
    alphabet = "abcdef ghij.kl-mn \tXYZ japon日本語é"
    pool = [
        None, "", "   ", "\t\n ", "x", "short one", "0123456789abcdef",
        "0123456789abcdefg", "é" * 8, "日" * 6,
    ] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 400)))
        for _ in range(60)
    ]
    for trial in range(8):
        batch = [rng.choice(pool) for _ in range(rng.randrange(1, 50))]
        arr = pa.array(batch, pa.string())
        assert fingerprint64(arr).to_pylist() == ref(arr)
        # sliced (non-zero offset) input must match too
        sliced = pa.array(["pad", "pad2"] + batch, pa.string()).slice(2)
        assert fingerprint64(sliced).to_pylist() == ref(arr)
    # chunked input (map_batches hands ChunkedArray columns)
    chunked = pa.chunked_array([pool[:5], pool[5:10]])
    flat = pa.array(pool[:10], pa.string())
    assert fingerprint64(chunked).to_pylist() == ref(flat)
    # empty batch
    assert fingerprint64(pa.array([], pa.string())).to_pylist() == []
