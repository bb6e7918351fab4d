"""Checkpoint/lineage + resume semantics."""

import json
import os

import pytest
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.pipelines import neardup
from cloud_dedup_ray.pipelines.neardup import cluster_corpus
from cloud_dedup_ray.stages.project import project_corpus


@pytest.fixture()
def corpus(small_corpus):
    return (
        project_corpus(ray.data.from_arrow(small_corpus), drop_content=False)
        .filter(expr="is_symlink == False")
        .materialize()
    )


def _assign(res):
    return {r["doc_id"]: r["cluster_id"] for r in res.assignments.take_all()}


def test_checkpoint_resume_identical_and_skips_recompute(corpus, tmp_path, monkeypatch):
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    r1 = cluster_corpus(corpus, cfg, with_containment=False)
    a1 = _assign(r1)
    assert r1.metrics["resumed_stages"] == []
    # lineage markers exist
    for stage in ("signatures", "lsh_buckets"):
        with open(tmp_path / "ck" / stage / "_lineage.json") as f:
            meta = json.load(f)
        assert meta["fingerprint"] == cfg.fingerprint()

    # resume: signer must never be constructed again — poison the class
    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError("signer recomputed despite checkpoint")

    monkeypatch.setattr(neardup, "MinHashSigner", Boom)
    r2 = cluster_corpus(corpus, cfg, with_containment=False)
    assert set(r2.metrics["resumed_stages"]) == {"signatures", "lsh_buckets"}
    assert _assign(r2) == a1


def test_checkpoint_invalidated_by_config_change(corpus, tmp_path):
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    cluster_corpus(corpus, cfg, with_containment=False)
    cfg2 = DedupConfig(checkpoint_dir=str(tmp_path / "ck"), num_bands=16)
    r2 = cluster_corpus(corpus, cfg2, with_containment=False)
    assert r2.metrics["resumed_stages"] == []  # fingerprint mismatch → rebuild


def test_partial_checkpoint_resumes_later_stages_only(corpus, tmp_path, monkeypatch):
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    r1 = cluster_corpus(corpus, cfg, with_containment=False)
    a1 = _assign(r1)
    # simulate a kill after the signatures stage: drop the bucket stage
    import shutil

    shutil.rmtree(tmp_path / "ck" / "lsh_buckets")

    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError("signer recomputed despite checkpoint")

    monkeypatch.setattr(neardup, "MinHashSigner", Boom)
    r2 = cluster_corpus(corpus, cfg, with_containment=False)
    assert r2.metrics["resumed_stages"] == ["signatures"]
    assert _assign(r2) == a1


def test_atomic_write_tmpdir_never_valid(corpus, tmp_path):
    """A half-written data.tmp (kill mid-write) must not validate."""
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    from cloud_dedup_ray.state.checkpoint import StageCheckpoint

    ck = StageCheckpoint(cfg.checkpoint_dir, cfg.fingerprint())
    os.makedirs(tmp_path / "ck" / "signatures" / "data.tmp", exist_ok=True)
    assert not ck.complete("signatures")


def test_per_partition_resume(tmp_path, monkeypatch):
    """Kill/resume at partition granularity: only the partition whose
    lineage is missing gets re-signed; completed partitions are loaded
    from their checkpoints and the final assignments are identical."""
    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus_resumable

    cdir = write_corpus(str(tmp_path / "corpus"), seed=7, n_files=120,
                        n_repos=3, n_shards=8)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    r1 = cluster_corpus_resumable(cdir, cfg, num_partitions=4,
                                  with_containment=False)
    a1 = _assign(r1)
    assert [p["resumed"] for p in r1.metrics["partitions"]] == [False] * 4
    assert all(p["rows_per_sec"] is not None for p in r1.metrics["partitions"])

    # simulate a kill mid-run: partition 2 incomplete, bucket stage gone
    import shutil

    shutil.rmtree(tmp_path / "ck" / "sig_part_0002")
    shutil.rmtree(tmp_path / "ck" / "lsh_buckets")

    calls = []
    orig = neardup.sign_dataset

    def counting_sign(corpus, cfg_):
        calls.append(1)
        return orig(corpus, cfg_)

    monkeypatch.setattr(neardup, "sign_dataset", counting_sign)
    r2 = cluster_corpus_resumable(cdir, cfg, num_partitions=4,
                                  with_containment=False)
    assert len(calls) == 1  # only the deleted partition re-signed
    assert [p["resumed"] for p in r2.metrics["partitions"]] == [
        True, True, False, True,
    ]
    assert _assign(r2) == a1


def test_partition_checkpoints_invalidated_by_file_set_change(tmp_path):
    """Changing the corpus file set or num_partitions shifts the
    file→partition mapping; stale sig_part_* checkpoints must NOT be
    reused for the wrong file subset (their lineage scope records the
    exact file slice)."""
    import glob
    import shutil

    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus_resumable

    cdir = write_corpus(str(tmp_path / "corpus"), seed=9, n_files=80,
                        n_repos=2, n_shards=6)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    cluster_corpus_resumable(cdir, cfg, num_partitions=3,
                             with_containment=False)

    # different partition count → every mapping shifts → full re-sign
    shutil.rmtree(tmp_path / "ck" / "lsh_buckets")
    r2 = cluster_corpus_resumable(cdir, cfg, num_partitions=2,
                                  with_containment=False)
    assert [p["resumed"] for p in r2.metrics["partitions"]] == [False, False]

    # removing one corpus shard shifts the slices → no stale reuse
    os.remove(sorted(glob.glob(os.path.join(cdir, "*.parquet")))[0])
    shutil.rmtree(tmp_path / "ck" / "lsh_buckets")
    r3 = cluster_corpus_resumable(cdir, cfg, num_partitions=2,
                                  with_containment=False)
    assert [p["resumed"] for p in r3.metrics["partitions"]] == [False, False]


def test_file_mode_incremental_append(tmp_path, monkeypatch):
    """partition_by='file': appending new shard files to the corpus
    re-signs ONLY the new files (existing per-file checkpoints stay
    valid), and the incremental result equals a from-scratch run over
    the full corpus."""
    import glob
    import shutil

    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus_resumable

    base = write_corpus(str(tmp_path / "base"), seed=11, n_files=80,
                        n_repos=2, n_shards=4)
    extra = write_corpus(str(tmp_path / "extra"), seed=23, n_files=40,
                         n_repos=2, n_shards=2)
    # corpus v1 = the 4 base shards
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    for f in sorted(glob.glob(os.path.join(base, "*.parquet"))):
        shutil.copy(f, cdir / os.path.basename(f))
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    r1 = cluster_corpus_resumable(str(cdir), cfg, with_containment=False,
                                  partition_by="file")
    assert [p["resumed"] for p in r1.metrics["partitions"]] == [False] * 4

    # corpus v2 = v1 + 2 appended shards (distinct names)
    for f in sorted(glob.glob(os.path.join(extra, "*.parquet"))):
        shutil.copy(f, cdir / ("extra-" + os.path.basename(f)))

    calls = []
    orig = neardup.sign_dataset

    def counting_sign(corpus, cfg_):
        calls.append(1)
        return orig(corpus, cfg_)

    monkeypatch.setattr(neardup, "sign_dataset", counting_sign)
    r2 = cluster_corpus_resumable(str(cdir), cfg, with_containment=False,
                                  partition_by="file")
    assert len(calls) == 2  # only the two appended shards signed
    assert sorted(p["resumed"] for p in r2.metrics["partitions"]) == [
        False, False, True, True, True, True,
    ]

    fresh = DedupConfig(checkpoint_dir=str(tmp_path / "ck_fresh"))
    r3 = cluster_corpus_resumable(str(cdir), fresh, with_containment=False,
                                  partition_by="file")
    assert _assign(r2) == _assign(r3)


def test_direct_checkpoint_invalidated_by_input_change(corpus, tmp_path, monkeypatch):
    """Direct cluster_corpus with a checkpoint_dir derives an input
    scope from the corpus content, so a CHANGED corpus re-signs instead
    of silently reusing the previous corpus' signatures/buckets."""
    import pyarrow as pa

    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    cluster_corpus(corpus, cfg, with_containment=False)

    # same corpus → both stage checkpoints reused
    calls = []
    orig = neardup.sign_dataset

    def counting_sign(c, cfg_):
        calls.append(1)
        return orig(c, cfg_)

    monkeypatch.setattr(neardup, "sign_dataset", counting_sign)
    cluster_corpus(corpus, cfg, with_containment=False)
    assert calls == []

    # modified corpus (one row's content edited) → invalidated, re-signed
    tbl = pa.concat_tables(
        [b for b in corpus.iter_batches(batch_format="pyarrow")]
    ).to_pandas()
    tbl.loc[tbl.index[0], "content"] = "entirely new content for this row"
    import hashlib as _h

    tbl.loc[tbl.index[0], "content_sha256"] = _h.sha256(
        tbl.loc[tbl.index[0], "content"].encode()
    ).hexdigest()
    changed = ray.data.from_pandas(tbl).materialize()
    cluster_corpus(changed, cfg, with_containment=False)
    assert calls == [1]


def test_corpus_identity_scope_couples_fields():
    """Multiset-preserving edits (two rows swapping content hashes,
    compensating mtime changes) must change the scope — the fold mixes
    each row's fields into ONE hash before summing, so per-column sums
    staying equal is not enough to collide. Sub-second mtime touches
    must also register (raw float64 bit pattern, no int truncation)."""
    import ray.data

    from cloud_dedup_ray.pipelines.neardup import _corpus_identity_scope

    rows = [
        {"doc_id": 1, "mtime": 100.0, "content_sha256": "aa" * 32},
        {"doc_id": 2, "mtime": 200.0, "content_sha256": "bb" * 32},
    ]
    base = _corpus_identity_scope(ray.data.from_items(rows))
    # same multiset of doc_ids, mtimes and sha prefixes — rows swapped
    swapped = [
        {"doc_id": 1, "mtime": 100.0, "content_sha256": "bb" * 32},
        {"doc_id": 2, "mtime": 200.0, "content_sha256": "aa" * 32},
    ]
    assert _corpus_identity_scope(ray.data.from_items(swapped)) != base
    # compensating mtime edits keep the per-column sum identical
    compensated = [
        {"doc_id": 1, "mtime": 150.0, "content_sha256": "aa" * 32},
        {"doc_id": 2, "mtime": 150.0, "content_sha256": "bb" * 32},
    ]
    assert _corpus_identity_scope(ray.data.from_items(compensated)) != base
    # sub-second touch
    touched = [
        {"doc_id": 1, "mtime": 100.0000001, "content_sha256": "aa" * 32},
        {"doc_id": 2, "mtime": 200.0, "content_sha256": "bb" * 32},
    ]
    assert _corpus_identity_scope(ray.data.from_items(touched)) != base
    # identical input reproduces the scope (order-independent)
    assert _corpus_identity_scope(ray.data.from_items(rows[::-1])) == base


def test_resume_at_bench_scale_no_resign_identical_clusters(tmp_path, monkeypatch):
    """Kill/resume at BENCH scale (the sf0.1 bench corpus shape, ~28k
    rows over 64 shard files) — resumability evidenced at a size where
    it matters, not just the 120-row fixture: a kill landing AFTER the
    signing stage (every sig-partition checkpoint complete, the bucket
    stage and everything downstream gone) must re-sign NOTHING on
    resume (all 8 partition lineage fingerprints validate) and produce
    byte-identical final cluster assignments."""
    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus_resumable

    cdir = write_corpus(str(tmp_path / "corpus"), seed=42, n_files=20000,
                        n_repos=4, n_shards=64)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    r1 = cluster_corpus_resumable(cdir, cfg, num_partitions=8,
                                  with_containment=False)
    a1 = _assign(r1)
    assert [p["resumed"] for p in r1.metrics["partitions"]] == [False] * 8
    assert len(a1) > 20000  # bench-scale row count actually reached

    # simulate the kill: signatures all on disk, downstream gone
    import shutil

    shutil.rmtree(tmp_path / "ck" / "lsh_buckets")

    calls = []
    orig = neardup.sign_dataset

    def counting_sign(c, cfg_):
        calls.append(1)
        return orig(c, cfg_)

    monkeypatch.setattr(neardup, "sign_dataset", counting_sign)
    r2 = cluster_corpus_resumable(cdir, cfg, num_partitions=8,
                                  with_containment=False)
    assert calls == []  # zero re-signing across all completed partitions
    assert [p["resumed"] for p in r2.metrics["partitions"]] == [True] * 8
    assert _assign(r2) == a1
