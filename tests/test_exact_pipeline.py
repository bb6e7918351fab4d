"""Integration: the Ray exact-tier pipeline vs the pure-Python oracle
on the deterministic synthetic corpus (FIXTURES.md scenarios)."""

import pyarrow as pa
import pytest
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.oracle.reference_oracle import analyze_oracle
from cloud_dedup_ray.pipelines.exact import analyze_corpus


def _corpus_rows(table: pa.Table) -> list[dict]:
    return table.to_pylist()


@pytest.fixture(scope="module")
def results(small_corpus):
    cfg = DedupConfig()
    res = analyze_corpus(ray.data.from_arrow(small_corpus), cfg)
    oracle = analyze_oracle(_corpus_rows(small_corpus))
    return res, oracle


def _group_keyset(df):
    return {
        (r.rel_path, r.content_match, r.version_status, tuple(r.services))
        for r in df.itertuples()
    }


def test_labels_and_totals(results):
    res, oracle = results
    assert res.labels == oracle["labels"]
    assert res.total_files == oracle["total_files"]


def test_duplicate_groups_match(results):
    res, oracle = results
    got = _group_keyset(res.duplicate_groups.to_pandas())
    want = {
        (g["rel_path"], g["content_match"], g["version_status"], tuple(g["services"]))
        for g in oracle["duplicate_groups"]
    }
    assert got == want


def test_conflict_groups_match(results):
    res, oracle = results
    got = _group_keyset(res.conflict_groups.to_pandas())
    want = {
        (g["rel_path"], g["content_match"], g["version_status"], tuple(g["services"]))
        for g in oracle["conflict_groups"]
    }
    assert got == want
    # mixed-type rows present
    assert any(cm == "mixed_type" for (_, cm, _, _) in got)


def test_symlinks_match(results):
    res, oracle = results
    sym = res.symlinks.to_pandas()
    got = {
        (r.rel_path, r.version_status, tuple(r.services)) for r in sym.itertuples()
    }
    want = {
        (s["rel_path"], s["symlink_status"], tuple(s["services"]))
        for s in oracle["symlinks"]
    }
    assert got == want
    assert len(got) >= 3  # identical, diverged, dangling planted


def test_newest_in_and_age(results):
    res, oracle = results
    got = {
        r.rel_path: (r.newest_in, r.age_difference_days)
        for r in res.duplicate_groups.to_pandas().itertuples()
    }
    for g in oracle["duplicate_groups"]:
        assert got[g["rel_path"]] == (g["newest_in"], g["age_difference_days"])


def test_counts_match(results):
    res, oracle = results
    assert res.pairwise_counts == oracle["pairwise_counts"]
    assert res.all_services_count == oracle["all_services_count"]
    assert res.unique_counts == oracle["unique_counts"]


def test_folder_analysis_matches(results):
    res, oracle = results
    got = {
        fc["folder_path"]: (
            fc["relationship"],
            fc["subtree_status"],
            fc["total_unique_files"],
            fc["subtree_total_files"],
            tuple(fc["services_present"]),
        )
        for fc in res.folder_comparisons
    }
    want = {
        fc["folder_path"]: (
            fc["relationship"],
            fc["subtree_status"],
            fc["total_unique_files"],
            fc["subtree_total_files"],
            tuple(fc["services_present"]),
        )
        for fc in oracle["folder_comparisons"]
    }
    assert got == want
    assert res.relationship_counts == oracle["relationship_counts"]
    assert [f["folder_path"] for f in res.safe_to_delete_roots] == [
        f["folder_path"] for f in oracle["safe_to_delete_roots"]
    ]


def test_no_checksum_mode(small_corpus):
    cfg = DedupConfig(use_checksum=False)
    res = analyze_corpus(ray.data.from_arrow(small_corpus), cfg)
    oracle = analyze_oracle(_corpus_rows(small_corpus), use_checksum=False)
    dup = res.duplicate_groups.to_pandas()
    assert set(dup.content_match) <= {"identical", "unverified"}
    # conflicts can only be mixed_type without checksums (no 'different')
    con = res.conflict_groups.to_pandas()
    assert set(con.content_match) <= {"mixed_type"}
    got = _group_keyset(dup)
    want = {
        (g["rel_path"], g["content_match"], g["version_status"], tuple(g["services"]))
        for g in oracle["duplicate_groups"]
    }
    assert got == want


def test_include_hidden_mode(small_corpus):
    cfg = DedupConfig(skip_hidden=False)
    res = analyze_corpus(ray.data.from_arrow(small_corpus), cfg)
    oracle = analyze_oracle(_corpus_rows(small_corpus), skip_hidden=True)
    # hidden dup (.hidden.txt planted in 2 repos) now appears
    dup_paths = set(res.duplicate_groups.to_pandas().rel_path)
    assert ".hidden.txt" in dup_paths
    # .DS_Store still always excluded
    assert not any("DS_Store" in p for p in dup_paths)
    assert res.total_files != oracle["total_files"]


def test_result_dict_shape(results):
    res, _ = results
    d = res.to_result_dict()
    for k in (
        "labels total_files duplicate_groups conflict_groups symlinks "
        "unique_counts pairwise_counts all_services_count folder_comparisons "
        "relationship_counts safe_to_delete_roots"
    ).split():
        assert k in d
    assert all("service_details" in g for g in d["duplicate_groups"])


def test_multi_commit_same_path_deterministic_representative():
    """A repo may hold several rows with the SAME path at different
    commits; the representative must be the deterministic min by
    (path, commit, sha, mtime) in both the pipeline and the oracle —
    plain min-by-path ties and would depend on block arrival order."""
    import pyarrow as pa

    rows = []
    # repoa: three commits of the same path, different content/mtime,
    # deliberately listed in non-sorted commit order
    for commit, content, mtime in (
        ("c9", "AAAA", 50.0), ("c1", "BBBB", 10.0), ("c5", "AAAA", 99.0),
    ):
        rows.append(dict(repo="repoa", path="pkg/mod.py", commit=commit,
                         lang="py", content=content, size=4, mtime=mtime,
                         is_symlink=False, symlink_target=None))
    rows.append(dict(repo="repob", path="pkg/mod.py", commit="c2",
                     lang="py", content="BBBB", size=4, mtime=10.0,
                     is_symlink=False, symlink_target=None))
    table = pa.Table.from_pylist(rows)

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.oracle.reference_oracle import analyze_oracle
    from cloud_dedup_ray.pipelines.exact import analyze_corpus

    want = analyze_oracle(rows)
    # repoa's rep is commit c1 ("BBBB", mtime 10) → identical/same
    assert len(want["duplicate_groups"]) == 1
    g = want["duplicate_groups"][0]
    assert (g["content_match"], g["version_status"]) == ("identical", "same")

    for _ in range(2):  # determinism across runs
        res = analyze_corpus(ray.data.from_arrow(table), DedupConfig())
        dup = res.duplicate_groups.to_pandas()
        assert len(dup) == 1 and len(res.conflict_groups.to_pandas()) == 0
        assert dup.iloc[0].content_match == "identical"
        assert dup.iloc[0].version_status == "same"


def test_distributed_folder_path_matches_driver(small_corpus):
    """folder_mode="distributed" (groupby(repo,folder) reduce + ancestor
    explode + per-folder compare in group tasks) must produce exactly
    the driver-merge path's folder comparisons, relationship counts and
    safe roots."""
    cfg = DedupConfig()
    ds = ray.data.from_arrow(small_corpus)
    drv = analyze_corpus(ds, cfg, folder_mode="driver")
    dist = analyze_corpus(ds, cfg, folder_mode="distributed")

    def strip(fcs):
        return [
            {k: v for k, v in fc.items()}
            for fc in sorted(fcs, key=lambda f: f["folder_path"])
        ]

    assert strip(dist.folder_comparisons) == strip(drv.folder_comparisons)
    assert dist.relationship_counts == drv.relationship_counts
    assert [f["folder_path"] for f in dist.safe_to_delete_roots] == [
        f["folder_path"] for f in drv.safe_to_delete_roots
    ]
    # the distributed path does not centralize name lists
    assert dist.file_names_by_folder == {}
    assert drv.file_names_by_folder  # driver path still feeds the tree
