"""End-to-end parity: the REAL reference implementation
(/root/reference/src/cloud_duplicate_analyzer.py, imported read-only and
executed on a temp directory tree) vs the Ray pipeline run on the
equivalent corpus table.

Fixtures avoid the reference's walk-order nondeterminism (no two
same-(name,size) files within one service), so outputs must agree
exactly. Label order: the rebuild sorts labels; we pass dirs to the
reference in sorted order too.
"""

import os
import sys

import pytest
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.pipelines.exact import analyze_corpus

sys.path.insert(0, "/root/reference/src")
ref = pytest.importorskip("cloud_duplicate_analyzer")

FUZZ = 5.0


def build_tree(root, files, symlinks=()):
    """files: list of (rel_path, content_bytes, mtime)."""
    for rel, content, mtime in files:
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(content)
        os.utime(p, (mtime, mtime))
    for rel, target in symlinks:
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        os.symlink(target, p)


def corpus_rows(services):
    """services: {label: (files, symlinks)} → corpus table rows."""
    rows = []
    for label, (files, symlinks) in services.items():
        for rel, content, mtime in files:
            rows.append(
                {
                    "repo": label,
                    "path": rel,
                    "commit": "",
                    "lang": rel.rsplit(".", 1)[-1],
                    "content": content.decode(),
                    "size": len(content),
                    "mtime": float(mtime),
                    "is_symlink": False,
                    "symlink_target": None,
                }
            )
        for rel, target in symlinks:
            resolved = os.path.realpath(target)  # non-strict, like the scanner
            rows.append(
                {
                    "repo": label,
                    "path": rel,
                    "commit": "",
                    "lang": "",
                    "content": "",
                    "size": -1,
                    "mtime": 0.0,
                    "is_symlink": True,
                    "symlink_target": resolved,
                }
            )
    return rows


def run_both(tmp_path, services, **cfg_kw):
    from pathlib import Path

    dirs = []
    for label in sorted(services):
        root = tmp_path / label
        root.mkdir()
        build_tree(str(root), *services[label])
        dirs.append((label, Path(root)))
    ref_result = ref.analyze(
        dirs,
        mtime_fuzz=cfg_kw.get("mtime_fuzz", FUZZ),
        use_checksum=cfg_kw.get("use_checksum", True),
        skip_hidden=cfg_kw.get("skip_hidden", True),
    )
    ds = ray.data.from_items(corpus_rows(services))
    mine = analyze_corpus(ds, DedupConfig(**cfg_kw))
    return ref_result, mine


def _ref_groups(groups):
    return {
        (
            g["rel_path"],
            g["content_match"],
            g["version_status"],
            tuple(sorted(g["matches"])),
            g["newest_in"],
            g["age_difference_days"],
        )
        for g in groups
    }


def _my_groups(ds):
    return {
        (
            r.rel_path,
            r.content_match,
            r.version_status,
            tuple(r.services),
            r.newest_in,
            None if r.age_difference_days is None or r.age_difference_days != r.age_difference_days
            else r.age_difference_days,
        )
        for r in ds.to_pandas().itertuples()
    }


SCENARIO = {
    "SvcA": (
        [
            ("docs/work/spec.txt", b"spec v1", 1000.0),
            ("docs/personal/diary.txt", b"dear diary", 1000.0),
            ("photos/2020/jan.jpg", b"JPG1", 1000.0),
            ("photos/2020/feb.jpg", b"JPG2", 1000.0),
            ("photos/2021/mar.jpg", b"JPG3", 1000.0),
            ("x/report.txt", b"hello", 1000.0),
            ("top.txt", b"rooted", 1000.0),
            ("conflict/data.bin", b"AAAA", 1000.0),
            ("phantom/p.bin", b"XX1", 1000.0),
            ("empty/zero.dat", b"", 1000.0),
            ("onlyA/solo.txt", b"solo", 1000.0),
        ],
        [("links/cur.txt", "TARGET1"), ("links/div.txt", "TARGET1")],
    ),
    "SvcB": (
        [
            ("docs/work/spec.txt", b"spec v1", 1002.0),
            ("docs/personal/diary.txt", b"other words", 2000.0),
            ("photos/2020/jan.jpg", b"JPG1", 1000.0),
            ("photos/2020/feb.jpg", b"JPG2", 1000.0),
            ("photos/2021/mar.jpg", b"JPG3", 1000.0),
            ("y/report.txt", b"hello", 1001.0),
            ("top.txt", b"rooted", 9999.0),
            ("conflict/data.bin", b"BBBB", 1000.0),
            ("phantom/p.bin", b"XX2", 1001.0),
            ("empty/zero.dat", b"", 8000.0),
            ("mixed/item.txt", b"regular file", 1000.0),
        ],
        [("links/cur.txt", "TARGET1"), ("links/div.txt", "TARGET2")],
    ),
    "SvcC": (
        [
            ("photos/2020/jan.jpg", b"JPG1", 1003.0),
            ("onlyC/c1.txt", b"ccc", 1000.0),
        ],
        [("mixed/item.txt", "TARGET1")],
    ),
}


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    # create symlink target files so resolution works for both sides
    for t in ("TARGET1", "TARGET2"):
        with open(tmp / t, "w") as f:
            f.write("t")
    services = {
        label: (
            files,
            [(rel, str(tmp / tgt)) for rel, tgt in links],
        )
        for label, (files, links) in SCENARIO.items()
    }
    return run_both(tmp, services)


def test_totals_match_reference(scenario):
    ref_result, mine = scenario
    assert mine.total_files == ref_result["total_files"]
    assert mine.labels == ref_result["labels"]


def test_duplicate_groups_match_reference(scenario):
    ref_result, mine = scenario
    assert _my_groups(mine.duplicate_groups) == _ref_groups(
        ref_result["duplicate_groups"]
    )


def test_conflict_groups_match_reference(scenario):
    ref_result, mine = scenario
    ref_set = {
        (g["rel_path"], g["content_match"], g["version_status"],
         tuple(sorted(g["matches"])))
        for g in ref_result["conflict_groups"]
    }
    my_set = {
        (r.rel_path, r.content_match, r.version_status, tuple(r.services))
        for r in mine.conflict_groups.to_pandas().itertuples()
    }
    assert my_set == ref_set


def test_symlinks_match_reference(scenario):
    ref_result, mine = scenario
    ref_set = {
        (s["rel_path"], s["symlink_status"], tuple(sorted(s["services"])))
        for s in ref_result["symlinks"]
    }
    my_set = {
        (r.rel_path, r.version_status, tuple(r.services))
        for r in mine.symlinks.to_pandas().itertuples()
    }
    assert my_set == ref_set


def test_counts_match_reference(scenario):
    ref_result, mine = scenario
    assert mine.pairwise_counts == ref_result["pairwise_counts"]
    assert mine.all_services_count == ref_result["all_services_count"]
    assert mine.unique_counts == ref_result["unique_counts"]


def test_folder_comparisons_match_reference(scenario):
    ref_result, mine = scenario
    def norm(fcs):
        return {
            fc["folder_path"]: (
                fc["relationship"],
                fc["subtree_status"],
                fc["total_unique_files"],
                fc["files_in_all"],
                fc["subtree_total_files"],
                tuple(fc["services_present"]),
            )
            for fc in fcs
        }
    assert norm(mine.folder_comparisons) == norm(ref_result["folder_comparisons"])
    assert mine.relationship_counts == ref_result["relationship_counts"]
    assert sorted(f["folder_path"] for f in mine.safe_to_delete_roots) == sorted(
        f["folder_path"] for f in ref_result["safe_to_delete_roots"]
    )


def test_no_checksum_parity(tmp_path_factory):
    """--no-checksum: matches become 'unverified', phantom undetectable
    (reference :254-255) — outputs must agree with the real reference."""
    tmp = tmp_path_factory.mktemp("parity_nc")
    services = {
        "A": ([("a/f.txt", b"abc", 1000.0), ("p/x.bin", b"XX1", 1000.0)], []),
        "B": ([("a/f.txt", b"abc", 1001.0), ("p/x.bin", b"XX2", 1000.0)], []),
    }
    ref_result, mine = run_both(tmp, services, use_checksum=False)
    assert _ref_groups(ref_result["duplicate_groups"]) == _my_groups(
        mine.duplicate_groups
    )
    assert len(ref_result["conflict_groups"]) == 0
    assert mine.conflict_groups.count() == 0
    cms = {g["content_match"] for g in ref_result["duplicate_groups"]}
    assert cms == {"unverified"}


def test_mtime_fuzz_parity(tmp_path_factory):
    """Custom --mtime-fuzz flips same↔diverged identically on both
    sides (reference :248, :1405)."""
    tmp = tmp_path_factory.mktemp("parity_fz")
    services = {
        "A": ([("a/f.txt", b"abc", 1000.0)], []),
        "B": ([("a/f.txt", b"abc", 1030.0)], []),  # 30 s apart
    }
    for fuzz, want_vs in ((5.0, "diverged"), (60.0, "same")):
        ref_result, mine = run_both(tmp, services, mtime_fuzz=fuzz)
        got_ref = ref_result["duplicate_groups"][0]["version_status"]
        got_mine = mine.duplicate_groups.to_pandas().iloc[0].version_status
        assert got_ref == got_mine == want_vs
        import shutil
        for label in ("A", "B"):
            shutil.rmtree(tmp / label, ignore_errors=True)


def test_include_hidden_parity(tmp_path_factory):
    """--include-hidden keeps dot-files; .DS_Store stays excluded either
    way (reference :144-149)."""
    tmp = tmp_path_factory.mktemp("parity_h")
    services = {
        "A": ([(".hid/s.txt", b"s", 1000.0), ("v.txt", b"v", 1000.0),
               (".DS_Store", b"junk", 1000.0)], []),
        "B": ([(".hid/s.txt", b"s", 1000.0), ("v.txt", b"v", 1000.0)], []),
    }
    ref_result, mine = run_both(tmp, services, skip_hidden=False)
    assert ref_result["total_files"] == mine.total_files == {"A": 2, "B": 2}
    assert _ref_groups(ref_result["duplicate_groups"]) == _my_groups(
        mine.duplicate_groups
    )
    assert len(ref_result["duplicate_groups"]) == 2  # .hid/s.txt + v.txt
