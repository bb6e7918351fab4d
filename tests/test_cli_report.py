"""CLI + report sinks: filesystem scan end-to-end through `main()`,
HTML/JSON twin outputs, stdout summary — mirroring the reference's CLI
smoke tests (/root/reference/tests/test_coverage_gaps.py:291-766)."""

import json
import os

from cloud_dedup_ray.cli import main, parse_dir_arg
from cloud_dedup_ray.report import (
    fmt_ts,
    human_size,
    pair_stats,
    render_html,
    stdout_summary,
)


def make_file(root, rel, content=b"x", mtime=None):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(content)
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return p


def test_parse_dir_arg():
    label, path = parse_dir_arg("Drive:/tmp")
    assert label == "Drive" and str(path) == "/tmp"
    label, path = parse_dir_arg("/tmp")
    assert label == "tmp"


def test_scalar_formatters():
    assert human_size(5) == "5 B"
    assert human_size(2048) == "2.0 KB"
    assert human_size(1024**5 * 1.5).endswith("PB")
    assert fmt_ts(0) == "—"
    assert fmt_ts(1_700_000_000).endswith("UTC")


def test_cli_end_to_end(tmp_path, capsys):
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    make_file(a, "docs/report.txt", b"same", mtime=1000)
    make_file(b, "docs/report.txt", b"same", mtime=1000)
    make_file(a, "src/app.py", b"v1", mtime=1000)
    make_file(b, "src/app.py", b"v2", mtime=5000)  # conflict (diverged)
    make_file(a, "only_a.txt", b"ua")
    make_file(b, ".hidden", b"h")  # skipped by default

    out = str(tmp_path / "rep.html")
    rc = main([f"A:{a}", f"B:{b}", "-o", out, "--mtime-fuzz", "5"])
    assert rc == 0

    captured = capsys.readouterr().out
    assert "Duplicate groups : 1" in captured
    assert "require action" in captured

    assert os.path.exists(out)
    html = open(out).read()
    assert "report.txt" in html and "app.py" in html
    # §1 stat cards + directories table, §4 per-service detail cells
    assert "stat-card" in html and a in html
    assert "service-detail" in html
    result = json.load(open(str(tmp_path / "rep.json")))
    assert result["total_files"] == {"A": 3, "B": 2}
    assert len(result["duplicate_groups"]) == 1
    assert len(result["conflict_groups"]) == 1
    assert result["conflict_groups"][0]["content_match"] == "different"
    assert result["unique_counts"]["A"] == 1
    assert result["mtime_fuzz"] == 5


def test_cli_corpus_mode_with_neardup(tmp_path, capsys):
    from cloud_dedup_ray.datagen import write_corpus

    corpus = write_corpus(str(tmp_path / "c"), seed=7, n_files=80, n_repos=2,
                          n_shards=2)
    out = str(tmp_path / "r.html")
    rc = main(["--corpus", corpus, "-o", out, "--near-dup"])
    assert rc == 0
    result = json.load(open(str(tmp_path / "r.json")))
    assert result["neardup"]["n_clusters"] >= 1
    assert os.path.isdir(str(tmp_path / "r_clusters"))
    assert "Near-dup clusters" in capsys.readouterr().out


def test_render_sections_and_pair_stats():
    result = {
        "labels": ["A", "B"],
        "total_files": {"A": 2, "B": 2},
        "unique_counts": {"A": 0, "B": 0},
        "duplicate_groups": [
            {"rel_path": "x.txt", "name_orig": "x.txt", "size": 4,
             "content_match": "identical", "version_status": "same",
             "newest_in": None, "age_difference_days": 0.0,
             "service_details": {"A": {}, "B": {}}},
        ],
        "conflict_groups": [
            {"rel_path": "y.txt", "name_orig": "y.txt", "size": 4,
             "content_match": "different", "version_status": "diverged",
             "newest_in": "B", "age_difference_days": 1.5,
             "service_details": {"A": {}, "B": {}}},
        ],
        "symlinks": [{"rel_path": "ln", "symlink_status": "target_diverged",
                      "services": ["A", "B"]}],
        "pairwise_counts": {"A↔B": 1},
        "all_services_count": 1,
        "relationship_counts": {"identical": 1},
        "safe_to_delete_roots": [{"folder_path": "docs"}],
        "unique_files": {},
    }
    ps = pair_stats(result)
    assert ps["A↔B"][("identical", "same")] == 1
    assert ps["A↔B"][("different", "diverged")] == 1  # conflicts included (A6)
    html = render_html(result)
    for frag in ("1. File Counts", "2. Duplicate File Summary",
                 "3. Folder Structure Analysis", "4. Files Requiring Action",
                 "5. Duplicate Files", "target_diverged", "docs",
                 "stat-card", "Diverged Symlinks"):
        assert frag in html
    # §2 chip cells: 1 identical / 1 different, row tinted by diverged
    assert "1 identical" in html and "1 different" in html
    txt = stdout_summary(result)
    assert "Duplicate groups : 1" in txt
    assert "1 file(s) require action" in txt


def test_build_folder_tree_nesting():
    from cloud_dedup_ray.report import _render_folder_tree, build_folder_tree

    fcs = [
        {"folder_path": "(root)", "relationship": "identical",
         "subtree_status": "partial", "subtree_total_files": 9},
        {"folder_path": "a", "relationship": "identical",
         "subtree_status": "identical", "subtree_total_files": 4},
        {"folder_path": "a/b", "relationship": "identical",
         "subtree_status": "identical", "subtree_total_files": 2},
        {"folder_path": "c", "relationship": "unique",
         "subtree_status": "unique", "subtree_total_files": 3},
    ]
    tree = build_folder_tree(fcs)
    assert set(tree) == {"(root)", "a", "c"}
    assert set(tree["a"]["_children"]) == {"b"}
    assert tree["a"]["_children"]["b"]["_fc"]["subtree_total_files"] == 2
    html = _render_folder_tree({"folder_comparisons": fcs, "labels": []})
    # collapsible nodes with the reference's subtree-status symbols
    assert "<details>" in html and "a/</strong>" in html
    assert '<span class="sym-is">★</span>' in html      # identical subtree
    assert '<span class="sym-uniq">◆</span>' in html    # unique subtree
    assert "2 subfolders" not in html  # "a" has exactly 1 subfolder
    assert "1 subfolders" in html


def test_folder_tree_per_file_badges():
    """J6 full use: the tree lists each folder's files with the
    reference's per-file classification symbols (render_node
    :1009-1060 + _file_sym :719-733)."""
    from cloud_dedup_ray.report import _render_folder_tree, render_html

    result = {
        "labels": ["A", "B"],
        "total_files": {"A": 3, "B": 2},
        "unique_counts": {"A": 1, "B": 0},
        "duplicate_groups": [
            {"rel_path": "docs/same.txt", "name_orig": "same.txt", "size": 4,
             "content_match": "identical", "version_status": "same",
             "newest_in": None, "age_difference_days": 0.0,
             "service_details": {"A": {}, "B": {}}},
        ],
        "conflict_groups": [
            {"rel_path": "docs/clash.txt", "name_orig": "clash.txt", "size": 4,
             "content_match": "different", "version_status": "diverged",
             "newest_in": "B", "age_difference_days": 1.5,
             "service_details": {"A": {}, "B": {}}},
        ],
        "symlinks": [
            {"rel_path": "docs/ln", "name_orig": "ln", "folder": "docs",
             "symlink_status": "target_diverged", "services": ["A", "B"],
             "symlink_targets": {"A": "/t1", "B": "/t2"}},
        ],
        "folder_comparisons": [
            {"folder_path": "docs", "relationship": "identical",
             "subtree_status": "partial", "subtree_total_files": 4},
        ],
        "_file_names_by_folder": {
            "docs": {"A": ["clash.txt", "ln", "only_a.txt", "same.txt"],
                     "B": ["clash.txt", "ln", "same.txt"]},
        },
        "pairwise_counts": {}, "all_services_count": 0,
        "relationship_counts": {}, "safe_to_delete_roots": [],
    }
    tree = _render_folder_tree(result)
    # identical+same duplicate → ★ ; different+diverged conflict → ⚠
    # with a §4 anchor ; symlink → ↪ with its target ; single-service → ◆
    assert '<span class="sym-is">★</span> same.txt' in tree
    assert '<span class="sym-dd">⚠</span> clash.txt' in tree
    assert 'href="#action-0"' in tree
    assert '<span class="sym-symlink">↪</span> ln' in tree and "/t1" in tree
    assert "Only in A" in tree and "only_a.txt" in tree
    # §4 table carries the matching anchor id
    page = render_html(result)
    assert 'id="action-0"' in page


def test_dangling_symlink_targets_survive_scan(tmp_path):
    """Reference parity (:152-167): Path.resolve() is non-strict, so a
    dangling symlink keeps its resolved target string — two links to the
    SAME missing target are target_identical, different missing targets
    are target_diverged (and the report shows both targets)."""
    import json as _json

    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    os.makedirs(a), os.makedirs(b)
    os.symlink("/missing/shared", os.path.join(a, "same.cfg"))
    os.symlink("/missing/shared", os.path.join(b, "same.cfg"))
    os.symlink("/missing/one", os.path.join(a, "diff.cfg"))
    os.symlink("/missing/two", os.path.join(b, "diff.cfg"))
    make_file(a, "pad.txt", b"p")
    make_file(b, "pad.txt", b"p")

    out = str(tmp_path / "rep.html")
    assert main([f"A:{a}", f"B:{b}", "-o", out]) == 0
    result = _json.load(open(str(tmp_path / "rep.json")))
    by_path = {s["rel_path"]: s for s in result["symlinks"]}
    assert by_path["same.cfg"]["symlink_status"] == "target_identical"
    assert by_path["same.cfg"]["symlink_targets"]["A"] == "/missing/shared"
    assert by_path["diff.cfg"]["symlink_status"] == "target_diverged"
    html = open(out).read()
    assert "/missing/one" in html and "/missing/two" in html


def test_same_label_dirs_both_scan(ray_session, tmp_path):
    """Two directories sharing one label (e.g. same basename) must BOTH
    scan under that service label — the reference keeps (label, path)
    tuples, and a plain dict would silently drop all but the last."""
    from cloud_dedup_ray.sources.corpus import scan_filesystem

    a = tmp_path / "x" / "Photos"
    b = tmp_path / "y" / "Photos"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    (a / "one.txt").write_text("alpha")
    (b / "two.txt").write_text("beta")
    ds, warnings = scan_filesystem({"Photos": [str(a), str(b)]})
    rows = ds.take_all()
    assert sorted(r["path"] for r in rows) == ["one.txt", "two.txt"]
    assert {r["repo"] for r in rows} == {"Photos"}


GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "report_snapshot.html")


def _golden_fixture():
    """Deterministic fixture at a FIXED path with pinned mtimes so the
    rendered HTML is byte-stable: dup, diverged conflict, phantom-ish
    same-mtime conflict, symlinks (same + diverged targets), uniques,
    nested folders, three labels (exercises the all-services row)."""
    import shutil

    root = "/tmp/cdr_golden_fixture"
    shutil.rmtree(root, ignore_errors=True)
    a, b, c = f"{root}/A", f"{root}/B", f"{root}/C"
    # identical everywhere → duplicate group + all-services count
    for r in (a, b, c):
        make_file(r, "docs/report.txt", b"same-content", mtime=1000)
    # same (name, size), different content, different mtime → diverged
    make_file(a, "src/app.py", b"version-1!", mtime=1000)
    make_file(b, "src/app.py", b"version-2!", mtime=86400 * 2)
    # same (name, size), different content, SAME mtime → phantom
    make_file(a, "src/cfg.ini", b"AAAA", mtime=5000)
    make_file(c, "src/cfg.ini", b"BBBB", mtime=5000)
    # uniques + nested folder structure
    make_file(a, "only/alpha.txt", b"ua", mtime=2000)
    make_file(b, "docs/deep/nested/beta.txt", b"ub", mtime=3000)
    # symlinks: same target vs diverged targets
    os.symlink("/target/one", f"{a}/link_same")
    os.symlink("/target/one", f"{b}/link_same")
    os.symlink("/target/one", f"{a}/link_div")
    os.symlink("/target/two", f"{b}/link_div")
    return a, b, c


def test_html_golden_snapshot():
    """Byte-exact golden snapshot of the full rendered report over the
    fixed fixture — locks section layout, badge grid, folder tree, CSS
    and formatting (reference render parity,
    /root/reference/src/cloud_duplicate_analyzer.py:823-1386). Update
    intentionally with UPDATE_GOLDEN=1 python -m pytest
    tests/test_cli_report.py::test_html_golden_snapshot."""
    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.pipelines.exact import analyze_corpus
    from cloud_dedup_ray.sources.corpus import attach_content, scan_filesystem

    a, b, c = _golden_fixture()
    scanned, _ = scan_filesystem({"A": [a], "B": [b], "C": [c]},
                                 skip_hidden=True)
    res = analyze_corpus(attach_content(scanned), DedupConfig(mtime_fuzz=5))
    result = res.to_result_dict()
    result["mtime_fuzz"] = 5
    result["generated_at"] = "2026-01-01 00:00"
    result["dirs"] = {"A": [a], "B": [b], "C": [c]}
    html = render_html(result)

    if os.environ.get("UPDATE_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            f.write(html)
    golden = open(GOLDEN_PATH).read()
    if html != golden:
        import difflib

        diff = "\n".join(
            list(difflib.unified_diff(golden.splitlines(),
                                      html.splitlines(),
                                      "golden", "rendered", lineterm=""))[:40]
        )
        raise AssertionError(f"rendered HTML diverged from golden:\n{diff}")
