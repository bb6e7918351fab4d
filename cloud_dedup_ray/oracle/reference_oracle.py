"""Pure-Python oracle: the reference's ``analyze()`` semantics over an
in-memory corpus table (list of row dicts).

Written fresh from the documented semantics
(/root/reference/src/cloud_duplicate_analyzer.py:273-713 — studied, not
copied) with the SAME deterministic tie-break rules the Ray pipeline
uses (sorted labels; min-path representative per (key, repo) and per
(repo, path_lower)), so pipeline-vs-oracle comparisons are exact. Used
only by tests — never by the distributed engine.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations

from cloud_dedup_ray.functions.classify import (
    CONTENT_RANK,
    VERSION_RANK,
    Rec,
    classify_pair,
)
from cloud_dedup_ray.functions.folders import folder_analysis
from cloud_dedup_ray.functions.pathutils import ROOT, is_hidden


def _project_rows(rows: list[dict], skip_hidden: bool, use_checksum: bool) -> list[Rec]:
    out = []
    for r in rows:
        path = r["path"]
        if path.rsplit("/", 1)[-1] == ".DS_Store":
            continue
        if skip_hidden and is_hidden(path):
            continue
        base = path.rsplit("/", 1)[-1]
        folder = path.rsplit("/", 1)[0] if "/" in path else ROOT
        content = r.get("content")
        h = None
        if use_checksum and not r["is_symlink"] and content is not None:
            h = hashlib.sha256(content.encode()).hexdigest()
        out.append(
            Rec(
                repo=r["repo"],
                path=path,
                commit=r.get("commit") or "",
                name=base.lower(),
                name_orig=base,
                folder=folder,
                size=r["size"],
                mtime=r["mtime"],
                is_symlink=r["is_symlink"],
                symlink_target=r.get("symlink_target"),
                content_hash=h,
            )
        )
    return out


def analyze_oracle(
    rows: list[dict],
    mtime_fuzz: float = 5.0,
    use_checksum: bool = True,
    skip_hidden: bool = True,
) -> dict:
    recs = _project_rows(rows, skip_hidden, use_checksum)
    labels = sorted({r.repo for r in recs})
    n = len(labels)

    by_key: dict[tuple[str, int], dict[str, Rec]] = defaultdict(dict)
    by_rel: dict[str, dict[str, Rec]] = defaultdict(dict)
    for r in recs:
        cur = by_key[(r.name, r.size)].get(r.repo)
        if cur is None or r.rep_key() < cur.rep_key():
            by_key[(r.name, r.size)][r.repo] = r
        cur = by_rel[r.path.lower()].get(r.repo)
        if cur is None or r.rep_key() < cur.rep_key():
            by_rel[r.path.lower()][r.repo] = r

    duplicate_groups, conflict_groups, symlinks = [], [], []

    for key, present in by_key.items():
        if len(present) < 2:
            continue
        order = sorted(present)
        gc, gv = "identical", "same"
        emitted = False
        for la, lb in combinations(order, 2):
            res = classify_pair(present[la], present[lb], mtime_fuzz, use_checksum)
            if res is None:
                emitted = True
                break
            cm, vs = res
            if cm == "symlink":
                first = present[order[0]]
                symlinks.append(
                    {
                        "rel_path": first.path,
                        "name_orig": first.name_orig,
                        "folder": first.folder,
                        "symlink_status": vs,
                        "services": order,
                        "symlink_targets": {l: present[l].symlink_target for l in order},
                    }
                )
                emitted = True
                break
            if cm == "mixed_type":
                first = present[order[0]]
                conflict_groups.append(
                    {
                        "rel_path": first.path,
                        "name_orig": first.name_orig,
                        "folder": first.folder,
                        "content_match": "mixed_type",
                        "version_status": vs,
                        "services": order,
                        "newest_in": None,
                        "age_difference_days": None,
                    }
                )
                emitted = True
                break
            if CONTENT_RANK[cm] > CONTENT_RANK[gc]:
                gc = cm
            if VERSION_RANK[vs] > VERSION_RANK[gv]:
                gv = vs
        if emitted:
            continue
        first = present[order[0]]
        mtimes = [present[l].mtime for l in order]
        group = {
            "rel_path": first.path,
            "name_orig": first.name_orig,
            "folder": first.folder,
            "size": key[1],
            "content_match": gc,
            "version_status": gv,
            "services": order,
            "newest_in": (
                max(order, key=lambda l: present[l].mtime)
                if gv in ("diverged", "phantom")
                else None
            ),
            "age_difference_days": round((max(mtimes) - min(mtimes)) / 86400.0, 2),
        }
        (conflict_groups if gc == "different" else duplicate_groups).append(group)

    # mixed-type second pass over rel_path keys
    already = {g["rel_path"].lower() for g in duplicate_groups}
    already |= {g["rel_path"].lower() for g in conflict_groups}
    already |= {s["rel_path"].lower() for s in symlinks}
    for rp_lower, present in by_rel.items():
        if rp_lower in already or len(present) < 2:
            continue
        kinds = {r.is_symlink for r in present.values()}
        if kinds != {True, False}:
            continue
        order = sorted(present)
        first = present[order[0]]
        conflict_groups.append(
            {
                "rel_path": first.path,
                "name_orig": first.name_orig,
                "folder": first.folder,
                "content_match": "mixed_type",
                "version_status": "conflict",
                "services": order,
                "newest_in": None,
                "age_difference_days": None,
            }
        )

    conflict_groups.sort(key=lambda g: g["rel_path"])

    pairwise_counts = {
        f"{la}↔{lb}": sum(
            1
            for g in duplicate_groups
            if la in g["services"] and lb in g["services"]
        )
        for la, lb in combinations(labels, 2)
    }
    all_services_count = sum(
        1 for g in duplicate_groups if len(g["services"]) == n
    )

    dup_rel_paths: dict[str, set[str]] = defaultdict(set)
    for g in duplicate_groups + conflict_groups:
        for l in g["services"]:
            dup_rel_paths[l].add(g["rel_path"].lower())
    for s in symlinks:
        for l in s["services"]:
            dup_rel_paths[l].add(s["rel_path"].lower())

    total_files = {l: sum(1 for r in recs if r.repo == l) for l in labels}
    unique_counts = {
        l: sum(
            1
            for r in recs
            if r.repo == l and r.path.lower() not in dup_rel_paths[l]
        )
        for l in labels
    }

    folder_sets: dict[str, dict[str, set[str]]] = {l: {} for l in labels}
    for r in recs:
        folder_sets[r.repo].setdefault(r.folder, set()).add(r.name)
    folder_comparisons, relationship_counts, safe_roots = folder_analysis(
        folder_sets, labels
    )

    return {
        "labels": labels,
        "total_files": total_files,
        "duplicate_groups": sorted(duplicate_groups, key=lambda g: g["rel_path"]),
        "conflict_groups": conflict_groups,
        "symlinks": sorted(symlinks, key=lambda s: s["rel_path"]),
        "unique_counts": unique_counts,
        "pairwise_counts": pairwise_counts,
        "all_services_count": all_services_count,
        "folder_comparisons": folder_comparisons,
        "relationship_counts": relationship_counts,
        "safe_to_delete_roots": safe_roots,
    }
