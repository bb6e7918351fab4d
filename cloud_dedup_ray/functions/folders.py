"""Folder-level analytics (F1–F7 in SURVEY.md §2.7).

Re-implementation of the reference's folder comparison semantics
(/root/reference/src/cloud_duplicate_analyzer.py:548-694, studied, not
copied): per-(label, folder) direct file-name sets → ancestor
synthesis → per-folder relationship + details → relationship counts →
subtree rollups → safe-to-delete roots.

This runs on the driver over the *aggregated folder table* (one row per
(repo, folder) with the distinct lowercased names), which is orders of
magnitude smaller than the file table — the distributed part is the
``groupby(["repo","folder"])`` that produces it (see
``pipelines/exact.py``). The documented scale path for corpora whose
folder count itself explodes is a path-sorted Dataset with prefix-range
segmented aggregation (SURVEY.md §2.7 F3/F5).

Folder keys use the ``(root)`` sentinel for top-level files throughout
(the reference stores ``.`` internally and converts on output; behavior
is identical because no folder name can start with either sentinel +
``/``).
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from cloud_dedup_ray.functions.pathutils import ROOT, ancestors


def folder_analysis(
    folder_sets: dict[str, dict[str, set[str]]],
    labels: list[str],
) -> tuple[list[dict], dict[str, int], list[dict]]:
    """→ (folder_comparisons, relationship_counts, safe_to_delete_roots).

    ``folder_sets``: label → folder → set of lowercased file names
    directly in that folder. ``labels`` fixes the label iteration order
    (the reference uses CLI order; the rebuild passes sorted labels).
    """
    all_folders: set[str] = set()
    for fd in folder_sets.values():
        all_folders.update(fd.keys())
    # ancestor synthesis: intermediate dirs participate in rollups
    for folder in list(all_folders):
        all_folders.update(ancestors(folder))

    def has_presence(label: str, folder: str) -> bool:
        fd = folder_sets[label]
        if folder in fd:
            return True
        prefix = folder + "/"
        return any(f.startswith(prefix) for f in fd)

    folder_comparisons: list[dict] = []
    for folder in sorted(all_folders):
        present = [l for l in labels if has_presence(l, folder)]
        if not present:
            continue
        sets_here = {l: folder_sets[l].get(folder, set()) for l in present}

        if len(present) < 2:
            only = present[0]
            files_here = sets_here[only]
            union_here = files_here
            in_all_count = len(files_here)
            details = {"in_all": [], f"{only}_only": sorted(files_here)}
            relationship = "unique"
        else:
            sets_list = list(sets_here.values())
            if all(s == sets_list[0] for s in sets_list):
                relationship = "identical"
            else:
                rels = set()
                for la, lb in combinations(present, 2):
                    sa, sb = sets_here[la], sets_here[lb]
                    if sa == sb:
                        rels.add("identical")
                    elif sa < sb:
                        rels.add("subset")
                    elif sa > sb:
                        rels.add("superset")
                    else:
                        rels.add("overlap")
                if rels == {"identical"}:
                    relationship = "identical"
                elif "overlap" in rels:
                    relationship = "overlap"
                elif rels & {"subset", "superset"}:
                    relationship = "subset/superset"
                else:
                    relationship = "overlap"
            union_here = set.union(*sets_here.values())
            in_all = set.intersection(*sets_here.values())
            in_all_count = len(in_all)
            details = {"in_all": sorted(in_all)}
            for label in present:
                others = set.union(
                    *(sets_here[l] for l in present if l != label)
                )
                details[f"{label}_only"] = sorted(sets_here[label] - others)
            for la, lb in combinations(present, 2):
                shared = (sets_here[la] & sets_here[lb]) - in_all
                if shared:
                    details[f"{la}+{lb}"] = sorted(shared)

        folder_comparisons.append(
            {
                "folder_path": folder,
                "services_present": present,
                "relationship": relationship,
                "total_unique_files": len(union_here),
                "files_in_all": in_all_count,
                "details": details,
            }
        )

    relationship_counts: dict[str, int] = defaultdict(int)
    for fc in folder_comparisons:
        relationship_counts[fc["relationship"]] += 1

    # subtree rollups: status over self + all descendant comparison rows
    by_path = {fc["folder_path"]: fc for fc in folder_comparisons}
    paths = set(by_path)
    for fc in folder_comparisons:
        path = fc["folder_path"]
        if path == ROOT:
            desc = folder_comparisons
        else:
            desc = [by_path[p] for p in paths if p == path or p.startswith(path + "/")]
        if all(d["relationship"] == "unique" for d in desc):
            fc["subtree_status"] = "unique"
        elif all(d["relationship"] == "identical" for d in desc):
            fc["subtree_status"] = "identical"
        elif any(d["relationship"] == "overlap" for d in desc):
            fc["subtree_status"] = "overlap"
        else:
            fc["subtree_status"] = "partial"
        fc["subtree_total_files"] = sum(d["total_unique_files"] for d in desc)

    # safe-to-delete roots: identical subtrees with no identical ancestor
    identical = [fc for fc in folder_comparisons if fc["subtree_status"] == "identical"]
    ipaths = [fc["folder_path"] for fc in identical]
    safe_roots = [
        fc
        for fc in identical
        if not any(
            fc["folder_path"] != p and fc["folder_path"].startswith(p + "/")
            for p in ipaths
        )
    ]
    return folder_comparisons, dict(relationship_counts), safe_roots
