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


def compare_one_folder(
    folder: str, present: list[str], sets_here: dict[str, set[str]]
) -> dict:
    """Per-folder comparison row (relationship + membership details)
    from the direct name sets of the labels present. Pure — shared by
    the driver merge path and the distributed groupby path."""
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

    return {
        "folder_path": folder,
        "services_present": present,
        "relationship": relationship,
        "total_unique_files": len(union_here),
        "files_in_all": in_all_count,
        "details": details,
    }


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

    # presence incl. descendants (F3), linear: a label is present in a
    # folder iff the folder holds files directly or is an ancestor of a
    # folder that does — precomputed by walking each direct folder's
    # ancestor chain once (replaces the O(folders² ) startswith scan).
    presence: dict[str, set[str]] = {}
    for label, fd in folder_sets.items():
        p = set(fd)
        for folder in fd:
            p.update(ancestors(folder))
        presence[label] = p

    folder_comparisons: list[dict] = []
    for folder in sorted(all_folders):
        present = [l for l in labels if folder in presence[l]]
        if not present:
            continue
        sets_here = {l: folder_sets[l].get(folder, set()) for l in present}
        folder_comparisons.append(compare_one_folder(folder, present, sets_here))

    return finalize_comparisons(folder_comparisons)


def finalize_comparisons(
    folder_comparisons: list[dict],
) -> tuple[list[dict], dict[str, int], list[dict]]:
    """Rollup half: relationship counts, subtree status/totals, and
    safe-to-delete roots over PATH-SORTED comparison rows (one row per
    folder — no file names needed, so this driver step scales with
    folder count, not corpus size)."""
    folder_comparisons = sorted(
        folder_comparisons, key=lambda fc: fc["folder_path"]
    )
    relationship_counts: dict[str, int] = defaultdict(int)
    for fc in folder_comparisons:
        relationship_counts[fc["relationship"]] += 1

    # subtree rollups (F5): status over self + all descendant rows.
    # folder_comparisons is path-sorted, so the descendants of p are the
    # contiguous range of paths starting with ``p + "/"`` — found with
    # two bisects and aggregated via prefix sums (O(F log F) total,
    # replacing the O(F²) all-paths scan).
    import bisect

    import numpy as np

    spaths = [fc["folder_path"] for fc in folder_comparisons]
    rels = [fc["relationship"] for fc in folder_comparisons]
    n_unique = np.cumsum([r == "unique" for r in rels])
    n_identical = np.cumsum([r == "identical" for r in rels])
    n_overlap = np.cumsum([r == "overlap" for r in rels])
    totals = np.cumsum([fc["total_unique_files"] for fc in folder_comparisons])

    def _range_stats(lo: int, hi: int) -> tuple[int, int, int, int, int]:
        if hi <= lo:
            return 0, 0, 0, 0, 0
        base_u = n_unique[lo - 1] if lo else 0
        base_i = n_identical[lo - 1] if lo else 0
        base_o = n_overlap[lo - 1] if lo else 0
        base_t = totals[lo - 1] if lo else 0
        return (
            hi - lo,
            int(n_unique[hi - 1] - base_u),
            int(n_identical[hi - 1] - base_i),
            int(n_overlap[hi - 1] - base_o),
            int(totals[hi - 1] - base_t),
        )

    n_rows = len(folder_comparisons)
    for i, fc in enumerate(folder_comparisons):
        path = fc["folder_path"]
        if path == ROOT:
            # reference special-case: (root) rolls up every row (:665)
            cnt, u, ident, ov, tot = _range_stats(0, n_rows)
        else:
            lo = bisect.bisect_left(spaths, path + "/")
            hi = bisect.bisect_left(spaths, path + "/\U0010ffff")
            cnt, u, ident, ov, tot = _range_stats(lo, hi)
            # include the folder's own row
            cnt += 1
            u += fc["relationship"] == "unique"
            ident += fc["relationship"] == "identical"
            ov += fc["relationship"] == "overlap"
            tot += fc["total_unique_files"]
        if u == cnt:
            fc["subtree_status"] = "unique"
        elif ident == cnt:
            fc["subtree_status"] = "identical"
        elif ov > 0:
            fc["subtree_status"] = "overlap"
        else:
            fc["subtree_status"] = "partial"
        fc["subtree_total_files"] = tot

    # safe-to-delete roots (F6): identical subtrees with no identical
    # ancestor — each candidate checks only its own ancestor chain.
    iset = {
        fc["folder_path"]
        for fc in folder_comparisons
        if fc["subtree_status"] == "identical"
    }
    safe_roots = [
        fc
        for fc in folder_comparisons
        if fc["subtree_status"] == "identical"
        and not any(a in iset for a in ancestors(fc["folder_path"]))
    ]
    return folder_comparisons, dict(relationship_counts), safe_roots
