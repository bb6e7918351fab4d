"""Report sinks — HTML render, JSON twin, stdout summary.

Driver-side render over the small aggregated result dict (the big group
lists live in Parquet sinks; the HTML shows counts + the sorted group
tables exactly like the reference's five report sections:
/root/reference/src/cloud_duplicate_analyzer.py:823-1386 (render_html),
:1447-1459 (HTML+JSON sinks), :1461-1496 (stdout summary);
section semantics per /root/reference/docs/report-format.md:38-113).

Nothing here touches Ray — inputs are the ``ExactResult.to_result_dict``
dict plus optional near-dup cluster stats.
"""

from __future__ import annotations

import html
import json
from datetime import datetime, timezone
from itertools import combinations
from typing import Any


# ---------------------------------------------------------------------------
# scalar formatters (reference :92-97, :114-120)
# ---------------------------------------------------------------------------

def human_size(n: float) -> str:
    """B → PB ladder, one decimal except bytes (reference :92-97)."""
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if n < 1024:
            return f"{n} B" if unit == "B" else f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} PB"


def fmt_ts(ts: float) -> str:
    """UTC timestamp; ``—`` on zero/overflow (reference :114-120)."""
    if ts == 0:
        return "—"
    try:
        return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M UTC"
        )
    except (OSError, OverflowError, ValueError):
        return "—"


# ---------------------------------------------------------------------------
# pair stats (reference A6, :877-899 — includes conflicts, unlike A2)
# ---------------------------------------------------------------------------

def pair_stats(result: dict[str, Any]) -> dict[str, dict[tuple[str, str], int]]:
    """Per label pair: counts keyed by (content_match, version_status)
    over duplicate AND conflict groups (render-time recompute, :877-899)."""
    stats: dict[str, dict[tuple[str, str], int]] = {}
    for grp in result.get("duplicate_groups", []) + result.get("conflict_groups", []):
        labels = sorted(grp.get("service_details", {}))
        key = (grp.get("content_match", ""), grp.get("version_status", ""))
        for la, lb in combinations(labels, 2):
            pair = f"{la}↔{lb}"
            stats.setdefault(pair, {})
            stats[pair][key] = stats[pair].get(key, 0) + 1
    return stats


# ---------------------------------------------------------------------------
# HTML render
# ---------------------------------------------------------------------------

_CSS = """
body{font-family:system-ui,sans-serif;margin:2rem;color:#222}
h1{font-size:1.4rem}h2{font-size:1.15rem;margin-top:2rem;border-bottom:1px solid #ddd}
table{border-collapse:collapse;margin:.75rem 0}
th,td{border:1px solid #ccc;padding:.3rem .6rem;font-size:.85rem;text-align:left}
th{background:#f3f3f3}
.badge{display:inline-block;padding:0 .4rem;border-radius:.5rem;font-size:.75rem}
.identical{background:#d9f2d9}.different{background:#f8d2d2}
.unverified{background:#f4ecc9}.mixed_type{background:#f8d2d2}
.warn{color:#a33}
.sym-is{color:#2a7}.sym-id{color:#888}.sym-dd{color:#a33}
.sym-dp{color:#b70}.sym-uniq{color:#26c}.sym-symlink{color:#888}
.tree-file{font-size:.8rem;margin-left:1.2rem}
.tree-file-section{font-size:.72rem;color:#888;margin:.25rem 0 0 .8rem;
text-transform:uppercase;letter-spacing:.04em}
"""


def _file_sym(content_match: str, version_status: str,
              is_symlink: bool = False) -> tuple[str, str]:
    """(symbol, css class) for one classified file — same symbol grid as
    the reference's ``_file_sym`` (:719-733)."""
    if is_symlink:
        return ("↪", "sym-symlink")
    if content_match == "mixed_type":
        return ("↪⚠", "sym-dd")
    if content_match in ("identical", "unverified") and version_status == "same":
        return ("★", "sym-is")
    if content_match in ("identical", "unverified") and version_status == "diverged":
        return ("✓", "sym-id")
    if content_match == "different" and version_status == "diverged":
        return ("⚠", "sym-dd")
    if content_match == "different" and version_status == "phantom":
        return ("⚡", "sym-dp")
    return ("~", "sym-id")


def _file_classifications(result: dict[str, Any]) -> dict[tuple[str, str], dict]:
    """(name_lower, folder) → classification info for the tree renderer,
    rebuilt from the result's own group lists (reference builds the same
    lookup at :484-523; conflicts indexed by rel_path-sorted position so
    the §4 anchors line up)."""
    import posixpath

    def folder_of(rel_path: str) -> str:
        parent = posixpath.dirname(rel_path)
        return parent if parent else "(root)"

    lookup: dict[tuple[str, str], dict] = {}
    conflicts = sorted(
        result.get("conflict_groups", []), key=lambda g: g["rel_path"]
    )
    for i, g in enumerate(conflicts):
        lookup[(g["name_orig"].lower(), folder_of(g["rel_path"]))] = {
            "content_match": g["content_match"],
            "version_status": g["version_status"],
            "conflict_index": i,
            "is_symlink": False,
            "symlink_target": None,
        }
    for g in result.get("duplicate_groups", []):
        key = (g["name_orig"].lower(), folder_of(g["rel_path"]))
        if key not in lookup:
            lookup[key] = {
                "content_match": g["content_match"],
                "version_status": g["version_status"],
                "conflict_index": None,
                "is_symlink": False,
                "symlink_target": None,
            }
    for s in result.get("symlinks", []):
        key = (s["name_orig"].lower(), folder_of(s["rel_path"]))
        target = next(
            (v for v in s.get("symlink_targets", {}).values() if v), None
        )
        if key not in lookup:
            lookup[key] = {
                "content_match": "symlink",
                "version_status": s.get("symlink_status", "target_identical"),
                "conflict_index": None,
                "is_symlink": True,
                "symlink_target": target,
            }
    return lookup


def _esc(x: Any) -> str:
    return html.escape("" if x is None else str(x))


def _badge(text: str) -> str:
    return f'<span class="badge {_esc(text)}">{_esc(text)}</span>'


def _group_table(
    groups: list[dict], labels: list[str], anchor_prefix: str | None = None
) -> str:
    """``anchor_prefix`` adds ``id="<prefix>-<i>"`` per rel_path-sorted
    row so the folder tree's per-file §4 links resolve."""
    if not groups:
        return "<p>None.</p>"
    head = (
        "<tr><th>Path</th><th>Size</th><th>Content</th><th>Version</th>"
        "<th>Newest in</th><th>Age Δ (days)</th><th>Services</th></tr>"
    )
    rows = []
    for i, g in enumerate(sorted(groups, key=lambda g: g["rel_path"])):
        svc = ", ".join(sorted(g.get("service_details", {})))
        row_id = f' id="{anchor_prefix}-{i}"' if anchor_prefix else ""
        rows.append(
            f"<tr{row_id}>"
            f"<td>{_esc(g['rel_path'])}</td>"
            f"<td>{_esc(human_size(g.get('size', 0)))}</td>"
            f"<td>{_badge(g.get('content_match', ''))}</td>"
            f"<td>{_esc(g.get('version_status', ''))}</td>"
            f"<td>{_esc(g.get('newest_in') or '—')}</td>"
            f"<td>{_esc(g.get('age_difference_days'))}</td>"
            f"<td>{_esc(svc)}</td>"
            "</tr>"
        )
    return f"<table>{head}{''.join(rows)}</table>"


def build_folder_tree(folder_comparisons: list[dict]) -> dict:
    """Nested ``{name: {"_fc": row, "_children": {...}}}`` tree from the
    flat path-keyed comparison rows; ``(root)`` children sit at the top
    level (reference _build_folder_tree :736-757 semantics)."""
    tree: dict = {}
    for fc in sorted(folder_comparisons, key=lambda f: f["folder_path"]):
        path = fc["folder_path"]
        if path == "(root)":
            node = tree.setdefault("(root)", {"_fc": None, "_children": {}})
            node["_fc"] = fc
            continue
        children = tree
        node = None
        for seg in path.split("/"):
            node = children.setdefault(seg, {"_fc": None, "_children": {}})
            children = node["_children"]
        node["_fc"] = fc
    return tree


def _render_file_list(
    fpath: str,
    names_by_folder: dict[str, dict[str, list[str]]],
    file_cls: dict[tuple[str, str], dict],
    labels: list[str],
) -> str:
    """Per-file rows of one folder node: shared files carry their
    classification symbol (+§4 anchor for conflicts, target for
    symlinks); single-service files group under "Only in <label>"
    (reference render_node :1009-1060)."""
    per_label = names_by_folder.get(fpath, {})
    if not per_label:
        return ""
    all_names: set[str] = set()
    for names in per_label.values():
        all_names.update(names)

    parts: list[str] = []
    in_multiple: list[tuple[str, dict | None]] = []
    unique_to: dict[str, list[str]] = {}
    for fname in sorted(all_names):
        labels_with = [l for l in labels if fname in per_label.get(l, ())]
        if len(labels_with) >= 2:
            in_multiple.append((fname, file_cls.get((fname, fpath))))
        elif labels_with:
            unique_to.setdefault(labels_with[0], []).append(fname)

    if in_multiple:
        parts.append('<div class="tree-file-section">Shared across services</div>')
        for fname, info in in_multiple:
            if info:
                sym, cls = _file_sym(
                    info["content_match"], info["version_status"],
                    is_symlink=info.get("is_symlink", False),
                )
                link = ""
                if info.get("conflict_index") is not None:
                    link = (
                        f' <a href="#action-{info["conflict_index"]}"'
                        ' style="font-size:10px;color:#888">&rarr;&nbsp;&sect;4</a>'
                    )
                target = ""
                if info.get("is_symlink") and info.get("symlink_target"):
                    target = (
                        ' <span style="font-size:11px;color:#888">&rarr; '
                        f"{_esc(info['symlink_target'])}</span>"
                    )
                parts.append(
                    f'<div class="tree-file"><span class="{cls}">{sym}</span> '
                    f"{_esc(fname)}{target}{link}</div>"
                )
            else:
                parts.append(f'<div class="tree-file">· {_esc(fname)}</div>')
    for label in labels:
        ufiles = unique_to.get(label, [])
        if ufiles:
            parts.append(
                f'<div class="tree-file-section">Only in {_esc(label)}</div>'
            )
            for fname in ufiles:
                parts.append(
                    '<div class="tree-file"><span class="sym-uniq">&#9670;'
                    f"</span> {_esc(fname)}</div>"
                )
    return "".join(parts)


def _render_folder_tree(result: dict[str, Any]) -> str:
    folder_comparisons = result.get("folder_comparisons", [])
    names_by_folder = result.get("_file_names_by_folder", {})
    file_cls = _file_classifications(result)
    labels = result.get("labels", [])
    tree = build_folder_tree(folder_comparisons)

    def render(nodes: dict) -> str:
        items = []
        for name, node in sorted(nodes.items()):
            fc = node["_fc"]
            label = _esc(name)
            files_html = ""
            if fc:
                label += (
                    f" {_badge(fc.get('relationship', ''))}"
                    f" <small>subtree: {_esc(fc.get('subtree_status', ''))},"
                    f" {fc.get('subtree_total_files', 0)} files</small>"
                )
                files_html = _render_file_list(
                    fc["folder_path"], names_by_folder, file_cls, labels
                )
            child_html = render(node["_children"]) if node["_children"] else ""
            items.append(f"<li>{label}{files_html}{child_html}</li>")
        return f"<ul>{''.join(items)}</ul>" if items else ""

    return render(tree)


def render_html(result: dict[str, Any]) -> str:
    """Five-section report mirroring the reference's layout
    (:823-1386; docs/report-format.md:38-113): 1 file counts, 2 pair
    summary, 3 folder relationships + safe-to-delete, 4 files requiring
    action, 5 duplicates / symlinks / version-diverged."""
    labels: list[str] = result.get("labels", [])
    parts: list[str] = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        "<title>Cloud duplicate report</title>",
        f"<style>{_CSS}</style></head><body>",
        "<h1>Cloud duplicate analysis</h1>",
    ]

    # §1 file counts
    parts.append("<h2>1 · File counts</h2><table><tr><th>Service</th>"
                 "<th>Total files</th><th>Unique files</th></tr>")
    for l in labels:
        parts.append(
            f"<tr><td>{_esc(l)}</td>"
            f"<td>{result.get('total_files', {}).get(l, 0):,}</td>"
            f"<td>{result.get('unique_counts', {}).get(l, 0):,}</td></tr>"
        )
    parts.append("</table>")

    # §2 pair summary (A6 pair_stats, includes conflicts)
    parts.append("<h2>2 · Pairwise summary</h2>")
    ps = pair_stats(result)
    if ps:
        parts.append("<table><tr><th>Pair</th><th>Content · version</th>"
                     "<th>Groups</th></tr>")
        for pair in sorted(ps):
            for (cm, vs), n in sorted(ps[pair].items()):
                parts.append(
                    f"<tr><td>{_esc(pair)}</td>"
                    f"<td>{_badge(cm)} · {_esc(vs)}</td><td>{n:,}</td></tr>"
                )
        parts.append("</table>")
    else:
        parts.append("<p>No matched groups.</p>")
    if len(labels) > 2:
        parts.append(
            f"<p>Groups present in all {len(labels)} services: "
            f"{result.get('all_services_count', 0):,}</p>"
        )

    # §3 folder relationships + tree + safe-to-delete roots
    parts.append("<h2>3 · Folder relationships</h2>")
    fcs = result.get("folder_comparisons", [])
    if fcs:
        parts.append(_render_folder_tree(result))
    rc = result.get("relationship_counts", {})
    if rc:
        parts.append("<table><tr><th>Relationship</th><th>Folders</th></tr>")
        for rel, cnt in sorted(rc.items()):
            parts.append(f"<tr><td>{_esc(rel)}</td><td>{cnt:,}</td></tr>")
        parts.append("</table>")
    roots = result.get("safe_to_delete_roots", [])
    if roots:
        parts.append("<p><strong>Safe-to-delete roots</strong> (identical "
                     "subtrees with no identical ancestor):</p><ul>")
        for r in roots:
            fp = r["folder_path"] if isinstance(r, dict) else r
            parts.append(f"<li>{_esc(fp)}</li>")
        parts.append("</ul>")

    # §4 files requiring action (conflicts + diverged symlinks)
    parts.append("<h2>4 · Files requiring action</h2>")
    parts.append(
        _group_table(result.get("conflict_groups", []), labels,
                     anchor_prefix="action")
    )
    div_syms = [
        s for s in result.get("symlinks", [])
        if s.get("symlink_status") == "target_diverged"
    ]
    if div_syms:
        parts.append("<p class='warn'>Symlinks with diverged targets:</p><ul>")
        for s in sorted(div_syms, key=lambda s: s["rel_path"]):
            parts.append(f"<li>{_esc(s['rel_path'])}</li>")
        parts.append("</ul>")

    # §5 duplicates + symlinks
    parts.append("<h2>5 · Duplicate files</h2>")
    parts.append(_group_table(result.get("duplicate_groups", []), labels))
    syms = result.get("symlinks", [])
    if syms:
        parts.append("<h2>5b · Symlinks</h2><table><tr><th>Path</th>"
                     "<th>Status</th><th>Services</th></tr>")
        for s in sorted(syms, key=lambda s: s["rel_path"]):
            parts.append(
                f"<tr><td>{_esc(s['rel_path'])}</td>"
                f"<td>{_esc(s.get('symlink_status', ''))}</td>"
                f"<td>{_esc(', '.join(s.get('services', [])))}</td></tr>"
            )
        parts.append("</table>")

    # near-dup appendix (rebuild-only)
    nd = result.get("neardup")
    if nd:
        parts.append("<h2>6 · Near-duplicate clusters (MinHash/LSH)</h2>")
        parts.append(
            f"<p>{nd.get('n_clusters', 0):,} clusters over "
            f"{nd.get('n_docs_clustered', 0):,} non-singleton docs; "
            f"{nd.get('n_candidates', 0):,} LSH candidates, "
            f"{nd.get('n_verified', 0):,} verified, "
            f"{nd.get('n_containment_edges', 0):,} containment edges.</p>"
        )

    warns = result.get("scan_warnings", {})
    if warns:
        parts.append("<h2>Scan warnings</h2><ul class='warn'>")
        for label, ws in sorted(warns.items()):
            for w in ws:
                parts.append(f"<li>{_esc(label)}: {_esc(w)}</li>")
        parts.append("</ul>")

    parts.append("</body></html>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# stdout summary (reference :1461-1496)
# ---------------------------------------------------------------------------

def stdout_summary(result: dict[str, Any]) -> str:
    labels = result.get("labels", [])
    lines = ["", "Summary",
             f"  Total files : {sum(result.get('total_files', {}).values()):,}"]
    for l in labels:
        lines.append(
            f"  {l:20s}: {result['total_files'].get(l, 0):,} files  "
            f"({result.get('unique_counts', {}).get(l, 0):,} unique)"
        )
    dups = result.get("duplicate_groups", [])
    lines.append(f"\n  Duplicate groups : {len(dups):,}")
    for pair, cnt in sorted(result.get("pairwise_counts", {}).items()):
        lines.append(f"    {pair}: {cnt:,}")
    if len(labels) > 2:
        lines.append(
            f"    All {len(labels)} services: {result.get('all_services_count', 0):,}"
        )
    conflicts = result.get("conflict_groups", [])
    if conflicts:
        lines.append(
            f"\n  ⚠  {len(conflicts)} file(s) require action "
            "(different content) — see Section 4 of report"
        )
    syms = result.get("symlinks", [])
    if syms:
        div = sum(1 for s in syms if s.get("symlink_status") == "target_diverged")
        lines.append(
            f"  ↪  {len(syms)} symlink(s) detected"
            + (f" ({div} with diverged targets — see Section 4)" if div else "")
        )
    rc = result.get("relationship_counts", {})
    if rc:
        lines.append("\n  Folder relationships:")
        for rel, cnt in sorted(rc.items()):
            lines.append(f"    {rel:20s}: {cnt}")
    nd = result.get("neardup")
    if nd:
        lines.append(
            f"\n  Near-dup clusters : {nd.get('n_clusters', 0):,} "
            f"({nd.get('n_verified', 0):,} verified pairs)"
        )
    for label, ws in sorted(result.get("scan_warnings", {}).items()):
        for w in ws:
            lines.append(f"  ⚠  {label}: {w}")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# file sinks (reference :1447-1459)
# ---------------------------------------------------------------------------

_PRIVATE_KEYS = {
    "_file_classifications", "_scanned_records", "_file_names_by_folder",
}


def write_reports(result: dict[str, Any], output_path: str) -> tuple[str, str]:
    """Write ``<stem>.html`` + ``<stem>.json`` (private keys stripped,
    ``default=str`` coercion — reference :1450-1459). Returns the two
    paths."""
    import os

    stem, ext = os.path.splitext(output_path)
    html_path = stem + (ext or ".html")
    json_path = stem + ".json"
    os.makedirs(os.path.dirname(os.path.abspath(html_path)), exist_ok=True)
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(render_html(result))
    clean = json.loads(
        json.dumps(
            {k: v for k, v in result.items() if k not in _PRIVATE_KEYS},
            default=str,
        )
    )
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(clean, f, indent=2)
    return html_path, json_path
