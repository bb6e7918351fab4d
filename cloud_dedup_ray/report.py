"""Report sinks — HTML render, JSON twin, stdout summary.

Driver-side render over the small aggregated result dict (the big group
lists live in Parquet sinks; the HTML mirrors the reference report
section for section:
/root/reference/src/cloud_duplicate_analyzer.py:759-821 (CSS + badge),
:823-1386 (render_html), :1447-1459 (HTML+JSON sinks), :1461-1496
(stdout summary); section semantics per
/root/reference/docs/report-format.md:38-113.

Nothing here touches Ray — inputs are the ``ExactResult.to_result_dict``
dict plus optional near-dup cluster stats.
"""

from __future__ import annotations

import html
import json
import posixpath
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


def _fmt_dt_short(ts: float | None) -> str:
    """Short table-cell timestamp (reference's per-service date cells)."""
    if not ts:
        return "—"
    try:
        return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M"
        )
    except (OSError, OverflowError, ValueError):
        return "—"


def _folder_of(rel_path: str) -> str:
    parent = posixpath.dirname(rel_path)
    return parent if parent else "(root)"


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


def pair_breakdown(result: dict[str, Any]) -> dict[str, dict[str, int]]:
    """Reference §2 per-pair breakdown (:878-899): match-type counts
    from duplicate groups + conflict count, and version-status counts
    over the union, for every label pair in declaration order."""
    labels = result.get("labels", [])
    dups = result.get("duplicate_groups", [])
    confs = result.get("conflict_groups", [])
    out: dict[str, dict[str, int]] = {}
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            dp = [g for g in dups
                  if la in g.get("service_details", {})
                  and lb in g.get("service_details", {})]
            cp = [g for g in confs
                  if la in g.get("service_details", {})
                  and lb in g.get("service_details", {})]
            ap = dp + cp
            out[f"{la}↔{lb}"] = {
                "identical": sum(1 for g in dp if g["content_match"] == "identical"),
                "unverified": sum(1 for g in dp if g["content_match"] == "unverified"),
                "different": len(cp),
                "same": sum(1 for g in ap if g["version_status"] == "same"),
                "diverged": sum(1 for g in ap if g["version_status"] == "diverged"),
                "phantom": sum(1 for g in ap if g["version_status"] == "phantom"),
                "conflict": sum(1 for g in ap if g["version_status"] == "conflict"),
                "total": len(ap),
            }
    return out


# ---------------------------------------------------------------------------
# HTML render
# ---------------------------------------------------------------------------

# Reference visual language (:759-821): steel-blue headings, zebra
# tables, pill badges on the green/amber/red safety ladder, stat-card
# grid, collapsible tree nodes with a left guide rail.
_ACCENT = "#2E5C8A"
_GREEN = "background:#d4edda;color:#155724"
_AMBER = "background:#fff3cd;color:#856404"
_RED = "background:#f8d7da;color:#721c24"
_BLUE = "background:#d1ecf1;color:#0c5460"

_CSS = f"""
body{{font-family:Arial,Helvetica,sans-serif;font-size:14px;color:#1a1a1a;
  max-width:1100px;margin:40px auto;padding:0 20px}}
h1{{font-size:26px;color:{_ACCENT};border-bottom:3px solid {_ACCENT};
  padding-bottom:8px}}
h2{{font-size:18px;color:{_ACCENT};margin-top:36px;
  border-bottom:1px solid #c5d8ec;padding-bottom:4px}}
h3{{font-size:15px;color:{_ACCENT};margin-top:24px}}
table{{border-collapse:collapse;width:100%;margin:14px 0;font-size:13px}}
th{{background:#D5E8F0;text-align:left;padding:8px 10px;border:1px solid #b0ccdd}}
td{{padding:7px 10px;border:1px solid #dde;vertical-align:top}}
tr:nth-child(even) td{{background:#f4f8fc}}
.badge{{display:inline-block;padding:2px 8px;border-radius:12px;
  font-size:11px;font-weight:bold}}
.badge-identical,.badge-same{{{_GREEN}}}
.badge-diverged,.badge-unverified,.badge-overlap,.badge-unique,
.badge-symlink{{{_AMBER}}}
.badge-phantom,.badge-different,.badge-mixed_type{{{_RED}}}
.badge-subset,.badge-superset,.badge-subset-superset{{{_BLUE}}}
.phantom-row td{{background:#fff8e1 !important}}
.conflict-row td{{background:#fff0f0 !important}}
.service-detail{{font-size:12px;line-height:1.6}}
.stat-grid{{display:grid;grid-template-columns:repeat(auto-fit,minmax(180px,1fr));
  gap:16px;margin:20px 0}}
.stat-card{{background:#f0f6fc;border:1px solid #c5d8ec;border-radius:8px;
  padding:16px;text-align:center}}
.stat-card .num{{font-size:32px;font-weight:bold;color:{_ACCENT}}}
.stat-card .lbl{{font-size:12px;color:#555;margin-top:4px}}
details{{margin:6px 0}}
details summary{{cursor:pointer;font-weight:bold;padding:6px 0;color:{_ACCENT}}}
code{{background:#f0f0f0;padding:1px 4px;border-radius:3px;font-size:12px}}
.footer{{margin-top:60px;font-size:12px;color:#888;text-align:center;
  border-top:1px solid #ddd;padding-top:12px}}
.tree-node > details{{margin-left:20px;border-left:2px solid #e0e8f0;
  padding-left:8px}}
.tree-node summary{{list-style:none;cursor:pointer;padding:4px 0;
  user-select:none}}
.tree-node summary::-webkit-details-marker{{display:none}}
.tree-file{{font-size:12px;font-family:monospace;padding:2px 0 2px 24px}}
.tree-file-section{{font-size:11px;font-weight:bold;color:#555;
  margin:6px 0 2px 12px;padding-bottom:2px;border-bottom:1px solid #eee}}
.sym-is{{color:#28a745}}.sym-id{{color:#17a2b8}}.sym-dd{{color:#dc3545}}
.sym-dp{{color:#fd7e14}}
.sym-uniq{{color:#ff9900;font-weight:bold}}
.sym-symlink{{color:#0066cc;font-weight:bold}}
.warn-banner{{background:#f8d7da;color:#721c24;border:1px solid #f5c6cb;
  border-radius:6px;padding:12px 16px;margin:16px 0}}
"""

# inline chip style for the §2 breakdown cells (reference _B, :912)
_CHIP = ("display:inline-block;padding:2px 8px;border-radius:10px;"
         "white-space:nowrap;font-size:12px")


def _esc(x: Any) -> str:
    return html.escape("" if x is None else str(x))


def _dir_str(d: Any) -> str:
    """A label's directory spec may be one path or a list (same-label
    dirs both scan under one service) — render either."""
    if isinstance(d, (list, tuple)):
        return ", ".join(str(p) for p in d)
    return str(d)


def badge(text: str, cls: str | None = None) -> str:
    """Pill badge; CSS class derived from the text (reference :818-821)."""
    cls = (cls or text).lower().replace("/", "-").replace(" ", "-")
    return f'<span class="badge badge-{_esc(cls)}">{_esc(text)}</span>'


def _chip(n: int, label: str, tone: str, bold: bool = False) -> str:
    fw = ";font-weight:bold" if bold else ""
    return (f'<span style="{_CHIP};{tone}{fw}">{n:,} {label}</span>')


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
    lookup: dict[tuple[str, str], dict] = {}
    conflicts = sorted(
        result.get("conflict_groups", []), key=lambda g: g["rel_path"]
    )
    for i, g in enumerate(conflicts):
        lookup[(g["name_orig"].lower(), _folder_of(g["rel_path"]))] = {
            "content_match": g["content_match"],
            "version_status": g["version_status"],
            "conflict_index": i,
            "is_symlink": False,
            "symlink_target": None,
        }
    for g in result.get("duplicate_groups", []):
        key = (g["name_orig"].lower(), _folder_of(g["rel_path"]))
        if key not in lookup:
            lookup[key] = {
                "content_match": g["content_match"],
                "version_status": g["version_status"],
                "conflict_index": None,
                "is_symlink": False,
                "symlink_target": None,
            }
    for s in result.get("symlinks", []):
        key = (s["name_orig"].lower(), _folder_of(s["rel_path"]))
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


# subtree-status → (symbol, css class) for tree nodes (reference :1017-1022)
_NODE_SYMS = {
    "identical": ("★", "sym-is"),
    "partial": ("~", "sym-id"),
    "overlap": ("✗", "sym-dd"),
    "unique": ("◆", "sym-uniq"),
}


def _render_folder_tree(result: dict[str, Any]) -> str:
    """Collapsible <details> tree — node symbol by subtree status, per-
    node file/subfolder counts, and the per-file lists (reference
    render_node :1010-1120)."""
    folder_comparisons = result.get("folder_comparisons", [])
    names_by_folder = result.get("_file_names_by_folder", {})
    file_cls = _file_classifications(result)
    labels = result.get("labels", [])
    tree = build_folder_tree(folder_comparisons)

    def render_node(name: str, node: dict) -> str:
        fc = node["_fc"]
        children = node["_children"]
        if fc is None and not children:
            return ""
        ss = fc["subtree_status"] if fc else "partial"
        node_sym, node_cls = _NODE_SYMS.get(ss, ("?", ""))
        file_ct = fc.get("total_unique_files", 0) if fc else 0
        subtree_ct = fc.get("subtree_total_files", 0) if fc else 0
        child_ct = len(children)

        status_text = _esc(ss)
        if ss == "unique" and fc and fc.get("services_present"):
            status_text = f'only in {_esc(", ".join(fc["services_present"]))}'

        summary = (
            f'<span class="{node_cls}">{node_sym}</span> '
            f"<strong>{_esc(name)}/</strong>"
            f'&nbsp;<span style="color:#888;font-size:12px">{status_text}'
            + (f" &nbsp;·&nbsp; {file_ct} files" if file_ct else "")
            + (f" &nbsp;·&nbsp; {child_ct} subfolders" if child_ct else "")
            + (f" &nbsp;·&nbsp; {subtree_ct} total"
               if child_ct and subtree_ct != file_ct else "")
            + "</span>"
        )
        files_html = (
            _render_file_list(fc["folder_path"], names_by_folder, file_cls, labels)
            if fc else ""
        )
        child_html = "".join(
            render_node(cn, children[cn]) for cn in sorted(children)
        )
        return (
            f'<div class="tree-node"><details><summary>{summary}</summary>'
            f"{files_html}{child_html}</details></div>"
        )

    body = "".join(render_node(n, tree[n]) for n in sorted(tree))
    return f'<div style="margin:12px 0">{body}</div>'


_TREE_LEGEND = (
    "<p style='font-size:12px;color:#888;margin-top:12px'>"
    "★ identical&nbsp;·&nbsp;same &nbsp;|&nbsp; "
    "✓ identical&nbsp;·&nbsp;diverged &nbsp;|&nbsp; "
    "⚠ different&nbsp;·&nbsp;diverged &nbsp;|&nbsp; "
    "⚡ different&nbsp;·&nbsp;phantom &nbsp;|&nbsp; "
    "&#9670; unique to one service &nbsp;|&nbsp; "
    "&#8618; symlink</p>"
)


def _render_safe_roots(safe_roots: list, labels: list[str]) -> list[str]:
    """'Fully duplicated subtrees — safe to delete' panel with the
    per-service ✓/— presence grid (reference :1141-1176)."""
    parts = ["<h3>Fully duplicated subtrees — safe to delete</h3>"]
    if not safe_roots:
        parts.append(
            "<p>No folder subtrees are fully identical across all services.</p>"
        )
        return parts
    parts.append(
        "<p>Each subtree below has identical content in every service that "
        "contains it (✓). Services marked — do not have this folder at all. "
        "Deleting from any ✓ service is safe as long as at least one other "
        "✓ service retains a copy.</p>"
    )
    svc_hdrs = "".join(f"<th>{_esc(l)}</th>" for l in labels)
    parts.append(
        f"<table><tr><th>Folder</th>{svc_hdrs}<th>Files in subtree</th></tr>"
    )
    for r in sorted(
        safe_roots,
        key=lambda x: x["folder_path"] if isinstance(x, dict) else x,
    ):
        fc = r if isinstance(r, dict) else {"folder_path": r}
        present = set(fc.get("services_present", labels))
        svc_cells = "".join(
            '<td style="color:#28a745;font-weight:bold">✓</td>'
            if l in present else '<td style="color:#aaa">—</td>'
            for l in labels
        )
        parts.append(
            f"<tr><td><code>{_esc(fc['folder_path'])}</code></td>{svc_cells}"
            f"<td>{fc.get('subtree_total_files', 0):,}</td></tr>"
        )
    parts.append("</table>")
    return parts


def _render_conflicts(conflicts: list[dict], labels: list[str]) -> list[str]:
    """§4 conflict table: per-service size/mtime (or symlink-target)
    cells, phantom/conflict row tints, the mixed-type explainer row, and
    the ``action-<i>`` anchors the folder tree links to (reference
    :1190-1263)."""
    parts: list[str] = []
    svc_headers = "".join(f"<th>{_esc(l)}</th>" for l in labels)
    parts.append(
        f"<table><tr><th>File</th><th>Folder</th><th>Status</th>{svc_headers}</tr>"
    )
    for i, g in enumerate(sorted(conflicts, key=lambda x: x["rel_path"])):
        folder_str = _folder_of(g["rel_path"])
        cm = g.get("content_match", "different")
        vs = g.get("version_status", "conflict")
        if cm == "mixed_type":
            symbol, row_cls = "&#8618;", "conflict-row"
            status_parts = ["mixed&nbsp;type"]
        else:
            symbol = "⚡" if vs == "phantom" else "⚠"
            row_cls = "phantom-row" if vs == "phantom" else "conflict-row"
            status_parts = [f"different&nbsp;·&nbsp;{_esc(vs)}"]
            if vs == "diverged" and g.get("newest_in"):
                status_parts.append(
                    '<br><span style="font-size:11px;color:#666">'
                    f"newer in {_esc(g['newest_in'])}</span>"
                )
        svc_cells = ""
        for label in labels:
            det = g.get("service_details", {}).get(label)
            if det is None:
                svc_cells += '<td style="color:#aaa">—</td>'
            elif det.get("is_symlink"):
                tgt = det.get("symlink_target") or "—"
                svc_cells += (
                    '<td class="service-detail">&#8618; symlink<br>'
                    '<span style="font-size:11px;color:#666">&rarr; '
                    f"{_esc(tgt)}</span></td>"
                )
            else:
                size_val = det.get("size")
                size_str = (
                    human_size(size_val)
                    if size_val is not None and size_val >= 0 else "—"
                )
                svc_cells += (
                    f'<td class="service-detail">{size_str}<br>'
                    f"{_esc(_fmt_dt_short(det.get('mtime_raw')))}</td>"
                )
        extra_note = ""
        if cm == "mixed_type":
            extra_note = (
                '<tr class="conflict-row">'
                f'<td colspan="{3 + len(labels)}" style="font-size:12px;'
                'color:#666;font-style:italic;padding:4px 10px">'
                "One service has a regular file and another has a symlink "
                "with the same name. Cannot safely deduplicate without "
                "understanding your backup strategy.</td></tr>"
            )
        parts.append(
            f'<tr class="{row_cls}" id="action-{i}">'
            f"<td><strong>{symbol} {_esc(g['name_orig'])}</strong></td>"
            f"<td><code>{_esc(folder_str)}</code></td>"
            f"<td>{''.join(status_parts)}</td>{svc_cells}</tr>" + extra_note
        )
    parts.append("</table>")
    return parts


def render_html(result: dict[str, Any]) -> str:
    """Five-section report mirroring the reference's layout
    (:823-1386; docs/report-format.md:38-113): 1 file counts, 2 pair
    summary, 3 folder analysis (tree + safe-to-delete), 4 files
    requiring action, 5 duplicates / symlinks / version-diverged, plus
    the rebuild-only near-dup appendix."""
    labels: list[str] = result.get("labels", [])
    n = len(labels)
    dups = result.get("duplicate_groups", [])
    divs = [g for g in dups if g["version_status"] == "diverged"
            and g["content_match"] in ("identical", "unverified")]
    total = sum(result.get("total_files", {}).values())
    generated_at = result.get("generated_at") or fmt_ts(0)

    parts: list[str] = [
        "<!DOCTYPE html><html lang='en'><head><meta charset='utf-8'>",
        "<title>Cloud Storage Duplicate Analysis</title>",
        f"<style>{_CSS}</style></head><body>",
        "<h1>Cloud Storage Duplicate Analysis</h1>",
        f'<p style="color:#555">Generated: {_esc(generated_at)} &nbsp;·&nbsp; '
        f"Comparing {n} directories</p>",
    ]

    # §1 file counts — stat-card grid + directories table
    parts.append("<h2>1. File Counts</h2>")
    parts.append('<div class="stat-grid">')
    for l in labels:
        cnt = result.get("total_files", {}).get(l, 0)
        pct = 100 * cnt / total if total else 0
        parts.append(
            f'<div class="stat-card"><div class="num">{cnt:,}</div>'
            f'<div class="lbl">{_esc(l)}<br>{pct:.1f}% of all files</div></div>'
        )
    parts.append(
        f'<div class="stat-card"><div class="num">{total:,}</div>'
        '<div class="lbl">Total files</div></div></div>'
    )
    dirs = result.get("dirs", {})
    if dirs:
        parts.append("<table><tr><th>Label</th><th>Path</th><th>Files</th></tr>")
        for l in labels:
            parts.append(
                f"<tr><td><strong>{_esc(l)}</strong></td>"
                f"<td><code>{_esc(_dir_str(dirs.get(l, '')))}</code></td>"
                f"<td>{result.get('total_files', {}).get(l, 0):,}</td></tr>"
            )
        parts.append("</table>")

    # scan warnings banner (reference :861-873)
    warns = result.get("scan_warnings", {})
    if warns:
        parts.append('<div class="warn-banner"><strong>⚠ Scan Warnings</strong>'
                     '<ul style="margin:8px 0 0 0;padding-left:20px">')
        for label, ws in sorted(warns.items()):
            for w in ws:
                parts.append(f"<li><strong>{_esc(label)}:</strong> {_esc(w)}</li>")
        parts.append(
            '</ul><p style="margin:8px 0 0 0;font-size:12px">Results below '
            "may be incomplete.</p></div>"
        )

    # §2 duplicate summary — per-pair chips (reference :876-971)
    parts.append("<h2>2. Duplicate File Summary</h2>")
    pb = pair_breakdown(result)
    parts.append(
        "<table><tr><th>Service Pair</th>"
        '<th style="background:#c8e6c9;border-left:3px solid #81c784">'
        "Match Type</th>"
        '<th style="background:#bbdefb;border-left:3px solid #64b5f6">'
        "Version Status</th><th>Total</th></tr>"
    )
    for pair_key, ps in pb.items():
        match_parts = []
        if ps["identical"]:
            match_parts.append(_chip(ps["identical"], "identical", _GREEN, True))
        if ps["unverified"]:
            match_parts.append(_chip(ps["unverified"], "unverified", _AMBER))
        if ps["different"]:
            match_parts.append(_chip(ps["different"], "different", _RED, True))
        if not match_parts:
            match_parts.append('<span style="color:#aaa">—</span>')
        version_parts = []
        if ps["phantom"]:
            version_parts.append(_chip(ps["phantom"], "phantom", _RED, True))
        if ps["diverged"]:
            version_parts.append(_chip(ps["diverged"], "diverged", _AMBER))
        if ps["conflict"]:
            version_parts.append(_chip(ps["conflict"], "mixed-type", _RED, True))
        if ps["same"]:
            version_parts.append(_chip(ps["same"], "same", _GREEN))
        if not version_parts:
            version_parts.append('<span style="color:#aaa">—</span>')
        row_bg = (
            "#fdecea" if ps["phantom"] > 0 or ps["conflict"] > 0 else
            "#fffde7" if ps["diverged"] > 0 else ""
        )
        row_style = f' style="background:{row_bg}"' if row_bg else ""
        parts.append(
            f"<tr{row_style}><td>{_esc(pair_key)}</td>"
            f'<td style="border-left:3px solid #81c784">'
            f"{' '.join(match_parts)}</td>"
            f'<td style="border-left:3px solid #64b5f6">'
            f"{' '.join(version_parts)}</td>"
            f"<td>{ps['total']:,}</td></tr>"
        )
    if n > 2:
        parts.append(
            f"<tr><td><strong>All {n} services</strong></td>"
            '<td colspan="2" style="border-left:3px solid #81c784">'
            "<em>(pairwise breakdown only)</em></td>"
            f"<td><strong>{result.get('all_services_count', 0):,}</strong></td></tr>"
        )
    unique_str = " &nbsp;|&nbsp; ".join(
        f"{_esc(l)}: {result.get('unique_counts', {}).get(l, 0):,} unique"
        for l in labels
    )
    parts.append(f'<tr><td colspan="4"><em>{unique_str}</em></td></tr></table>')
    parts.append(
        "<p>Duplicate matching used: same filename + same size. "
        "MD5 checksums were computed for all candidate pairs "
        f"(mtime tolerance: {result.get('mtime_fuzz', 5)}s).</p>"
    )

    # §3 folder structure analysis (reference :974-1176)
    fcs = result.get("folder_comparisons", [])
    shared_count = sum(1 for fc in fcs if fc["relationship"] != "unique")
    unique_count = sum(1 for fc in fcs if fc["relationship"] == "unique")
    heading_detail = f"{shared_count} shared"
    if unique_count:
        heading_detail += f", {unique_count} unique"
    parts.append(
        f"<h2>3. Folder Structure Analysis ({heading_detail} folders)</h2>"
    )
    parts.append("<h3>Folder tree</h3>")
    parts.append(
        "<p>Expand any folder to see file-level detail. "
        "★ = fully identical subtree; ~ = partially duplicated; "
        "✗ = has conflicts; &#9670; = unique to one service; "
        "&#8618; = symlink.</p>"
    )
    if fcs:
        parts.append(_render_folder_tree(result))
    parts.append(_TREE_LEGEND)
    rc = result.get("relationship_counts", {})
    if rc:
        parts.append("<table><tr><th>Relationship</th><th>Folders</th></tr>")
        for rel, cnt in sorted(rc.items()):
            parts.append(f"<tr><td>{badge(rel)}</td><td>{cnt:,}</td></tr>")
        parts.append("</table>")
    parts.extend(_render_safe_roots(result.get("safe_to_delete_roots", []), labels))

    # §4 files requiring action (reference :1179-1296)
    conflicts = result.get("conflict_groups", [])
    div_syms = [
        s for s in result.get("symlinks", [])
        if s.get("symlink_status") == "target_diverged"
    ]
    total_action = len(conflicts) + len(div_syms)
    parts.append(f'<h2 id="s4">4. Files Requiring Action ({total_action})</h2>')
    if not conflicts and not div_syms:
        parts.append(
            "<p>No content conflicts found — all matched files have identical "
            "content (or matching was skipped with <code>--no-checksum</code>)."
            "</p>"
        )
    else:
        parts.append(
            "<p>These files share a name and size across services but have "
            "<strong>different content</strong>. Review each before deleting "
            "any copy.</p><p>"
            "<strong>⚠ different&nbsp;·&nbsp;diverged</strong> — content "
            "differs, timestamps differ; keep the newer copy.<br>"
            "<strong>⚡ different&nbsp;·&nbsp;phantom</strong> — content "
            "differs despite matching timestamps; keep both copies.<br>"
            "<strong>&#8618; mixed type</strong> — one service has a regular "
            "file and another has a symlink with the same name.<br>"
            "<strong>&#8618; target_diverged</strong> — both services have a "
            "symlink with the same name but pointing to different targets.</p>"
        )
        if conflicts:
            parts.extend(_render_conflicts(conflicts, labels))
        if div_syms:
            parts.append("<h3>Diverged Symlinks</h3>")
            parts.append(
                "<p>These symlinks point to different targets across "
                "services. Review before deleting to avoid losing "
                "references.</p>"
            )
            for sym in sorted(div_syms, key=lambda x: x["rel_path"]):
                parts.append(
                    '<div class="conflict-row">'
                    '<span class="sym-symlink">&#8618;</span> '
                    f"<strong>{_esc(sym.get('name_orig', sym['rel_path']))}"
                    "</strong>"
                    f'<span style="color:#888;margin-left:8px">'
                    f"{_esc(sym.get('folder', ''))}</span></div>"
                )
                parts.append("<table><tr><th>Service</th><th>Symlink Target"
                             "</th></tr>")
                for label, target in sorted(
                    sym.get("symlink_targets", {}).items()
                ):
                    tstr = (f"<code>{_esc(target)}</code>" if target
                            else "<em>unresolvable</em>")
                    parts.append(
                        f"<tr><td>{_esc(label)}</td><td>{tstr}</td></tr>"
                    )
                parts.append("</table>")

    # §5 duplicate file list (reference :1299-1312)
    parts.append(f"<h2>5. Duplicate Files ({len(dups)} confirmed)</h2>")
    if not dups:
        parts.append("<p>No duplicate files found.</p>")
    else:
        parts.append(
            "<table><tr><th>File</th><th>Folder</th><th>Size</th>"
            "<th>Found in</th><th>Match</th><th>Version</th></tr>"
        )
        for g in sorted(dups, key=lambda x: x["rel_path"]):
            found_in = ", ".join(sorted(g.get("service_details", {})))
            parts.append(
                f"<tr><td>{_esc(g['name_orig'])}</td>"
                f"<td><code>{_esc(_folder_of(g['rel_path']))}</code></td>"
                f'<td style="white-space:nowrap">{human_size(g.get("size", 0))}'
                "</td>"
                f"<td>{_esc(found_in)}</td>"
                f"<td>{badge(g.get('content_match', 'unverified'))}</td>"
                f"<td>{badge(g.get('version_status', 'same'))}</td></tr>"
            )
        parts.append("</table>")

    # symlinks subsection (reference :1315-1340)
    syms = result.get("symlinks", [])
    if syms:
        parts.append(f"<h3>Symlinks ({len(syms)})</h3>")
        parts.append("<table><tr><th>Name</th><th>Target</th><th>Status</th>"
                     "<th>Services</th></tr>")
        for s in sorted(syms, key=lambda s: s["rel_path"]):
            targets = s.get("symlink_targets", {})
            target_display = next((v for v in targets.values() if v), "—")
            status = s.get("symlink_status", "unknown")
            parts.append(
                "<tr><td><strong>&#8618; "
                f"{_esc(s.get('name_orig', s['rel_path']))}</strong><br>"
                f'<small style="color:#888">{_esc(s.get("folder", ""))}</small>'
                "</td>"
                f'<td><code style="font-size:11px">{_esc(target_display)}'
                "</code></td>"
                f"<td>{badge(f'symlink · {status}', 'symlink')}</td>"
                f"<td>{_esc(', '.join(s.get('services', [])))}</td></tr>"
            )
        parts.append("</table>")

    # version-diverged subsection (reference :1343-1380)
    if divs:
        parts.append(f"<h3>Version-Diverged Files ({len(divs)})</h3>")
        parts.append(
            "<p>These files have identical (or unverified) content across "
            "services but different modification timestamps (beyond the "
            "mtime tolerance). Safe to delete older copies once content is "
            "confirmed.</p>"
        )
        div_hdrs = "".join(f"<th>{_esc(l)}</th>" for l in labels)
        parts.append(
            "<table><tr><th>File</th><th>Folder</th><th>Size</th>"
            f"<th>Found in</th><th>Newest in</th><th>Age gap (days)</th>"
            f"{div_hdrs}</tr>"
        )
        for g in sorted(divs, key=lambda x: x["rel_path"]):
            details = g.get("service_details", {})
            date_cells = ""
            for l in labels:
                det = details.get(l)
                if det and det.get("mtime_raw"):
                    is_newest = l == g.get("newest_in")
                    star = " ★" if is_newest else ""
                    fw = "font-weight:bold;" if is_newest else ""
                    date_cells += (
                        f'<td style="white-space:nowrap;font-size:12px;{fw}">'
                        f"{_fmt_dt_short(det['mtime_raw'])}{star}</td>"
                    )
                else:
                    date_cells += '<td style="color:#aaa">—</td>'
            parts.append(
                '<tr style="background:#fffde7">'
                f"<td>{_esc(g['name_orig'])}</td>"
                f"<td><code>{_esc(_folder_of(g['rel_path']))}</code></td>"
                f'<td style="white-space:nowrap">{human_size(g.get("size", 0))}'
                "</td>"
                f"<td>{_esc(', '.join(sorted(details)))}</td>"
                f"<td><strong>{_esc(g.get('newest_in') or '—')}</strong></td>"
                f'<td style="text-align:center">'
                f"{(g.get('age_difference_days') or 0):.1f}</td>"
                f"{date_cells}</tr>"
            )
        parts.append("</table>")

    # near-dup appendix (rebuild-only)
    nd = result.get("neardup")
    if nd:
        parts.append("<h2>6. Near-Duplicate Clusters (MinHash/LSH)</h2>")
        parts.append(
            f"<p>{nd.get('n_clusters', 0):,} clusters over "
            f"{nd.get('n_docs_clustered', 0):,} non-singleton docs; "
            f"{nd.get('n_candidates', 0):,} LSH candidates, "
            f"{nd.get('n_verified', 0):,} verified, "
            f"{nd.get('n_containment_edges', 0):,} containment edges.</p>"
        )

    parts.append(
        f'<div class="footer">Cloud Storage Duplicate Analysis · '
        f"{_esc(generated_at)} · cloud_dedup_ray</div></body></html>"
    )
    return "\n".join(parts)


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
