"""Corpus sources.

Primary source: the Parquet corpus table in the BASELINE.json
``input_hint`` shape (repo, path, commit, lang, content, size, mtime,
is_symlink, symlink_target) via ``ray.data.read_parquet`` with column
pruning.

Secondary source: a real filesystem scan mirroring the reference's
``scan_directory`` (/root/reference/src/cloud_duplicate_analyzer.py:
125-191 — recursive walk, hidden/.DS_Store filtering at the walk,
symlink sentinels size=-1/mtime=0.0, stat-failure fallback size=0).
The walk (metadata only) runs on the driver; content reads happen in
distributed ``map_batches`` tasks so large trees stream.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

CORPUS_COLUMNS = [
    "repo", "path", "commit", "lang", "content",
    "size", "mtime", "is_symlink", "symlink_target",
]


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the corpus parquet directory, pruning to ``columns``."""
    return ray.data.read_parquet(path, columns=columns)


def _walk_root(
    label: str, root: str, rows: list[dict], warnings: list[str],
    skip_hidden: bool,
) -> None:
    """Walk one root directory, appending corpus rows under ``label``."""
    for dirpath, dirnames, filenames in os.walk(root, onerror=lambda e: warnings.append(
        f"{label}: Permission denied or walk error: {e}"
    )):
        if skip_hidden:
            dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        for fname in filenames:
            if fname == ".DS_Store":
                continue
            if skip_hidden and fname.startswith("."):
                continue
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, root)
            is_link = os.path.islink(full)
            if is_link:
                # Non-strict resolution (reference :154 Path.resolve()):
                # dangling symlinks keep their resolved target string,
                # so two links to the same missing target still compare
                # target_identical.
                try:
                    target = os.path.realpath(full)
                except OSError:
                    target = None
                size, mtime = -1, 0.0
            else:
                target = None
                try:
                    st = os.stat(full)
                    size, mtime = st.st_size, st.st_mtime
                except (OSError, PermissionError):
                    size, mtime = 0, 0.0
            rows.append(
                {
                    "repo": label,
                    "path": rel.replace(os.sep, "/"),
                    "commit": "",
                    "lang": fname.rsplit(".", 1)[-1] if "." in fname else "",
                    "content": None,          # filled by attach_content
                    "size": size,
                    "mtime": mtime,
                    "is_symlink": is_link,
                    "symlink_target": target,
                    "_full_path": full,
                }
            )


def scan_filesystem(
    roots: dict[str, str], skip_hidden: bool = True
) -> tuple[ray.data.Dataset, list[str]]:
    """Scan labeled root directories into the corpus schema.

    ``roots`` maps label → directory or LIST of directories (the
    reference keeps (label, path) tuples, so two dirs sharing a label —
    e.g. the same basename — both scan under that one service label;
    parse_dir_arg :79-89, :1419-1426). Returns (dataset, warnings). The driver walks
    metadata (cheap); file CONTENT is read lazily in distributed tasks
    by :func:`attach_content`. Reference behaviors preserved: hidden
    dirs pruned during the walk and hidden files skipped when
    ``skip_hidden`` (:144-146); ``.DS_Store`` always skipped (:148-149);
    symlinks get sentinels size=-1, mtime=0.0 and a resolved target or
    None (:152-167); stat failure → size=0, mtime=0.0 (:169-174);
    empty scan / permission errors → warnings channel (:140-141,
    :187-190).
    """
    rows: list[dict] = []
    warnings: list[str] = []
    for label, root_spec in roots.items():
        n_before = len(rows)
        root_list = [root_spec] if isinstance(root_spec, str) else list(root_spec)
        for root in root_list:
            _walk_root(label, root, rows, warnings, skip_hidden)
        if len(rows) == n_before:
            warnings.append(f"{label}: 0 files found")
    if not rows:
        schema = pa.schema(
            [
                ("repo", pa.string()), ("path", pa.string()),
                ("commit", pa.string()), ("lang", pa.string()),
                ("content", pa.string()), ("size", pa.int64()),
                ("mtime", pa.float64()), ("is_symlink", pa.bool_()),
                ("symlink_target", pa.string()), ("_full_path", pa.string()),
            ]
        )
        return ray.data.from_arrow(schema.empty_table()), warnings
    return ray.data.from_items(rows), warnings


def attach_content(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Distributed content read for filesystem-scanned corpora: each
    batch's files are read inside the task (streams; no driver-side
    content)."""

    def _read(batch: pa.Table) -> pa.Table:
        contents = []
        for full, is_link in zip(
            batch["_full_path"].to_pylist(), batch["is_symlink"].to_pylist()
        ):
            if is_link or full is None:
                contents.append("")
                continue
            try:
                with open(full, "rb") as f:
                    contents.append(f.read().decode("utf-8", "replace"))
            except OSError:
                contents.append(None)  # hash stage treats None as failure
        idx = batch.schema.get_field_index("content")
        return batch.set_column(idx, "content", pa.array(contents, pa.string())) \
                    .drop_columns(["_full_path"])

    return ds.map_batches(_read, batch_format="pyarrow")
