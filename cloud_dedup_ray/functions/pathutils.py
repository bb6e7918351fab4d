"""Vectorized path helpers (Arrow-native).

Mirrors the reference's path decomposition semantics
(/root/reference/src/cloud_duplicate_analyzer.py:150-151, 177-182):
``name`` = lowercased basename, ``folder`` = dirname with the
``(root)`` sentinel for top-level files (:182, :490).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ROOT = "(root)"


def basename(paths: pa.Array) -> pa.Array:
    """Last path component; vectorized via regex strip of the dirname."""
    return pc.replace_substring_regex(paths, pattern=r"^.*/", replacement="")


def dirname(paths: pa.Array) -> pa.Array:
    """Parent path, ``(root)`` when the path has no '/' (reference :182)."""
    has_sep = pc.match_substring(paths, "/")
    parent = pc.replace_substring_regex(paths, pattern=r"/[^/]*$", replacement="")
    return pc.if_else(has_sep, parent, pa.scalar(ROOT, pa.string()))


def ancestors(folder: str) -> list[str]:
    """All proper ancestor folders of ``folder`` (not including itself or
    the root sentinel). ``a/b/c`` → ``["a", "a/b"]`` (reference :563-570)."""
    if folder == ROOT:
        return []
    parts = folder.split("/")
    return ["/".join(parts[:i]) for i in range(1, len(parts))]


def is_hidden(path: str) -> bool:
    """True if any path segment starts with '.' (reference prunes hidden
    dirs during the walk and hidden filenames at :144-146)."""
    return any(seg.startswith(".") for seg in path.split("/"))


def hidden_mask(paths: pa.Array) -> pa.Array:
    """Vectorized ``is_hidden``: a segment starting with '.' is either at
    the string start or right after a '/'."""
    return pc.match_substring_regex(paths, r"(^|/)\.")


def ds_store_mask(paths: pa.Array) -> pa.Array:
    """``.DS_Store`` basenames — always excluded (reference :148-149)."""
    return pc.match_substring_regex(paths, r"(^|/)\.DS_Store$")
