"""Pair / group classification — the reference's core transform
(C1–C4 in SURVEY.md §2.5), re-implemented from its documented semantics
(/root/reference/src/cloud_duplicate_analyzer.py:203-268, 315-433; no
code copied).

``classify_pair`` operates on lightweight record tuples; the pipeline
calls it inside ``groupby(name, size).map_groups`` where per-row hashes
are already materialized (so rule 7's "hash both files" reduces to a
string comparison — hash equality is all the reference ever compares,
:264).
"""

from __future__ import annotations

from dataclasses import dataclass

# precedence ranks for the worst-case group reduce (reference :334-335)
CONTENT_RANK = {"identical": 0, "unverified": 1, "different": 2}
VERSION_RANK = {"same": 0, "diverged": 1, "phantom": 2, "conflict": 3}


@dataclass(frozen=True)
class Rec:
    """The subset of a file record that classification needs."""
    repo: str
    path: str
    name: str          # lowercased basename
    name_orig: str
    folder: str
    size: int
    mtime: float
    is_symlink: bool
    symlink_target: str | None
    content_hash: str | None   # None ⇔ hash unavailable / failed / disabled
    #: version identifier from the corpus table; "" for filesystem scans.
    #: Participates in the deterministic representative tie-break (a repo
    #: may hold several rows with the SAME path at different commits).
    commit: str = ""

    def rep_key(self) -> tuple:
        """Deterministic representative ordering: min by (path, commit,
        content_hash, mtime). Plain min-by-path is ambiguous when one
        repo stores several commits of the same path — the winner would
        depend on block arrival order."""
        return (self.path, self.commit or "", self.content_hash or "", self.mtime)


def classify_pair(
    a: Rec, b: Rec, mtime_fuzz: float, use_checksum: bool
) -> tuple[str, str] | None:
    """(content_match, version_status) or None for non-matching records.

    Rule order (reference :231-268):
      1. one symlink + one regular     → ("mixed_type", "conflict")
      2. both symlinks                 → targets equal & non-null →
                                         ("symlink", "target_identical")
                                         else ("symlink", "target_diverged")
      3. name/size mismatch            → None (defensive; dead at the
                                         call site — callers group by key)
      4. mtime_same = |Δmtime| ≤ fuzz
      5. size == 0 (both empty)        → ("identical", "same") always
      6. checksum disabled             → ("unverified", same/diverged)
      7. either hash missing           → ("unverified", same/diverged)
      8. hashes equal                  → ("identical", same/diverged)
         hashes differ                 → ("different",
                                          "phantom" if mtime_same else "diverged")
    """
    if a.is_symlink != b.is_symlink:
        return ("mixed_type", "conflict")
    if a.is_symlink and b.is_symlink:
        if (
            a.symlink_target is not None
            and b.symlink_target is not None
            and a.symlink_target == b.symlink_target
        ):
            return ("symlink", "target_identical")
        return ("symlink", "target_diverged")
    if a.name != b.name or a.size != b.size:
        return None
    mtime_same = abs(a.mtime - b.mtime) <= mtime_fuzz
    if a.size == 0:
        return ("identical", "same")
    if not use_checksum:
        return ("unverified", "same" if mtime_same else "diverged")
    if not a.content_hash or not b.content_hash:
        return ("unverified", "same" if mtime_same else "diverged")
    if a.content_hash == b.content_hash:
        return ("identical", "same" if mtime_same else "diverged")
    return ("different", "phantom" if mtime_same else "diverged")


def reduce_group(
    pairs: list[tuple[str, str]]
) -> tuple[str, str]:
    """Worst-case precedence reduce over a group's pair classifications
    (reference :392-395): the max-rank content_match and version_status
    independently."""
    cm = max((p[0] for p in pairs), key=lambda v: CONTENT_RANK[v])
    vs = max((p[1] for p in pairs), key=lambda v: VERSION_RANK[v])
    return cm, vs


def enrich_group(members: list[Rec], version_status: str) -> dict:
    """Group enrichment (reference :400-428): ``newest_in`` only for
    diverged/phantom groups; ``age_difference_days`` always."""
    newest_in = None
    if version_status in ("diverged", "phantom"):
        newest_in = max(members, key=lambda r: r.mtime).repo
    mtimes = [r.mtime for r in members]
    age_days = round((max(mtimes) - min(mtimes)) / 86400.0, 2)
    return {"newest_in": newest_in, "age_difference_days": age_days}
