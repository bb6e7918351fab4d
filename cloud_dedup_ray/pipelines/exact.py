"""Exact-tier analysis pipeline — reference parity.

The full ``analyze()`` surface of the reference
(/root/reference/src/cloud_duplicate_analyzer.py:273-713) as a Ray Data
pipeline:

    read_parquet(corpus)
      → map_batches  project / filter / hash          (stateless tasks)
      → groupby(name, size) → map_groups classify      [shuffle 1]
      → groupby(path_lower) → map_groups mixed-type    [shuffle 2]
      → groupby(repo) counts, broadcast anti-joins     [small shuffles]
      → groupby(repo, folder) name-sets → driver folder rollups [shuffle 3]

Deterministic deviations from the reference (documented; the pure-Python
oracle in ``cloud_dedup_ray/oracle`` applies the same rules, so parity
tests are exact):
  * label iteration order = sorted(labels) (reference: CLI order),
  * the representative record per (key, repo) = min by path
    (reference: ``hits[0]`` filesystem walk order, :325),
  * per (repo, lowercased path) the record = min by path
    (reference: last walk-order write wins, :298-301).
All other semantics — including the J2/J7 representative-path quirks —
are preserved in parity mode.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cloud_dedup_ray.stages import coarse

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.classify import (
    CONTENT_RANK,
    VERSION_RANK,
    Rec,
    classify_pair,
)
from cloud_dedup_ray.functions.folders import (
    finalize_comparisons,
    folder_analysis,
)
from cloud_dedup_ray.stages.project import project_corpus

GROUP_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("size", pa.int64()),
        ("rel_path", pa.string()),
        ("name_orig", pa.string()),
        ("folder", pa.string()),
        ("route", pa.string()),           # duplicate | conflict | symlink
        ("content_match", pa.string()),
        ("version_status", pa.string()),  # symlink rows: the symlink_status
        ("newest_in", pa.string()),
        ("age_difference_days", pa.float64()),
        ("services", pa.list_(pa.string())),
        ("n_services", pa.int64()),
        ("member_repos", pa.list_(pa.string())),
        ("member_paths", pa.list_(pa.string())),
        ("member_mtimes", pa.list_(pa.float64())),
        ("member_sizes", pa.list_(pa.int64())),
        ("member_is_symlink", pa.list_(pa.bool_())),
        ("member_targets", pa.list_(pa.string())),
    ]
)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return GROUP_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=GROUP_SCHEMA)


REC_COLS = (
    "repo path commit name name_orig folder size mtime "
    "is_symlink symlink_target content_sha256"
).split()


def _reps_per_key(df, key_cols: list[str]):
    """Deterministic representative per (key, repo) over a WHOLE
    partition frame in one vectorized pass: min by (path, commit, sha,
    mtime) — ``Rec.rep_key`` — replacing the reference's walk-order
    ``hits[0]``. Plain min-by-path is ambiguous for corpora holding
    several commits of one path per repo. The per-group pandas variant
    this replaces (sort_values + drop_duplicates per blocking group) was
    ~90 % of the classify stage's CPU at 100k-row scale.

    Returns the reduced frame sorted by (key, repo): one row per
    (key, repo), group rows contiguous and labels already in sorted
    order. ``content_sha256`` and ``commit`` come back ''-filled —
    ``Rec.rep_key`` (and the SQL oracle's ``coalesce``) map a missing
    value to '' which sorts FIRST, while pandas sorts NaN LAST, so
    filling before the sort keeps pipeline and oracle picking the same
    representative when rows tie with mixed availability."""
    df = df.assign(
        content_sha256=df["content_sha256"].fillna(""),
        commit=df["commit"].fillna(""),
    )
    df = df.sort_values(
        key_cols + ["repo", "path", "commit", "content_sha256", "mtime"],
        kind="stable",
    )
    return df.drop_duplicates(key_cols + ["repo"], keep="first")


def _recs_of(reps) -> list[Rec]:
    """Build Rec objects for every row of a representative frame with
    column-wise extraction (no per-row pandas indexing)."""
    cols = {
        c: reps[c].tolist()
        for c in (
            "repo", "path", "commit", "name", "name_orig", "folder",
            "size", "mtime", "is_symlink", "symlink_target",
            "content_sha256",
        )
    }
    out: list[Rec] = []
    for repo, path, commit, name, name_orig, folder, size, mtime, sym, tgt, sha in zip(
        cols["repo"], cols["path"], cols["commit"], cols["name"],
        cols["name_orig"], cols["folder"], cols["size"], cols["mtime"],
        cols["is_symlink"], cols["symlink_target"], cols["content_sha256"],
    ):
        out.append(
            Rec(
                repo=repo,
                path=path,
                commit=commit if isinstance(commit, str) else "",
                name=name,
                name_orig=name_orig,
                folder=folder,
                size=int(size),
                mtime=float(mtime),
                is_symlink=bool(sym),
                symlink_target=(
                    None if tgt is None or isinstance(tgt, float) else tgt
                ),
                content_hash=(
                    None if not sha or isinstance(sha, float) else sha
                ),
            )
        )
    return out


def _group_bounds(*key_arrays: np.ndarray) -> np.ndarray:
    """Boundary indices of contiguous equal-key runs (arrays pre-sorted
    by the keys); returns ``[b0, b1, ..., n]``."""
    n = len(key_arrays[0])
    if n == 0:
        return np.zeros(1, np.int64)
    new = np.zeros(n, bool)
    new[0] = True
    for arr in key_arrays:
        new[1:] |= arr[1:] != arr[:-1]
    return np.append(np.flatnonzero(new), n)


def _group_row(
    members: dict[str, Rec], route: str, cm: str, vs: str,
    newest_in: str | None, age_days: float | None,
) -> dict:
    labels = list(members)  # already sorted by caller
    first = members[labels[0]]
    return {
        "name": first.name,
        "size": first.size,
        "rel_path": first.path,
        "name_orig": first.name_orig,
        "folder": first.folder,
        "route": route,
        "content_match": cm,
        "version_status": vs,
        "newest_in": newest_in,
        "age_difference_days": age_days,
        "services": labels,
        "n_services": len(labels),
        "member_repos": labels,
        "member_paths": [members[l].path for l in labels],
        "member_mtimes": [members[l].mtime for l in labels],
        "member_sizes": [members[l].size for l in labels],
        "member_is_symlink": [members[l].is_symlink for l in labels],
        "member_targets": [members[l].symlink_target for l in labels],
    }


def _classify_group(ordered: dict[str, Rec], cfg: DedupConfig) -> dict | None:
    """Reference match loop for ONE (name,size) group (:315-433),
    including the first-symlink-pair short-circuit. ``ordered`` maps
    sorted labels → representative Rec."""
    labels = list(ordered)
    group_content, group_version = "identical", "same"
    for la, lb in combinations(labels, 2):
        res = classify_pair(ordered[la], ordered[lb], cfg.mtime_fuzz, cfg.use_checksum)
        if res is None:
            return None
        cm, vs = res
        if cm == "symlink":
            return _group_row(ordered, "symlink", "symlink", vs, None, None)
        if cm == "mixed_type":
            # dead in the main loop (symlink size=-1 never equals a
            # regular size) — kept defensively like the reference
            return _group_row(ordered, "conflict", "mixed_type", vs, None, None)
        if CONTENT_RANK[cm] > CONTENT_RANK[group_content]:
            group_content = cm
        if VERSION_RANK[vs] > VERSION_RANK[group_version]:
            group_version = vs
    newest_in = (
        max(labels, key=lambda l: ordered[l].mtime)
        if group_version in ("diverged", "phantom")
        else None
    )
    mtimes = [r.mtime for r in ordered.values()]
    age = round((max(mtimes) - min(mtimes)) / 86400.0, 2)
    route = "conflict" if group_content == "different" else "duplicate"
    return _group_row(ordered, route, group_content, group_version, newest_in, age)


class GroupClassifier:
    """``map_groups`` body over one COARSE partition of the corpus
    (``__part = hash(name,size) % P``, stages/coarse.py). All (name,
    size) blocking groups of the partition are handled in one call:
    singleton keys (the vast majority) are dropped by a vectorized
    pandas ``duplicated`` prefilter; only multi-row keys reach Python."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.__name__ = "GroupClassifier"  # map_groups wraps plain functions

    def __call__(self, table: pa.Table) -> pa.Table:
        df = table.select(REC_COLS).to_pandas()
        sub = df[df.duplicated(["name", "size"], keep=False)]
        if sub.empty:
            return _rows_to_table([])
        reps = _reps_per_key(sub, ["name", "size"])
        recs = _recs_of(reps)
        names = reps["name"].to_numpy()
        sizes = reps["size"].to_numpy()
        bounds = _group_bounds(names, sizes)
        rows: list[dict] = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi - lo < 2:  # <2 distinct repos share this (name, size)
                continue
            # reps are (key, repo)-sorted → labels already in sorted order
            ordered = {recs[i].repo: recs[i] for i in range(lo, hi)}
            row = _classify_group(ordered, self.cfg)
            if row is not None:
                rows.append(row)
        return _rows_to_table(rows)


class MixedTypeClassifier:
    """``map_groups`` body for the rel_path-keyed second pass
    (:435-482) over one coarse partition (``__part =
    crc32(path_lower) % P``): path keys holding both a symlink and a
    regular file across ≥2 repos become mixed_type conflicts, unless the
    rel_path was already emitted by the main pass."""

    def __init__(self, cfg: DedupConfig, handled_ref: "ray.ObjectRef | None"):
        self.cfg = cfg
        self.handled_ref = handled_ref
        self._handled: set[str] | None = None
        self.__name__ = "MixedTypeClassifier"

    def __call__(self, table: pa.Table) -> pa.Table:
        if self._handled is None:
            self._handled = (
                ray.get(self.handled_ref) if self.handled_ref is not None else set()
            )
        df = table.select(REC_COLS + ["path_lower"]).to_pandas()
        df = df[~df["path_lower"].isin(self._handled)]
        sub = df[df.duplicated("path_lower", keep=False)]
        if sub.empty:
            return _rows_to_table([])
        # the pre-reps ``is_symlink.nunique() != 2`` group filter the
        # per-group variant applied was redundant: the representative
        # kind-set check below rejects exactly the same groups
        reps = _reps_per_key(sub, ["path_lower"])
        recs = _recs_of(reps)
        keys = reps["path_lower"].to_numpy()
        sym = reps["is_symlink"].to_numpy(dtype=bool)
        bounds = _group_bounds(keys)
        rows: list[dict] = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi - lo < 2:
                continue
            kinds = set(sym[lo:hi].tolist())
            if kinds != {True, False}:
                continue
            ordered = {recs[i].repo: recs[i] for i in range(lo, hi)}
            rows.append(
                _group_row(ordered, "conflict", "mixed_type", "conflict", None, None)
            )
        return _rows_to_table(rows)


@dataclass
class ExactResult:
    """Driver-side handle on the analysis outputs. The three group
    datasets stay distributed; counts/folder tables are small and
    materialized."""

    labels: list[str]
    total_files: dict[str, int]
    duplicate_groups: ray.data.Dataset
    conflict_groups: ray.data.Dataset
    symlinks: ray.data.Dataset
    unique_counts: dict[str, int]
    pairwise_counts: dict[str, int]
    all_services_count: int
    folder_comparisons: list[dict] = field(default_factory=list)
    relationship_counts: dict[str, int] = field(default_factory=dict)
    safe_to_delete_roots: list[dict] = field(default_factory=list)
    #: folder → {label → sorted lowercase names}; feeds the HTML tree's
    #: per-file badge lists (reference folder_label_names, :1002-1007).
    #: Driver-sized like the reference's scanned-records map — the HTML
    #: tree is a small-corpus artifact by construction.
    file_names_by_folder: dict = field(default_factory=dict)
    #: per-phase wall seconds (throughput/skew observability, north rule)
    metrics: dict = field(default_factory=dict)

    def to_result_dict(self) -> dict[str, Any]:
        """Reference-shaped result dict (:696-713, minus private keys and
        scan plumbing)."""
        dup = self.duplicate_groups.to_pandas()
        con = self.conflict_groups.to_pandas()
        sym = self.symlinks.to_pandas()

        def groups(df):
            out = []
            if df.empty:
                return out
            for _, g in df.sort_values("rel_path").iterrows():
                out.append(
                    {
                        "rel_path": g["rel_path"],
                        "name_orig": g["name_orig"],
                        "size": int(g["size"]),
                        "content_match": g["content_match"],
                        "version_status": g["version_status"],
                        "newest_in": g["newest_in"],
                        "age_difference_days": g["age_difference_days"],
                        "service_details": {
                            repo: {
                                "size": int(s),
                                "mtime_raw": float(m),
                                "is_symlink": bool(sym),
                                "symlink_target": (tgt or None),
                            }
                            for repo, s, m, sym, tgt in zip(
                                g["member_repos"], g["member_sizes"],
                                g["member_mtimes"], g["member_is_symlink"],
                                g["member_targets"],
                            )
                        },
                    }
                )
            return out

        return {
            "labels": self.labels,
            "total_files": self.total_files,
            "duplicate_groups": groups(dup),
            "conflict_groups": groups(con),
            "symlinks": [
                {
                    "rel_path": s["rel_path"],
                    "name_orig": s["name_orig"],
                    "folder": s["folder"],
                    "symlink_status": s["version_status"],
                    "services": list(s["services"]),
                    "symlink_targets": dict(zip(s["member_repos"], s["member_targets"])),
                }
                for _, s in (
                    sym.sort_values("rel_path") if not sym.empty else sym
                ).iterrows()
            ],
            "unique_counts": self.unique_counts,
            "pairwise_counts": self.pairwise_counts,
            "all_services_count": self.all_services_count,
            "folder_comparisons": self.folder_comparisons,
            "relationship_counts": self.relationship_counts,
            "safe_to_delete_roots": self.safe_to_delete_roots,
            "_file_names_by_folder": self.file_names_by_folder,
        }


def _folder_name_partials(table: pa.Table) -> pa.Table:
    """Per-batch combiner for folder analytics: distinct sorted file
    names per (repo, folder) — shared by the driver-merge path in
    ``analyze_corpus`` and the distributed reduce in
    ``folder_comparison_rows_distributed``."""
    df = table.select(["repo", "folder", "name"]).to_pandas()
    g = (
        df.groupby(["repo", "folder"], sort=False)["name"]
        .agg(lambda s: sorted(set(s)))
        .reset_index()
    )
    return pa.table(
        {
            "repo": pa.array(g["repo"], pa.string()),
            "folder": pa.array(g["folder"], pa.string()),
            "names": pa.array(list(g["name"]), pa.list_(pa.string())),
        }
    )


_folder_name_partials.__name__ = "folder_partials"


def folder_comparison_rows_distributed(
    projected: ray.data.Dataset, num_parts: int = 32
) -> list[dict]:
    """Distributed folder analytics (the scale path for F1–F6): the
    driver never holds the global (repo, folder) → name-set map.

    1. per-batch distinct-name partials → coarse hash partition on
       (repo, folder) → per-partition vectorized merge — one row per
       (repo, folder) with its direct names;
    2. ancestor-presence explode (one marker row per ancestor, names
       shipped only for the direct row);
    3. coarse hash partition on the folder → per-folder comparison
       (``compare_one_folder``) inside the group task.

    Returns one comparison row per folder (counts + membership details —
    ≪ corpus); ``finalize_comparisons`` does the path-sorted rollups.
    Label order contract: the rebuild always uses sorted labels, so
    ``services_present`` = sorted repos present — no global label
    broadcast is needed."""
    import json as _json

    import pandas as pd

    from cloud_dedup_ray.functions.folders import compare_one_folder
    from cloud_dedup_ray.functions.pathutils import ancestors

    def _add_kpart(t: pa.Table) -> pa.Table:
        keys = [
            f"{r}\0{f}"
            for r, f in zip(t["repo"].to_pylist(), t["folder"].to_pylist())
        ]
        part = coarse.str_partition(keys, num_parts)
        return t.append_column("__kpart", pa.array(part))

    def _merge_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        # merge ALL (repo, folder) groups of one hash partition in a
        # single pandas pass — a Ray map_groups per (repo, folder) key
        # would pay per-tiny-group scheduling + Arrow overhead (the
        # coarse-partition pattern, see stages/coarse.py)
        g = (
            df.groupby(["repo", "folder"], sort=False)["names"]
            .agg(lambda lists: sorted(set().union(*lists)))
            .reset_index()
        )
        return g[["repo", "folder", "names"]]

    def _explode(t: pa.Table) -> pa.Table:
        tgt: list[str] = []
        repo: list[str] = []
        names: list[list[str]] = []
        direct: list[bool] = []
        for r, f, ns in zip(
            t["repo"].to_pylist(), t["folder"].to_pylist(), t["names"].to_pylist()
        ):
            tgt.append(f)
            repo.append(r)
            names.append(ns)
            direct.append(True)
            for a in ancestors(f):
                tgt.append(a)
                repo.append(r)
                names.append([])
                direct.append(False)
        return pa.table(
            {
                "target": pa.array(tgt, pa.string()),
                "repo": pa.array(repo, pa.string()),
                "names": pa.array(names, pa.list_(pa.string())),
                "direct": pa.array(direct, pa.bool_()),
            }
        )

    def _add_part(t: pa.Table) -> pa.Table:
        part = coarse.str_partition(t["target"].to_pylist(), num_parts)
        return t.append_column("__part", pa.array(part))

    _PAYLOAD_KEYS = (
        "services_present", "relationship", "total_unique_files",
        "files_in_all", "details",
    )

    def _compare(df: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for folder, g in df.groupby("target", sort=False):
            present = sorted(set(g["repo"]))
            sets_here: dict[str, set[str]] = {l: set() for l in present}
            for r, ns, d in zip(g["repo"], g["names"], g["direct"]):
                if d:
                    sets_here[r].update(ns)
            row = compare_one_folder(folder, present, sets_here)
            out.append(
                {
                    "folder_path": row["folder_path"],
                    "payload": _json.dumps({k: row[k] for k in _PAYLOAD_KEYS}),
                }
            )
        return pd.DataFrame(out, columns=["folder_path", "payload"])

    _compare.__name__ = "folder_compare"
    rows = (
        projected.select_columns(["repo", "folder", "name"])
        .map_batches(_folder_name_partials, batch_format="pyarrow")
        .map_batches(_add_kpart, batch_format="pyarrow")
        .groupby("__kpart")
        .map_groups(_merge_partition, batch_format="pandas")
        .map_batches(_explode, batch_format="pyarrow")
        .map_batches(_add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_compare, batch_format="pandas")
        .take_all()
    )
    return [
        {"folder_path": r["folder_path"], **_json.loads(r["payload"])}
        for r in rows
    ]


def analyze_corpus(
    corpus: ray.data.Dataset, cfg: DedupConfig | None = None,
    folder_mode: str = "auto",
    preprojected: ray.data.Dataset | None = None,
) -> ExactResult:
    """Run the full exact-tier analysis over a corpus Dataset in the
    ``input_hint`` schema.

    ``folder_mode``: ``"driver"`` merges folder name-sets on the driver
    (reference-shaped, also feeds the HTML tree's per-file lists);
    ``"distributed"`` runs the groupby(repo, folder) reduce + per-folder
    compare as a Dataset job (driver holds one row per folder);
    ``"auto"`` switches to distributed above 2M corpus rows.

    ``preprojected``: an already-projected (``project_corpus``) dataset
    to reuse — lets a caller running several tiers over one corpus
    share a single projection/hash pass (``corpus`` is ignored). Must
    have been projected with settings compatible with ``cfg``."""
    import time

    from cloud_dedup_ray.stages.blockscan import (
        coalesce_small_blocks,
        is_materialized,
        scan_blocks,
    )

    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()
    if preprojected is not None:
        projected = (
            preprojected if is_materialized(preprojected)
            else preprojected.materialize()
        )
    else:
        projected = project_corpus(
            corpus, skip_hidden=cfg.skip_hidden, use_checksum=cfg.use_checksum
        ).materialize()  # reused by all downstream passes
    # tiny-block inputs make the classify sort-shuffle overhead-bound
    projected = coalesce_small_blocks(projected)
    t_project = time.perf_counter()

    num_parts = 32

    # ---- symlink paths: flat task wave over the materialized blocks
    # (~100 ms) — the mixed-type pass and the counts pass both need this
    # set, and it must exist BEFORE the fused shuffle below so the
    # mixed-copy rows can be emitted into the same job. ----
    def _sym_block(t: pa.Table) -> list[str]:
        if t.num_rows == 0 or "path_lower" not in t.schema.names:
            return []
        return t.filter(t["is_symlink"])["path_lower"].to_pylist()

    symlink_paths: set[str] = set()
    for part in scan_blocks(projected, _sym_block):
        symlink_paths.update(part)
    sym_paths_ref = ray.put(symlink_paths)
    # Arrow-array form for the vectorized pc.is_in filter in the fused
    # map (ray.get of the same ref is plasma-cached per worker)
    sym_arr_ref = ray.put(pa.array(sorted(symlink_paths)))
    t_sym = time.perf_counter()

    # ---- FUSED classify + mixed-type shuffle: one groupby job carries
    # BOTH passes. Every row is emitted once keyed by hash(name, size)
    # (partitions [0, P)), and the symlink-neighborhood rows (the only
    # possible members of a mixed-type path group) are emitted a second
    # time keyed by hash(path_lower) offset into [P, 2P). The group task
    # dispatches on the partition range. The mixed pass's handled-keys
    # anti-join moves to the driver (mixed rows are few), which breaks
    # the classify → mixed serial dependency that previously forced two
    # back-to-back shuffle jobs. ----
    def _part_fused(t: pa.Table) -> pa.Table:
        part = coarse.str_int_partition(
            t["name"].to_pylist(), np.asarray(t["size"], np.int64), num_parts
        )
        t1 = t.append_column("__part", pa.array(part))
        sym_arr = ray.get(sym_arr_ref)
        if len(sym_arr) == 0:
            return t1
        keep = pc.is_in(t["path_lower"], value_set=sym_arr)
        t2 = t.filter(keep)
        part2 = coarse.str_partition(t2["path_lower"].to_pylist(), num_parts)
        t2 = t2.append_column(
            "__part", pa.array((np.asarray(part2) + num_parts).astype(part2.dtype))
        )
        return pa.concat_tables([t1, t2])

    class _FusedClassifier:
        """Dispatch a fused-shuffle partition to the right pass body:
        ``__part < num_parts`` → (name, size) group classification,
        else → mixed-type path-group classification (no handled filter
        — applied on the driver afterwards)."""

        def __init__(self, cfg: DedupConfig):
            self.classify = GroupClassifier(cfg)
            self.mixed = MixedTypeClassifier(cfg, None)
            self.__name__ = "FusedClassifier"

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return GROUP_SCHEMA.empty_table()
            if t["__part"][0].as_py() < num_parts:
                return self.classify(t)
            return self.mixed(t)

    # The classified group table is ≪ the corpus (one row per matched
    # blocking key), so it is collected to the driver ONCE; routing,
    # pairwise counts and the anti-join key sets are then plain pandas.
    # The fused shuffle and the (independent) folder job run
    # CONCURRENTLY — Ray Data executions compose, and overlapping them
    # hides per-job scheduling latency that would otherwise be serial
    # driver time.
    from concurrent.futures import ThreadPoolExecutor

    def _run_classify():
        df = (
            projected.select_columns(REC_COLS + ["path_lower"])
            .map_batches(_part_fused, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(_FusedClassifier(cfg), batch_format="pyarrow")
            .to_pandas()
        )
        return df if not df.empty else GROUP_SCHEMA.empty_table().to_pandas()

    # folder name-set combiner (F1): per-batch partials, merged on the
    # driver — no shuffle. At folder counts too large for one driver the
    # same partials feed a groupby(repo, folder) reduce instead.
    def _run_folder_partials() -> dict[str, dict[str, set[str]]]:
        sets: dict[str, dict[str, set[str]]] = {}
        for bt in projected.map_batches(
            _folder_name_partials, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for r, f, names in zip(
                bt["repo"].to_pylist(),
                bt["folder"].to_pylist(),
                bt["names"].to_pylist(),
            ):
                sets.setdefault(r, {}).setdefault(f, set()).update(names)
        return sets

    use_distributed_folders = folder_mode == "distributed" or (
        folder_mode == "auto" and projected.count() > 2_000_000
    )
    pool = ThreadPoolExecutor(max_workers=2)
    f_groups = pool.submit(_run_classify)
    if use_distributed_folders:
        f_folders = pool.submit(folder_comparison_rows_distributed, projected)
    else:
        f_folders = pool.submit(_run_folder_partials)
    all_df = f_groups.result()

    import pandas as pd

    # ---- split the fused output: mixed-type rows carry the sentinel
    # content_match == "mixed_type"; the handled-keys anti-join
    # (reference :441 — a path group already emitted by the main pass is
    # skipped) runs here on the driver over the few mixed candidates.
    mixed_mask = all_df["content_match"] == "mixed_type"
    groups_df = all_df[~mixed_mask].reset_index(drop=True)
    handled = {p.lower() for p in groups_df["rel_path"]}
    mixed_df = all_df[mixed_mask].reset_index(drop=True)
    if not mixed_df.empty:
        mixed_df = mixed_df[
            ~mixed_df["rel_path"].str.lower().isin(handled)
        ].reset_index(drop=True)
    t_classify = time.perf_counter()
    t_mixed = t_classify

    # ---- unique counts (J7, representative-path quirk preserved):
    # dup_rel_paths from the first-pass groups; the mixed groups'
    # contribution is corrected afterwards using the per-(repo,
    # symlink-path) row counts the same pass emits. ----
    dup_rel_paths: dict[str, set[str]] = {}
    for rp, svcs in zip(groups_df["rel_path"], groups_df["services"]):
        rpl = rp.lower()
        for l in svcs:
            dup_rel_paths.setdefault(l, set()).add(rpl)
    dup_ref = ray.put(dup_rel_paths)

    # A1 + A4 in ONE flat task wave over the materialized blocks: per
    # block emit (repo → rows, matched) partials plus (repo,
    # symlink-path) row counts; the reduce is a tiny driver merge.
    def _count_block(batch: pa.Table, sets, sympaths):
        if batch.num_rows == 0 or "repo" not in batch.schema.names:
            return [], []
        df = pa.table(
            {"repo": batch["repo"], "path_lower": batch["path_lower"]}
        ).to_pandas()
        agg_rows, sym_rows = [], []
        for repo, g in df.groupby("repo", sort=False):
            matched = int(g["path_lower"].isin(sets.get(repo, ())).sum())
            agg_rows.append((repo, len(g), matched))
            if sympaths:
                in_sym = g[g["path_lower"].isin(sympaths)]
                for p, c in in_sym["path_lower"].value_counts().items():
                    sym_rows.append((repo, p, int(c)))
        return agg_rows, sym_rows

    total_files: dict[str, int] = {}
    matched_counts: dict[str, int] = {}
    sym_row_counts: dict[tuple[str, str], int] = {}
    for agg_rows, sym_rows in scan_blocks(
        projected, _count_block, dup_ref, sym_paths_ref
    ):
        for repo, n, m in agg_rows:
            total_files[repo] = total_files.get(repo, 0) + n
            matched_counts[repo] = matched_counts.get(repo, 0) + m
        for repo, p, c in sym_rows:
            sym_row_counts[(repo, p)] = sym_row_counts.get((repo, p), 0) + c

    dup_df = groups_df[groups_df.route == "duplicate"]
    con_df = pd.concat(
        [groups_df[groups_df.route == "conflict"], mixed_df], ignore_index=True
    )
    sym_df = groups_df[groups_df.route == "symlink"]

    def _as_ds(df: "pd.DataFrame") -> ray.data.Dataset:
        return ray.data.from_arrow(
            pa.Table.from_pandas(df.reset_index(drop=True), schema=GROUP_SCHEMA,
                                 preserve_index=False)
        )

    duplicate_groups = _as_ds(dup_df)
    conflict_groups = _as_ds(con_df)
    symlink_groups = _as_ds(sym_df)

    # mixed-group correction: rows whose path matched ONLY a mixed group
    # (every mixed group keys on a symlink path, counted above)
    for rp, svcs in zip(mixed_df["rel_path"], mixed_df["services"]):
        rpl = rp.lower()
        for l in svcs:
            if rpl not in dup_rel_paths.get(l, ()):
                matched_counts[l] = (
                    matched_counts.get(l, 0) + sym_row_counts.get((l, rpl), 0)
                )
                dup_rel_paths.setdefault(l, set()).add(rpl)

    # the same pass yields the label set (A1 doubles as label discovery)
    labels = sorted(total_files)
    n_labels = len(labels)
    unique_counts = {
        l: total_files.get(l, 0) - matched_counts.get(l, 0) for l in labels
    }

    # ---- counts (A2-A3, driver-side over the collected group table) ----
    pairwise_counts = {f"{la}↔{lb}": 0 for la, lb in combinations(labels, 2)}
    for svcs in dup_df["services"]:
        for a, b in combinations(svcs, 2):
            pairwise_counts[f"{a}↔{b}"] += 1
    all_services_count = int((dup_df["n_services"] == n_labels).sum())
    t_counts = time.perf_counter()

    # ---- folder analytics (F1-F6): the folder job (driver merge or
    # distributed groupby compare) was launched concurrently with the
    # classify shuffle above; here we just collect it. ----
    names_by_folder: dict[str, dict[str, list[str]]] = {}
    if use_distributed_folders:
        comparison_rows = f_folders.result()
        pool.shutdown()
        t_folder_agg = time.perf_counter()
        folder_comparisons, relationship_counts, safe_roots = (
            finalize_comparisons(comparison_rows)
        )
    else:
        folder_sets = f_folders.result()
        pool.shutdown()
        for l in labels:
            folder_sets.setdefault(l, {})
        for label, folders in folder_sets.items():
            for folder, names in folders.items():
                names_by_folder.setdefault(folder, {})[label] = sorted(names)
        t_folder_agg = time.perf_counter()
        folder_comparisons, relationship_counts, safe_roots = folder_analysis(
            folder_sets, labels
        )
    t_folder = time.perf_counter()
    metrics = {
        "sec_project": round(t_project - t0, 3),
        "sec_sym_scan": round(t_sym - t_project, 3),
        "sec_classify": round(t_classify - t_sym, 3),  # fused classify+mixed
        "sec_counts": round(t_counts - t_mixed, 3),
        "sec_folder_agg": round(t_folder_agg - t_counts, 3),
        "sec_folder_analysis": round(t_folder - t_folder_agg, 3),
        "n_groups": len(groups_df),
        "n_folders": len(folder_comparisons),
    }

    return ExactResult(
        labels=labels,
        total_files=total_files,
        duplicate_groups=duplicate_groups,
        conflict_groups=conflict_groups,
        symlinks=symlink_groups,
        unique_counts=unique_counts,
        pairwise_counts=pairwise_counts,
        all_services_count=all_services_count,
        folder_comparisons=folder_comparisons,
        relationship_counts=relationship_counts,
        safe_to_delete_roots=safe_roots,
        file_names_by_folder=names_by_folder,
        metrics=metrics,
    )
