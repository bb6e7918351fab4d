"""CLI entry point — ``python -m cloud_dedup_ray``.

Mirrors the reference CLI surface
(/root/reference/src/cloud_duplicate_analyzer.py:1391-1496): labeled
directory args, ``--mtime-fuzz`` / ``--no-checksum`` /
``--include-hidden``, ``-o`` / ``--output-dir`` auto-naming, HTML+JSON
twin sinks and the stdout summary — plus rebuild-only flags for the
Parquet corpus source, the near-dup tier and checkpointing.

The CLI owns the Ray session (guarded init; the driver-contract module
``__ray_entry__`` never initialises Ray).
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime
from pathlib import Path


def parse_dir_arg(raw: str) -> tuple[str, Path]:
    """'Label:/path' or '/path' → (label, resolved Path); unlabeled dirs
    use their last path component (reference :79-89, incl. the
    Windows-drive guard)."""
    if ":" in raw and not raw.startswith("/") and not raw.startswith("~"):
        colon_idx = raw.index(":")
        label = raw[:colon_idx].strip()
        path = Path(raw[colon_idx + 1:].strip()).expanduser().resolve()
    else:
        path = Path(raw).expanduser().resolve()
        label = path.name or str(path)
    return label, path


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cloud_dedup_ray",
        description=(
            "Ray-Data-native duplicate analysis: compare labeled directory "
            "trees (or a Parquet source-code corpus) and produce a "
            "duplicate/conflict/folder report plus near-duplicate clusters."
        ),
    )
    p.add_argument(
        "dirs", nargs="*",
        help='Directories to compare. Prefix with "Label:" to set a display name.',
    )
    p.add_argument(
        "--corpus", default=None,
        help="Parquet corpus directory (repo,path,commit,lang,content schema); "
             "replaces the directory args — 'repo' is the service label.",
    )
    p.add_argument("-o", "--output", default=None,
                   help="Output file path (stem shared by .html and .json).")
    p.add_argument("--output-dir", default=None,
                   help="Directory for auto-named outputs; ignored with -o.")
    p.add_argument("--mtime-fuzz", type=float, default=5,
                   help="Seconds tolerance for mtime comparison (default: 5)")
    p.add_argument("--no-checksum", action="store_true",
                   help="Skip content checksums; matches become 'unverified' "
                        "and the 'phantom' case is undetectable.")
    p.add_argument("--include-hidden", action="store_true",
                   help="Include hidden files and folders (dot-names).")
    p.add_argument("--near-dup", action="store_true",
                   help="Also run the MinHash/LSH near-duplicate tier and "
                        "write cluster assignments parquet.")
    p.add_argument("--checkpoint-dir", default=None,
                   help="Per-stage parquet checkpoint root (resume support).")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: let Ray decide).")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if not args.corpus and len(args.dirs) < 2:
        _build_parser().error("Provide at least two directories, or --corpus.")

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.pipelines.exact import analyze_corpus
    from cloud_dedup_ray.report import stdout_summary, write_reports
    from cloud_dedup_ray.sources.corpus import (
        attach_content,
        read_corpus,
        scan_filesystem,
    )

    cfg = DedupConfig(
        mtime_fuzz=args.mtime_fuzz,
        use_checksum=not args.no_checksum,
        skip_hidden=not args.include_hidden,
        checkpoint_dir=args.checkpoint_dir,
    )

    warnings: list[str] = []
    if args.corpus:
        corpus = read_corpus(args.corpus)
    else:
        # label → LIST of paths: two dirs sharing a label (e.g. the same
        # basename, the tool's canonical comparison) must BOTH scan under
        # that service label (reference keeps (label, path) tuples,
        # :1419-1426) — a plain dict would silently drop all but the last
        roots: dict[str, list[str]] = {}
        for raw in args.dirs:
            label, path = parse_dir_arg(raw)
            if not path.exists():
                print(f"Directory not found: {path}", file=sys.stderr)
                return 2
            if not path.is_dir():
                print(f"Not a directory: {path}", file=sys.stderr)
                return 2
            roots.setdefault(label, []).append(str(path))
        scanned, warnings = scan_filesystem(roots, skip_hidden=cfg.skip_hidden)
        corpus = attach_content(scanned)

    res = analyze_corpus(corpus, cfg)
    result = res.to_result_dict()
    result["mtime_fuzz"] = args.mtime_fuzz
    result["generated_at"] = datetime.now().strftime("%Y-%m-%d %H:%M")
    result["dirs"] = (
        {label: args.corpus for label in result["labels"]}
        if args.corpus else roots
    )
    if warnings:
        result["scan_warnings"] = {"scan": warnings}

    ts = datetime.now().strftime("%y%m%d%H%M")
    auto_name = f"cloud_duplicate_report_{ts}.html"
    if args.output:
        output_path = str(Path(args.output).expanduser().resolve())
    elif args.output_dir:
        output_path = str(Path(args.output_dir).expanduser().resolve() / auto_name)
    else:
        output_path = str(Path.cwd() / auto_name)

    if args.near_dup:
        from cloud_dedup_ray.pipelines.neardup import (
            cluster_corpus,
            cluster_corpus_resumable,
        )
        from cloud_dedup_ray.stages.project import project_corpus

        if args.corpus and cfg.checkpoint_dir:
            # corpus mode + checkpoints → per-shard-file lineage: a
            # killed run resumes, and a GROWN corpus (new shard files
            # appended) re-signs only the new files (incremental ingest)
            nd = cluster_corpus_resumable(args.corpus, cfg, partition_by="file")
        else:
            nd_input = (
                project_corpus(
                    corpus, skip_hidden=cfg.skip_hidden, drop_content=False
                )
                .filter(expr="is_symlink == False")
                .materialize()
            )
            nd = cluster_corpus(nd_input, cfg)
        stem = os.path.splitext(output_path)[0]
        nd.assignments.write_parquet(stem + "_clusters")
        result["neardup"] = nd.metrics

    html_path, json_path = write_reports(result, output_path)
    print(f"\n✓ HTML report → {html_path}")
    print(f"✓ JSON data   → {json_path}")
    print(stdout_summary(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
