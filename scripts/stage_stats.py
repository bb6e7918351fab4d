"""Per-stage ``ds.stats()`` audit of the flagship Dataset stages.

Runs the near-dup tier's Dataset-shaped stages (corpus scan →
projection → MinHash signing; LSH band explode → coarse partition →
bucket-pair map_groups) on the bench corpus and prints Ray Data's own
per-operator stats — wall time, block counts, per-block sizes, task
distribution — so stage health is inspectable without instrumenting
the pipeline. Use after perf changes to confirm wall time sits in
useful compute (the Map operators) rather than scheduling or exchange
overhead.

Usage: python scripts/stage_stats.py [n_files]  (default 20000)
"""

from __future__ import annotations

import gc
import os
import sys

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.pipelines.neardup import sign_dataset
    from cloud_dedup_ray.sources.corpus import read_corpus
    from cloud_dedup_ray.stages.minhash_stage import (
        add_bucket_partition,
        emit_bucket_pairs,
        explode_bands,
    )
    from cloud_dedup_ray.stages.project import project_corpus

    cfg = DedupConfig()
    corpus_dir = write_corpus(
        f"/tmp/cdr_bench/n{n}", seed=42, n_files=n, n_repos=4, n_shards=64
    )
    # the same prep chain cluster_corpus_resumable._prep builds
    corpus = (
        project_corpus(
            read_corpus(corpus_dir),
            skip_hidden=cfg.skip_hidden,
            use_checksum=False,
            drop_content=False,
        )
        .filter(expr="is_symlink == False")
        .materialize()
    )
    print("=== stage: corpus scan + projection (no checksum) ===")
    print(corpus.stats())

    signed = sign_dataset(corpus, cfg).materialize()
    print("\n=== stage: MinHash signing (task-pool map_batches) ===")
    print(signed.stats())

    num_parts = 64
    pairs = (
        signed.map_batches(explode_bands, batch_format="pyarrow")
        .map_batches(add_bucket_partition(num_parts), batch_format="pyarrow")
        .groupby("__part")
        .map_groups(emit_bucket_pairs(cfg.bucket_pair_cap), batch_format="pyarrow")
        .materialize()
    )
    print("\n=== stage: LSH explode + partition + bucket-pair map_groups ===")
    print(pairs.stats())
    del corpus, signed, pairs
    gc.collect()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
