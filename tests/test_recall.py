"""Recall gate: LSH clustering must recover ≥0.99 of true dup pairs
(exact-Jaccard ground truth at identical shingle/num-perm/band config)."""

import pytest
import ray.data

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.text import normalize
from cloud_dedup_ray.pipelines.neardup import cluster_corpus
from cloud_dedup_ray.pipelines.recall import pair_recall, true_dup_pairs
from cloud_dedup_ray.stages.project import project_corpus


@pytest.mark.parametrize("seed", [7, 21])
def test_dup_pair_recall_ge_099(seed):
    from cloud_dedup_ray.datagen import generate_corpus

    table = generate_corpus(seed=seed, n_files=200, n_repos=3)
    ds = ray.data.from_arrow(table)
    corpus = (
        project_corpus(ds, drop_content=False)
        .filter(expr="is_symlink == False")
        .materialize()
    )
    cfg = DedupConfig()
    res = cluster_corpus(corpus, cfg)
    assignments = {
        r["doc_id"]: r["cluster_id"] for r in res.assignments.take_all()
    }

    docs = {
        r["doc_id"]: normalize(__import__("pyarrow").array([r["content"]]))[0].as_py()
        for r in corpus.select_columns(["doc_id", "content"]).take_all()
    }
    truth = true_dup_pairs(docs, cfg)
    assert len(truth) > 20, "fixture should plant a dense pair population"
    recall, found, total = pair_recall(assignments, truth)
    assert recall >= 0.99, f"recall {recall:.4f} ({found}/{total})"
