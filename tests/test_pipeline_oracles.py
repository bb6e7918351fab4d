"""The driver-facing pure-Python pipeline oracles
(cloud_dedup_ray/oracle/pipeline_oracles.py) must agree EXACTLY with
the Ray pipelines on the real testdata tables — these are the frames
the read_parquet SQL twins hash-compare against."""

import pandas.testing as pdt

SF = "/root/testdata/sf0.001"


def test_cdc_oracle_matches_pipeline(ray_session):
    from cloud_dedup_ray.oracle.pipeline_oracles import oracle_cdc_dedup
    from cloud_dedup_ray.pipelines.textops import docs_cdc_dedup

    pdt.assert_frame_equal(oracle_cdc_dedup(SF), docs_cdc_dedup(SF))


def test_hll_oracle_matches_pipeline(ray_session):
    from cloud_dedup_ray.oracle.pipeline_oracles import (
        oracle_hll_tokens_by_lang,
    )
    from cloud_dedup_ray.pipelines.textops import docs_hll_tokens_by_lang

    pdt.assert_frame_equal(
        oracle_hll_tokens_by_lang(SF), docs_hll_tokens_by_lang(SF)
    )


def test_minhash_clusters_oracle_matches_pipeline(ray_session):
    """The scalar-loop rerun of the whole near-dup tier (normalize →
    shingle → OPH sign+densify → band/bucket keys → capped pairing →
    estimate/exact hybrid verify → min-label components) must reproduce
    the Ray pipeline's cluster assignment exactly."""
    from cloud_dedup_ray.oracle.pipeline_oracles import (
        oracle_minhash_clusters,
    )
    from cloud_dedup_ray.pipelines.textops import docs_minhash_clusters

    got = docs_minhash_clusters(SF)
    want = oracle_minhash_clusters(SF)
    pdt.assert_frame_equal(want, got)
    # the corpus must actually exercise the clustering (non-trivial)
    assert (want["cluster_id"] != want["doc_id"]).any()


def test_nd_cluster_assignments_oracle_matches_pipeline(ray_session, tmp_path):
    """The FULL near-dup tier — LSH plus the suffix-array containment
    pass (anchor blocking, cluster-rep collapse, ratio prune, signature
    screen, substring verify) — reproduced per-document in pure Python
    must equal the Ray pipeline's assignment on a small deterministic
    corpus."""
    import ray

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.datagen import write_corpus
    from cloud_dedup_ray.oracle.pipeline_oracles import (
        oracle_nd_cluster_assignments,
    )
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus
    from cloud_dedup_ray.sources.corpus import read_corpus
    from cloud_dedup_ray.stages.project import project_corpus

    corpus_dir = write_corpus(
        str(tmp_path / "c"), seed=7, n_files=120, n_repos=2, n_shards=4
    )
    corpus = (
        project_corpus(read_corpus(corpus_dir), drop_content=False)
        .filter(expr="is_symlink == False")
        .materialize()
    )
    got = (
        cluster_corpus(corpus, DedupConfig())
        .assignments.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = oracle_nd_cluster_assignments(corpus_dir)
    pdt.assert_frame_equal(want, got)
    assert (want["cluster_id"] != want["doc_id"]).any()
