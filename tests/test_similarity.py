"""Similarity search: ANN variants measured against the exact
brute-force baseline on the testdata embeddings table."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def truth():
    from cloud_dedup_ray.pipelines.similarity import emb_knn_bruteforce

    return emb_knn_bruteforce(SF, query_vec_id=0, k=10)


def test_bruteforce_topk_shape(truth):
    assert len(truth) == 10
    assert list(truth.columns) == ["vec_id", "cos_sim"]
    # descending similarity, query excluded
    assert truth["cos_sim"].is_monotonic_decreasing
    assert 0 not in set(truth["vec_id"])


def test_lsh_recall_vs_bruteforce(truth):
    from cloud_dedup_ray.pipelines.similarity import emb_knn_lsh

    # the synthetic embeddings are near-uniform (top-10 cosine ≈ 0.28),
    # so the hyperplane collision probability needs shallow tables:
    # p/table = (1 − θ/π)^planes ≈ 0.12 at 4 planes → ≥ 0.87 over 16.
    got = emb_knn_lsh(SF, query_vec_id=0, k=10, n_planes=4, n_tables=16)
    recall = len(set(got["vec_id"]) & set(truth["vec_id"])) / 10
    assert recall >= 0.7, f"LSH recall@10 too low: {recall}"


def test_ivf_recall_vs_bruteforce(truth):
    from cloud_dedup_ray.pipelines.similarity import emb_knn_ivf

    got = emb_knn_ivf(SF, query_vec_id=0, k=10, n_centroids=16, nprobe=4)
    recall = len(set(got["vec_id"]) & set(truth["vec_id"])) / 10
    assert recall >= 0.6, f"IVF recall@10 too low: {recall}"
    # results it does return must carry the exact cosine (re-rank is exact)
    merged = got.merge(truth, on="vec_id", suffixes=("_ivf", "_bf"))
    assert (merged["cos_sim_ivf"] == merged["cos_sim_bf"]).all()


def test_ivf_deterministic():
    from cloud_dedup_ray.pipelines.similarity import emb_knn_ivf

    a = emb_knn_ivf(SF, query_vec_id=3, k=5)
    b = emb_knn_ivf(SF, query_vec_id=3, k=5)
    assert a.equals(b)
