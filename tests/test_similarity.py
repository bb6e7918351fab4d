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


def test_exact_probe_modes_equal_bruteforce(truth):
    """The driver-checked parameterizations: probing EVERY index
    partition (LSH probe_all / IVF nprobe = n_centroids) must
    reproduce the brute-force top-k exactly — same ids, same cos_sim,
    same order — which is what lets the brute-force SQL twin serve as
    their full hash oracle."""
    import pandas.testing as pdt

    from cloud_dedup_ray.pipelines.similarity import emb_knn_ivf, emb_knn_lsh

    lsh = emb_knn_lsh(SF, query_vec_id=0, k=10, probe_all=True)
    ivf = emb_knn_ivf(SF, query_vec_id=0, k=10, n_centroids=16, nprobe=16)
    pdt.assert_frame_equal(lsh, truth)
    pdt.assert_frame_equal(ivf, truth)


def test_neardup_pairs_exact_vs_bruteforce():
    """Blocked/pruned emb_neardup_pairs must equal the full O(n²)
    matmul result exactly (pruning is a bound, never a heuristic)."""
    import numpy as np
    import pandas as pd

    from cloud_dedup_ray.pipelines.similarity import emb_neardup_pairs

    got = emb_neardup_pairs(SF, block_rows=64)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (m / norms) @ (m / norms).T
    ii, jj = np.nonzero(np.triu(sims, k=1) >= 0.38)
    a, b = ids[ii], ids[jj]
    truth = sorted(
        (min(x, y), max(x, y), round(s, 4))
        for x, y, s in zip(a, b, sims[ii, jj])
    )
    assert list(got.itertuples(index=False, name=None)) == truth


def test_neardup_pairs_cone_pruning_fires(tmp_path):
    """On angularly-clustered data the LSH sort + bounding-cone bound
    must actually prune cross-cluster block pairs (and stay exact)."""
    import numpy as np
    import pandas as pd

    from cloud_dedup_ray.pipelines.similarity import emb_neardup_pairs

    rng = np.random.RandomState(0)
    dim, per = 32, 300
    centers = rng.normal(size=(4, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.concatenate(
        [c + 0.05 * rng.normal(size=(per, dim)) for c in centers]
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": list(vecs.astype(np.float32))}
    )
    df.to_parquet(tmp_path / "embeddings.parquet")
    metrics = {}
    got = emb_neardup_pairs(
        str(tmp_path), threshold=0.9, block_rows=100, metrics_out=metrics
    )
    assert metrics["n_block_pairs_pruned"] > 0, metrics
    # exactness on the clustered corpus too
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = (vecs / norms) @ (vecs / norms).T
    n_truth = int((np.triu(sims, k=1) >= 0.9).sum())
    assert len(got) == n_truth


def test_cone_pruned_block_pairs_hierarchical_matches_flat():
    """The two-level (group-cone) enumeration must return EXACTLY the
    block pairs the flat per-block bound keeps (the group bound provably
    dominates the member-block bound), while evaluating far fewer
    block-level bounds than B(B+1)/2 on angularly clustered cones."""
    import numpy as np

    from cloud_dedup_ray.pipelines.similarity import _cone_pruned_block_pairs

    rng = np.random.RandomState(1)
    dim, n_clusters, per = 16, 8, 40  # 320 blocks
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cents = np.concatenate(
        [c + 0.03 * rng.normal(size=(per, dim)) for c in centers]
    )
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    radii = rng.uniform(0.01, 0.05, size=len(cents))
    threshold = 0.9

    bi, bj, n_enum = _cone_pruned_block_pairs(cents, radii, threshold, 16)

    theta = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))
    best = np.cos(np.maximum(0.0, theta - radii[:, None] - radii[None, :]))
    fi, fj = np.triu_indices(len(cents))
    flat_live = best[fi, fj] >= threshold
    expected = set(zip(fi[flat_live].tolist(), fj[flat_live].tolist()))
    assert set(zip(bi.tolist(), bj.tolist())) == expected
    total = len(cents) * (len(cents) + 1) // 2
    # groups straddling cluster boundaries inflate their covering radius,
    # so demand a solid but not extreme reduction here; real LSH-sorted
    # runs are angularly coherent and prune much harder
    assert n_enum < total / 2, (n_enum, total)


def test_neardup_pairs_empty_table(tmp_path):
    import pandas as pd

    from cloud_dedup_ray.pipelines.similarity import emb_neardup_pairs

    pd.DataFrame(
        {"vec_id": pd.Series(dtype="int64"), "embedding": pd.Series(dtype=object)}
    ).to_parquet(tmp_path / "embeddings.parquet")
    got = emb_neardup_pairs(str(tmp_path))
    assert list(got.columns) == ["vec_a", "vec_b", "cos_sim"]
    assert len(got) == 0


def test_neardup_pairs_multi_group(tmp_path):
    """group_size smaller than the block count exercises the multi-group
    hierarchy end-to-end; the result must stay exact."""
    import numpy as np
    import pandas as pd

    from cloud_dedup_ray.pipelines.similarity import emb_neardup_pairs

    rng = np.random.RandomState(2)
    dim, per = 24, 200
    centers = rng.normal(size=(6, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.concatenate(
        [c + 0.04 * rng.normal(size=(per, dim)) for c in centers]
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": list(vecs.astype(np.float32))}
    )
    df.to_parquet(tmp_path / "embeddings.parquet")
    metrics = {}
    got = emb_neardup_pairs(
        str(tmp_path), threshold=0.9, block_rows=50, group_size=4,
        metrics_out=metrics,
    )
    assert metrics["n_blocks"] > 8
    # at this tiny scale boundary-straddling groups can defeat the
    # group-level bound, but the block-level bound must still prune
    # (the hierarchy-reduction property itself is unit-tested above)
    assert metrics["n_block_pairs_enumerated"] <= metrics["n_block_pairs_total"]
    assert metrics["n_block_pairs_pruned"] > 0
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = (vecs / norms) @ (vecs / norms).T
    n_truth = int((np.triu(sims, k=1) >= 0.9).sum())
    assert len(got) == n_truth


def _write_clustered_emb(tmp_path, n=1200, dim=16, n_clusters=6, seed=3):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.concatenate(
        [c + 0.15 * rng.normal(size=(n // n_clusters, dim)) for c in centers]
    )
    pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": list(vecs.astype(np.float32))}
    ).to_parquet(tmp_path / "embeddings.parquet")
    return vecs


def test_lsh_partitioned_index_reads_scale_with_probes(tmp_path):
    """The LSH scale path must read only the query's probed
    table=T/bucket=B partitions: candidate rows and bytes read are a
    strict fraction of the corpus/index, and the returned sims are the
    exact cosines."""
    import numpy as np

    from cloud_dedup_ray.pipelines.similarity import (
        _ann_cache_dir,
        _probe_partition_stats,
        emb_knn_lsh,
    )

    vecs = _write_clustered_emb(tmp_path)
    m = {}
    got = emb_knn_lsh(
        str(tmp_path), query_vec_id=5, k=10, n_planes=6, n_tables=3,
        metrics_out=m,
    )
    assert len(got) == 10
    assert 0 < m["n_candidate_rows"] < len(vecs), m
    idx = _ann_cache_dir(str(tmp_path), "lsh", [6, 3, 1000])
    whole_index = _probe_partition_stats([idx])["n_probed_bytes"]
    assert 0 < m["n_probed_bytes"] < whole_index, m
    assert 1 <= m["n_probed_partitions"] <= 3
    # re-rank is exact: returned sims equal the true cosines
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    true = vn @ vn[5]
    for vid, cs in zip(got["vec_id"], got["cos_sim"]):
        assert abs(cs - true[vid]) < 5e-4
    assert 5 not in set(got["vec_id"])


def test_ivf_partitioned_index_reads_scale_with_probes(tmp_path):
    """The IVF scale path must read only the nprobe nearest cent=C
    partitions."""
    import numpy as np

    from cloud_dedup_ray.pipelines.similarity import emb_knn_ivf

    vecs = _write_clustered_emb(tmp_path)
    m = {}
    got = emb_knn_ivf(
        str(tmp_path), query_vec_id=5, k=10, n_centroids=8, nprobe=2,
        metrics_out=m,
    )
    assert len(got) == 10
    assert m["n_probed_partitions"] == 2
    assert 0 < m["n_candidate_rows"] < len(vecs), m
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    true = vn @ vn[5]
    for vid, cs in zip(got["vec_id"], got["cos_sim"]):
        assert abs(cs - true[vid]) < 5e-4


def test_lsh_index_cache_reused_and_invalidated(tmp_path):
    """Second query must reuse the built index; touching the source
    file must key a NEW index dir (no stale reuse)."""
    import os
    import time

    from cloud_dedup_ray.pipelines.similarity import _ann_cache_dir

    _write_clustered_emb(tmp_path)
    d1 = _ann_cache_dir(str(tmp_path), "lsh", [6, 3, 1000])
    src = tmp_path / "embeddings.parquet"
    os.utime(src, ns=(time.time_ns(), time.time_ns()))
    d2 = _ann_cache_dir(str(tmp_path), "lsh", [6, 3, 1000])
    assert d1 != d2
    # param change also re-keys
    d3 = _ann_cache_dir(str(tmp_path), "lsh", [5, 3, 1000])
    assert d3 != d2
