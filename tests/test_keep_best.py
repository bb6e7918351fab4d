"""docs_dedup_keep_best on a synthetic corpus with real duplicate
groups (the shipped documents tables have none): case/whitespace
variants must collide on the normalized fingerprint and the
highest-quality variant must win, ties to min doc_id."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud_dedup_ray.functions.text import normalize, quality_features, quality_score
from cloud_dedup_ray.pipelines.textops import docs_dedup_keep_best


@pytest.fixture()
def dup_docs_dir(tmp_path):
    texts = [
        "The quick brown fox jumps over the lazy dog",   # 0
        "the quick   brown fox JUMPS over the lazy dog", # 1 same group
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG  ", # 2 same group
        "a completely different document about rivers",  # 3
        "a completely different document about rivers",  # 4 exact dup of 3
        "zzz qqq xxx",                                   # 5 singleton
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path), texts


def test_keep_best_groups_and_ranking(ray_session, dup_docs_dir):
    sf_dir, texts = dup_docs_dir
    out = docs_dedup_keep_best(sf_dir)

    assert sorted(out["n_copies"].tolist()) == [1, 2, 3]

    # the fox group: 3 variants, the winner is the max-quality one
    q = np.asarray(quality_score(quality_features(pa.array(texts))))
    fox_ids = [0, 1, 2]
    best_fox = min(fox_ids, key=lambda i: (-q[i], i))
    row3 = out[out["n_copies"] == 3].iloc[0]
    assert row3["best_doc_id"] == best_fox
    assert row3["best_quality"] == pytest.approx(q[best_fox])

    # exact duplicates tie on quality → min doc_id wins
    row2 = out[out["n_copies"] == 2].iloc[0]
    assert row2["best_doc_id"] == 3

    # fingerprints really are the normalized-text groups
    norm = normalize(pa.array(texts)).to_pylist()
    assert norm[0] == norm[1] == norm[2]
