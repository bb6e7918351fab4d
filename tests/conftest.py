import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic generated corpus table (in memory)."""
    from cloud_dedup_ray.datagen import generate_corpus

    return generate_corpus(seed=7, n_files=120, n_repos=3)


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    from cloud_dedup_ray.datagen import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), seed=7, n_files=120, n_repos=3, n_shards=4)
