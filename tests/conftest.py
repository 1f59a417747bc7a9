import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver requirement)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_path(tmp_path_factory):
    """Deterministic tiny synthetic corpus parquet (FIXTURES.md F1 'tiny')."""
    from poseidon_ray.sources.fixtures import write_corpus

    out = tmp_path_factory.mktemp("corpus") / "tiny.parquet"
    write_corpus(str(out), n_rows=200, seed=42)
    return str(out)


@pytest.fixture(scope="session")
def small_corpus_path(tmp_path_factory):
    from poseidon_ray.sources.fixtures import write_corpus

    out = tmp_path_factory.mktemp("corpus_small") / "small.parquet"
    write_corpus(str(out), n_rows=1200, seed=42)
    return str(out)


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
