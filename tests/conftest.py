import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
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
def small_corpus(tmp_path_factory):
    """Deterministic 300-doc interleaved corpus + aliases + goldens."""
    from fancyrag_ray.fixtures import generate_corpus, write_corpus

    corpus = generate_corpus(n_docs=300, seed=42)
    out = tmp_path_factory.mktemp("corpus")
    paths = write_corpus(corpus, str(out))
    return corpus, paths
