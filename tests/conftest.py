import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic tiny synthetic source-code corpus (64 rows / 4
    partitions) + expected-stats sidecar. Session-scoped: built once."""
    from sotohp_ray.sources.corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_tiny")
    meta = generate_corpus(str(root), preset="tiny")
    return str(root), meta


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    from sotohp_ray.sources.corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_small")
    meta = generate_corpus(str(root), preset="small")
    return str(root), meta
