import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: tests own
    the session, library code never calls ray.init/shutdown)."""
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
def fixture_corpus():
    """The deterministic span-doc fixture corpus (FIXTURES.md §3)."""
    from knowledge_graph_construction_ray.fixtures import generate_corpus

    return generate_corpus()


@pytest.fixture(scope="session")
def oracle_graph(fixture_corpus):
    """Reference-semantics oracle output over the fixture corpus."""
    from knowledge_graph_construction_ray.oracle import GraphOracle

    return GraphOracle().build_from_docs(fixture_corpus.to_pylist())
