import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus200():
    from pboh_entity_linking_ray.sources.synthetic import generate_corpus

    return generate_corpus(200, 42)


@pytest.fixture(scope="session")
def linkage200(corpus200, ray_session):
    """Run the flagship pipeline once per session; several tests share it."""
    import ray.data as rd

    from pboh_entity_linking_ray.pipelines.linkage import run_linkage

    res = run_linkage(rd.from_arrow(corpus200.turns))
    res.scored = res.scored.materialize()
    res.clusters = res.clusters.materialize()
    return res
