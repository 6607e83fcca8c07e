import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_index(ray_session, tmp_path_factory):
    """Index built once from the tiny fixture corpus; shared by query tests."""
    import ray.data as rd

    from search_engine_ray.config import IndexBuildConfig
    from search_engine_ray.corpus import tiny_fixture_pages
    from search_engine_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("idx") / "tiny")
    build_index(rd.from_arrow(tiny_fixture_pages()), index_dir,
                IndexBuildConfig(num_partitions=3, block_size=4))
    return index_dir
