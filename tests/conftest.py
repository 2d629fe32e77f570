import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    # the streaming executor does NOT preserve block order by default;
    # several tests assert positionally on to_pandas() output, which is
    # only deterministic with preserve_order (flaked under CPU contention)
    ctx.execution_options.preserve_order = True
    yield
    ray.shutdown()
