import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local mode, 4 CPUs)."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        # hash-join aggregator actors cost 0.125 CPU EACH; uncapped
        # (min_parallelism) pools reserve all 4 CPUs of this fixture and
        # deadlock the upstream map tasks — cap to half the cluster
        # (see stages/joins._cap_shuffle_aggregators)
        ctx.max_hash_shuffle_aggregators = 8
    except Exception:
        pass
    yield
    ray.shutdown()
