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
        # hash-join aggregator pools reserve 0.125 CPU × num_partitions
        # REGARDLESS of actor count — joins.shuffle_hash_join clamps P to
        # 2×CPUs (see stages/joins._clamp_join_partitions); the actor-count
        # cap here is belt-and-braces against pathological actor spread.
        ctx.max_hash_shuffle_aggregators = 8
    except Exception:
        pass
    yield
    ray.shutdown()
