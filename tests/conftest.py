import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# THP madvise faults are pathologically slow on this VM (see
# whitebox_tools_ray/__init__.py) — pin numpy's hugepage madvise off in the
# test driver and every Ray worker.
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={"env_vars": {"NUMPY_MADVISE_HUGEPAGE": "0"}},
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
