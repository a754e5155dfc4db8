"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from palimpzest_ray import quiet

    quiet()
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_lake(tmp_path):
    return str(tmp_path / "lake")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: sustained soak tests (minutes, full suite only)"
    )
