import json
import os

import pytest

FIXTURE_DIR = "/root/reference/test/fixtures"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


def load_fixture(name: str):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture corpus not available: {name}")
    with open(path) as f:
        return json.load(f)


@pytest.fixture
def fixtures():
    return load_fixture
