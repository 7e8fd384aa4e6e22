import json
import os

import pytest

# Vendored copy of the reference conformance corpus (ISC-licensed, see
# tests/fixtures/LICENSE) so a standalone checkout keeps its correctness bar.
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


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
        pytest.fail(f"vendored fixture corpus missing: {name} (tests/fixtures/)")
    with open(path) as f:
        return json.load(f)


@pytest.fixture
def fixtures():
    return load_fixture
