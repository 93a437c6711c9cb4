"""Test configuration.

By default tests run on CPU with 8 virtual devices so the multi-chip
sharding paths can be exercised without TPU hardware.  Set
``ALIGNER_TEST_PLATFORM=tpu`` to run the TPU-marked tests against real
hardware instead.
"""

import os

_PLATFORM = os.environ.get("ALIGNER_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if _PLATFORM != "tpu":
        skip = pytest.mark.skip(reason="requires ALIGNER_TEST_PLATFORM=tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
