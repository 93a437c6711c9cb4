"""Test configuration.

By default tests run on CPU with 8 virtual devices so the multi-chip
sharding paths can be exercised without TPU hardware, and with x64 enabled
so device engines can be compared bit-for-bit with the float64 oracle.
Set ``ALIGNER_TEST_PLATFORM=tpu`` to run the TPU-marked tests against real
hardware instead.

Note: the environment may pre-register an external TPU platform plugin
that overrides ``JAX_PLATFORMS`` from the environment, so the platform is
forced via ``jax.config`` *after* import.
"""

import os

_PLATFORM = os.environ.get("ALIGNER_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

os.makedirs(os.path.expanduser("~/.cache/jax-aligner"), exist_ok=True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax-aligner")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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
