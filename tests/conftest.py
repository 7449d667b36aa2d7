"""Test configuration.

The reference runs GoogleTest per-op executables via ctest
(cmake/gtest.cmake:15-19).  Here: pytest on a CPU backend with 8 virtual
devices (``--xla_force_host_platform_device_count=8``) so the distributed
layer is exercised without a TPU pod — the fake-backend mechanism SURVEY §4
calls for.  Pallas kernels run in interpret mode on CPU automatically
(simplemath_tpu.config).  x64 is enabled so float64/int64 oracle tests run
natively (TPU-side, those dtypes take the XLA path).

This environment preloads the TPU tunnel plugin via sitecustomize and pins
``JAX_PLATFORMS=axon``; jax is already imported by the time conftest runs,
so the backend must be forced through ``jax.config`` — env vars are latched.

Set SM_TEST_BACKEND=tpu to run the suite on the real chip instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("SM_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
