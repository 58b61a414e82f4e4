"""Test configuration: run the suite on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel), which would serialize the whole suite on one chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache keeps repeat runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (it wins over env vars), which would put every test on the single
# remote TPU. Counter-update before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_TESTDATA = pathlib.Path("/root/reference/testdata")


@pytest.fixture(scope="session")
def testdata():
    if not REFERENCE_TESTDATA.is_dir():
        pytest.skip("reference testdata not available")
    return REFERENCE_TESTDATA
