import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import.
# force CPU: the ambient axon sitecustomize force-registers the tunneled TPU
# at interpreter start (ignoring JAX_PLATFORMS env), which makes every test
# pay remote-compile latency.  Override post-import via jax.config.
# DDCMD_TEST_TPU=1 keeps the TPU for on-hardware checks.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

if not os.environ.get("DDCMD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# make f64 *available* for physics-validation tests (compute dtype is still
# chosen explicitly per test; production default stays f32)
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
WATERBOX = REFERENCE / "examples" / "waterbox"


@pytest.fixture(scope="session")
def waterbox_dir():
    if not WATERBOX.exists():
        pytest.skip("reference waterbox example not mounted")
    return WATERBOX
