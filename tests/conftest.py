"""Test configuration: 8 virtual CPU devices + x64 for SBCL-parity math.

The multi-chip tests simulate a TPU slice with
``--xla_force_host_platform_device_count=8`` on CPU (SURVEY §4's rebuild
test strategy); x64 is enabled because the parity target is 1e-8 in
log-likelihood against the double-float reference.
"""

import os

# Force CPU even when the environment pre-registers a TPU platform (the
# axon sitecustomize sets JAX_PLATFORMS=axon before conftest runs, so the
# env var alone is not enough — jax.config wins after import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


REFERENCE_DATA = "/root/reference/example-data.xls"


@pytest.fixture
def example_table():
    from lisp_mcmc_tpu.io import read_file_data

    if not os.path.exists(REFERENCE_DATA):
        pytest.skip("reference example data not available")
    return read_file_data(REFERENCE_DATA)
