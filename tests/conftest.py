"""Test configuration: hermetic multi-device CPU JAX.

Tests run on a virtual 8-device CPU mesh (the TPU-world equivalent of a fake
backend) so they are deterministic and runnable anywhere; real-TPU execution
is exercised by bench.py and the driver's graft entry checks.
"""

import os

# Must be set before jax is imported anywhere.  Force-override: the shell
# environment pins JAX_PLATFORMS=axon (the tunneled real TPU), which is far
# too slow for per-op unit tests and not multi-device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The baked sitecustomize registers the tunneled 'axon' TPU backend and
# force-sets jax_platforms='axon,cpu' regardless of the env var; override
# it programmatically before any backend is instantiated.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
