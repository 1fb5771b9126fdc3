"""Test configuration: force an 8-virtual-device CPU backend.

This is the TPU analog of "test multi-node without a cluster" (SURVEY.md §4):
every test sees 8 XLA CPU devices, so mesh/sharding tests exercise real
collectives without hardware.  Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize pre-imports jax and pins the experimental "axon"
# TPU-tunnel platform; override it after the fact (backends are lazy, so this
# is still safe here).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(__file__), "fixtures")
