"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the reference has no simulated multi-node
harness at all — see SURVEY.md §4.4). Set GSPLAT_TEST_TPU=1 to run on real
devices instead.
"""

import os

if not os.environ.get("GSPLAT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # Env-var JAX_PLATFORMS is overridden by the TPU plugin in this image;
    # the config update is authoritative.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
