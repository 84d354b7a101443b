"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Bench/production runs on real TPU; tests must be hermetic and exercise the
multi-device sharding paths, so we force the CPU platform with 8 virtual
devices BEFORE jax initializes.
"""

import os

# force CPU even though the ambient environment sets JAX_PLATFORMS=axon
# (the real TPU tunnel): tests must be hermetic and deterministic
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep math deterministic-ish and quiet
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("TERMDAW_COLOR", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
