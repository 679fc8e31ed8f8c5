"""Test config: run on a virtual 8-device CPU mesh.

The container pre-imports jax with the TPU backend registered (sitecustomize),
so plain env vars are too late — switch platforms through jax.config before
any backend is initialized.  The CPU backend doubles as our "WARP software
rasterizer" analogue (BASELINE.json configs[0]) and the 8 virtual devices let
sharding tests validate multi-chip layouts without real chips.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
