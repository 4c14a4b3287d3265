"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on CPU exactly the way the driver's dryrun
does it: XLA_FLAGS=--xla_force_host_platform_device_count=8.

Note: this image's sitecustomize registers the axon TPU PJRT plugin and
imports jax at interpreter startup, so JAX_PLATFORMS env tweaks are too
late — the platform must be switched through jax.config, and XLA_FLAGS must
be set before the CPU backend first initializes (it is lazy, so here works).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
