"""Test config: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on the host mesh per the build plan
(SURVEY.md §4). The axon TPU plugin registers itself at interpreter startup
(sitecustomize) and pins jax_platforms to "axon,cpu"; overriding the config
here — before any backend is initialized — keeps tests on fast local CPU and
avoids the ~60 s remote-tunnel backend bring-up per process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
