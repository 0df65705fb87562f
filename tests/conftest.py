"""Test config: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding paths are exercised on the host mesh per the build plan
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
