"""Test configuration: run JAX on a virtual 8-device CPU backend.

This is the TPU-world equivalent of the reference's (absent) multi-node test
harness: all sharding/collective logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §4).
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
