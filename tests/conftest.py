"""Test configuration: run JAX on a virtual 8-device CPU backend.

This is the TPU-world equivalent of the reference's (absent) multi-node test
harness: all sharding/collective logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §4).
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The machine's sitecustomize registers the axon TPU backend and overrides
# JAX_PLATFORMS; force the CPU backend through jax.config (must happen before
# first backend use).
jax.config.update('jax_platforms', 'cpu')

# Parity tests compare against float32 PyTorch references; run all matmuls at
# full precision under test. Production kernels choose their own dtype
# (bfloat16 on TPU) explicitly via module `dtype` fields.
jax.config.update('jax_default_matmul_precision', 'highest')

# Persist CPU-compiled executables across pytest invocations (single-core
# host: model compiles dominate test wall-time; a warm cache makes the
# `-m quick` slice sub-minute).
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_tests')
os.makedirs(_cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)


def pytest_configure(config):
    assert jax.devices()[0].platform == 'cpu', jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


def pytest_collection_modifyitems(config, items):
    """Every test without an explicit ``slow`` marker is ``quick``:
    ``pytest -m quick`` is the sub-minute smoke slice on this single-core
    host (the full suite takes ~23 min, dominated by full-model compiles)."""
    for item in items:
        if item.get_closest_marker('slow') is None:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
