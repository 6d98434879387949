"""Parity: fused Pallas Up-stage kernel vs the flax `Up` module.

The fused kernel (ops/fused_up.py) must reproduce models/vlg_head.py `Up`
(ConvTranspose -> split skip-concat conv -> GN -> ReLU -> conv -> GN ->
ReLU; reference model/decode_heads/vlg_head.py:116-137) exactly, so the
two decoder paths are checkpoint- and math-interchangeable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.models.vlg_head import Up
from semivl_tpu.ops.fused_up import fused_up_stage


def _run_pair(b, n, h, w, cin, up_c_skip, cout, dtype, seed=0):
    skip_c = up_c_skip
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b * n, h, w, cin), dtype)
    skip = jnp.asarray(rng.randn(b, 2 * h, 2 * w, skip_c), dtype)

    module = Up(cout, skip_c, dtype=dtype)
    variables = module.init(jax.random.PRNGKey(0), x, skip)
    # randomise GN affine + biases so the test is not identity-blind
    params = variables['params']
    params = jax.tree.map(
        lambda p: p + 0.1 * jnp.asarray(
            np.random.RandomState(1).randn(*p.shape), p.dtype), params)
    variables = {'params': params}

    ref = module.apply(variables, x, skip)

    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    skip_cf = jnp.transpose(skip, (0, 3, 1, 2))
    out_cf = fused_up_stage(x_cf, skip_cf, params, interpret=True)
    out = jnp.transpose(out_cf, (0, 2, 3, 1))
    return np.asarray(ref, np.float32), np.asarray(out, np.float32)


@pytest.mark.quick
def test_fused_up_matches_flax_fp32():
    # up2-like geometry at reduced size: 64ch -> 32ch, 16x16 -> 32x32
    ref, out = _run_pair(2, 3, 16, 16, 64, 16, 32, jnp.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.quick
def test_fused_up_matches_flax_up1_geometry():
    # up1-like: cin=128, skip 32, out 64
    ref, out = _run_pair(1, 2, 16, 16, 128, 32, 64, jnp.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.quick
def test_fused_up_group_size_follows_features_over_16():
    """cout=24: nn.GroupNorm(num_groups=24//16=1) normalises over ONE
    24-channel group — the kernel must derive the same grouping, not a
    hardcoded 16 (which would silently diverge)."""
    ref, out = _run_pair(1, 2, 16, 16, 64, 16, 24, jnp.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_up_matches_flax_bf16():
    ref, out = _run_pair(1, 2, 16, 16, 64, 16, 32, jnp.bfloat16)
    # bf16 rounding differs (flax casts conv output before GN either way);
    # tolerance covers accumulated bf16 ulps across two convs + 2 GNs
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.12)
    # and the bulk must agree tightly
    err = np.abs(out - ref)
    assert np.mean(err) < 0.01, np.mean(err)


@pytest.mark.quick
def test_fused_up_head_epilogue():
    """up2+head fusion: output equals flax Up -> 3x3 head conv."""
    import flax.linen as nn
    from semivl_tpu.ops.resize import resize  # noqa: F401 (parity dep)

    b, n, h, w, cin, cs, cout = 1, 3, 16, 16, 64, 16, 32
    rng = np.random.RandomState(3)
    dtype = jnp.float32
    x = jnp.asarray(rng.randn(b * n, h, w, cin), dtype)
    skip = jnp.asarray(rng.randn(b, 2 * h, 2 * w, cs), dtype)

    module = Up(cout, cs, dtype=dtype)
    variables = module.init(jax.random.PRNGKey(0), x, skip)
    params = variables['params']
    head = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name='head')
    hv = head.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 2 * h, 2 * w, cout), dtype))
    hp = jax.tree.map(
        lambda p: p + 0.2 * jnp.asarray(
            np.random.RandomState(5).randn(*p.shape), p.dtype),
        hv['params'])

    ref_mid = module.apply(variables, x, skip)
    ref = head.apply({'params': hp}, ref_mid)        # (P, 2h, 2w, 1)

    out_cf = fused_up_stage(
        jnp.transpose(x, (0, 3, 1, 2)), jnp.transpose(skip, (0, 3, 1, 2)),
        params, head_params=hp, interpret=True)      # (P, 1, 2h, 2w)
    out = jnp.transpose(out_cf, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.quick
def test_polyphase_composite_matches_tconv_conv1():
    """Round-3 groundwork: conv3x3(conv_transpose2x2(x)+bias) == the four
    composite 2x2 phase convs over the ones-augmented input, exactly
    (including zero-padding edges)."""
    from semivl_tpu.models.vlg_head import conv_transpose_2x2
    from semivl_tpu.ops.fused_up import polyphase_up_conv1_reference

    rng = np.random.RandomState(7)
    b, h, w, cin, u, cout = 2, 5, 6, 8, 12, 16
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    up_k = jnp.asarray(rng.randn(2, 2, cin, u), jnp.float32)
    up_b = jnp.asarray(rng.randn(u), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, u, cout), jnp.float32)

    t = conv_transpose_2x2(x, up_k, up_b)           # (b, 2h, 2w, u)
    ref = jax.lax.conv_general_dilated(
        t, k1, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    got = polyphase_up_conv1_reference(x, up_k, up_b, k1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
