"""Polyphase decoder algebra: phase-separated stage/chain references must
equal the flax Up/Up/head path exactly (fp32).

This is the oracle layer for the fused Pallas decoder (ops/fused_decoder):
the kernels execute the same tap lists, so their parity reduces to this.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.models.vlg_head import Up
from semivl_tpu.ops.polyphase import (
    chain_reference,
    from_phases,
    stage_reference,
    to_phases,
)


def _init_up(cin, cs, cout, h, w, b, seed):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    skip = jnp.asarray(rng.randn(1, 2 * h, 2 * w, cs), jnp.float32)
    module = Up(cout, cs, dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), x, skip)['params']
    params = jax.tree.map(
        lambda p: p + 0.1 * jnp.asarray(
            np.random.RandomState(seed + 1).randn(*p.shape), p.dtype),
        params)
    return module, params, x, skip


@pytest.mark.quick
def test_to_from_phases_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 3, 16, 16), jnp.float32)
    for level in (0, 1, 2):
        ph = to_phases(x, level)
        assert ph.shape[1] == 4 ** level
        np.testing.assert_array_equal(np.asarray(from_phases(ph, level)),
                                      np.asarray(x))


@pytest.mark.quick
def test_phase_extraction_semantics(rng):
    """Phase (vy, vx) must be the stride-2^L slice [vy::2^L, vx::2^L]."""
    x = jnp.asarray(rng.randn(1, 2, 8, 8), jnp.float32)
    ph = to_phases(x, 1)
    for vy in range(2):
        for vx in range(2):
            np.testing.assert_array_equal(
                np.asarray(ph[0, vy * 2 + vx]),
                np.asarray(x[0, :, vy::2, vx::2]))


@pytest.mark.quick
def test_stage_reference_matches_flax_up_level1():
    b, n, h, w, cin, cs, cout = 1, 3, 8, 8, 24, 16, 32
    module, params, x, skip = _init_up(cin, cs, cout, h, w, b * n, 0)
    ref = module.apply({'params': params}, x, skip)     # (P, 2h, 2w, Cout)

    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    skip_cf = jnp.transpose(skip, (0, 3, 1, 2))
    skip_ph = to_phases(skip_cf, 1)
    out_ph = stage_reference(x_cf[:, None], skip_ph, params, 1)
    out = from_phases(out_ph, 1)                        # (P, Cout, 2h, 2w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.transpose(ref, (0, 3, 1, 2))),
        rtol=2e-5, atol=2e-5)


@pytest.mark.quick
def test_stage_reference_matches_flax_up_level2():
    """Stage 2: input arrives phase-separated (level 1), output level 2."""
    b, h, w, cin, cs, cout = 2, 8, 8, 24, 16, 32
    module, params, x, skip = _init_up(cin, cs, cout, 2 * h, 2 * w, b, 3)
    # x lives on the 2h x 2w grid = level-1 fine grid over an h x w base
    ref = module.apply({'params': params}, x, skip)     # (B, 4h, 4w, Cout)

    x_ph = to_phases(jnp.transpose(x, (0, 3, 1, 2)), 1)
    skip_ph = to_phases(jnp.transpose(skip, (0, 3, 1, 2)), 2)
    out_ph = stage_reference(x_ph, skip_ph, params, 2)
    out = from_phases(out_ph, 2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.transpose(ref, (0, 3, 1, 2))),
        rtol=3e-5, atol=3e-5)


@pytest.mark.quick
def test_stage_reference_odd_base_grid():
    """Cityscapes-style non-power-of-two base (h=w=5): the phase algebra
    must hold for any base size (the Pallas gates only constrain VMEM)."""
    module, params, x, skip = _init_up(24, 16, 32, 5, 5, 2, 9)
    ref = module.apply({'params': params}, x, skip)
    out_ph = stage_reference(
        jnp.transpose(x, (0, 3, 1, 2))[:, None],
        to_phases(jnp.transpose(skip, (0, 3, 1, 2)), 1), params, 1)
    np.testing.assert_allclose(
        np.asarray(from_phases(out_ph, 1)),
        np.asarray(jnp.transpose(ref, (0, 3, 1, 2))), rtol=2e-5, atol=2e-5)


@pytest.mark.quick
def test_chain_reference_matches_flax_chain():
    """up1 -> up2 -> head, all phase-separated, equals the interleaved
    flax chain (the production XLA decoder tail)."""
    b, n, h, w = 1, 2, 8, 8
    cin, cs1, cout1, cs2, cout2 = 24, 16, 32, 16, 16
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(b * n, h, w, cin), jnp.float32)
    skip1 = jnp.asarray(rng.randn(b, 2 * h, 2 * w, cs1), jnp.float32)
    skip2 = jnp.asarray(rng.randn(b, 4 * h, 4 * w, cs2), jnp.float32)

    up1 = Up(cout1, cs1, dtype=jnp.float32)
    p1 = up1.init(jax.random.PRNGKey(0), x, skip1)['params']
    mid = up1.apply({'params': p1}, x, skip1)
    up2 = Up(cout2, cs2, dtype=jnp.float32)
    p2 = up2.init(jax.random.PRNGKey(1), mid, skip2)['params']
    out_mid = up2.apply({'params': p2}, mid, skip2)
    head = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name='head')
    hv = head.init(jax.random.PRNGKey(2), out_mid)['params']
    hv = jax.tree.map(
        lambda p: p + 0.2 * jnp.asarray(
            np.random.RandomState(5).randn(*p.shape), p.dtype), hv)
    ref = head.apply({'params': hv}, out_mid)           # (P, 4h, 4w, 1)

    # skips are per image (B) but phases index per plane (P = B*N):
    # broadcast to planes as the kernel's index_map p // n does
    s1_ph = jnp.repeat(to_phases(jnp.transpose(skip1, (0, 3, 1, 2)), 1),
                       n, axis=0)
    s2_ph = jnp.repeat(to_phases(jnp.transpose(skip2, (0, 3, 1, 2)), 2),
                       n, axis=0)
    ho_ph = chain_reference(jnp.transpose(x, (0, 3, 1, 2)),
                            s1_ph, s2_ph, p1, p2, hv)
    ho = from_phases(ho_ph, 2)                          # (P, 1, 4h, 4w)
    np.testing.assert_allclose(
        np.asarray(ho), np.asarray(jnp.transpose(ref, (0, 3, 1, 2))),
        rtol=1e-4, atol=1e-4)
