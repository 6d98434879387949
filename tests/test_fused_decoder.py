"""Fused polyphase decoder kernels vs the exact XLA phase references.

``fused_stage`` runs in interpret mode on CPU with float32 storage so any
mismatch is an algebra bug, not rounding; a separate bf16 test covers the
production storage dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.models.vlg_head import Up
from semivl_tpu.ops.fused_decoder import fused_stage, make_geometry
from semivl_tpu.ops.polyphase import stage_reference, to_phases


def _setup(b, n, h, w, cin, cs, cout, seed, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    p = b * n
    x = jnp.asarray(rng.randn(p, cin, h, w), dtype)
    skip_ph = jnp.asarray(rng.randn(b, 4, cs, h, w), dtype)
    module = Up(cout, cs, dtype=dtype)
    params = module.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, h, w, cin), dtype),
        jnp.zeros((1, 2 * h, 2 * w, cs), dtype))['params']
    params = jax.tree.map(
        lambda q: q + 0.1 * jnp.asarray(
            np.random.RandomState(seed + 1).randn(*q.shape), q.dtype),
        params)
    return x, skip_ph, params


@pytest.mark.quick
def test_geometry():
    g = make_geometry(32, 32)
    assert (g.ws, g.nc, g.aligns) == (32, 4, (0, 1, 3))
    g = make_geometry(64, 64)
    assert (g.ws, g.nc, g.aligns) == (64, 2, (0, 1))
    g = make_geometry(51, 51)
    assert (g.ws, g.nc, g.aligns) == (64, 2, (0, 1))
    assert not g.masked
    g = make_geometry(102, 102)
    assert (g.ws, g.nc, g.aligns) == (128, 1, (0,))


@pytest.mark.quick
def test_fused_stage_matches_reference():
    x, skip_ph, params = _setup(1, 2, 8, 8, 24, 16, 32, seed=1)
    ref = stage_reference(x[:, None], skip_ph, params, 1)
    out = fused_stage(x, skip_ph, params, interpret=True,
                      storage=jnp.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.quick
def test_fused_stage_head_epilogue():
    x, skip_ph, params = _setup(2, 1, 8, 8, 24, 16, 32, seed=7)
    rng = np.random.RandomState(8)
    head = {'kernel': jnp.asarray(rng.randn(3, 3, 32, 1), jnp.float32),
            'bias': jnp.asarray(rng.randn(1), jnp.float32)}
    _, ref = stage_reference(x[:, None], skip_ph, params, 1,
                             head_params=head)
    out = fused_stage(x, skip_ph, params, head_params=head, interpret=True,
                      storage=jnp.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_fused_stage_odd_width():
    """Cityscapes-style base (h=w=13 -> ws=16 > w): pad-column masks at
    stores, zero-pad col reads instead of wrap masks."""
    x, skip_ph, params = _setup(1, 2, 13, 13, 24, 16, 32, seed=11)
    ref = stage_reference(x[:, None], skip_ph, params, 1)
    out = fused_stage(x, skip_ph, params, interpret=True,
                      storage=jnp.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.quick
def test_fused_stage_bf16_storage():
    """Production storage dtype: bf16 planes, fp32 accumulation/stats."""
    x, skip_ph, params = _setup(1, 2, 8, 8, 24, 16, 32, seed=3)
    ref = stage_reference(x[:, None], skip_ph, params, 1)
    out = fused_stage(x, skip_ph, params, interpret=True)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert np.mean(err) < 0.02, np.mean(err)


def _chain_setup(seed=21, dtype=jnp.float32):
    """Random chain: up1(24->32, skip 16) -> up2(32->16? ...) -> head."""
    import flax.linen as nn
    b, n, h, w = 1, 2, 8, 8
    cin, cs1, cout1, cs2, cout2 = 24, 16, 32, 16, 16
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b * n, cin, h, w), dtype)
    skip1 = jnp.asarray(rng.randn(b, cs1, 2 * h, 2 * w), dtype)
    skip2 = jnp.asarray(rng.randn(b, cs2, 4 * h, 4 * w), dtype)
    up1 = Up(cout1, cs1, dtype=dtype)
    p1 = up1.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, h, w, cin), dtype),
                  jnp.zeros((1, 2 * h, 2 * w, cs1), dtype))['params']
    up2 = Up(cout2, cs2, dtype=dtype)
    p2 = up2.init(jax.random.PRNGKey(1),
                  jnp.zeros((1, 2 * h, 2 * w, cout1), dtype),
                  jnp.zeros((1, 4 * h, 4 * w, cs2), dtype))['params']
    head = {'kernel': jnp.asarray(rng.randn(3, 3, cout2, 1) * 0.2,
                                  jnp.float32),
            'bias': jnp.asarray(rng.randn(1), jnp.float32)}

    def xla_chain(x, skip1, skip2, p1, p2, head_p):
        import flax.linen as nn
        xn = jnp.transpose(x, (0, 2, 3, 1))
        s1 = jnp.transpose(skip1, (0, 2, 3, 1))
        s2 = jnp.transpose(skip2, (0, 2, 3, 1))
        mid = up1.apply({'params': p1}, xn, s1)
        out = up2.apply({'params': p2}, mid, s2)
        hm = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))
        y = hm.apply({'params': head_p}, out)
        return jnp.transpose(y, (0, 3, 1, 2))   # (P, 1, 4h, 4w)

    return x, skip1, skip2, p1, p2, head, xla_chain


@pytest.mark.quick
def test_fused_chain_matches_xla():
    from semivl_tpu.ops.fused_decoder import fused_vlg_decoder
    x, skip1, skip2, p1, p2, head, xla_chain = _chain_setup()
    ref = xla_chain(x, skip1, skip2, p1, p2, head)
    out = fused_vlg_decoder(x, skip1, skip2, p1, p2, head,
                            interpret=True, storage=jnp.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_chain_gradients_match_xla():
    """Full custom-VJP parity: gradients w.r.t. x, both skips and every
    parameter must match jax.grad of the XLA chain (fp32, interpret)."""
    from semivl_tpu.ops.fused_decoder import fused_vlg_decoder
    x, skip1, skip2, p1, p2, head, xla_chain = _chain_setup()
    # a non-trivial scalar loss with an asymmetric weighting
    wmap = jnp.asarray(
        np.random.RandomState(5).randn(1, 1, 32, 32), jnp.float32)

    def loss_fused(args):
        x, s1, s2, p1, p2, hp = args
        y = fused_vlg_decoder(x, s1, s2, p1, p2, hp, interpret=True,
                              storage=jnp.float32)
        return jnp.sum(y.astype(jnp.float32) * wmap)

    def loss_xla(args):
        x, s1, s2, p1, p2, hp = args
        return jnp.sum(xla_chain(x, s1, s2, p1, p2, hp) * wmap)

    args = (x, skip1, skip2, p1, p2, head)
    gf = jax.grad(loss_fused)(args)
    gx = jax.grad(loss_xla)(args)
    flat_f, tree_f = jax.tree_util.tree_flatten(gf)
    flat_x, tree_x = jax.tree_util.tree_flatten(gx)
    assert tree_f == tree_x
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(gf)[0]]
    for path, a, b in zip(paths, flat_f, flat_x):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, (path, err, scale)
