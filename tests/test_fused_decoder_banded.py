"""Row-banded fused-decoder backward vs the whole-plane kernels.

The banded passes (ops/fused_decoder_banded.py) must reproduce
``_stage_bwd`` bit-closely in fp32 interpret mode: same math, different
blocking. Chain-level routing (forward stat saving -> banded backward)
is exercised by monkeypatching the VMEM decision so tiny test planes
take the banded path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.models.vlg_head import Up
from semivl_tpu.ops import fused_decoder
from semivl_tpu.ops.fused_decoder import (_fwd_tap_lists,
                                          _pack_stage_weights,
                                          _stage_bwd, _stage_fwd_core,
                                          fused_decoder_ok)
from semivl_tpu.ops.fused_decoder_banded import (_stage_bwd_banded,
                                                 banded_vmem_bytes,
                                                 choose_band_rows,
                                                 make_band_plan)


def _stage_case(b, n, h, w, cin, cs, cout, head, seed=0):
    rng = np.random.RandomState(seed)
    p = b * n
    x = jnp.asarray(rng.randn(p, cin, h, w), jnp.float32)
    skip = jnp.asarray(rng.randn(b, 4, cs, h, w), jnp.float32)
    g_c = 1 if head else cout
    g_out = jnp.asarray(rng.randn(p, 4, g_c, h, w), jnp.float32)
    up = Up(cout, cs, dtype=jnp.float32)
    params = up.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, cin)),
                     jnp.zeros((1, 2 * h, 2 * w, cs)))['params']
    head_params = None
    if head:
        head_params = {
            'kernel': jnp.asarray(rng.randn(3, 3, cout, 1) * 0.3,
                                  jnp.float32),
            'bias': jnp.asarray(rng.randn(1), jnp.float32)}
    t1, t2 = _fwd_tap_lists(cin, cs, cout)
    pw = _pack_stage_weights(params, head_params, t1, t2, jnp.float32)
    args = [pw['w1'], pw['g1s'], pw['g1b'], pw['w2'], pw['g2s'],
            pw['g2b']]
    if head:
        args += [pw['wh'], pw['hb']]
    return x, skip, g_out, args


def _assert_stage_parity(b, n, h, w, cin, cs, cout, band_rows, head,
                         seed=0, tol=2e-5):
    x, skip, g_out, args = _stage_case(b, n, h, w, cin, cs, cout, head,
                                       seed)
    _, stats = _stage_fwd_core(x, skip, *args, interpret=True,
                               storage=jnp.float32, save_stats=True)
    ref = _stage_bwd(x, skip, g_out, *args, interpret=True,
                     storage=jnp.float32)
    out = _stage_bwd_banded(x, skip, g_out, stats, *args, interpret=True,
                            storage=jnp.float32, band_rows=band_rows)
    names = ['g_x', 'g_skip', 'g_w1', 'g_g1s', 'g_g1b', 'g_w2', 'g_g2s',
             'g_g2b'] + (['g_wh', 'g_hb'] if head else [])
    for nm, a, r in zip(names, out, ref):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        err = np.abs(a - r).max() / max(np.abs(r).max(), 1e-3)
        assert err < tol, (nm, err)


@pytest.mark.quick
def test_banded_stage_multiband():
    """Genuinely 3 bands: ws=8 gives nc=16, so h must exceed 2*nc
    (banding cannot go finer than the nc alignment unit — h=40 ->
    R=16, nb=3 with a ragged 8-row last band)."""
    from semivl_tpu.ops.fused_decoder_banded import make_band_plan
    assert make_band_plan(40, 8, 2, 4).nb == 3
    _assert_stage_parity(1, 2, 40, 8, 24, 16, 32, 4, head=False)


def test_banded_stage_head_ragged():
    """Fused head + ragged last band + ws>w pad columns."""
    _assert_stage_parity(1, 2, 11, 12, 24, 16, 32, 4, head=True, seed=3)


@pytest.mark.slow
def test_banded_stage_nc1():
    """ws=128 (the 801-crop stage-2 alignment regime) with head."""
    _assert_stage_parity(1, 1, 6, 65, 16, 8, 32, 2, head=True, seed=5)


@pytest.mark.slow
def test_banded_stage_nc2():
    """ws=64, E rounded to nc=2 (the 801-crop stage-1 regime)."""
    _assert_stage_parity(1, 2, 10, 33, 24, 16, 32, 4, head=False, seed=7)


def test_banded_gate_801(monkeypatch):
    """801-crop Cityscapes decoder geometry: whole-plane backward does
    not fit scoped VMEM; the banded backward fits but measured SLOWER
    than XLA on v5e (82.4 vs 38.5 ms fwd+bwd, 2026-08-18), so the
    public gate rejects backward use unless SEMIVL_FORCE_BANDED_BWD=1
    opts in (reference geometry from model/decode_heads/vlg_head.py
    with crop 801 -> 51x51 base grid)."""
    assert fused_decoder_ok(128, 32, 64, 16, 32, 51, 51, backward=False)
    assert not fused_decoder_ok(128, 32, 64, 16, 32, 51, 51,
                                backward=True)
    monkeypatch.setenv('SEMIVL_FORCE_BANDED_BWD', '1')
    assert fused_decoder_ok(128, 32, 64, 16, 32, 51, 51, backward=True)
    monkeypatch.delenv('SEMIVL_FORCE_BANDED_BWD')
    for cin, cs, cout, h, w, fh in [(128, 32, 64, 51, 51, False),
                                    (64, 16, 32, 102, 102, True)]:
        r = choose_band_rows(cin, cs, cout, h, w, fh)
        assert r is not None
        assert (banded_vmem_bytes(cin, cs, cout, h, w, fh, r)
                <= 14 * 1024 * 1024)
        plan = make_band_plan(h, w, 3 if fh else 2, r)
        assert plan.R % plan.geo.nc == 0 and plan.E % plan.geo.nc == 0
        assert plan.nb * plan.R >= h


@pytest.mark.slow
def test_banded_chain_gradients_match_xla(monkeypatch):
    """Full custom-VJP routing through the banded backward: force the
    banded decision on a tiny chain and compare every gradient against
    jax.grad of the XLA chain."""
    from semivl_tpu.ops import fused_decoder_banded
    from semivl_tpu.ops.fused_decoder import fused_vlg_decoder
    from tests.test_fused_decoder import _chain_setup
    monkeypatch.setattr(fused_decoder, '_stage_banded',
                        lambda *a: True)
    # Small bands: stage 2 (16-row planes, nc=8) goes multi-band (nb=2);
    # stage 1 (8-row planes, w=8 -> nc=16) cannot band finer than nc so
    # it runs as one band — its multi-band machinery is covered by the
    # _assert_stage_parity tests above.
    monkeypatch.setattr(fused_decoder_banded, 'choose_band_rows',
                        lambda *a, **k: 4)
    x, skip1, skip2, p1, p2, head, xla_chain = _chain_setup()
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
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
        assert err < 5e-4, (path, err)
