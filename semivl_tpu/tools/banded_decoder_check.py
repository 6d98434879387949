"""On-chip validation + timing of the row-banded fused decoder backward.

At 801-crop Cityscapes geometry (base grid 51 -> stage planes 51/102)
the whole-plane backward kernels exceed scoped VMEM, so training fell
back to the XLA decoder; the banded backward
(ops/fused_decoder_banded.py) is the fused path there. This tool, on
the attached device:

  1. checks fused-vs-XLA gradient parity for the Up/Up/head chain at
     the target geometry (kernel-default bf16 internal storage -> loose
     tolerance vs the model-dtype XLA chain; run
     ``--dtype float32 --storage float32`` on CPU for tight fp32
     checks), and
  2. times forward and forward+backward for both paths.

Usage:
  python -m semivl_tpu.tools.banded_decoder_check \
      [--batch 4] [--n 19] [--grid 51] [--band-rows 0=auto]

Reference geometry: model/decode_heads/vlg_head.py with
configs/_base_/models/*city* (crop 801, ViT-B/16 -> 51x51 base grid).
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)


def _fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


def _time(fn_j, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn_j(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--n', type=int, default=19,
                        help='class planes (Cityscapes: 19)')
    parser.add_argument('--grid', type=int, default=51,
                        help='base feature grid (801 crop / 16 patch)')
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--storage', default=None,
                        help='kernel internal storage dtype (default: the '
                             'kernel default, bfloat16)')
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--band-rows', type=int, default=0,
                        help='override band size (0 = auto)')
    parser.add_argument('--skip-parity', action='store_true')
    parser.add_argument('--time-passes', action='store_true',
                        help='attribute the banded backward cost to its '
                             'three passes per stage (A / B / C via '
                             'stop_after prefixes) — decides whether a '
                             'forward-spilled-raws variant (killing pass '
                             "A's conv recompute) could beat the XLA "
                             'backward (VERDICT r3 #6)')
    args = parser.parse_args()

    import flax.linen as nn

    from semivl_tpu.models.vlg_head import Up
    from semivl_tpu.ops import fused_decoder_banded
    from semivl_tpu.ops.fused_decoder import fused_vlg_decoder

    if args.band_rows:
        fused_decoder_banded.choose_band_rows = (
            lambda *a, **k: args.band_rows)

    dtype = jnp.dtype(args.dtype)
    b, n, g = args.batch, args.n, args.grid
    cin, cs1, cout1, cs2, cout2 = 128, 32, 64, 16, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b * n, cin, g, g), dtype)
    skip1 = jnp.asarray(rng.randn(b, cs1, 2 * g, 2 * g), dtype)
    skip2 = jnp.asarray(rng.randn(b, cs2, 4 * g, 4 * g), dtype)
    up1 = Up(cout1, cs1, dtype=dtype)
    p1 = up1.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, g, g, cin), dtype),
                  jnp.zeros((1, 2 * g, 2 * g, cs1), dtype))['params']
    up2 = Up(cout2, cs2, dtype=dtype)
    p2 = up2.init(jax.random.PRNGKey(1),
                  jnp.zeros((1, 2 * g, 2 * g, cout1), dtype),
                  jnp.zeros((1, 4 * g, 4 * g, cs2), dtype))['params']
    head = {'kernel': jnp.asarray(rng.randn(3, 3, cout2, 1) * 0.2,
                                  jnp.float32),
            'bias': jnp.asarray(rng.randn(1), jnp.float32)}
    wmap = jnp.asarray(rng.randn(1, 1, 4 * g, 4 * g), jnp.float32)

    def xla_chain(x, s1, s2, p1, p2, hp):
        xn = jnp.transpose(x, (0, 2, 3, 1))
        s1 = jnp.transpose(s1, (0, 2, 3, 1))
        s2 = jnp.transpose(s2, (0, 2, 3, 1))
        mid = up1.apply({'params': p1}, xn, s1)
        out = up2.apply({'params': p2}, mid, s2)
        hm = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                     param_dtype=jnp.float32)
        y = hm.apply({'params': hp}, out)
        return jnp.transpose(y, (0, 3, 1, 2))

    storage = jnp.dtype(args.storage) if args.storage else None

    def loss_fused(xx, s1, s2, pp1, pp2, hp):
        y = fused_vlg_decoder(xx, s1, s2, pp1, pp2, hp, storage=storage)
        return jnp.sum(y.astype(jnp.float32) * wmap)

    def loss_xla(xx, s1, s2, pp1, pp2, hp):
        return jnp.sum(xla_chain(xx, s1, s2, pp1, pp2, hp) * wmap)

    inputs = (x, skip1, skip2, p1, p2, head)
    fwd_f = jax.jit(lambda *a: fused_vlg_decoder(*a, storage=storage))
    fwd_x = jax.jit(xla_chain)
    gr_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5)))
    gr_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5)))

    if not args.skip_parity:
        print('compiling + checking gradient parity...', flush=True)
        gf = gr_f(*inputs)
        gx = gr_x(*inputs)
        paths = [jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_flatten_with_path(gf)[0]]
        worst = 0.0
        for path, a, r in zip(paths,
                              jax.tree_util.tree_leaves(gf),
                              jax.tree_util.tree_leaves(gx)):
            a = np.asarray(a, np.float32)
            r = np.asarray(r, np.float32)
            err = np.abs(a - r).max() / max(np.abs(r).max(), 1e-3)
            worst = max(worst, err)
            flag = 'OK ' if err < 0.05 else 'BAD'
            print(f'  {flag} {path:40s} relerr {err:.2e}', flush=True)
        print(f'worst relative error: {worst:.3e}')

    tf = _time(fwd_f, inputs, iters=args.iters)
    tx = _time(fwd_x, inputs, iters=args.iters)
    tbf = _time(gr_f, inputs, iters=args.iters)
    tbx = _time(gr_x, inputs, iters=args.iters)
    print(f'fwd      fused {tf * 1e3:8.2f} ms   xla {tx * 1e3:8.2f} ms')
    print(f'fwd+bwd  fused {tbf * 1e3:8.2f} ms   xla {tbx * 1e3:8.2f} ms')

    if args.time_passes:
        import functools

        from semivl_tpu.ops import fused_decoder as fd
        from semivl_tpu.ops.fused_decoder_banded import _stage_bwd_banded

        cdt = storage or fd._CDT
        t1a, t2a = fd._fwd_tap_lists(cin, cs1, cout1)
        t1b, t2b = fd._fwd_tap_lists(cout1, cs2, cout2)
        pw1 = fd._pack_stage_weights(p1, None, t1a, t2a, cdt)
        pw2 = fd._pack_stage_weights(p2, head, t1b, t2b, cdt)
        s1_ph = fd._deinterleave(skip1)
        s2_ph = fd._deinterleave(skip2)
        ho, res = fd._chain_fwd(False, cdt, x, s1_ph, s2_ph, pw1, pw2)
        _, _, _, x2, _, _, st1, st2 = res
        assert st1 is not None and st2 is not None, \
            'geometry is not banded; --time-passes targets banded shapes'
        g_ho = jnp.ones_like(ho)
        g_c2 = fd._deinterleave(jnp.ones(x2.shape, x2.dtype))

        def stage2(stop):
            return _stage_bwd_banded(
                x2, s2_ph, g_ho, st2, pw2['w1'], pw2['g1s'], pw2['g1b'],
                pw2['w2'], pw2['g2s'], pw2['g2b'], pw2['wh'], pw2['hb'],
                interpret=False, storage=cdt, stop_after=stop)

        def stage1(stop):
            return _stage_bwd_banded(
                x, s1_ph, g_c2, st1, pw1['w1'], pw1['g1s'], pw1['g1b'],
                pw1['w2'], pw1['g2s'], pw1['g2b'],
                interpret=False, storage=cdt, stop_after=stop)

        print('\nper-pass banded backward attribution (pass B = AB - A, '
              'pass C = full - AB):')
        passes = {}
        for name, fn in (('stage1', stage1), ('stage2', stage2)):
            times = {}
            for stop in ('A', 'B', None):
                j = jax.jit(functools.partial(fn, stop))
                times[stop or 'full'] = _time(j, (), iters=args.iters) * 1e3
            a, ab, full = times['A'], times['B'], times['full']
            passes[name] = times
            print(f'  {name}:  A {a:7.2f} ms   B {ab - a:7.2f} ms   '
                  f'C {full - ab:7.2f} ms   full {full:7.2f} ms')
        tot_full = sum(p['full'] for p in passes.values())
        tot_a = sum(p['A'] for p in passes.values())
        xla_bwd = (tbx - tx) * 1e3
        print(f'  banded bwd total {tot_full:.2f} ms; minus pass A '
              f'(the conv recompute a forward-spilled-raws variant would '
              f'remove) {tot_full - tot_a:.2f} ms; XLA bwd {xla_bwd:.2f} '
              'ms')
        verdict = ('COULD WIN' if tot_full - tot_a < xla_bwd
                   else 'CANNOT WIN')
        print(f'  forward-spilled-raws bound: {verdict} '
              '(B+C alone vs XLA backward)')

    print(f'devices: {jax.devices()}')


if __name__ == '__main__':
    main()
