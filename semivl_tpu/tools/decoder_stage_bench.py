"""Per-stage timing of the VLG decoder on the attached device.

The fused train step is decoder-bound (BASELINE.md: ~26% of bf16 peak,
attributed to the plane-folded small-channel convs). This tool times each
VLG stage in isolation — similarity+conv1, ASPP, semantic transformers,
up1, up2, head — forward and forward+backward, at the shapes the flagship
VOC step actually runs (N=21 planes, 32x32 base grid, decoder batch ~14
images/step at bs2), so optimisation effort lands on the real bottleneck.

Reference decomposition: model/decode_heads/vlg_head.py:192-251.

Usage: python -m semivl_tpu.tools.decoder_stage_bench [--batch 14] [--n 21]
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
    """Completion barrier: block_until_ready does NOT wait on this
    harness's remote TPU backend (bench.py:122-128); a device->host scalar
    fetch is the only reliable sync. The queue is in-order, so fetching
    from the last call times the whole run."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


def _time(fn, *args, iters=20, warmup=3):
    fn_j = jax.jit(fn)
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
    parser.add_argument('--batch', type=int, default=14,
                        help='decoder image batch (flagship step at bs2 '
                             'runs ~14 decoder images/iter)')
    parser.add_argument('--n', type=int, default=21, help='class planes')
    parser.add_argument('--grid', type=int, default=32,
                        help='base feature grid (512 crop / 16 patch)')
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()

    from semivl_tpu.models import vlg_head as V

    dtype = jnp.dtype(args.dtype)
    b, n, g = args.batch, args.n, args.grid
    ch = 128
    key = jax.random.PRNGKey(0)
    rows = []

    def bench(name, module, *xs, method=None):
        variables = module.init(key, *xs)

        def fwd(v, *xs):
            return module.apply(v, *xs)

        def fwdbwd(v, *xs):
            def loss(v):
                out = module.apply(v, *xs)
                if isinstance(out, dict):
                    out = sum(jnp.sum(o.astype(jnp.float32) ** 2)
                              for o in jax.tree_util.tree_leaves(out))
                    return out
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.grad(loss)(v)

        tf = _time(fwd, variables, *xs, iters=args.iters)
        tb = _time(fwdbwd, variables, *xs, iters=args.iters)
        rows.append((name, tf * 1e3, tb * 1e3))
        print(f'{name:28s} fwd {tf * 1e3:8.3f} ms   fwd+bwd '
              f'{tb * 1e3:8.3f} ms', flush=True)

    k1, k2, k3, k4 = jax.random.split(key, 4)

    # stage 2a: 7x7 conv on (B*N, g, g, 1) similarity planes
    import flax.linen as nn
    x_sim = jax.random.normal(k1, (b * n, g, g, 1), dtype)

    class Conv1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(ch, (7, 7), padding=((3, 3), (3, 3)),
                           dtype=dtype, param_dtype=jnp.float32)(x)

    bench('conv1 7x7 (B*N,32,32,1)', Conv1(), x_sim)

    # stage 2b: residual GN-ASPP on (B*N, g, g, 128)
    x_aspp = jax.random.normal(k2, (b * n, g, g, ch), dtype)
    bench('aspp (B*N,32,32,128)', V.ASPPModule(dtype=dtype), x_aspp)

    # stage 3: 2x semantic transformer over class axis
    x_sem = jax.random.normal(k3, (b, n, g, g, ch), dtype)
    text = jax.random.normal(k4, (b, n, ch), dtype)

    class Sem2(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            for i in range(2):
                x = V.SemanticTransformer(
                    channels=ch, text_channels=ch, num_heads=4,
                    dtype=dtype, name=f'l{i}')(x, t)
            return x

    bench('semantic x2 (B,N,32,32,128)', Sem2(), x_sem, text)

    # stage 4: up1 (128 -> 64 @ 64x64) and up2 (64 -> 32 @ 128x128)
    x_up1 = jax.random.normal(k3, (b * n, g, g, ch), dtype)
    skip1 = jax.random.normal(k4, (b, 2 * g, 2 * g, 32), dtype)
    bench('up1 (B*N,32->64, 128->64ch)',
          V.Up(64, 32, dtype=dtype), x_up1, skip1)

    x_up2 = jax.random.normal(k3, (b * n, 2 * g, 2 * g, 64), dtype)
    skip2 = jax.random.normal(k4, (b, 4 * g, 4 * g, 16), dtype)
    bench('up2 (B*N,64->128, 64->32ch)',
          V.Up(32, 16, dtype=dtype), x_up2, skip2)

    # stage 5: head conv 32 -> 1 @ 128x128
    x_head = jax.random.normal(k3, (b * n, 4 * g, 4 * g, 32), dtype)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=dtype, param_dtype=jnp.float32)(x)

    bench('head 3x3 (B*N,128,128,32->1)', Head(), x_head)

    total_f = sum(r[1] for r in rows)
    total_b = sum(r[2] for r in rows)
    print(f'{"TOTAL":28s} fwd {total_f:8.3f} ms   fwd+bwd {total_b:8.3f} ms')
    print(f'devices: {jax.devices()}')
    np.savez('/tmp/decoder_stage_bench.npz',
             rows=np.array([(r[0], r[1], r[2]) for r in rows], dtype=object))


if __name__ == '__main__':
    main()
