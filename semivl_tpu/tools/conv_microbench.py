"""Microbenchmarks for the VLG decoder's small-channel conv shapes.

The per-stage bench (decoder_stage_bench.py) shows the plane-folded Up
stages run at 9-19% MXU utilisation — below even the Cout/128 lane cap.
This tool times isolated formulations of the same math to locate the gap:
raw conv, conv+GN, pure GEMMs at matched shapes, and a 9-shifted-matmul
conv decomposition. Results drive the choice between an XLA reformulation
and a Pallas fused kernel.

Usage: python -m semivl_tpu.tools.conv_microbench
"""

import os
import time

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)


def _fetch(tree):
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


def conv3x3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B = 294  # 14 images x 21 planes
    rows = []

    def run(name, gflop, fn, *args):
        t = _time(fn, *args)
        rows.append((name, t * 1e3, gflop / t / 1e3))
        print(f'{name:44s} {t * 1e3:8.3f} ms  {gflop / t / 1e3:7.1f} '
              f'TFLOP/s', flush=True)

    ks = jax.random.split(key, 8)

    # --- the up2 working set: 128x128 spatial, 32-64 channels ---
    x = jax.random.normal(ks[0], (B, 128, 128, 32), dt)
    k32 = jax.random.normal(ks[1], (3, 3, 32, 32), dt)
    g = 2 * B * 128 * 128 * 9 * 32 * 32 / 1e9
    run('conv3x3 (294,128,128,32)->32', g, conv3x3, x, k32)

    x64 = jax.random.normal(ks[2], (B, 128, 128, 64), dt)
    k64_32 = jax.random.normal(ks[3], (3, 3, 64, 32), dt)
    g = 2 * B * 128 * 128 * 9 * 64 * 32 / 1e9
    run('conv3x3 (294,128,128,64)->32', g, conv3x3, x64, k64_32)

    # same FLOPs as conv 32->32 but as one big GEMM (im2col-free lower
    # bound: what the MXU gives at K=288, N=32)
    m = B * 128 * 128
    a = jax.random.normal(ks[4], (m, 288), dt)
    w = jax.random.normal(ks[5], (288, 32), dt)
    g = 2 * m * 288 * 32 / 1e9
    run('gemm (4.8M,288)@(288,32)', g, jnp.dot, a, w)

    w128 = jax.random.normal(ks[5], (288, 128), dt)
    g = 2 * m * 288 * 128 / 1e9
    run('gemm (4.8M,288)@(288,128)  [full lanes]', g, jnp.dot, a, w128)

    # conv as 9 shifted matmuls (K=32 each), accumulated
    def conv_shift(x, k):
        out = jnp.zeros(x.shape[:3] + (k.shape[-1],), x.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w_ = x.shape[1:3]
        for dy in range(3):
            for dx in range(3):
                out = out + jnp.einsum(
                    'bhwc,co->bhwo', xp[:, dy:dy + h, dx:dx + w_], k[dy, dx])
        return out

    g = 2 * B * 128 * 128 * 9 * 32 * 32 / 1e9
    run('conv3x3 as 9 shifted matmuls 32->32', g, conv_shift, x, k32)

    # GN alone at the same shape (bandwidth reference)
    import flax.linen as nn
    gn = nn.GroupNorm(num_groups=2, epsilon=1e-5, dtype=dt,
                      param_dtype=jnp.float32)
    gv = gn.init(key, x)
    gb = 2 * B * 128 * 128 * 32 * 2 / 1e9  # read+write bf16, GB
    t = _time(lambda v, x: gn.apply(v, x), gv, x)
    rows.append(('groupnorm (294,128,128,32)', t * 1e3, 0))
    print(f'{"groupnorm (294,128,128,32)":44s} {t * 1e3:8.3f} ms  '
          f'{gb / t:7.1f} GB/s', flush=True)

    # the 64x64 stage (up1 conv2 shape)
    x_u1 = jax.random.normal(ks[6], (B, 64, 64, 64), dt)
    k64 = jax.random.normal(ks[7], (3, 3, 64, 64), dt)
    g = 2 * B * 64 * 64 * 9 * 64 * 64 / 1e9
    run('conv3x3 (294,64,64,64)->64', g, conv3x3, x_u1, k64)

    # head: 32->1 at 128x128
    k1 = jax.random.normal(ks[3], (3, 3, 32, 1), dt)
    g = 2 * B * 128 * 128 * 9 * 32 * 1 / 1e9
    run('conv3x3 (294,128,128,32)->1 [head]', g, conv3x3, x, k1)

    # head as matmul over the 9-tap patch axis: (M, 288) @ (288, 1)
    w1 = jax.random.normal(ks[3], (288, 1), dt)
    g = 2 * m * 288 * 1 / 1e9
    run('gemm (4.8M,288)@(288,1) [head lower bound]', g, jnp.dot, a, w1)

    # batched-over-planes layout alternative: N in lanes via grouped conv
    xg = jax.random.normal(ks[0], (14, 128, 128, 21 * 32), dt)
    kg = jax.random.normal(ks[1], (3, 3, 32, 21 * 32), dt)

    def conv_grouped(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=21)

    g = 2 * 14 * 128 * 128 * 9 * 32 * 21 * 32 / 1e9
    run('grouped conv 21 groups 32->32 (N in lanes)', g, conv_grouped,
        xg, kg)

    print(f'devices: {jax.devices()}')


if __name__ == '__main__':
    main()
