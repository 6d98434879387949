"""Layout experiments for narrow-channel decoder tensors.

conv_microbench.py showed GN at ~180 GB/s and conv32->32 at its GEMM
bound (16 TF/s). Hypothesis: (…, 32) minor dims are tile-padded to 128
lanes in HBM, wasting 4x bandwidth on every op. This tool times
elementwise/reduction/conv ops at C=32 vs C=128 and alternative layouts
(W-minor, flattened) to confirm and find the fix.

Usage: python -m semivl_tpu.tools.layout_microbench
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


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B = 294

    def run(name, gbytes, fn, *args):
        t = _time(fn, *args)
        print(f'{name:52s} {t * 1e3:8.3f} ms  {gbytes / t:7.1f} GB/s',
              flush=True)

    ks = jax.random.split(key, 4)
    # elementwise: same element count, different minor dims
    n_el = B * 128 * 128 * 32
    gb = n_el * 2 * 2 / 1e9  # read+write bf16
    x32 = jax.random.normal(ks[0], (B, 128, 128, 32), dt)
    run('relu+1 (294,128,128,32)', gb, lambda x: jax.nn.relu(x) + 1, x32)
    x128 = jax.random.normal(ks[1], (B // 4, 128, 128, 128), dt)
    run('relu+1 (73,128,128,128) [same bytes]', gb * 73 / 73.5,
        lambda x: jax.nn.relu(x) + 1, x128)
    xflat = x32.reshape(-1, 1024)
    run('relu+1 flat (…,1024) [same bytes]', gb,
        lambda x: jax.nn.relu(x) + 1, xflat)
    xw = jax.random.normal(ks[2], (B, 32, 128, 128), dt)  # W-minor
    run('relu+1 (294,32,128,128) [W minor]', gb,
        lambda x: jax.nn.relu(x) + 1, xw)

    # reduction (read-only)
    gb_r = n_el * 2 / 1e9
    run('sum (294,128,128,32)', gb_r,
        lambda x: jnp.sum(x.astype(jnp.float32)), x32)
    run('sum (294,32,128,128) [W minor]', gb_r,
        lambda x: jnp.sum(x.astype(jnp.float32)), xw)

    # conv in NCHW dimension numbers (W-minor activations)
    k32 = jax.random.normal(ks[3], (3, 3, 32, 32), dt)
    gflop = 2 * B * 128 * 128 * 9 * 32 * 32 / 1e9

    def conv_nhwc(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def conv_nchw(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NCHW', 'HWIO', 'NCHW'))

    t = _time(conv_nhwc, x32, k32)
    print(f'{"conv3x3 NHWC 32->32":52s} {t * 1e3:8.3f} ms  '
          f'{gflop / t / 1e3:7.1f} TFLOP/s', flush=True)
    t = _time(conv_nchw, xw, k32)
    print(f'{"conv3x3 NCHW 32->32 [W minor]":52s} {t * 1e3:8.3f} ms  '
          f'{gflop / t / 1e3:7.1f} TFLOP/s', flush=True)

    # GN in W-minor layout (stats over H,W per group: lanes stay full)
    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=2, epsilon=1e-5, dtype=dt,
                      param_dtype=jnp.float32)
    gv = gn.init(key, x32)
    gb3 = n_el * 2 * 3 / 1e9
    run('groupnorm NHWC (294,128,128,32)', gb3,
        lambda v, x: gn.apply(v, x), gv, x32)

    def gn_wminor(x, scale, bias):
        # x: (B, C, H, W); groups of 16 channels
        xs = x.reshape(B, 2, 16, 128, 128).astype(jnp.float32)
        mean = jnp.mean(xs, axis=(2, 3, 4), keepdims=True)
        var = jnp.mean((xs - mean) ** 2, axis=(2, 3, 4), keepdims=True)
        y = (xs - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y.reshape(B, 32, 128, 128).astype(dt)
        return y * scale[:, None, None] + bias[:, None, None]

    scale = jnp.ones((32,), dt)
    bias = jnp.zeros((32,), dt)
    run('groupnorm W-minor hand (294,32,128,128)', gb3,
        gn_wminor, xw, scale, bias)

    print(f'devices: {jax.devices()}')


if __name__ == '__main__':
    main()
