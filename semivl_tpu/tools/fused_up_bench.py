"""On-chip timing: fused Pallas Up-stage kernel vs the flax/XLA Up module.

Flagship shapes (B=14 decoder images, N=21 planes). Compare against
decoder_stage_bench rows `up1`/`up2`.

Usage: python -m semivl_tpu.tools.fused_up_bench
"""

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
    from semivl_tpu.models.vlg_head import Up
    from semivl_tpu.ops.fused_up import fused_up_stage

    dt = jnp.bfloat16
    b, n = 14, 21
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    for name, h, cin, cs, cout in (('up1', 32, 128, 32, 64),
                                   ('up2', 64, 64, 16, 32)):
        x = jnp.asarray(rng.randn(b * n, h, h, cin), dt)
        skip = jnp.asarray(rng.randn(b, 2 * h, 2 * h, cs), dt)
        module = Up(cout, cs, dtype=dt)
        variables = module.init(key, x, skip)
        params = variables['params']

        t_flax = _time(lambda v, x, s: module.apply(v, x, s),
                       variables, x, skip)

        x_cf = jnp.transpose(x, (0, 3, 1, 2))
        skip_cf = jnp.transpose(skip, (0, 3, 1, 2))
        t_fused = _time(
            lambda p, x, s: fused_up_stage(x, s, p, interpret=False),
            params, x_cf, skip_cf)

        # correctness on-chip (bf16): compare a checksum
        ref = module.apply(variables, x, skip)
        out = jnp.transpose(
            fused_up_stage(x_cf, skip_cf, params, interpret=False),
            (0, 2, 3, 1))
        err = float(jnp.mean(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.mean(jnp.abs(ref.astype(jnp.float32))))
        print(f'{name}: flax {t_flax * 1e3:7.3f} ms   fused '
              f'{t_fused * 1e3:7.3f} ms   speedup '
              f'{t_flax / t_fused:4.2f}x   mean|err| {err:.4f} '
              f'(signal {scale:.3f})', flush=True)


if __name__ == '__main__':
    main()
