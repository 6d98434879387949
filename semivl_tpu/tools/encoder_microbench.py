"""On-chip microbench for the encoder's matmul/LayerNorm pipeline.

The round-3 device trace attributed the largest remaining step segment to
the ENCODER (39.9 ms fwd+bwd of a 123.6 ms step): its 768-channel GEMMs run
at 85-100 TF/s instead of the measured clean-GEMM ceiling (165-175 TF/s at
M=4100), dragged by (a) fused LayerNorm-stat epilogues — XLA fuses the fp32
mean/var reductions of the NEXT LayerNorm into the GEMM/residual epilogue —
and (b) the odd 1025-token count (M=4100 vs 4096 measured ~15% slower on
pure GEMMs).

This tool measures both hypotheses in isolation on a raw functional replica
of ``semivl_tpu.models.layers.TransformerBlock`` (same math, same dtypes,
same attention dispatch) so candidate fixes can be compared before touching
model code:

  base          the block exactly as the model computes it
  barrier_ln    lax.optimization_barrier on each LayerNorm input (splits
                the GEMM and the LN-stat reduction into separate fusions)
  barrier_res   barrier after each residual add instead
  barrier_gelu  barrier between the fc1 GEMM and the exact-erf GELU
  pad=L'        run the whole block at a padded token count

plus pure-GEMM rate references at the step's M values.

Run on the real chip:  python -m semivl_tpu.tools.encoder_microbench
"""

import argparse
import functools
import json

from semivl_tpu.tools.decoder_profile import timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=4,
                        help='encoder batch in the flagship step (2*bs=4)')
    parser.add_argument('--seq-len', type=int, default=1025)
    parser.add_argument('--dim', type=int, default=768)
    parser.add_argument('--heads', type=int, default=12)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--layers', type=int, default=12,
                        help='stack depth for the stacked variants')
    parser.add_argument('--pads', default='1025,1032,1040,1152',
                        help='token counts for the padded-length sweep')
    args = parser.parse_args()

    import os

    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), '.jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from semivl_tpu.ops.attention import multi_head_attention

    dtype = jnp.dtype(args.dtype)
    b, l, c, h = args.batch_size, args.seq_len, args.dim, args.heads
    hid = 4 * c
    rs = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rs.randn(*shape) * 0.02, dtype)

    # one set of weights reused across stacked layers (perf, not numerics)
    W = dict(
        qkv=mk(c, 3 * c), qkv_b=mk(3 * c),
        o=mk(c, c), o_b=mk(c),
        fc1=mk(c, hid), fc1_b=mk(hid),
        fc2=mk(hid, c), fc2_b=mk(c),
        ln1_s=jnp.ones((c,), jnp.float32), ln1_b=jnp.zeros((c,), jnp.float32),
        ln2_s=jnp.ones((c,), jnp.float32), ln2_b=jnp.zeros((c,), jnp.float32),
    )

    def layer_norm(x, s, bias, barrier=False):
        if barrier:
            x = lax.optimization_barrier(x)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + 1e-6)
        return (y * s + bias).astype(dtype)

    def block(x, w, mode):
        bar_ln = mode == 'barrier_ln'
        bar_res = mode == 'barrier_res'
        bar_gelu = mode == 'barrier_gelu'
        y = layer_norm(x, w['ln1_s'], w['ln1_b'], barrier=bar_ln)
        qkv = y @ w['qkv'] + w['qkv_b']
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = multi_head_attention(q, k, v, h)
        x = x + (a @ w['o'] + w['o_b'])
        if bar_res:
            x = lax.optimization_barrier(x)
        y = layer_norm(x, w['ln2_s'], w['ln2_b'], barrier=bar_ln)
        ff = y @ w['fc1'] + w['fc1_b']
        if bar_gelu:
            # split the exact-erf GELU (VPU) out of the fc1 GEMM epilogue
            ff = lax.optimization_barrier(ff)
        ff = jnp.asarray(jax.nn.gelu(ff, approximate=False))
        x = x + (ff @ w['fc2'] + w['fc2_b'])
        if bar_res:
            x = lax.optimization_barrier(x)
        return x

    def stack(x, w, mode, depth):
        for _ in range(depth):
            x = block(x, w, mode)
        return x

    results = {}

    def record(key, val):
        # print incrementally so a timed-out run still yields data
        results[key] = val
        print(json.dumps({key: val}), flush=True)

    # ---- pure-GEMM rate references at the step's M values
    for m in (4096, b * l, 4128, 4160, 4608):
        aa = mk(m, c)
        bb = mk(c, hid)
        f = jax.jit(lambda p, q: p @ q)
        t = timeit(f, aa, bb, iters=args.iters * 2)
        record(f'gemm_{m}x{c}x{hid}_tf', round(
            2 * m * c * hid / (t * 1e-3) / 1e12, 1))

    # ---- single-block and stacked fwd / fwd+bwd per mode
    x0 = mk(b, l, c)
    for mode in ('base', 'barrier_ln', 'barrier_res', 'barrier_gelu'):
        fwd = jax.jit(functools.partial(stack, mode=mode, depth=args.layers))
        record(f'stack{args.layers}_fwd_{mode}_ms', round(
            timeit(fwd, x0, W, iters=args.iters), 3))

        def loss(x, w, _mode=mode):
            return jnp.sum(stack(x, w, _mode, args.layers)
                           .astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        record(f'stack{args.layers}_fwdbwd_{mode}_ms', round(
            timeit(bwd, x0, W, iters=args.iters), 3))

    # ---- padded-token-count sweep (base mode)
    for lp in [int(s) for s in args.pads.split(',') if s]:
        xp = mk(b, lp, c)
        fwd = jax.jit(functools.partial(stack, mode='base',
                                        depth=args.layers))
        record(f'stack{args.layers}_fwd_L{lp}_ms', round(
            timeit(fwd, xp, W, iters=args.iters), 3))

        def loss(x, w):
            return jnp.sum(stack(x, w, 'base', args.layers)
                           .astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        record(f'stack{args.layers}_fwdbwd_L{lp}_ms', round(
            timeit(bwd, xp, W, iters=args.iters), 3))

    # Aggregate to stderr: stdout already carries one JSON line per key
    # (a line-by-line consumer must not see the same data twice).
    import sys
    print(json.dumps(results), file=sys.stderr)


if __name__ == '__main__':
    main()
