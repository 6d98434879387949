"""On-chip segment profiler for the fused SemiVL train step.

Times the encoder / guidance / VLG-decoder pieces at the exact shapes the
flagship VOC step runs them (bs 2/chip => main need_fp decoder pass sees 8
plane-sets of N=21), plus the VLG head's internal stages as standalone
modules with matched shapes. Output: one JSON line per segment, sorted by
cost, so optimisation targets the measured bottleneck instead of FLOP
guesses (BASELINE.md round-1 accounting put the decoder at ~4.6 of 11
TFLOP/iter but ~75% of step time).

Run on the real chip:  python -m semivl_tpu.tools.decoder_profile
"""

import argparse
import json
import time


def _fetch_scalar(out):
    """Force completion by fetching one scalar to host.

    On this dev harness's remote TPU backend ``jax.block_until_ready`` does
    NOT wait for execution (measured: a 1.1-TFLOP matmul "completed" in
    40us); a device->host fetch is the only reliable barrier. The device
    queue executes in order, so fetching from the LAST enqueued call times
    the whole batch of calls.
    """
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


def timeit(fn, *args, warmup=2, iters=10, reps=3):
    """Slope timing: run the enqueue-loop at ``iters`` and ``2*iters`` calls
    (each ended by one scalar fetch) and take the difference — the tunnel
    round-trip (~35 ms, fluctuating with load) cancels exactly. ``reps``
    pairs are measured and the minimum slope returned (load spikes only ever
    inflate a measurement)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch_scalar(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _fetch_scalar(o)
        return time.perf_counter() - t0

    best = float('inf')
    for _ in range(reps):
        t1 = run(iters)
        t2 = run(2 * iters)
        best = min(best, (t2 - t1) / iters)
    return best * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=2)
    parser.add_argument('--crop', type=int, default=512)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--segments', action='store_true',
                        help='also profile VLG-internal stage modules')
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

    from __graft_entry__ import _flagship_cfg
    from semivl_tpu.models.builder import build_model
    from semivl_tpu.utils.init_utils import jit_init

    dtype = jnp.dtype(args.dtype)
    crop = args.crop
    bs = args.batch_size
    cfg = _flagship_cfg(crop_size=crop)
    bundle = build_model(cfg, dtype=dtype)
    module = bundle.module
    text = jnp.asarray(bundle.text_feats)
    mcc = jnp.asarray(bundle.mcc_text_feats)
    n_cls = text.shape[0]

    variables = jit_init(
        module, {'params': jax.random.PRNGKey(0),
                 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, crop, crop, 3)), text, mcc, method='init_variables')

    rs = np.random.RandomState(0)
    results = {}

    # ---- full-model pieces at real step shapes (bs=2: enc B=4, dec B=8)
    img4 = jnp.asarray(rs.randn(2 * bs, crop, crop, 3), jnp.float32)

    enc_fwd = jax.jit(lambda v, x: module.apply(v, x,
                                                method='extract_feat'))
    results['enc_fwd_b%d' % (2 * bs)] = timeit(enc_fwd, variables, img4,
                                               iters=args.iters)

    def enc_loss(v, x):
        feats, gemb, _ = module.apply(v, x, method='extract_feat')
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    enc_bwd = jax.jit(jax.grad(enc_loss))
    results['enc_fwdbwd_b%d' % (2 * bs)] = timeit(enc_bwd, variables, img4,
                                                  iters=args.iters)

    mclip = jax.jit(lambda v, x, t: module.apply(
        v, x, t, 0.9, method='forward_maskclip'))
    results['maskclip_fwd_b%d' % (2 * bs)] = timeit(
        mclip, variables, img4, mcc, iters=args.iters)

    # ---- VLG head at the main-pass decoder batch (need_fp doubles 2*bs)
    dec_b = 4 * bs
    hw = crop // 16
    feats = (jnp.asarray(rs.randn(dec_b, hw, hw, 768), dtype),
             jnp.asarray(rs.randn(dec_b, hw, hw, 768), dtype),
             jnp.asarray(rs.randn(dec_b, hw, hw, 512), dtype))

    def head_apply(v, feats, t):
        return module.apply(
            v, feats, t, None, (crop, crop),
            method=lambda m, f, tt, cf, os_: m.decode_head(
                f, tt, cf, output_size=os_))

    head_fwd = jax.jit(head_apply)
    results['vlg_fwd_b%d' % dec_b] = timeit(head_fwd, variables, feats, text,
                                            iters=args.iters)

    def head_loss(v, feats, t):
        return jnp.sum(head_apply(v, feats, t).astype(jnp.float32))

    head_bwd = jax.jit(jax.grad(head_loss, argnums=(0, 1)))
    results['vlg_fwdbwd_b%d' % dec_b] = timeit(head_bwd, variables, feats,
                                               text, iters=args.iters)

    # ---- loss-side segment: CE at full crop resolution
    from semivl_tpu.losses.ce import cross_entropy
    logits = jnp.asarray(rs.randn(dec_b, n_cls, crop, crop), jnp.float32)
    labels = jnp.asarray(rs.randint(0, n_cls, (dec_b, crop, crop)), jnp.int32)
    ce = jax.jit(cross_entropy)
    results['ce_%d_b%d' % (crop, dec_b)] = timeit(ce, logits, labels,
                                                  iters=args.iters)

    if args.segments:
        from semivl_tpu.models.vlg_head import (
            ASPPModule, SemanticTransformer, Up)
        import flax.linen as nn

        bn = dec_b * n_cls
        key = jax.random.PRNGKey(0)

        def seg(name, mod, *xs, method=None):
            v = mod.init(key, *xs)
            fn = jax.jit(lambda v, *a: mod.apply(v, *a))
            results[name] = timeit(fn, v, *xs, iters=args.iters)

        x_planes = jnp.asarray(rs.randn(bn, hw, hw, 1), dtype)
        conv1 = nn.Conv(128, (7, 7), padding=((3, 3), (3, 3)), dtype=dtype,
                        param_dtype=jnp.float32)
        seg('seg_conv1_7x7', conv1, x_planes)

        x128 = jnp.asarray(rs.randn(bn, hw, hw, 128), dtype)
        seg('seg_aspp', ASPPModule(dtype=dtype), x128)

        x5d = jnp.asarray(rs.randn(dec_b, n_cls, hw, hw, 128), dtype)
        ttok = jnp.asarray(rs.randn(dec_b, n_cls, 128), dtype)
        seg('seg_semtrans_x1',
            SemanticTransformer(channels=128, text_channels=128, num_heads=4,
                                dtype=dtype), x5d, ttok)

        skip1 = jnp.asarray(rs.randn(dec_b, hw, hw, 32), dtype)
        seg('seg_up1', Up(64, 32, dtype=dtype), x128, skip1)

        x64 = jnp.asarray(rs.randn(bn, 2 * hw, 2 * hw, 64), dtype)
        skip2 = jnp.asarray(rs.randn(dec_b, hw, hw, 16), dtype)
        seg('seg_up2', Up(32, 16, dtype=dtype), x64, skip2)

        x32 = jnp.asarray(rs.randn(bn, 4 * hw, 4 * hw, 32), dtype)
        headc = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                        param_dtype=jnp.float32)
        seg('seg_headconv', headc, x32)

        from semivl_tpu.ops.resize import resize
        xout = jnp.asarray(rs.randn(dec_b, 4 * hw, 4 * hw, n_cls),
                           jnp.float32)
        rz = jax.jit(lambda x: resize(x, (crop, crop), mode='bilinear',
                                      align_corners=False))
        results['seg_final_resize'] = timeit(rz, xout, iters=args.iters)

    for name, ms in sorted(results.items(), key=lambda kv: -kv[1]):
        print(json.dumps({'segment': name, 'ms': round(ms, 3)}))


if __name__ == '__main__':
    main()
