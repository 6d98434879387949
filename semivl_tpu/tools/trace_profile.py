"""Device-trace profiler for the fused train step and the eval forward.

Makes the round-3 ad-hoc trace analysis reproducible: captures a
``jax.profiler`` trace (this backend emits per-fusion device events with
``hlo_category`` / ``model_flops`` / ``bytes_accessed`` args), then parses
the Chrome-trace JSON and prints

  * total device ms per step (the relay-independent time — tunnel
    round-trips never appear in device lanes),
  * an HLO-category rollup with achieved TF/s and GB/s per category
    (Pallas kernels broken out by kernel-name prefix),
  * the top individual fusions by device time.

``--target eval`` traces the sliding-window eval forward on a synthetic
VOC-geometry val image and reports DEVICE ms/image — the relay-variance-
free companion to bench.py's wall-clock eval FPS (round-2 VERDICT noted
the wall-clock band is ~25% due to tunnel load).

Run on the real chip:
  python -m semivl_tpu.tools.trace_profile --target step
  python -m semivl_tpu.tools.trace_profile --target eval
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile


def load_device_events(trace_dir):
    """Return the list of device-side HLO-op events from the newest trace
    under ``trace_dir`` (events carrying an ``hlo_category`` arg)."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins/profile/*/*.trace.json.gz')))
    if not paths:
        raise FileNotFoundError(f'no trace under {trace_dir}')
    ev = json.load(gzip.open(paths[-1]))
    return [e for e in ev['traceEvents']
            if e.get('ph') == 'X' and 'hlo_category' in e.get('args', {})]


def _category(e):
    cat = e['args'].get('hlo_category', '?')
    name = e.get('name', '')
    # Pallas kernels surface as custom-call events named after the kernel;
    # break the two families out of the generic custom-call bucket.
    if name.startswith('attn') or name.startswith('packed_attn'):
        return 'pallas:attention'
    if name.startswith('decode') or name.startswith('fused_stage') \
            or name.startswith('stage_'):
        return 'pallas:decoder'
    if 'custom-call' in cat:
        return f'pallas:{name.split(".")[0][:24]}'
    return cat


def _tfs(flops, dur_us):
    """Achieved TF/s for ``flops`` over ``dur_us`` microseconds."""
    return flops / max(dur_us, 1e-9) / 1e6


def _gbs(nbytes, dur_us):
    """Achieved GB/s for ``nbytes`` over ``dur_us`` microseconds."""
    return nbytes / max(dur_us, 1e-9) / 1e3


def report(events, n_iters, top=20):
    """Print category rollup + top ops; return total device ms/iter.

    Trace ``dur`` values are microseconds (Chrome trace format)."""
    tot_t = sum(e['dur'] for e in events)
    tot_f = sum(int(e['args'].get('model_flops', 0) or 0) for e in events)
    print(f'device total: {tot_t / 1e3 / n_iters:.2f} ms/iter '
          f'({tot_f / n_iters / 1e12:.2f} TFLOP -> '
          f'{_tfs(tot_f, tot_t):.1f} TF/s avg)')

    cat_t = collections.Counter()
    cat_f = collections.Counter()
    cat_b = collections.Counter()
    for e in events:
        c = _category(e)
        cat_t[c] += e['dur']
        cat_f[c] += int(e['args'].get('model_flops', 0) or 0)
        cat_b[c] += int(e['args'].get('bytes_accessed', 0) or 0)
    print(f'{"category":32s} {"ms/iter":>8s} {"TF/s":>6s} {"GB/s":>6s}')
    for c, t in cat_t.most_common():
        print(f'{c:32s} {t / 1e3 / n_iters:8.2f} '
              f'{_tfs(cat_f[c], t):6.1f} {_gbs(cat_b[c], t):6.0f}')

    rows = collections.defaultdict(lambda: [0.0, 0, 0])
    for e in events:
        ln = e['args'].get('long_name', e['name'])
        m = re.match(r'%\S+ = (\S+)', ln)
        sig = m.group(1) if m else e['name'][:60]
        rows[sig][0] += e['dur']
        rows[sig][1] += int(e['args'].get('model_flops', 0) or 0)
        rows[sig][2] += 1
    print(f'--- top {top} ops ---')
    for sig, (t, f, c) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f'{t / 1e3 / n_iters:8.3f} ms x{c // n_iters:<4d} '
              f'{_tfs(f, t):6.1f} TF/s  {sig[:70]}')
    return tot_t / 1e3 / n_iters


def _build_flagship(crop, bs, dtype, dataset='pascal',
                    decoder_kernel='auto'):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from semivl_tpu.models.builder import build_model
    from semivl_tpu.utils.init_utils import jit_init

    cfg = _flagship_cfg(crop_size=crop, dataset=dataset)
    cfg['batch_size'] = bs
    if decoder_kernel != 'auto':
        # A/B the fused polyphase decoder vs plain XLA at this geometry
        # (models/builder.py routing) — e.g. the N-scaled layout copies
        # around the plane-folded kernels at ADE N=150.
        cfg['decoder_fwd_kernel'] = decoder_kernel
        cfg['decoder_train_kernel'] = decoder_kernel
    bundle = build_model(cfg, dtype=dtype)
    variables = jit_init(
        bundle.module, {'params': jax.random.PRNGKey(0),
                        'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, crop, crop, 3)), jnp.asarray(bundle.text_feats),
        jnp.asarray(bundle.mcc_text_feats), method='init_variables')
    return cfg, bundle, variables


def trace_step(args, trace_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from semivl_tpu.train.optim import build_optimizer
    from semivl_tpu.train.step import (TrainState, make_semivl_train_step,
                                       replicate, shard_batch)

    crop, bs = args.crop, args.batch_size
    cfg, bundle, variables = _build_flagship(
        crop, bs, jnp.dtype(args.dtype), dataset=args.dataset,
        decoder_kernel=args.decoder_kernel)
    mesh = Mesh(np.array(jax.devices()), ('data',))
    b = bs * len(jax.devices())
    tx, _, mask = build_optimizer(
        cfg, variables['params'], total_iters=10000,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys)
    state = replicate(TrainState(params=variables,
                                 opt_state=tx.init(variables['params']),
                                 step=jnp.zeros((), jnp.int32)), mesh)
    step_fn = make_semivl_train_step(bundle, cfg, tx, mesh,
                                     total_iters=10000, trainable_mask=mask)
    rs = np.random.RandomState(0)

    def imgs():
        return rs.randn(b, crop, crop, 3).astype(np.float32)

    boxes = np.zeros((b, crop, crop), np.float32)
    boxes[:, 100:300, 50:400] = 1
    ign = np.zeros((b, crop, crop), np.int32)
    batch = shard_batch(dict(
        img_x=imgs(),
        mask_x=rs.randint(0, cfg['nclass'], (b, crop, crop)).astype(np.int32),
        img_w=imgs(), img_s1=imgs(), img_s2=imgs(), ignore_mask=ign,
        cutmix_box1=boxes, cutmix_box2=boxes, img_w_other=imgs(),
        img_s1_other=imgs(), img_s2_other=imgs(),
        ignore_mask_other=ign), mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)

    def fetch(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    metrics = None
    for _ in range(args.warmup):
        state, metrics = step_fn(state, batch, key)
    fetch(metrics['loss_all'])

    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch, key)
    fetch(metrics['loss_all'])
    jax.profiler.stop_trace()


def trace_eval(args, trace_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from semivl_tpu.evaluation.predict import Evaluator

    crop = args.crop
    cfg, bundle, variables = _build_flagship(
        crop, args.batch_size, jnp.dtype(args.dtype),
        dataset=args.dataset, decoder_kernel=args.decoder_kernel)
    cfg = dict(cfg)
    cfg['eval_transfer_dtype'] = 'bfloat16'
    mesh = Mesh(np.array(jax.devices()), ('data',))
    ev = Evaluator(bundle.module_fwd, variables, bundle.text_feats, cfg,
                   mesh=mesh)
    rs = np.random.RandomState(0)
    # PRODUCTION eval path: predict_hist_into (zero per-image D2H) — the
    # loop evaluate() runs in steady state, incl. the O(pixels x nclass)
    # compare-reduce histogram whose cost scales with the vocabulary
    # (round-4 VERDICT #3: measure at ADE N=150 / COCO N=81).
    if args.dataset == 'cityscapes':
        mode, ih, iw, mh, mw = 'sliding_window', 1024, 2048, 1024, 2048
    else:
        mode, ih, iw, mh, mw = 'zegclip_sliding_window', 512, 683, 500, 667
    img = rs.randint(0, 256, (1, ih, iw, 3)).astype(np.uint8)
    mask = rs.randint(0, cfg['nclass'], (mh, mw)).astype(np.uint8)
    acc = ev.zero_hist()
    out = ev.predict_hist_into(acc, img, mask, mode)  # compile+warm
    assert out is not None, 'device hist path unavailable for this mode'
    acc = out
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        acc = ev.predict_hist_into(acc, img, mask, mode)
    np.asarray(acc)  # completion barrier (device->host fetch)
    jax.profiler.stop_trace()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--target', default='step', choices=['step', 'eval'])
    parser.add_argument('--dataset', default='pascal',
                        choices=['pascal', 'coco', 'ade', 'cityscapes'])
    parser.add_argument('--batch-size', type=int, default=2)
    parser.add_argument('--crop', type=int, default=512)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--iters', type=int, default=3)
    parser.add_argument('--warmup', type=int, default=3)
    parser.add_argument('--trace-dir', default=None)
    parser.add_argument('--top', type=int, default=20)
    parser.add_argument('--decoder-kernel', default='auto',
                        choices=['auto', 'xla', 'fused'],
                        help='override the Up/head decoder routing '
                             '(models/builder.py) for fused-vs-XLA '
                             'device-time A/Bs')
    args = parser.parse_args()

    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), '.jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix='semivl_trace_')
    if args.target == 'step':
        trace_step(args, trace_dir)
    else:
        trace_eval(args, trace_dir)
    events = load_device_events(trace_dir)
    ms = report(events, args.iters, top=args.top)
    unit = 'ms/step' if args.target == 'step' else 'ms/image(device)'
    print(json.dumps({'metric': f'{args.target}_device_time',
                      'value': round(ms, 2), 'unit': unit}))


if __name__ == '__main__':
    main()
