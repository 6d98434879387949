#!/usr/bin/env python
"""Benchmark: fused SemiVL train-step throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "semivl_train_imgs_per_sec_per_chip", "value": N,
   "unit": "imgs/sec/chip", "vs_baseline": N}

"imgs" counts labeled + unlabeled training images consumed per iteration
(2 * batch_size), the reference's effective throughput unit. The reference
publishes no throughput numbers and cannot run here (no GPU, no mmcv), so
vs_baseline divides by an arithmetic A100 proxy of the PyTorch reference —
5.8 imgs/sec/GPU, the mid scenario of docs/reference_denominator.md
(fp32 matmuls @13 TF/s + TF32 convs @30 TF/s + 20% eager/dataloader
overhead on the analytically-counted 9.2 TFLOP/iter). Override with env
SEMIVL_BASELINE_IMGS_PER_SEC when a real measurement exists.
"""

import argparse
import json
import os
import time

import numpy as np

def reference_a100_imgs_per_sec(dataset):
    """Per-geometry A100 proxy of the PyTorch reference, mid scenario
    (docs/reference_denominator.md + tools/reference_denominator.py).
    Env SEMIVL_BASELINE_IMGS_PER_SEC overrides when a real measurement
    exists."""
    env = os.environ.get('SEMIVL_BASELINE_IMGS_PER_SEC')
    if env is not None:
        return float(env)
    from semivl_tpu.tools.reference_denominator import denominators
    return denominators(dataset)['mid']


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=2,
                        help='per-chip batch (VOC reference: 2)')
    parser.add_argument('--crop', type=int, default=512)
    parser.add_argument('--steps', type=int, default=30)
    parser.add_argument('--warmup', type=int, default=5)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--attention', default='auto',
                        choices=['auto', 'xla', 'pallas'],
                        help="'auto': XLA fused attention below 1536 tokens"
                             ', Pallas flash kernel above (measured '
                             'crossover, ops/attention.py)')
    parser.add_argument('--mode', default='train', choices=['train', 'eval'],
                        help="'eval' benchmarks zegclip sliding-window "
                             'inference FPS instead of the train step')
    parser.add_argument('--dataset', default='pascal',
                        choices=['pascal', 'coco', 'ade', 'cityscapes'],
                        help='flagship config per dataset; coco/ade use the '
                             'large-vocabulary N=81/150 text guidance at '
                             "the reference's bs1 (experiments.py:373-424); "
                             'cityscapes runs the skr04 conv-encoder model '
                             'at 801^2 bs1 (experiments.py:428-456)')
    args = parser.parse_args()
    if args.dataset != 'pascal':
        # reference trains COCO/ADE/Cityscapes at batch 1/GPU
        # (experiments.py:385,413,441)
        if args.batch_size == parser.get_default('batch_size'):
            args.batch_size = 1
        if args.dataset == 'cityscapes' and \
                args.crop == parser.get_default('crop'):
            args.crop = 801

    from semivl_tpu.ops.attention import set_default_impl
    set_default_impl(args.attention)

    import os
    import jax
    # single-core host: persist compiled executables so reruns skip the
    # multi-minute XLA compile of the fused step
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from __graft_entry__ import _flagship_cfg
    from semivl_tpu.models.builder import build_model
    from semivl_tpu.train.optim import build_optimizer
    from semivl_tpu.train.step import (
        TrainState,
        make_semivl_train_step,
        replicate,
        shard_batch,
    )

    crop = args.crop
    cfg = _flagship_cfg(crop_size=crop, dataset=args.dataset)
    cfg['batch_size'] = args.batch_size
    bundle = build_model(cfg, dtype=jnp.dtype(args.dtype))

    if args.mode == 'eval':
        _bench_eval(args, cfg, bundle)
        return
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ('data',))
    n_chips = len(devices)
    b = args.batch_size * n_chips

    text = jnp.asarray(bundle.text_feats)
    mcc = jnp.asarray(bundle.mcc_text_feats)
    from semivl_tpu.utils.init_utils import jit_init
    variables = jit_init(
        bundle.module,
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, crop, crop, 3)), text, mcc, method='init_variables')
    tx, _, mask = build_optimizer(
        cfg, variables['params'], total_iters=10000,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys)
    state = replicate(TrainState(
        params=variables, opt_state=tx.init(variables['params']),
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
        cutmix_box1=boxes, cutmix_box2=boxes,
        img_w_other=imgs(), img_s1_other=imgs(), img_s2_other=imgs(),
        ignore_mask_other=ign), mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)

    # NOTE: jax.block_until_ready does NOT wait for execution on this
    # harness's remote TPU backend (measured round 2: a 1.1-TFLOP matmul
    # "completed" in 40us under it). A device->host scalar fetch is the
    # only reliable completion barrier; the device queue is in-order, so
    # fetching from the last step times the whole chained run.
    def fetch(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    for _ in range(args.warmup):
        state, metrics = step_fn(state, batch, key)
    fetch(metrics['loss_all'])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch, key)
    fetch(metrics['loss_all'])
    dt = time.perf_counter() - t0

    iters_per_sec = args.steps / dt
    imgs_per_sec_per_chip = iters_per_sec * 2 * args.batch_size
    print(json.dumps({
        'metric': 'semivl_train_imgs_per_sec_per_chip',
        'value': round(imgs_per_sec_per_chip, 3),
        'unit': 'imgs/sec/chip',
        'vs_baseline': round(
            imgs_per_sec_per_chip
            / reference_a100_imgs_per_sec(args.dataset), 3),
    }))


def _bench_eval(args, cfg, bundle):
    """zegclip sliding-window eval FPS on synthetic VOC-sized val images."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax.sharding import Mesh
    from semivl_tpu.evaluation.predict import Evaluator

    mesh = Mesh(np.array(jax.devices()), ('data',))
    from semivl_tpu.utils.init_utils import jit_init
    variables = jit_init(
        bundle.module,
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, args.crop, args.crop, 3)),
        jnp.asarray(bundle.text_feats),
        jnp.asarray(bundle.mcc_text_feats), method='init_variables')
    cfg = dict(cfg)
    cfg['eval_transfer_dtype'] = 'bfloat16'  # halve D2H logit traffic
    ev = Evaluator(bundle.module_fwd, variables, bundle.text_feats, cfg,
                   mesh=mesh)
    rs = np.random.RandomState(0)

    # Synthetic in-memory val set at typical VOC geometry after min-512
    # resize (uint8 transport, on-device normalisation — the val-loader
    # default). Benchmarked through the REAL evaluate() loop: prefetch
    # thread, device canvas accumulation, on-device mIoU histograms.
    if args.dataset == 'cityscapes':
        mode, ihw, mhw = 'sliding_window', (1024, 2048), (1024, 2048)
    else:
        mode, ihw, mhw = 'zegclip_sliding_window', (512, 683), (500, 667)

    class _SynthVal:
        def __init__(self, n):
            self.n = n
            self.imgs = [rs.randint(0, 256, ihw + (3,)).astype(np.uint8)
                         for _ in range(4)]
            self.mask = rs.randint(0, cfg['nclass'], mhw).astype(np.uint8)

        def __len__(self):
            return self.n

        def get(self, i):
            return {'img': self.imgs[i % 4], 'mask': self.mask}

    from semivl_tpu.evaluation.predict import evaluate
    n = args.steps
    ds = _SynthVal(n)
    evaluate(ev, ds, mode, cfg, indices=[0, 1])  # warm
    t0 = time.perf_counter()
    evaluate(ev, ds, mode, cfg)
    dt = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'zegclip_sliding_window_eval_fps',
        'value': round(n / dt, 3),
        'unit': 'imgs/sec',
        'vs_baseline': round(n / dt, 3),
    }))


if __name__ == '__main__':
    main()
