#!/usr/bin/env python
"""Exact FLOP accounting for the fused SemiVL train step.

Compiles the flagship VOC train step (CLIP ViT-B/16 + VLG, 21 classes,
crop 512, per-chip batch 2) on the CPU backend and prints XLA's
``cost_analysis()`` totals — the authoritative per-iteration FLOP count
behind BASELINE.md's utilisation math and the reference-throughput
denominator (docs/reference_denominator.md).

The reference performs the *same* mathematical work per iteration
(/root/reference/semivl.py:228-328: 1 teacher fwd on B, 1 MaskCLIP fwd on
2B, 2 student fwds on 2B each — one with the feature-perturbation concat
doubling the decoder batch — plus backward), so this count is also the
numerator of the reference's A100 time estimate.

Run:  JAX_PLATFORMS=cpu python -m semivl_tpu.tools.flops_accounting
"""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=None,
                        help='default: the reference per-GPU batch for the '
                             'dataset (pascal 2, others 1)')
    parser.add_argument('--crop', type=int, default=None,
                        help='default: the reference crop for the dataset '
                             '(cityscapes 801, others 512)')
    parser.add_argument('--dataset', default='pascal',
                        choices=['pascal', 'coco', 'ade', 'cityscapes'])
    args = parser.parse_args()
    if args.crop is None:
        args.crop = 801 if args.dataset == 'cityscapes' else 512
    if args.batch_size is None:
        args.batch_size = 2 if args.dataset == 'pascal' else 1

    import os
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from __graft_entry__ import _flagship_cfg
    from semivl_tpu.models.builder import build_model
    from semivl_tpu.train.optim import build_optimizer
    from semivl_tpu.train.step import (
        TrainState, make_semivl_train_step, replicate, shard_batch)

    crop, bs = args.crop, args.batch_size
    cfg = _flagship_cfg(crop_size=crop, dataset=args.dataset)
    cfg['batch_size'] = bs
    bundle = build_model(cfg, dtype=jnp.bfloat16)

    mesh = Mesh(np.array(jax.devices()[:1]), ('data',))
    text = jnp.asarray(bundle.text_feats)
    mcc = jnp.asarray(bundle.mcc_text_feats)
    variables = jax.eval_shape(
        lambda: bundle.module.init(
            {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
            jnp.zeros((1, crop, crop, 3)), text, mcc,
            method='init_variables'))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    tx, _, mask = build_optimizer(
        cfg, variables['params'], total_iters=10000,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys)
    state = replicate(TrainState(
        params=variables, opt_state=tx.init(variables['params']),
        step=jnp.zeros((), jnp.int32)), mesh)
    step_fn = make_semivl_train_step(bundle, cfg, tx, mesh,
                                     total_iters=10000, trainable_mask=mask)

    b = bs
    img = jnp.zeros((b, crop, crop, 3), jnp.float32)
    m = jnp.zeros((b, crop, crop), jnp.int32)
    f = jnp.zeros((b, crop, crop), jnp.float32)
    batch = shard_batch(dict(
        img_x=img, mask_x=m, img_w=img, img_s1=img, img_s2=img,
        ignore_mask=m, cutmix_box1=f, cutmix_box2=f, img_w_other=img,
        img_s1_other=img, img_s2_other=img, ignore_mask_other=m), mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)

    lowered = jax.jit(
        step_fn, donate_argnums=(0,)).lower(state, batch, key)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get('flops', 0.0))
    imgs = 2 * bs  # labeled + unlabeled per iteration (the bench unit)
    print(json.dumps({
        'dataset': args.dataset,
        'crop': crop,
        'batch_per_chip': bs,
        'flops_per_iter': flops,
        'tflops_per_iter': round(flops / 1e12, 3),
        'imgs_per_iter': imgs,
        'tflops_per_img': round(flops / imgs / 1e12, 4),
        'bytes_accessed_per_iter': float(cost.get('bytes accessed', 0.0)),
    }))


if __name__ == '__main__':
    main()
