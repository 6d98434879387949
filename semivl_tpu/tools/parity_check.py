#!/usr/bin/env python
"""Numerical parity harness vs the PyTorch reference.

Given a reference checkpoint (released ``best.pth``) and a config, compares
our converted-model logits against reference-exported logits on the same
inputs (SURVEY.md §7 step 10). Two modes:

1. ``--ref-logits DIR``: compare our sliding-window logits against .pt/.npy
   dumps produced by the reference's ``third_party/unimatch/eval.py
   --logit-path`` on the same val set — reports per-image max/mean abs diff
   and argmax agreement.
2. without ``--ref-logits``: just run our eval and report mIoU (the number
   to place against the paper's table).

    python -m semivl_tpu.tools.parity_check --config cfg.yaml \
        --ckpt best.pth [--ref-logits ref_dump/] [--limit 20]
"""

import argparse
import os

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', required=True)
    parser.add_argument('--ckpt', required=True)
    parser.add_argument('--ref-logits', default=None)
    parser.add_argument('--limit', type=int, default=None)
    parser.add_argument('--ema', action='store_true')
    parser.add_argument('--platform', default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from semivl_tpu.data.dataset import SemiDataset
    from semivl_tpu.evaluation.metrics import intersection_and_union
    from semivl_tpu.evaluation.predict import Evaluator
    from semivl_tpu.models.builder import build_model
    from semivl_tpu.tools.convert_reference_ckpt import (
        convert_vlm_checkpoint, load_reference_checkpoint)

    with open(args.config) as f:
        cfg = yaml.load(f, Loader=yaml.Loader)
    cfg['clip_encoder'] = None
    cfg.setdefault('pl_text', cfg.get('text_embedding_variant', 'single'))

    bundle = build_model(cfg)
    flat, epoch = load_reference_checkpoint(args.ckpt, ema=args.ema)
    variables = convert_vlm_checkpoint(flat)
    print(f'loaded reference checkpoint (epoch {epoch})')

    valset = SemiDataset(cfg, 'val', id_path=cfg.get('val_id_path'))
    ev = Evaluator(bundle.module, variables, bundle.text_feats, cfg)
    mode = cfg.get('eval_mode', 'zegclip_sliding_window')

    inter_sum = np.zeros(cfg['nclass'], np.float64)
    union_sum = np.zeros(cfg['nclass'], np.float64)
    diffs = []
    n = min(len(valset), args.limit or len(valset))
    for i in range(n):
        sample = valset.get(i)
        pred, logits = ev.predict(sample['img'][None],
                                  sample['mask'].shape, mode,
                                  return_logits=True)
        inter, union, _ = intersection_and_union(
            pred[0], sample['mask'], cfg['nclass'])
        inter_sum += inter
        union_sum += union
        if args.ref_logits:
            lbl = sample['id'].split(' ')[1].split('/')[-1]
            base = os.path.join(args.ref_logits, lbl)
            ref = None
            if os.path.isfile(base.replace('.png', '.npy')):
                ref = np.load(base.replace('.png', '.npy'))
            elif os.path.isfile(base.replace('.png', '.pt')):
                import torch
                ref = torch.load(base.replace('.png', '.pt'),
                                 map_location='cpu').numpy()
            if ref is not None:
                ref = ref.reshape(logits.shape)
                d = np.abs(logits - ref)
                agree = float((logits.argmax(1) == ref.argmax(1)).mean())
                diffs.append((d.max(), d.mean(), agree))
                print(f'[{i}] {lbl}: maxdiff={d.max():.4f} '
                      f'meandiff={d.mean():.5f} argmax_agree={agree:.4f}')

    iou = inter_sum / (union_sum + 1e-10) * 100.0
    print(f'mIoU over {n} images: {iou.mean():.2f}')
    if diffs:
        diffs = np.array(diffs)
        print(f'logit parity: maxdiff p95={np.percentile(diffs[:, 0], 95):.4f} '
              f'mean={diffs[:, 1].mean():.5f} '
              f'argmax agreement={diffs[:, 2].mean():.4f}')


if __name__ == '__main__':
    main()
