#!/usr/bin/env python
"""Semi-supervision learning-effect demo on synthetic color-blob data.

Trains the tiny VLM twice on a color-segmentation task that is exactly
learnable from pixels (class = blob color): once supervised-only with K
labeled images, once with the full SemiVL/UniMatch consistency loop adding
unlabeled images of the same distribution. Prints both best mIoUs — the
semi-supervised run should match or beat the supervised-only run, which is
runtime evidence that the pseudo-label/consistency mechanism (the
reference's core claim, semivl.py:198-325) does useful work end-to-end.

Pure-CPU friendly (tiny model, 64px crops):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python -m semivl_tpu.tools.semi_effect_demo --out-root /tmp/semi_demo
"""

import argparse
import os

import numpy as np

CLASS_COLORS = np.array([
    [64, 64, 64],     # 0 background
    [220, 40, 40],    # 1 red
    [40, 200, 60],    # 2 green
    [50, 80, 230],    # 3 blue
    [235, 220, 50],   # 4 yellow
], np.uint8)


def make_blob_dataset(root, n_labeled, n_unlabeled, n_val, size=(72, 88),
                      seed=0):
    from PIL import Image
    rs = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'imgs')
    mask_dir = os.path.join(root, 'masks')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)

    def write_sample(name):
        h, w = size
        mask = np.zeros((h, w), np.uint8)
        img = np.tile(CLASS_COLORS[0], (h, w, 1)).astype(np.int16)
        for _ in range(rs.randint(2, 5)):
            c = rs.randint(1, len(CLASS_COLORS))
            bh, bw = rs.randint(h // 6, h // 2), rs.randint(w // 6, w // 2)
            y, x = rs.randint(0, h - bh), rs.randint(0, w - bw)
            mask[y:y + bh, x:x + bw] = c
            img[y:y + bh, x:x + bw] = CLASS_COLORS[c]
        img = np.clip(img + rs.randint(-12, 13, img.shape), 0,
                      255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name + '.png'))
        Image.fromarray(mask).save(os.path.join(mask_dir, name + '.png'))
        return f'imgs/{name}.png masks/{name}.png'

    splits_dir = os.path.join(root, 'splits')
    os.makedirs(splits_dir, exist_ok=True)
    paths = {}
    for kind, n in (('labeled', n_labeled), ('unlabeled', n_unlabeled),
                    ('val', n_val)):
        lines = [write_sample(f'{kind[0]}{i}') for i in range(n)]
        p = os.path.join(splits_dir, f'{kind}.txt')
        with open(p, 'w') as f:
            f.write('\n'.join(lines) + '\n')
        paths[kind] = p
    return paths


def _base_cfg(root, paths, method, epochs):
    from semivl_tpu.configs import config_from_vars
    cfg = config_from_vars(
        exp_id=95, model='mmseg.tiny-vlm-test', crop_size=64, batch_size=1,
        epochs=epochs, img_scale=None, method=method,
        criterion='CELoss', criterion_u='CELoss', conf_thresh=0.95,
        maskclip_consistency_lambda=0, lr=3e-3,
        eval_mode='zegclip_sliding_window')
    cfg['clip_encoder'] = None
    # nclass stays 21 (the tiny model's text embedding); blobs only use
    # classes 0-4, which dilutes absolute mIoU identically for both runs.
    cfg['data_root'] = root
    cfg['stride'] = 48
    cfg['labeled_id_path'] = paths['labeled']
    cfg['unlabeled_id_path'] = paths['unlabeled']
    cfg['val_id_path'] = paths['val']
    return cfg


def _read_curve(save_path, n_present=len(CLASS_COLORS)):
    """Parse metrics.jsonl -> per-epoch (mIoU, present-class mIoU).

    The blob task uses classes 0..n_present-1 of the 21-class tiny model;
    'present mIoU' averages only those, removing the 16-absent-class
    dilution from the headline number."""
    import json as _json

    from semivl_tpu.datasets.classes import CLASSES
    present = [f'eval/{CLASSES["pascal"][i]}_IoU' for i in range(n_present)]
    by_epoch = {}
    with open(os.path.join(save_path, 'metrics.jsonl')) as f:
        for line in f:
            rec = _json.loads(line)
            keys = [k for k in rec if k not in ('t', 'step')]
            if not keys:
                continue
            k = keys[0]
            if k == 'eval/mIoU' or k in present:
                by_epoch.setdefault(rec['step'], {})[k] = rec[k]
    curve = []
    for ep in sorted(by_epoch):
        row = by_epoch[ep]
        if 'eval/mIoU' not in row:
            continue
        pres = [row[k] for k in present if k in row]
        curve.append((ep, row['eval/mIoU'],
                      sum(pres) / len(pres) if pres else float('nan')))
    return curve


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out-root', default='/tmp/semi_effect_demo')
    parser.add_argument('--n-labeled', type=int, default=2)
    parser.add_argument('--n-unlabeled', type=int, default=16)
    parser.add_argument('--n-val', type=int, default=6)
    parser.add_argument('--sup-epochs', type=int, default=48,
                        help='supervised epochs (1 iter/epoch at 2 labeled '
                             'bs2) chosen to match total steps')
    parser.add_argument('--semi-epochs', type=int, default=6)
    parser.add_argument('--eval-every', type=int, default=1)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from semivl_tpu.train.loop import train

    ds_root = os.path.join(args.out_root, 'data')
    paths = make_blob_dataset(ds_root, args.n_labeled, args.n_unlabeled,
                              args.n_val, seed=args.seed)
    os.makedirs(args.out_root, exist_ok=True)
    os.chdir(args.out_root)

    results, curves = {}, {}
    for method, epochs in (('supervised', args.sup_epochs),
                           ('semivl', args.semi_epochs)):
        cfg = _base_cfg(ds_root, paths, method, epochs)
        cfg['eval_every_n_epochs'] = args.eval_every
        best, save_path = train(cfg, seed=args.seed)
        results[method] = best
        curves[method] = _read_curve(save_path)
        print(f'[semi-effect] {method}: best mIoU {best:.2f} ({save_path})')

    # matched-step learning curves: supervised epochs are 1 iter each at
    # this dataset geometry, semivl epochs are n_unlabeled/world iters
    print('[semi-effect] learning curves (epoch, mIoU, present-class mIoU):')
    for method, curve in curves.items():
        for ep, miou, pres in curve:
            print(f'[curve] {method} epoch={ep} miou={miou:.2f} '
                  f'present_miou={pres:.2f}')

    gain = results['semivl'] - results['supervised']
    print(f'[semi-effect] supervised={results["supervised"]:.2f} '
          f'semivl={results["semivl"]:.2f} gain={gain:+.2f}')


if __name__ == '__main__':
    main()
