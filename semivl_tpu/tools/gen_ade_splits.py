#!/usr/bin/env python
"""Regenerate the ADE20K labeled/unlabeled split lists.

Parity: reference splits/gen_ade_splits.py:15-47 — seed-0 shuffle of the
sorted training file list, labeled = first round(N/denom) files for
denominators 128/64/32/16/8, plus the validation list. The bundled
assets were produced with exactly this procedure; this tool exists to
regenerate them against a local ADE20K copy.

    python -m semivl_tpu.tools.gen_ade_splits --root ~/data/ADEChallengeData2016 \
        --out semivl_tpu/assets/splits/ade
"""

import argparse
import os
import random


def save_split(file_name, selected, mode='training'):
    lines = []
    for s in selected:
        stem = s.rsplit('.', 1)[0]
        lines.append(f'images/{mode}/{stem}.jpg annotations/{mode}/{stem}.png')
    os.makedirs(os.path.dirname(file_name), exist_ok=True)
    with open(file_name, 'w') as f:
        f.write('\n'.join(lines))


def generate(root, out_dir, denominators=(128, 64, 32, 16, 8), seed=0):
    root = os.path.expanduser(root)
    files = sorted(os.listdir(os.path.join(root, 'images/training')))
    random.Random(seed).shuffle(files)
    n_files = len(files)
    for denom in denominators:
        n_split = round(n_files / denom)
        labeled = files[:n_split]
        unlabeled = files[n_split:]
        save_split(os.path.join(out_dir, f'1_{denom}', 'labeled.txt'),
                   labeled)
        save_split(os.path.join(out_dir, f'1_{denom}', 'unlabeled.txt'),
                   unlabeled)
    val = sorted(os.listdir(os.path.join(root, 'images/validation')))
    save_split(os.path.join(out_dir, 'val.txt'), val, mode='validation')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', required=True)
    parser.add_argument('--out', default='semivl_tpu/assets/splits/ade')
    args = parser.parse_args()
    generate(args.root, args.out)


if __name__ == '__main__':
    main()
