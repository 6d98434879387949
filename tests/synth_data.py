"""Synthetic on-disk dataset fixture (SURVEY.md §4): a few random images +
masks in the reference split-file layout, for data-pipeline and train-loop
tests without real datasets."""

import os

import numpy as np
from PIL import Image


def make_synth_dataset(root, n_labeled=2, n_unlabeled=6, n_val=3,
                       num_classes=21, size=(80, 96), seed=0):
    """Create images/masks + split files under ``root``.

    Returns a run-config fragment (data_root + split paths).
    """
    rs = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'imgs')
    mask_dir = os.path.join(root, 'masks')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)

    def write_sample(name):
        h, w = size
        img = rs.randint(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name + '.png'))
        mask = rs.randint(0, num_classes, (h, w)).astype(np.uint8)
        mask[:4, :4] = 255  # some ignore pixels
        Image.fromarray(mask).save(os.path.join(mask_dir, name + '.png'))
        return f'imgs/{name}.png masks/{name}.png'

    splits_dir = os.path.join(root, 'splits')
    os.makedirs(splits_dir, exist_ok=True)
    lines_l = [write_sample(f'l{i}') for i in range(n_labeled)]
    lines_u = [write_sample(f'u{i}') for i in range(n_unlabeled)]
    lines_v = [write_sample(f'v{i}') for i in range(n_val)]
    paths = {}
    for kind, lines in (('labeled', lines_l), ('unlabeled', lines_u),
                        ('val', lines_v)):
        p = os.path.join(splits_dir, f'{kind}.txt')
        with open(p, 'w') as f:
            f.write('\n'.join(lines) + '\n')
        paths[kind] = p
    return paths


def synth_cfg(root, crop_size=64, num_classes=21, img_scale=None):
    return dict(
        dataset='pascal',
        data_root=root,
        nclass=num_classes,
        crop_size=crop_size,
        img_scale=img_scale,
        scale_ratio_range=(0.5, 2.0),
        labeled_photometric_distortion=False,
        split='synth',
    )
