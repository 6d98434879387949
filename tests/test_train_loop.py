"""End-to-end training-loop smoke test: synthetic data, tiny model, 8-device
mesh, two epochs with eval + checkpoint + resume."""

import os

import numpy as np
import pytest
import yaml

from semivl_tpu.configs import config_from_vars
from semivl_tpu.train.loop import train

from synth_data import make_synth_dataset


@pytest.fixture(scope='module')
def loop_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('loopds'))
    paths = make_synth_dataset(root, n_labeled=2, n_unlabeled=8, n_val=2,
                               size=(72, 88))
    cfg = config_from_vars(
        exp_id=99, model='mmseg.tiny-vlm-test', crop_size=64,
        batch_size=1, epochs=2, img_scale=None,
        criterion='CELoss', criterion_u='CELoss',
        maskclip_consistency_lambda=[0.1, 0], mcc_conf_thresh=0.9,
        mcc_text='concept4_single', mcc_loss_reduce='mean_all',
        eval_mode='zegclip_sliding_window')
    cfg['clip_encoder'] = 'tiny-mcvit-test'
    cfg['data_root'] = root
    cfg['stride'] = 48
    cfg['labeled_id_path'] = paths['labeled']
    cfg['unlabeled_id_path'] = paths['unlabeled']
    cfg['val_id_path'] = paths['val']
    return cfg


def test_full_semivl_loop(loop_cfg, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    best, save_path = train(loop_cfg, seed=0)
    assert 0.0 <= best <= 100.0
    assert os.path.isfile(os.path.join(save_path, 'all_args.yaml'))
    assert os.path.isfile(os.path.join(save_path, 'metrics.jsonl'))
    assert os.path.isdir(os.path.join(save_path, 'ckpt', 'latest'))
    assert os.path.isdir(os.path.join(save_path, 'ckpt', 'best'))
    with open(os.path.join(save_path, 'all_args.yaml')) as f:
        args = yaml.load(f, Loader=yaml.Loader)
    assert args['nclass'] == 21
