"""Mid-epoch preemption + exact resume.

The reference loses the run on any interruption (SURVEY.md §5). Our loop
checkpoints at the preemption boundary with ``(epoch, epoch_step)`` and
resumes INSIDE the epoch: the loader permutation depends only on
``(seed, epoch)`` and the per-step RNG only on the global step, so a
preempted+resumed run must be BIT-IDENTICAL to an uninterrupted one."""

import json
import os

import numpy as np
import pytest

from semivl_tpu.configs import config_from_vars
from semivl_tpu.train.loop import train

from synth_data import make_synth_dataset


@pytest.fixture(scope='module')
def resume_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('resumeds'))
    # 16 unlabeled / 8 ranks / bs1 -> 2 steps per epoch; 2 epochs = 4 steps
    paths = make_synth_dataset(root, n_labeled=2, n_unlabeled=16, n_val=2,
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
    cfg['debug_images'] = False
    return cfg


def _load_raw(save_path, name='latest'):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(save_path, 'ckpt', name))
    tree = ocp.StandardCheckpointer().restore(path)
    with open(path + '.extra.json') as f:
        extra = json.load(f)
    return tree, extra


@pytest.mark.slow
def test_mid_epoch_preempt_resume_bit_exact(resume_cfg, tmp_path,
                                            monkeypatch):
    monkeypatch.chdir(tmp_path)

    # A: uninterrupted 4-step run
    best_a, path_a = train(resume_cfg, seed=0)

    # B: fault-injected preemption right after global step 0 (mid epoch 0)
    cfg_p = dict(resume_cfg, preempt_at_step=0)
    _, path_b = train(cfg_p, seed=0)
    tree_b, extra_b = _load_raw(path_b)
    assert int(np.asarray(tree_b['step'])) == 1
    assert extra_b['epoch'] == 0.0 and extra_b['epoch_step'] == 1.0

    # resume B to completion (no injection this time)
    best_b, path_b2 = train(resume_cfg, seed=0, resume_from=path_b)
    assert path_b2 == path_b

    tree_a, extra_a = _load_raw(path_a)
    tree_b, extra_b = _load_raw(path_b)
    assert int(np.asarray(tree_a['step'])) == int(np.asarray(tree_b['step']))
    assert extra_a == extra_b
    assert best_a == best_b

    leaves_a, treedef_a = _flatten(tree_a)
    leaves_b, treedef_b = _flatten(tree_b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _flatten(tree):
    import jax
    return jax.tree.flatten(tree)
