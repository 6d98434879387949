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


@pytest.mark.slow
def test_full_semivl_loop(loop_cfg, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    best, save_path = train(loop_cfg, seed=0)
    assert 0.0 <= best <= 100.0
    assert os.path.isfile(os.path.join(save_path, 'all_args.yaml'))
    assert os.path.isfile(os.path.join(save_path, 'metrics.jsonl'))
    # the per-epoch debug grid (loop catches exceptions and only warns —
    # assert it actually rendered through the jitted device-param path)
    import glob
    assert glob.glob(os.path.join(save_path, 'debug', '*.png'))
    assert os.path.isdir(os.path.join(save_path, 'ckpt', 'latest'))
    assert os.path.isdir(os.path.join(save_path, 'ckpt', 'best'))
    with open(os.path.join(save_path, 'all_args.yaml')) as f:
        args = yaml.load(f, Loader=yaml.Loader)
    assert args['nclass'] == 21


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from semivl_tpu.train.checkpoint import CheckpointManager
    from semivl_tpu.train.step import TrainState

    state = TrainState(
        params={'params': {'w': jnp.ones((3, 3))}},
        opt_state={'mu': jnp.zeros((3, 3))},
        step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save('latest', state, extra={'epoch': 4, 'previous_best': 55.5})
    assert mgr.exists('latest')

    blank = TrainState(
        params={'params': {'w': jnp.zeros((3, 3))}},
        opt_state={'mu': jnp.ones((3, 3))},
        step=jnp.asarray(0, jnp.int32))
    restored, extra = mgr.restore('latest', blank)
    np.testing.assert_array_equal(np.asarray(restored.params['params']['w']),
                                  np.ones((3, 3)))
    assert int(np.asarray(restored.step)) == 7
    assert extra['epoch'] == 4 and extra['previous_best'] == 55.5

    # ema variant
    state_e = state.replace(ema_params={'w': jnp.full((3, 3), 2.0)})
    mgr.save('best', state_e, extra={'epoch': 1, 'previous_best': 1.0})
    blank_e = blank.replace(ema_params={'w': jnp.zeros((3, 3))})
    restored_e, _ = mgr.restore('best', blank_e)
    np.testing.assert_array_equal(
        np.asarray(restored_e.ema_params['w']), np.full((3, 3), 2.0))
