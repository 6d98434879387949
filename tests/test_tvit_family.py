"""UniMatch-w/-ViT ablation build path: VLM with a TIMM ViT backbone and
DLV3P head (reference vlm-dlv3p-bn11-sk4-ft-tvit-in1k.py, exp-41 grid
entry experiments.py:347). The head's SyncBN (axis_name='data') requires
train-mode forwards to run inside the data mesh, exactly as the trainer
does."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from semivl_tpu.configs import config_from_vars
from semivl_tpu.models.builder import build_model
from semivl_tpu.train.optim import build_optimizer
from semivl_tpu.train.step import (
    TrainState,
    make_supervised_train_step,
    replicate,
    shard_batch,
)

IMG = 128
WORLD = 8


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.slow
def test_tvit_vlm_builds_and_runs(rng):
    cfg = config_from_vars(
        exp_id=99, model='mmseg.vlm-dlv3p-bn11-sk4-ft-tvit-in1k', lr=1e-4,
        backbone_lr_mult=0.001, criterion='CELoss', criterion_u='CELoss',
        img_scale=None, crop_size=IMG, maskclip_consistency_lambda=0,
        method='supervised')
    bundle = build_model(cfg)
    assert not bundle.freeze_backbone  # 'ft' variant trains the backbone
    x = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)
    text = jnp.asarray(bundle.text_feats)
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        x, text, method='init_variables')
    assert 'batch_stats' in variables  # SyncBN head
    out = bundle.module.apply(variables, x, text)  # eval-mode forward
    assert out.shape == (1, 21, IMG, IMG)
    assert np.isfinite(np.asarray(out)).all()

    # train-mode (BN + FP dropout) through the real supervised step on the
    # data mesh — grads flow through the timm backbone
    mesh = Mesh(np.array(jax.devices()[:WORLD]), ('data',))
    tx, _, mask = build_optimizer(
        cfg, variables['params'], total_iters=10,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys)
    state = TrainState(params=variables,
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_supervised_train_step(bundle, cfg, tx, mesh, mask)
    batch = shard_batch(dict(
        img=rng.randn(WORLD, IMG, IMG, 3).astype(np.float32),
        mask=rng.randint(0, 21, (WORLD, IMG, IMG)).astype(np.int32)), mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert int(np.asarray(jax.device_get(new_state.step))) == 1
