"""Learning-dynamics check: the full optimizer/step/model stack must be able
to overfit a learnable target (guards against silent gradient breakage)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from semivl_tpu.train.optim import build_optimizer
from semivl_tpu.train.step import (
    TrainState,
    make_supervised_train_step,
    replicate,
    shard_batch,
)

from tiny_model import tiny_bundle


@pytest.mark.slow
def test_overfits_learnable_target(rng):
    bundle = tiny_bundle(num_classes=5, img_size=64, with_mcc=False)
    text = bundle.text_feats
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), jnp.asarray(text),
        method='init_variables')
    cfg = dict(criterion=dict(name='CELoss', kwargs={}),
               optimizer=dict(type='AdamW', lr=3e-3, weight_decay=0.01,
                              paramwise_cfg=dict(custom_keys={
                                  'backbone': dict(lr_mult=0.1),
                                  'head': dict(lr_mult=1.0)})),
               warmup_iters=0, warmup_ratio=1e-6)
    tx, _, mask = build_optimizer(cfg, variables['params'], total_iters=1000,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    state = TrainState(params=variables,
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    mesh = Mesh(np.array(jax.devices()[:1]), ('data',))
    step = make_supervised_train_step(bundle, cfg, tx, mesh, mask)

    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    m = np.zeros((2, 64, 64), np.int32)
    m[:, 32:, :] += 1
    m[:, :, 32:] += 2
    batch = shard_batch(dict(img=img, mask=m), mesh)
    state = replicate(state, mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)
    first = None
    for _ in range(40):
        state, metrics = step(state, batch, key)
        loss = float(np.asarray(metrics['loss_all']))
        if first is None:
            first = loss
    assert loss < first * 0.3, (first, loss)
