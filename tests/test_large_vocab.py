"""Large-vocabulary (ADE N=150 / COCO N=81) coverage.

The reference trains ADE20K at 150 classes and COCO at 81
(/root/reference/experiments.py:373-424); the VLG decoder folds classes
into the batch axis, so N=150 multiplies every decoder plane op by 7x vs
VOC (SURVEY.md §7 hard parts). These tests exercise that regime end to end
at tiny dims on the CPU mesh, plus the real flagship ADE/COCO configs
through build_model (real text .npy, correct N plumbed everywhere).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from semivl_tpu.train.optim import build_optimizer
from semivl_tpu.train.step import (
    TrainState,
    make_semivl_train_step,
    replicate,
    shard_batch,
)

from tiny_model import tiny_bundle

IMG = 64
NCLS = 150  # ADE vocabulary


@pytest.fixture(scope='module')
def mesh():
    # 2 devices: the 150-plane decoder makes an 8-way batch too heavy for
    # a quick CPU test; 2-way still exercises sharding + pmean.
    return Mesh(np.array(jax.devices()[:2]), ('data',))


def _batch(rng, b, ncls):
    def img():
        return rng.randn(b, IMG, IMG, 3).astype(np.float32)

    boxes = np.zeros((b, IMG, IMG), np.float32)
    boxes[:, 10:30, 5:40] = 1
    ign = np.zeros((b, IMG, IMG), np.int32)
    return dict(
        img_x=img(), mask_x=rng.randint(0, ncls, (b, IMG, IMG)).astype(np.int32),
        img_w=img(), img_s1=img(), img_s2=img(), ignore_mask=ign,
        cutmix_box1=boxes, cutmix_box2=boxes,
        img_w_other=img(), img_s1_other=img(), img_s2_other=img(),
        ignore_mask_other=ign)


@pytest.mark.slow
def test_semivl_step_n150(mesh):
    """One fused semi-supervised step at ADE vocabulary size."""
    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG)
    img = jnp.zeros((1, IMG, IMG, 3))
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        img, jnp.asarray(bundle.text_feats),
        jnp.asarray(bundle.mcc_text_feats), method='init_variables')
    cfg = dict(
        conf_mode='pixelwise', conf_thresh=0.95, use_fp=True,
        criterion=dict(name='CELoss', kwargs=dict(ignore_index=255)),
        criterion_u='CELoss',
        maskclip_consistency_lambda=[0.1, 0], mcc_conf_thresh=0.9,
        mcc_loss_reduce='mean_all', fp_rate=0.5,
        optimizer=dict(type='AdamW', lr=1e-4, weight_decay=0.01,
                       paramwise_cfg=dict(custom_keys={
                           'backbone': dict(lr_mult=0.001),
                           'norm': dict(decay_mult=0.),
                           'head': dict(lr_mult=10.),
                       })),
        warmup_iters=0, warmup_ratio=1e-6)
    tx, _, mask = build_optimizer(
        cfg, params['params'], total_iters=10,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys)
    state = replicate(TrainState(
        params=params, opt_state=tx.init(params['params']),
        step=jnp.zeros((), jnp.int32)), mesh)
    step_fn = make_semivl_train_step(bundle, cfg, tx, mesh, total_iters=10,
                                     trainable_mask=mask)
    rng = np.random.RandomState(0)
    batch = shard_batch(_batch(rng, 2, NCLS), mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)
    new_state, metrics = step_fn(state, batch, key)
    metrics = jax.tree.map(np.asarray, metrics)
    for k in ('loss_all', 'loss_x', 'loss_s1', 'loss_mc_fp'):
        assert np.isfinite(metrics[k]), (k, metrics[k])
    assert int(np.asarray(new_state.step)[0] if np.ndim(
        np.asarray(new_state.step)) else new_state.step) == 1


@pytest.mark.slow
def test_sliding_eval_n150(mesh):
    """zegclip sliding-window eval with a 150-class head (canvas + argmax
    over the large vocabulary; reference supervised.py:69-102)."""
    from semivl_tpu.evaluation.predict import Evaluator

    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG, with_mcc=False)
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, IMG, IMG, 3)), jnp.asarray(bundle.text_feats),
        None, method='init_variables')
    cfg = dict(crop_size=IMG, stride=int(IMG * 2 / 3), nclass=NCLS)
    ev = Evaluator(bundle.module_fwd, variables, bundle.text_feats, cfg,
                   mesh=mesh)
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (1, IMG, IMG + 24, 3)).astype(np.uint8)
    pred = ev.predict(img, (60, 85), 'zegclip_sliding_window')
    pred = np.asarray(pred)
    assert pred.shape[-2:] == (60, 85)
    assert pred.min() >= 0 and pred.max() < NCLS


def test_flagship_large_vocab_configs_build():
    """The real ADE/COCO flagship configs resolve through build_model with
    the shipped text embeddings (N=150 / N=81) plumbed everywhere."""
    from __graft_entry__ import _flagship_cfg
    from semivl_tpu.models.builder import build_model

    for ds, n in (('ade', 150), ('coco', 81)):
        cfg = _flagship_cfg(crop_size=512, dataset=ds)
        assert cfg['nclass'] == n
        bundle = build_model(cfg, dtype=jnp.bfloat16)
        assert bundle.num_classes == n
        assert bundle.text_feats.shape == (n, 512)
        # COCO/ADE use mcc_text='same' -> single variant, N concepts == N
        assert bundle.mcc_text_feats.shape == (n, 512)
        assert np.allclose(
            np.linalg.norm(bundle.text_feats, axis=-1), 1.0, atol=1e-2)
