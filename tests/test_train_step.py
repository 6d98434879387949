"""Fused train-step integration tests on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from semivl_tpu.train.optim import (
    build_optimizer,
    make_poly_schedule,
    param_path_strings,
    trainable_mask,
    _custom_key_mults,
)
from semivl_tpu.train.step import (
    TrainState,
    make_semivl_train_step,
    make_supervised_train_step,
    replicate,
    shard_batch,
)

from tiny_model import tiny_bundle

WORLD = 8
IMG = 64
NCLS = 21


def run_cfg(**over):
    cfg = dict(
        conf_mode='pixelwise', conf_thresh=0.95, use_fp=True,
        criterion=dict(name='CELoss', kwargs=dict(ignore_index=255)),
        criterion_u='CELoss',
        maskclip_consistency_lambda=[0.1, 0], mcc_conf_thresh=0.9,
        mcc_loss_reduce='mean_all', fp_rate=0.5,
        optimizer=dict(type='AdamW', lr=1e-4, weight_decay=0.01,
                       paramwise_cfg=dict(custom_keys={
                           'backbone': dict(lr_mult=0.01),
                           'text_encoder': dict(lr_mult=0.0),
                           'conv_encoder': dict(lr_mult=1.0),
                           'norm': dict(decay_mult=0.),
                           'ln': dict(decay_mult=0.),
                           'head': dict(lr_mult=10.),
                       })),
        warmup_iters=0, warmup_ratio=1e-6,
        log_grad_norm=True)
    cfg.update(over)
    return cfg


@pytest.fixture(scope='module')
def mesh():
    return Mesh(np.array(jax.devices()[:WORLD]), ('data',))


@pytest.fixture(scope='module')
def setup(mesh):
    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG)
    img = jnp.zeros((1, IMG, IMG, 3))
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        img, jnp.asarray(bundle.text_feats),
        jnp.asarray(bundle.mcc_text_feats), method='init_variables')
    cfg = run_cfg()
    tx, sched, mask = build_optimizer(
        cfg, params['params'], total_iters=100,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys)
    state = TrainState(params=params, opt_state=tx.init(params['params']),
                       step=jnp.zeros((), jnp.int32))
    return bundle, cfg, tx, mask, state


def synth_batch(rng, b):
    def img():
        return rng.randn(b, IMG, IMG, 3).astype(np.float32)

    def boxes():
        m = np.zeros((b, IMG, IMG), np.float32)
        m[:, 10:30, 5:40] = 1
        return m

    ign = np.zeros((b, IMG, IMG), np.int32)
    ign[:, :, :3] = 255
    return dict(
        img_x=img(), mask_x=rng.randint(0, NCLS, (b, IMG, IMG)).astype(np.int32),
        img_w=img(), img_s1=img(), img_s2=img(), ignore_mask=ign,
        cutmix_box1=boxes(), cutmix_box2=boxes(),
        img_w_other=img(), img_s1_other=img(), img_s2_other=img(),
        ignore_mask_other=ign)


@pytest.mark.slow
def test_semivl_step(mesh, setup, rng):
    bundle, cfg, tx, mask, state = setup
    # the step donates its input state; tests share the fixture, so step on
    # a private copy
    state = jax.tree.map(jnp.array, state)
    # params in optimizer-facing layout: state.params has {'params': ...}
    step_fn = make_semivl_train_step(
        bundle, cfg, tx, mesh, total_iters=100, trainable_mask=mask)

    batch = shard_batch(synth_batch(rng, WORLD), mesh)
    state_r = replicate(state, mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)

    old_params = jax.tree.map(np.asarray, state.params['params'])
    new_state, metrics = step_fn(state_r, batch, key)
    metrics = jax.tree.map(np.asarray, metrics)

    for k in ['loss_all', 'loss_x', 'loss_s1', 'loss_s2', 'loss_fp',
              'loss_mc_s1', 'loss_mc_s2', 'loss_mc_fp', 'grad_norm']:
        assert k in metrics and np.isfinite(metrics[k]), (k, metrics.get(k))
    assert float(metrics['grad_norm']) > 0
    assert int(new_state.step) == 1

    new_params = jax.tree.map(np.asarray, new_state.params['params'])

    def changed(path_parts):
        sub_old, sub_new = old_params, new_params
        for p in path_parts:
            sub_old, sub_new = sub_old[p], sub_new[p]
        return np.abs(sub_old - sub_new).max() > 0

    # frozen: clip encoder and non-attn backbone params
    assert not changed(('clip_encoder', 'layers_0', 'attn', 'in_proj',
                        'kernel'))
    assert not changed(('backbone', 'layers_0', 'ffn', 'fc1', 'kernel'))
    assert not changed(('backbone', 'ln0', 'scale'))
    # finetuned: backbone attn + pos_embed (exclude_keys semantics)
    assert changed(('backbone', 'layers_0', 'attn', 'in_proj', 'kernel'))
    assert changed(('backbone', 'pos_embed'))
    # decoder trains
    assert changed(('decode_head', 'conv1', 'kernel'))

    # second step with donated buffers still works
    batch2 = shard_batch(synth_batch(rng, WORLD), mesh)
    new_state2, m2 = step_fn(new_state, batch2, key)
    assert int(new_state2.step) == 2
    assert np.isfinite(np.asarray(m2['loss_all']))


@pytest.mark.slow
def test_supervised_step(mesh, rng):
    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG, with_mcc=False)
    img = jnp.zeros((1, IMG, IMG, 3))
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        img, jnp.asarray(bundle.text_feats), method='init_variables')
    cfg = run_cfg(maskclip_consistency_lambda=0)
    tx, _, mask = build_optimizer(cfg, params['params'], total_iters=10,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    state = TrainState(params=params, opt_state=tx.init(params['params']),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_supervised_train_step(bundle, cfg, tx, mesh, mask)
    batch = shard_batch(dict(
        img=rng.randn(WORLD, IMG, IMG, 3).astype(np.float32),
        mask=rng.randint(0, NCLS, (WORLD, IMG, IMG)).astype(np.int32)), mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_on_device_aug_and_ema_step(mesh, setup, rng):
    """semivl step with on-device strong augs and an EMA teacher."""
    bundle, cfg, tx, mask, state = setup
    state = jax.tree.map(jnp.array, state)  # see donation note above
    cfg = dict(cfg)
    cfg['strong_aug_on_device'] = True
    cfg['ema_decay'] = 0.99
    state = TrainState(params=state.params, opt_state=state.opt_state,
                       step=state.step,
                       ema_params=jax.tree.map(jnp.array,
                                               state.params['params']))
    step_fn = make_semivl_train_step(
        bundle, cfg, tx, mesh, total_iters=100, trainable_mask=mask)

    raw = rng.rand(WORLD, IMG, IMG, 3).astype(np.float32)
    ign = np.zeros((WORLD, IMG, IMG), np.int32)
    boxes = np.zeros((WORLD, IMG, IMG), np.float32)
    boxes[:, 10:30, 5:40] = 1
    batch = shard_batch(dict(
        img_x=rng.randn(WORLD, IMG, IMG, 3).astype(np.float32),
        mask_x=rng.randint(0, NCLS, (WORLD, IMG, IMG)).astype(np.int32),
        img_raw=raw, img_raw_other=rng.rand(WORLD, IMG, IMG, 3)
        .astype(np.float32),
        ignore_mask=ign, ignore_mask_other=ign,
        cutmix_box1=boxes, cutmix_box2=boxes), mesh)
    old_ema = np.asarray(
        state.ema_params['decode_head']['conv1']['kernel'])
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    new_ema = np.asarray(jax.device_get(
        new_state.ema_params['decode_head']['conv1']['kernel']))
    new_param = np.asarray(jax.device_get(
        new_state.params['params']['decode_head']['conv1']['kernel']))
    assert np.abs(new_ema - old_ema).max() > 0          # EMA moved
    assert np.abs(new_ema - new_param).max() > 1e-9     # but lags params


@pytest.mark.slow
def test_on_device_labeled_pmd_step(mesh, setup, rng):
    """uint8 labeled transport + on-device PhotoMetricDistortion
    (reference semi.py:79-82, Cityscapes labeled_photometric_distortion)."""
    bundle, cfg, tx, mask, state = setup
    state = jax.tree.map(jnp.array, state)
    cfg = dict(cfg)
    cfg['strong_aug_on_device'] = True
    cfg['labeled_photometric_distortion'] = True
    step_fn = make_semivl_train_step(
        bundle, cfg, tx, mesh, total_iters=100, trainable_mask=mask)
    ign = np.zeros((WORLD, IMG, IMG), np.int32)
    boxes = np.zeros((WORLD, IMG, IMG), np.float32)
    boxes[:, 10:30, 5:40] = 1
    batch = shard_batch(dict(
        img_x=(rng.rand(WORLD, IMG, IMG, 3) * 255).astype(np.uint8),
        mask_x=rng.randint(0, NCLS, (WORLD, IMG, IMG)).astype(np.int32),
        img_raw=(rng.rand(WORLD, IMG, IMG, 3) * 255).astype(np.uint8),
        img_raw_other=(rng.rand(WORLD, IMG, IMG, 3) * 255).astype(np.uint8),
        ignore_mask=ign, ignore_mask_other=ign,
        cutmix_box1=boxes, cutmix_box2=boxes), mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert int(np.asarray(jax.device_get(new_state.step))) == 1


def test_poly_schedule():
    sched = make_poly_schedule(1e-4, max_iters=100, warmup_iters=10,
                               warmup_ratio=1e-6)
    lr0 = float(sched(0))
    assert lr0 == pytest.approx(1e-4 * 1e-6, rel=1e-3)
    assert float(sched(10)) == pytest.approx(1e-4 * 0.9 ** 0.9, rel=1e-4)
    assert float(sched(100)) == 0.0
    sched2 = make_poly_schedule(1e-4, max_iters=100)
    assert float(sched2(0)) == pytest.approx(1e-4)


def test_custom_key_mults_mmseg_semantics():
    keys = {
        'backbone': dict(lr_mult=0.01),
        'text_encoder': dict(lr_mult=0.0),
        'conv_encoder': dict(lr_mult=0.5),
        'norm': dict(decay_mult=0.),
        'ln': dict(decay_mult=0.),
        'head': dict(lr_mult=10.),
    }
    # decode_head matches 'head' (incl. its ln params: 'head' wins over 'ln')
    assert _custom_key_mults(keys, 'decode_head.conv1.kernel') == (10., 1.0)
    assert _custom_key_mults(
        keys, 'decode_head.layers_0.transformer.ln1.scale') == (10., 1.0)
    # backbone matches 'backbone' first (longer key), even for ln params
    assert _custom_key_mults(keys, 'backbone.ln0.scale') == (0.01, 1.0)
    assert _custom_key_mults(keys, 'conv_encoder.stem.conv.kernel') == (0.5, 1.0)


def test_trainable_mask_semantics():
    params = {
        'backbone': {'layers_0': {'attn': {'in_proj': {'kernel': 0}},
                                  'ffn': {'fc1': {'kernel': 0}}},
                     'pos_embed': 0, 'ln0': {'scale': 0}},
        'decode_head': {'conv1': {'kernel': 0}},
        'clip_encoder': {'proj': {'kernel': 0}},
    }
    mask = trainable_mask(params, True, ['attn', 'pos_embed'])
    assert mask['backbone']['layers_0']['attn']['in_proj']['kernel']
    assert mask['backbone']['pos_embed']
    assert not mask['backbone']['layers_0']['ffn']['fc1']['kernel']
    assert not mask['backbone']['ln0']['scale']
    assert mask['decode_head']['conv1']['kernel']
    assert not mask['clip_encoder']['proj']['kernel']


def test_param_paths():
    paths = param_path_strings({'a': {'b': 1, 'c': {'d': 2}}})
    assert paths == {'a': {'b': 'a.b', 'c': {'d': 'a.c.d'}}}


@pytest.mark.slow
def test_unimatch_step_no_mcc(mesh, rng):
    """method='unimatch': the same fused step with the MaskCLIP-consistency
    branch off (reference: same semivl.py code path, SURVEY.md §2.1)."""
    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG, with_mcc=False)
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, IMG, IMG, 3)), jnp.asarray(bundle.text_feats),
        method='init_variables')
    assert 'clip_encoder' not in params['params']
    cfg = run_cfg(maskclip_consistency_lambda=0)
    tx, _, mask = build_optimizer(cfg, params['params'], total_iters=50,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    state = TrainState(params=params, opt_state=tx.init(params['params']),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_semivl_train_step(bundle, cfg, tx, mesh, total_iters=50,
                                     trainable_mask=mask)
    batch = shard_batch(synth_batch(rng, WORLD), mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert 'loss_mc_s1' not in metrics  # no guidance branch


@pytest.mark.quick
def test_mmseg_criterion_requires_atm_head(mesh):
    """criterion 'mmseg' hardwires SegLossPlus; pairing it with a non-ATM
    head (VLG uses loss_decode=None + CELoss in the reference grid) must
    fail loudly instead of silently misassigning the loss."""
    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG, with_mcc=False)
    cfg = run_cfg(criterion=dict(name='mmseg'))
    with pytest.raises(AssertionError, match='ATM'):
        make_supervised_train_step(bundle, cfg, None, mesh, None)
    cfg = run_cfg(criterion_u='mmseg')
    with pytest.raises(AssertionError, match='ATM'):
        make_semivl_train_step(bundle, cfg, None, mesh, 10, None)


def test_supervised_step_uint8_transport_and_ema(mesh, rng):
    """supervised + strong_aug_on_device (uint8 image/label transport with
    in-graph normalisation and optional photometric distortion) + EMA: the
    step must consume img_u8 and carry ema_params forward (both previously
    dropped on the supervised path)."""
    bundle = tiny_bundle(num_classes=NCLS, img_size=IMG, with_mcc=False)
    img = jnp.zeros((1, IMG, IMG, 3))
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        img, jnp.asarray(bundle.text_feats), method='init_variables')
    cfg = run_cfg(maskclip_consistency_lambda=0)
    cfg['strong_aug_on_device'] = True
    cfg['labeled_photometric_distortion'] = True
    cfg['ema_decay'] = 0.9
    tx, _, mask = build_optimizer(cfg, params['params'], total_iters=10,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    ema0 = jax.tree.map(np.asarray, params['params'])  # host snapshot
    state = TrainState(params=params, opt_state=tx.init(params['params']),
                       step=jnp.zeros((), jnp.int32),
                       ema_params=jax.tree.map(jnp.array, ema0))
    step_fn = make_supervised_train_step(bundle, cfg, tx, mesh, mask)
    batch = shard_batch(dict(
        img_u8=rng.randint(0, 256, (WORLD, IMG, IMG, 3)).astype(np.uint8),
        mask=rng.randint(0, NCLS, (WORLD, IMG, IMG)).astype(np.uint8)),
        mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert new_state.ema_params is not None
    # EMA moved toward the updated params (trainable leaves changed)
    moved = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        new_state.ema_params, ema0))
    assert max(moved) > 0
