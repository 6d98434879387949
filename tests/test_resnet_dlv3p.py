"""ResNetV1c + DLV3P head tests: torch parity for the bottleneck math,
BN running-stat updates, and the dlv3p model path through the train step."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from semivl_tpu.models.resnet import Bottleneck, ConvBNReLU, ResNetV1c


def test_conv_bn_relu_parity(rng):
    tm = nn.Sequential(nn.Conv2d(4, 8, 3, padding=2, dilation=2, bias=False),
                       nn.BatchNorm2d(8), nn.ReLU()).eval()
    with torch.no_grad():
        tm[1].running_mean.normal_()
        tm[1].running_var.uniform_(0.5, 2.0)
        tm[1].weight.normal_()
        tm[1].bias.normal_()
    x = rng.randn(2, 10, 10, 4).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()

    m = ConvBNReLU(8, 3, dilation=2, axis_name=None)
    params = {'params': {'conv': {
        'kernel': tm[0].weight.detach().numpy().transpose(2, 3, 1, 0)}},
        'batch_stats': {'bn': {'mean': tm[1].running_mean.numpy(),
                               'var': tm[1].running_var.numpy()}}}
    params['params']['bn'] = {'scale': tm[1].weight.detach().numpy(),
                              'bias': tm[1].bias.detach().numpy()}
    got = np.asarray(m.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet_stage1_shapes(rng):
    m = ResNetV1c(depth=101, num_stages=1, out_indices=(0,), axis_name=None)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    assert len(outs) == 1
    assert outs[0].shape == (1, 16, 16, 256)  # stride 4, 256 ch
    assert 'batch_stats' in variables


def test_bn_stats_update(rng):
    m = ConvBNReLU(8, 3, axis_name=None)
    x = jnp.asarray(rng.randn(4, 8, 8, 4), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    before = np.asarray(variables['batch_stats']['bn']['mean'])
    _, upd = m.apply(variables, x, train=True, mutable=['batch_stats'])
    after = np.asarray(upd['batch_stats']['bn']['mean'])
    assert np.abs(after - before).max() > 0


@pytest.mark.slow
def test_dlv3p_model_supervised_step(rng):
    """dlv3p ablation model (BN head) through the supervised train step on
    the 8-device mesh — exercises batch_stats threading + SyncBN."""
    from jax.sharding import Mesh
    from semivl_tpu.models.builder import ModelBundle
    from semivl_tpu.models.vlm import VLM
    from semivl_tpu.train.optim import build_optimizer
    from semivl_tpu.train.step import (
        TrainState, make_supervised_train_step, replicate, shard_batch)
    from tiny_model import tiny_backbone_cfg, CLIP_DIM

    head = dict(type='DLV3PHead', img_size=64, num_classes=5,
                in_channels=CLIP_DIM, channels=32, c1_in_channels=32,
                c1_channels=16, dilations=(2, 4, 6), align_corners=False)
    module = VLM(backbone_cfg=tiny_backbone_cfg(64, [1, 2]),
                 decode_head_cfg=head)
    text = rng.randn(5, CLIP_DIM).astype(np.float32)
    bundle = ModelBundle(module=module, text_feats=text, mcc_text_feats=None,
                         num_classes=5, img_size=64, model_cfg={},
                         freeze_backbone=True,
                         exclude_keys=['attn', 'pos_embed'])
    variables = module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), jnp.asarray(text),
        method='init_variables')
    assert 'batch_stats' in variables

    cfg = dict(criterion=dict(name='CELoss', kwargs={}),
               optimizer=dict(type='AdamW', lr=1e-4, weight_decay=0.01,
                              paramwise_cfg=dict(custom_keys={})),
               warmup_iters=0, warmup_ratio=1e-6)
    tx, _, mask = build_optimizer(cfg, variables['params'], total_iters=10,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    state = TrainState(params=variables,
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    step_fn = make_supervised_train_step(bundle, cfg, tx, mesh, mask)
    batch = shard_batch(dict(
        img=rng.randn(8, 64, 64, 3).astype(np.float32),
        mask=rng.randint(0, 5, (8, 64, 64)).astype(np.int32)), mesh)
    # snapshot BEFORE the step: donated input buffers are deleted after
    old = np.array(
        variables['batch_stats']['decode_head']['aspp']['b0']['bn']['mean'])
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    # BN running stats advanced
    new = np.asarray(jax.device_get(
        new_state.params['batch_stats']['decode_head']['aspp']['b0']['bn']
        ['mean']))
    assert np.abs(new - old).max() > 0
