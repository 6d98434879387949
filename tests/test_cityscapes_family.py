"""Cityscapes model family: VLM + ResNetV1c conv_encoder (skr04) with
skip_from_conv_feat and pixelavg confidence mode, through the fused step."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from semivl_tpu.models.builder import ModelBundle
from semivl_tpu.models.vlm import VLM
from semivl_tpu.train.optim import build_optimizer
from semivl_tpu.train.step import (
    TrainState,
    make_semivl_train_step,
    replicate,
    shard_batch,
)

from tiny_model import CLIP_DIM, EMB, tiny_backbone_cfg

IMG, NCLS, WORLD = 64, 5, 8


@pytest.mark.slow
def test_skr04_semivl_step(rng):
    head = dict(
        type='VLGHead', img_size=IMG, num_classes=NCLS,
        text_in_channels=CLIP_DIM, text_channels=32, up_channels=(32, 16),
        # skips: ViT layer feat (EMB ch) + conv_encoder stage-0 (256 ch)
        skip_in_channels=(EMB, 256), skip_channels=(16, 16),
        skip_from_conv_feat=True, num_layers=1, num_heads=2, channels=32,
        pool_size=(2, 2), conv1_ksize=3, align_corners=False,
        text_embedding_name='')
    conv_encoder = dict(type='ResNetV1c', depth=101, num_stages=1,
                        out_indices=[0])
    module = VLM(backbone_cfg=tiny_backbone_cfg(IMG, [1, 2]),
                 decode_head_cfg=head, conv_encoder_cfg=conv_encoder,
                 renorm_clip_img=True)  # Cityscapes renorm path
    text = rng.randn(NCLS, CLIP_DIM).astype(np.float32)
    bundle = ModelBundle(module=module, text_feats=text, mcc_text_feats=None,
                         num_classes=NCLS, img_size=IMG, model_cfg={},
                         freeze_backbone=True,
                         exclude_keys=['attn', 'pos_embed'])
    variables = module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, IMG, IMG, 3)), jnp.asarray(text),
        method='init_variables')
    assert 'conv_encoder' in variables['params']
    assert 'batch_stats' in variables  # SyncBN stats of the conv encoder

    cfg = dict(conf_mode='pixelavg', conf_thresh=0.95, use_fp=True,
               criterion=dict(name='CELoss', kwargs={}),
               criterion_u='CELoss', nclass=NCLS,
               maskclip_consistency_lambda=0, fp_rate=0.5,
               optimizer=dict(type='AdamW', lr=5e-5, weight_decay=0.01,
                              paramwise_cfg=dict(custom_keys={
                                  'backbone': dict(lr_mult=0.1),
                                  'conv_encoder': dict(lr_mult=0.1),
                                  'head': dict(lr_mult=10.)})),
               warmup_iters=0, warmup_ratio=1e-6)
    tx, _, mask = build_optimizer(cfg, variables['params'], total_iters=10,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    # conv_encoder is trainable (Cityscapes conv_enc_lr_mult path)
    assert mask['conv_encoder']['stem1']['conv']['kernel']

    state = TrainState(params=variables,
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    mesh = Mesh(np.array(jax.devices()[:WORLD]), ('data',))
    step_fn = make_semivl_train_step(bundle, cfg, tx, mesh, total_iters=10,
                                     trainable_mask=mask)

    def imgs():
        return rng.randn(WORLD, IMG, IMG, 3).astype(np.float32)

    boxes = np.zeros((WORLD, IMG, IMG), np.float32)
    boxes[:, 8:30, 8:40] = 1
    ign = np.zeros((WORLD, IMG, IMG), np.int32)
    batch = shard_batch(dict(
        img_x=imgs(),
        mask_x=rng.randint(0, NCLS, (WORLD, IMG, IMG)).astype(np.int32),
        img_w=imgs(), img_s1=imgs(), img_s2=imgs(), ignore_mask=ign,
        cutmix_box1=boxes, cutmix_box2=boxes,
        img_w_other=imgs(), img_s1_other=imgs(), img_s2_other=imgs(),
        ignore_mask_other=ign), mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert int(np.asarray(new_state.step)) == 1
