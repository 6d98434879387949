"""Tiny VLM bundle for fast CPU train/eval-loop tests."""

import numpy as np

from semivl_tpu.models.builder import ModelBundle
from semivl_tpu.models.vlm import VLM

EMB, LAYERS, HEADS, PATCH = 32, 2, 4, 16
CLIP_DIM = 16
CH = 32


def tiny_backbone_cfg(img_size, out_indices):
    return dict(
        type='MaskClipVisionTransformer',
        img_size=(img_size, img_size), patch_size=PATCH, embed_dims=EMB,
        num_layers=LAYERS, num_heads=HEADS, mlp_ratio=2, clip_dim=CLIP_DIM,
        out_indices=out_indices, pre_norm=True, final_norm=True,
        return_clip_embed=True, return_qkv=True, patch_bias=False)


def tiny_bundle(num_classes=21, img_size=64, with_mcc=True, seed=0):
    rs = np.random.RandomState(seed)
    decode_head = dict(
        type='VLGHead', img_size=img_size, num_classes=num_classes,
        text_in_channels=CLIP_DIM, text_channels=CH, up_channels=(CH, 16),
        skip_in_channels=(EMB, EMB), skip_channels=(16, 16),
        skip_from_conv_feat=False, num_layers=1, num_heads=2, channels=CH,
        pool_size=(2, 2), conv1_ksize=3, align_corners=False,
        text_embedding_name='')

    def l2(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    text = l2(rs.randn(num_classes, CLIP_DIM).astype(np.float32))
    mcc_text = (l2(rs.randn(num_classes, CLIP_DIM).astype(np.float32))
                if with_mcc else None)

    module = VLM(
        backbone_cfg=tiny_backbone_cfg(img_size, [0, 1, LAYERS]),
        decode_head_cfg=decode_head,
        clip_encoder_cfg=(tiny_backbone_cfg(img_size, None)
                          if with_mcc else None),
        fp_rate=0.5)

    return ModelBundle(
        module=module, text_feats=text, mcc_text_feats=mcc_text,
        num_classes=num_classes, img_size=img_size,
        model_cfg={}, freeze_backbone=True,
        exclude_keys=['attn', 'pos_embed'])
