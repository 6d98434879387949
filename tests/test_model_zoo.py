"""Remaining model-zoo contract tests: timm ViT, DeepLabV3+, Xception,
MaskCLIP heads, deeplabv3plus build path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.models.deeplabv3plus import DeepLabV3Plus
from semivl_tpu.models.maskclip_heads import MaskClip2Head, MaskClipHead
from semivl_tpu.models.timm_vit import TIMMVisionTransformer


def test_timm_vit_contract(rng):
    m = TIMMVisionTransformer(img_size=(64, 64), embed_dims=32, num_layers=3,
                              num_heads=4, out_indices=(1, 2))
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert len(out['feats']) == 2
    assert out['feats'][0].shape == (2, 4, 4, 32)
    assert out['global_emb'].shape == (2, 32)
    # off-size input resized to train size at eval (timm_vit.py:67-70)
    y = m.apply(variables, jnp.zeros((1, 96, 80, 3)))
    assert y['feats'][0].shape == (1, 4, 4, 32)


@pytest.mark.slow
def test_deeplabv3plus_need_fp(rng):
    m = DeepLabV3Plus(num_classes=5, backbone='resnet50', axis_name=None)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = m.init({'params': jax.random.PRNGKey(0),
                        'fp': jax.random.PRNGKey(1)}, x)
    out = m.apply(variables, x)
    assert out.shape == (1, 5, 64, 64)
    pred, pred_fp = m.apply(variables, x, need_fp=True,
                            rngs={'fp': jax.random.PRNGKey(2)})
    assert pred.shape == pred_fp.shape == (1, 5, 64, 64)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(out),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_xception_shapes(rng):
    from semivl_tpu.models.xception import Xception65
    m = Xception65(axis_name=None)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    c1, c4 = m.apply(variables, x)
    assert c1.shape == (1, 16, 16, 256)   # stride 4 hook
    assert c4.shape == (1, 4, 4, 2048)    # os 16


def test_maskclip_heads(rng):
    text = rng.randn(5, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    h2 = MaskClip2Head(img_size=32)
    feat = rng.randn(1, 4, 4, 16).astype(np.float32)
    out = h2(jnp.asarray(feat), jnp.asarray(text))
    assert out.shape == (1, 5, 32, 32)

    h = MaskClipHead(text_channels=16, ks_thresh=0.5, pd_thresh=0.1)
    v = jnp.asarray(rng.randn(1, 4, 4, 24), jnp.float32)
    k = jnp.asarray(rng.randn(1, 4, 4, 24), jnp.float32)
    variables = h.init(jax.random.PRNGKey(0), v, jnp.asarray(text), k)
    out = h.apply(variables, v, jnp.asarray(text), k)
    assert out.shape == (1, 5, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_deeplabv3plus_build_path():
    from semivl_tpu.configs import config_from_vars
    from semivl_tpu.models.builder import build_model
    cfg = config_from_vars(
        exp_id=99, model='dlv3p-r101', opt='original', lr=1e-3,
        criterion='CELoss', criterion_u='CELoss', img_scale=None,
        crop_size=64, eval_mode='original')
    bundle = build_model(cfg)
    assert bundle.module.backbone == 'resnet101'
    assert not bundle.freeze_backbone
    assert cfg['lr_multi'] == 10.0
