"""End-to-end VLM model contract tests (flagship SemiVL config, tiny size)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.configs import config_from_vars
from semivl_tpu.models.builder import build_model


@pytest.fixture(scope='module')
def bundle_and_params():
    cfg = config_from_vars(
        exp_id=40, model='mmseg.vlm-vlg-aspp-s2p4-sk04-ftap-mcvitb',
        lr=1e-4, backbone_lr_mult=0.01, criterion='CELoss',
        criterion_u='CELoss',
        maskclip_consistency_lambda=[0.1, 0], mcc_conf_thresh=0.9,
        mcc_text='concept4_single', mcc_loss_reduce='mean_all',
        crop_size=64)  # tiny crops for CPU speed
    bundle = build_model(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        img, jnp.asarray(bundle.text_feats),
        jnp.asarray(bundle.mcc_text_feats),
        method='init_variables')
    return cfg, bundle, params


def test_param_tree_scopes(bundle_and_params):
    _, bundle, params = bundle_and_params
    top = set(params['params'].keys())
    assert top == {'backbone', 'decode_head', 'clip_encoder'}
    assert 'layers_0' in params['params']['backbone']
    assert bundle.freeze_backbone
    assert bundle.exclude_keys == ['attn', 'pos_embed']
    assert bundle.text_feats.shape == (21, 512)
    assert bundle.mcc_text_feats.shape == (98, 512)


def test_forward_shapes(bundle_and_params):
    _, bundle, params = bundle_and_params
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    text = jnp.asarray(bundle.text_feats)

    logits = bundle.module.apply(params, img, text)
    assert logits.shape == (2, 21, 64, 64)

    preds, preds_fp = bundle.module.apply(
        params, img, text, need_fp=True,
        rngs={'fp': jax.random.PRNGKey(2)})
    assert preds.shape == (2, 21, 64, 64)
    # fp output covers the w-half (second half) only
    assert preds_fp.shape == (1, 21, 64, 64)
    # clean half must equal the plain forward
    np.testing.assert_allclose(np.asarray(preds), np.asarray(logits),
                               rtol=2e-3, atol=2e-3)


def test_fp_is_stochastic(bundle_and_params):
    _, bundle, params = bundle_and_params
    img = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32)
    text = jnp.asarray(bundle.text_feats)
    _, fp1 = bundle.module.apply(params, img, text, need_fp=True,
                                 rngs={'fp': jax.random.PRNGKey(3)})
    _, fp2 = bundle.module.apply(params, img, text, need_fp=True,
                                 rngs={'fp': jax.random.PRNGKey(4)})
    assert np.abs(np.asarray(fp1) - np.asarray(fp2)).max() > 1e-6


def test_forward_maskclip(bundle_and_params):
    _, bundle, params = bundle_and_params
    img = jnp.asarray(np.random.RandomState(2).randn(2, 64, 64, 3), jnp.float32)
    labels = bundle.module.apply(
        params, img, jnp.asarray(bundle.mcc_text_feats), 0.9,
        method='forward_maskclip')
    labels = np.asarray(labels)
    assert labels.shape == (2, 64, 64)
    valid = labels[labels != 255]
    assert labels.dtype == np.int32
    if valid.size:
        assert valid.min() >= 0 and valid.max() < 21
