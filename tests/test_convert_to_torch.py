"""Roundtrip: flax variables -> reference-named torch state dict -> flax.

The importer (convert_reference_ckpt) is parity-tested against real torch
replicas elsewhere; composing exporter+importer and requiring an exact tree
match therefore pins the exporter to the reference naming/layout too.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from semivl_tpu.tools.convert_reference_ckpt import convert_vlm_checkpoint
from semivl_tpu.tools.convert_to_torch import export_vlm_checkpoint

from tiny_model import tiny_bundle


def _init_tiny_variables():
    bundle = tiny_bundle(num_classes=5, img_size=64, with_mcc=False)
    variables = bundle.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray(bundle.text_feats), method='init_variables')
    return jax.tree.map(np.asarray, jax.device_get(variables))


def _assert_trees_equal(a, b, path=''):
    assert set(a) == set(b), f'{path}: {set(a) ^ set(b)}'
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_equal(a[k], b[k], f'{path}/{k}')
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                err_msg=f'{path}/{k}')


@pytest.mark.slow
def test_export_import_roundtrip():
    variables = _init_tiny_variables()
    flat = export_vlm_checkpoint(variables)
    # reference naming spot checks
    assert 'backbone.patch_embed.projection.weight' in flat
    assert 'backbone.layers.0.attn.attn.in_proj_weight' in flat
    assert 'decode_head.aspp.aspp_convs.4.gap.1.weight' in flat
    assert 'decode_head.up1.up.weight' in flat
    assert not any(k.startswith('clip_encoder') for k in flat)
    # conv layout: torch OIHW
    pe = flat['backbone.patch_embed.projection.weight']
    assert pe.shape == (32, 3, 16, 16)

    back = convert_vlm_checkpoint(flat)
    want = {'params': {k: v for k, v in variables['params'].items()
                       if k != 'clip_encoder'}}
    _assert_trees_equal(want, back)
