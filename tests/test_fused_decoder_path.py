"""decoder_kernel='fused' (Pallas up-stage path, ops/fused_up.py) must be
checkpoint- and output-compatible with the default XLA VLGHead path: one
param tree initialised either way, same logits from both branches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.models.vlg_head import VLGHead

CH, TXT_CH, TXT_IN, HEADS = 32, 32, 16, 2
UP = (32, 16)
SKIP_IN = (12, 12)
SKIP_CH = (8, 4)
N_CLS, B, H = 5, 2, 8
IMG = 32


def _head(decoder_kernel):
    return VLGHead(img_size=IMG, num_classes=N_CLS,
                   text_in_channels=TXT_IN, text_channels=TXT_CH,
                   up_channels=UP, skip_in_channels=SKIP_IN,
                   skip_channels=SKIP_CH, skip_from_conv_feat=False,
                   num_layers=1, num_heads=HEADS, channels=CH,
                   pool_size=(2, 2), conv1_ksize=3, align_corners=False,
                   decoder_kernel=decoder_kernel)


@pytest.mark.quick
def test_fused_decoder_matches_xla_and_shares_params():
    rng = np.random.RandomState(0)
    feats = (jnp.asarray(rng.randn(B, H, H, SKIP_IN[0]), jnp.float32),
             jnp.asarray(rng.randn(B, H, H, SKIP_IN[1]), jnp.float32),
             jnp.asarray(rng.randn(B, H, H, TXT_IN), jnp.float32))
    text = jnp.asarray(rng.randn(N_CLS, TXT_IN), jnp.float32)

    xla_head = _head('xla')
    fused_head = _head('fused')

    v_xla = xla_head.init(jax.random.PRNGKey(0), feats, text)
    v_fused = fused_head.init(jax.random.PRNGKey(0), feats, text)

    # identical param trees (paths AND shapes) — checkpoints interchange
    flat_a = jax.tree_util.tree_flatten_with_path(v_xla)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v_fused)[0]
    paths_a = [(jax.tree_util.keystr(k), v.shape) for k, v in flat_a]
    paths_b = [(jax.tree_util.keystr(k), v.shape) for k, v in flat_b]
    assert paths_a == paths_b

    out_xla = xla_head.apply(v_xla, feats, text)
    out_fused = fused_head.apply(v_xla, feats, text)
    assert out_xla.shape == (B, N_CLS, IMG, IMG)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.quick
def test_builder_creates_fused_fwd_variant(monkeypatch):
    """decoder_fwd_kernel='fused' gives bundle.module_fwd a fused-decoder
    clone sharing the param structure; default on CPU is the XLA module."""
    from semivl_tpu.models.builder import build_model

    cfg = {
        'model': 'mmseg.vlm-vlg-aspp-s2p4-sk04-ftap-mcvitb',
        'nclass': 21, 'crop_size': 64, 'dataset': 'pascal',
        'text_embedding_variant': 'single',
        'mcc_text': 'single', 'pl_text': 'single',
    }
    bundle = build_model(cfg)
    assert bundle.module_fwd is bundle.module  # CPU: auto -> xla

    bundle2 = build_model({**cfg, 'decoder_fwd_kernel': 'fused'})
    assert bundle2.module_fwd is not bundle2.module
    assert (bundle2.module_fwd.decode_head_cfg['decoder_kernel']
            == 'fused_fwd')


@pytest.mark.quick
def test_fused_decoder_handles_odd_width():
    """801-crop-like geometry (plane width not dividing 128) now runs the
    fused polyphase chain (round-2's 128-divisibility gate is gone):
    outputs still match the XLA path."""
    h_odd = 6  # W1=12, 128 % 12 != 0
    rng = np.random.RandomState(1)
    feats = (jnp.asarray(rng.randn(1, h_odd, h_odd, SKIP_IN[0]),
                         jnp.float32),
             jnp.asarray(rng.randn(1, h_odd, h_odd, SKIP_IN[1]),
                         jnp.float32),
             jnp.asarray(rng.randn(1, h_odd, h_odd, TXT_IN), jnp.float32))
    text = jnp.asarray(rng.randn(N_CLS, TXT_IN), jnp.float32)
    xla_head = _head('xla')
    fused_head = _head('fused')
    v = xla_head.init(jax.random.PRNGKey(0), feats, text)
    assert fused_head.fused_decoder_ok(h_odd, h_odd)
    out_a = xla_head.apply(v, feats, text)
    out_b = fused_head.apply(v, feats, text)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.quick
def test_fused_vmem_gate_flagship_geometry():
    """bf16 flagship geometry fits the scoped-VMEM budget; fp32 does not
    (the measured 17.4 MB OOM) — the gate must separate them."""
    from semivl_tpu.ops.fused_up import (FUSED_VMEM_LIMIT,
                                         fused_up_vmem_bytes)
    # up1 at 512-crop flagship: cin 128 -> up_c 96, skip 32, out 64
    for isz, fits in ((2, True), (4, False)):
        b1 = fused_up_vmem_bytes(96, 32, 64, 32, 32, isz, False)
        b2 = fused_up_vmem_bytes(48, 16, 32, 64, 64, isz, True)
        assert (max(b1, b2) <= FUSED_VMEM_LIMIT) == fits, (isz, b1, b2)


@pytest.mark.quick
def test_fused_decoder_vmem_gate_decision():
    """Round-3 polyphase chain gates: the forward-only variant
    ('fused_fwd': teacher/eval) fits flagship 512-crop for bf16 AND fp32
    models (bf16 internal storage); wide base grids (Cityscapes 102) and
    the w > 64 row-stride bound fall back."""
    def head(dtype):
        return VLGHead(img_size=512, num_classes=21, text_in_channels=512,
                       text_channels=128, up_channels=(64, 32),
                       skip_in_channels=(768, 768), skip_channels=(32, 16),
                       num_layers=2, num_heads=4, channels=128,
                       decoder_kernel='fused', dtype=dtype)

    from semivl_tpu.ops.fused_decoder import fused_decoder_ok
    # flagship 512-crop qualifies for BOTH training (backward kernels)
    # and forward-only use, regardless of model dtype
    assert fused_decoder_ok(128, 32, 64, 16, 32, 32, 32, backward=True)
    assert fused_decoder_ok(128, 32, 64, 16, 32, 32, 32, backward=False)
    assert head(jnp.bfloat16).fused_decoder_ok(32, 32)
    assert head(jnp.float32).fused_decoder_ok(32, 32)
    # 801-crop Cityscapes: the forward chain fits (compiled+ran on-chip,
    # teacher/eval path); the whole-plane backward kernels do not, and
    # the row-banded backward measured slower than XLA on v5e, so
    # training falls back to XLA by default (banded_decoder_check,
    # 2026-08-18: banded 82.4 ms vs XLA 38.5 ms fwd+bwd)
    assert fused_decoder_ok(128, 32, 64, 16, 32, 51, 51, backward=False)
    assert not fused_decoder_ok(128, 32, 64, 16, 32, 51, 51,
                                backward=True)
    # row-stride bound: base w > 64 cannot host 2w in 128 lanes
    assert not fused_decoder_ok(128, 32, 64, 16, 32, 100, 100,
                                backward=False)
