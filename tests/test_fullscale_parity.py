"""Full-scale end-to-end numerics parity: ViT-B/16 + VLG at REAL dims.

Every other torch-replica parity test runs at tiny dims; this one runs
the flagship configuration — ViT-B/16 (768-d, 12 layers, 12 heads,
patch 16), VLG decoder (channels 128, ups (64, 32), skips (32, 16)),
N=21 classes with the real ``voc12_wbg_single.npy`` text embeddings, a
512x512 input — weight-for-weight against PyTorch replicas of the
reference math (model/vlm.py:112-127, maskclip_vit.py:492-596,
vlg_head.py:140-251). It bounds the accumulated-fp-error risk the
small-dim tests cannot see (PARITY.md). fp32 end to end.

The replica classes live in test_clip_vit / test_vlg_head with
module-global dims; ``_dims`` overrides them for the duration of the
build + forward.
"""

import contextlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import test_clip_vit as tcv
import test_vlg_head as tvh
from semivl_tpu.models.vlm import VLM
from semivl_tpu.text.embeddings import load_text_embedding

IMG = 512
EMB, HEADS, LAYERS, PATCH, CLIP_DIM = 768, 12, 12, 16, 512
OUT_INDICES = [0, 4, 12]
CH, TXT_CH, N_CLS = 128, 128, 21
UP = (64, 32)
SKIP_IN = (768, 768)
SKIP_CH = (32, 16)


@contextlib.contextmanager
def _dims(mod, **over):
    old = {k: getattr(mod, k) for k in over}
    for k, v in over.items():
        setattr(mod, k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            setattr(mod, k, v)


@pytest.mark.slow
def test_fullscale_flagship_logit_parity():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    img = rng.randn(1, IMG, IMG, 3).astype(np.float32) * 0.5
    text = load_text_embedding('voc12_wbg_single').astype(np.float32)
    assert text.shape == (N_CLS, CLIP_DIM)

    with _dims(tcv, EMB=EMB, HEADS=HEADS, LAYERS=LAYERS, PATCH=PATCH,
               CLIP_DIM=CLIP_DIM, IMG=IMG):
        tvit = tcv.TorchViT(OUT_INDICES).eval()
        # realistic weight scales so 12 layers don't blow up
        with torch.no_grad():
            for p in tvit.parameters():
                p.mul_(0.05 if p.ndim >= 2 else 1.0)
        vit_params = tcv._torch_to_flax(tvit)['params']
        with torch.no_grad():
            t_feats, t_g = tvit(torch.from_numpy(
                img.transpose(0, 3, 1, 2)))

    with _dims(tvh, CH=CH, TXT_CH=TXT_CH, TXT_IN=CLIP_DIM, HEADS=4,
               UP=UP, SKIP_IN=SKIP_IN, SKIP_CH=SKIP_CH, N_CLS=N_CLS,
               B=1, H=IMG // PATCH, IMG=IMG, POOL=(4, 4), K1=7):
        tvlg = tvh.TorchVLG().eval()
        with torch.no_grad():
            for p in tvlg.parameters():
                p.mul_(0.2 if p.ndim >= 2 else 1.0)
        vlg_params = tvh._convert(tvlg)['params']
        with torch.no_grad():
            want = tvlg([f.permute(0, 3, 1, 2) if f.ndim == 4 else f
                         for f in t_feats],
                        torch.from_numpy(text)).numpy()

    backbone_cfg = dict(
        type='MaskClipVisionTransformer', img_size=[IMG, IMG],
        patch_size=PATCH, embed_dims=EMB, num_layers=LAYERS,
        num_heads=HEADS, out_indices=OUT_INDICES, clip_dim=CLIP_DIM)
    head_cfg = dict(
        type='VLGHead', img_size=IMG, num_classes=N_CLS,
        text_in_channels=CLIP_DIM, text_channels=TXT_CH, up_channels=UP,
        skip_in_channels=SKIP_IN, skip_channels=SKIP_CH, num_layers=2,
        num_heads=4, channels=CH, pool_size=(4, 4), conv1_ksize=7,
        align_corners=False, text_embedding_name='')
    module = VLM(backbone_cfg=backbone_cfg, decode_head_cfg=head_cfg)
    params = {'params': {'backbone': vit_params,
                         'decode_head': vlg_params}}
    got = np.asarray(module.apply(params, jnp.asarray(img),
                                  jnp.asarray(text)))

    assert got.shape == want.shape == (1, N_CLS, IMG, IMG)
    scale = np.abs(want).max()
    max_err = np.abs(got - want).max()
    mean_err = np.abs(got - want).mean()
    # publish the measured numbers in the assertion message for PARITY.md
    assert max_err < 2e-3 * max(scale, 1.0) and mean_err < 2e-4, (
        f'full-scale logit mismatch: max abs {max_err:.3e}, '
        f'mean abs {mean_err:.3e}, logit scale {scale:.3f}')
    print(f'FULLSCALE-PARITY max_abs={max_err:.3e} mean_abs={mean_err:.3e} '
          f'scale={scale:.3f}')


@pytest.mark.slow
def test_fullscale_stress_statistics_parity():
    """Full-scale parity under CLIP-like weight pathologies.

    Real CLIP ViT weights carry outlier channels (a handful of embedding
    dims with 10-30x the typical magnitude) and large position-embedding
    values — exactly the statistics that stress accumulated-fp paths
    (VERDICT r3 weak #5; the real-weight rerun stays artifact-gated,
    PARITY.md). This variant injects those pathologies into the torch
    replica before conversion: 8 outlier embedding channels scaled 25x in
    every residual-writing projection (attention out_proj, fc2), the
    position embedding scaled 8x, and log-normal spread on the final LN
    gain. fp32 parity must hold at the same tolerance as the clean test.
    """
    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    img = rng.randn(1, IMG, IMG, 3).astype(np.float32) * 0.5
    text = load_text_embedding('voc12_wbg_single').astype(np.float32)

    with _dims(tcv, EMB=EMB, HEADS=HEADS, LAYERS=LAYERS, PATCH=PATCH,
               CLIP_DIM=CLIP_DIM, IMG=IMG):
        tvit = tcv.TorchViT(OUT_INDICES).eval()
        with torch.no_grad():
            for p in tvit.parameters():
                p.mul_(0.05 if p.ndim >= 2 else 1.0)
            outlier = torch.from_numpy(
                rng.choice(EMB, 8, replace=False)).long()
            for blk in tvit.blocks:
                # rows of out_proj / fc2 write the residual stream: scale
                # the outlier embedding dims 25x (CLIP-style outliers)
                blk.attn.out_proj.weight[outlier] *= 25.0
                blk.fc2.weight[outlier] *= 25.0
            tvit.pos_embed.mul_(8.0)
            tvit.ln1f.weight.mul_(torch.from_numpy(np.exp(
                rng.randn(EMB).astype(np.float32) * 0.5)))
        vit_params = tcv._torch_to_flax(tvit)['params']
        with torch.no_grad():
            t_feats, _ = tvit(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    with _dims(tvh, CH=CH, TXT_CH=TXT_CH, TXT_IN=CLIP_DIM, HEADS=4,
               UP=UP, SKIP_IN=SKIP_IN, SKIP_CH=SKIP_CH, N_CLS=N_CLS,
               B=1, H=IMG // PATCH, IMG=IMG, POOL=(4, 4), K1=7):
        tvlg = tvh.TorchVLG().eval()
        with torch.no_grad():
            for p in tvlg.parameters():
                p.mul_(0.2 if p.ndim >= 2 else 1.0)
        vlg_params = tvh._convert(tvlg)['params']
        with torch.no_grad():
            want = tvlg([f.permute(0, 3, 1, 2) if f.ndim == 4 else f
                         for f in t_feats],
                        torch.from_numpy(text)).numpy()

    backbone_cfg = dict(
        type='MaskClipVisionTransformer', img_size=[IMG, IMG],
        patch_size=PATCH, embed_dims=EMB, num_layers=LAYERS,
        num_heads=HEADS, out_indices=OUT_INDICES, clip_dim=CLIP_DIM)
    head_cfg = dict(
        type='VLGHead', img_size=IMG, num_classes=N_CLS,
        text_in_channels=CLIP_DIM, text_channels=TXT_CH, up_channels=UP,
        skip_in_channels=SKIP_IN, skip_channels=SKIP_CH, num_layers=2,
        num_heads=4, channels=CH, pool_size=(4, 4), conv1_ksize=7,
        align_corners=False, text_embedding_name='')
    module = VLM(backbone_cfg=backbone_cfg, decode_head_cfg=head_cfg)
    params = {'params': {'backbone': vit_params,
                         'decode_head': vlg_params}}
    got = np.asarray(module.apply(params, jnp.asarray(img),
                                  jnp.asarray(text)))

    scale = np.abs(want).max()
    max_err = np.abs(got - want).max()
    mean_err = np.abs(got - want).mean()
    assert max_err < 2e-3 * max(scale, 1.0) and mean_err < 2e-4 * max(
        scale, 1.0), (
        f'stress-statistics logit mismatch: max abs {max_err:.3e}, '
        f'mean abs {mean_err:.3e}, logit scale {scale:.3f}')
    print(f'STRESS-PARITY max_abs={max_err:.3e} mean_abs={mean_err:.3e} '
          f'scale={scale:.3f}')

    # bf16 sensitivity under outlier statistics: diagnostic bound only
    # (real-weight mIoU parity remains the artifact-gated check)
    module_bf16 = VLM(backbone_cfg=backbone_cfg, decode_head_cfg=head_cfg,
                      dtype=jnp.bfloat16)
    got16 = np.asarray(module_bf16.apply(
        params, jnp.asarray(img), jnp.asarray(text))).astype(np.float32)
    dev = np.abs(got16 - want)
    print(f'STRESS-BF16 max_abs={dev.max():.3e} mean_abs={dev.mean():.3e} '
          f'scale={scale:.3f}')
    assert np.isfinite(got16).all()
    assert dev.mean() < 0.05 * max(scale, 1.0), (
        f'bf16 deviation blow-up under outlier stats: mean {dev.mean():.3e}'
        f' vs scale {scale:.3f}')
