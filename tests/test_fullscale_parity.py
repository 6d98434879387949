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
