"""timm ViT importer parity: torch replica of timm vit_base_patch16 (tiny
dims) vs our TIMMVisionTransformer loaded through convert_timm_vit."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from semivl_tpu.models.timm_vit import TIMMVisionTransformer
from semivl_tpu.tools.convert_timm_weights import (
    convert_timm_vit,
    resize_timm_pos_embed,
)

EMB, LAYERS, HEADS, PATCH, IMG = 32, 2, 4, 8, 32


class TimmBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(EMB, eps=1e-6)
        self.attn_qkv = nn.Linear(EMB, 3 * EMB)
        self.attn_proj = nn.Linear(EMB, EMB)
        self.norm2 = nn.LayerNorm(EMB, eps=1e-6)
        self.fc1 = nn.Linear(EMB, 4 * EMB)
        self.fc2 = nn.Linear(4 * EMB, EMB)

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(b, n, 3, HEADS, c // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (c // HEADS) ** -0.5
        att = att.softmax(dim=-1)
        h = (att @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn_proj(h)
        h = self.norm2(x)
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x


class TimmViT(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_proj = nn.Conv2d(3, EMB, PATCH, PATCH)
        self.cls_token = nn.Parameter(torch.randn(1, 1, EMB) * 0.02)
        n = (IMG // PATCH) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, EMB) * 0.02)
        self.blocks = nn.ModuleList([TimmBlock() for _ in range(LAYERS)])
        self.norm = nn.LayerNorm(EMB, eps=1e-6)

    def forward(self, x, out_indices=(0, 1)):
        b = x.shape[0]
        x = self.patch_proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        feats = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in out_indices:
                g = self.norm(x)[:, 1:]
                s = IMG // PATCH
                feats.append(g.reshape(b, s, s, EMB))
        return feats, self.norm(x)[:, 0]


def _timm_state_dict(tm):
    sd = {
        'cls_token': tm.cls_token.detach().numpy(),
        'pos_embed': tm.pos_embed.detach().numpy(),
        'patch_embed.proj.weight': tm.patch_proj.weight.detach().numpy(),
        'patch_embed.proj.bias': tm.patch_proj.bias.detach().numpy(),
        'norm.weight': tm.norm.weight.detach().numpy(),
        'norm.bias': tm.norm.bias.detach().numpy(),
    }
    for i, blk in enumerate(tm.blocks):
        pre = f'blocks.{i}.'
        sd.update({
            pre + 'norm1.weight': blk.norm1.weight.detach().numpy(),
            pre + 'norm1.bias': blk.norm1.bias.detach().numpy(),
            pre + 'norm2.weight': blk.norm2.weight.detach().numpy(),
            pre + 'norm2.bias': blk.norm2.bias.detach().numpy(),
            pre + 'attn.qkv.weight': blk.attn_qkv.weight.detach().numpy(),
            pre + 'attn.qkv.bias': blk.attn_qkv.bias.detach().numpy(),
            pre + 'attn.proj.weight': blk.attn_proj.weight.detach().numpy(),
            pre + 'attn.proj.bias': blk.attn_proj.bias.detach().numpy(),
            pre + 'mlp.fc1.weight': blk.fc1.weight.detach().numpy(),
            pre + 'mlp.fc1.bias': blk.fc1.bias.detach().numpy(),
            pre + 'mlp.fc2.weight': blk.fc2.weight.detach().numpy(),
            pre + 'mlp.fc2.bias': blk.fc2.bias.detach().numpy(),
        })
    return sd


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_timm_import_parity(rng):
    torch.manual_seed(0)
    tm = TimmViT().eval()
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        t_feats, t_cls = tm(torch.from_numpy(img).permute(0, 3, 1, 2))

    g = IMG // PATCH
    variables = convert_timm_vit(_timm_state_dict(tm), grid=(g, g))
    fm = TIMMVisionTransformer(
        img_size=(IMG, IMG), patch_size=PATCH, embed_dims=EMB,
        num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4,
        out_indices=(0, 1))
    out = fm.apply(variables, jnp.asarray(img))

    assert len(out['feats']) == len(t_feats) == 2
    for got, want in zip(out['feats'], t_feats):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['global_emb']), t_cls.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_timm_pos_embed_resize(rng):
    pos = rng.randn(1, 5, EMB).astype(np.float32)  # 2x2 grid + cls
    out = resize_timm_pos_embed(pos, (4, 4))
    assert out.shape == (1, 17, EMB)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls untouched
    out_same = resize_timm_pos_embed(pos, (2, 2))
    np.testing.assert_array_equal(out_same, pos)
