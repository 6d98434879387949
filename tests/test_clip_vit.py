"""Encoder parity: Flax MaskClipViT vs a PyTorch replica of the reference
math (maskclip_vit.py forward + forward_qkv), weight-for-weight."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

from semivl_tpu.models.clip_vit import MaskClipViT

# tiny config for fast CPU tests
EMB, HEADS, LAYERS, PATCH, CLIP_DIM = 32, 4, 3, 8, 16
IMG = 32  # 4x4 grid
EPS = 1e-6


class TorchBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = nn.LayerNorm(EMB, eps=EPS)
        self.ln2 = nn.LayerNorm(EMB, eps=EPS)
        self.attn = nn.MultiheadAttention(EMB, HEADS, batch_first=True)
        self.fc1 = nn.Linear(EMB, 4 * EMB)
        self.fc2 = nn.Linear(4 * EMB, EMB)

    def ffn(self, x):
        return self.fc2(F.gelu(self.fc1(x)))

    def forward_qkv(self, x):
        # reference maskclip_vit.py:110-118
        y = self.ln1(x)
        y = F.linear(y, self.attn.in_proj_weight, self.attn.in_proj_bias)
        n, l, c = y.shape
        y = y.view(n, l, 3, c // 3).permute(2, 0, 1, 3).reshape(3 * n, l, c // 3)
        y = F.linear(y, self.attn.out_proj.weight, self.attn.out_proj.bias)
        q, k, v = y.tensor_split(3, dim=0)
        v = v + x
        return q, k, v

    def forward(self, x, return_v=False):
        v = None
        if return_v:
            _, _, v = self.forward_qkv(x)
            v = v + self.ffn(self.ln2(v))
        x = x + self.attn(self.ln1(x), self.ln1(x), self.ln1(x),
                          need_weights=False)[0]
        x = x + self.ffn(self.ln2(x))
        return x, v


class TorchViT(nn.Module):
    """Reference maskclip_vit.py:492-596 logic on tiny dims."""

    def __init__(self, out_indices):
        super().__init__()
        self.out_indices = out_indices
        self.patch = nn.Conv2d(3, EMB, PATCH, stride=PATCH, bias=False)
        self.cls_token = nn.Parameter(torch.randn(1, 1, EMB) * 0.02)
        n = (IMG // PATCH) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, EMB) * 0.02)
        self.ln0 = nn.LayerNorm(EMB, eps=EPS)
        self.ln1f = nn.LayerNorm(EMB, eps=EPS)
        self.blocks = nn.ModuleList([TorchBlock() for _ in range(LAYERS)])
        self.proj = nn.Linear(EMB, CLIP_DIM, bias=False)

    def forward(self, img):
        b = img.shape[0]
        x = self.patch(img).flatten(2).transpose(1, 2)
        gh = img.shape[-2] // PATCH
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        x = self.ln0(x)
        feats = []
        for i, blk in enumerate(self.blocks):
            last = i == LAYERS - 1
            need_v = (i in self.out_indices) or last
            x, v = blk(x, return_v=need_v)
            if last:
                x = self.ln1f(x)
                v = self.ln1f(v)
                ve = self.proj(v[:, 1:])
                ve = ve / ve.norm(dim=-1, keepdim=True)
                clip_embed = ve.reshape(b, gh, gh, CLIP_DIM)
            if i in self.out_indices:
                feats.append(v[:, 1:].reshape(b, gh, gh, EMB))
        if LAYERS in self.out_indices:
            feats.append(clip_embed)
        g = self.proj(x[:, 0])
        g = g / g.norm(dim=-1, keepdim=True)
        return feats, g


def _torch_to_flax(tm):
    def t(x):
        return np.asarray(x.detach())

    params = {
        'patch_embed': {'kernel': t(tm.patch.weight).transpose(2, 3, 1, 0)},
        'cls_token': t(tm.cls_token),
        'pos_embed': t(tm.pos_embed),
        'ln0': {'scale': t(tm.ln0.weight), 'bias': t(tm.ln0.bias)},
        'ln1': {'scale': t(tm.ln1f.weight), 'bias': t(tm.ln1f.bias)},
        'proj': {'kernel': t(tm.proj.weight).T},
    }
    for i, blk in enumerate(tm.blocks):
        params[f'layers_{i}'] = {
            'ln1': {'scale': t(blk.ln1.weight), 'bias': t(blk.ln1.bias)},
            'ln2': {'scale': t(blk.ln2.weight), 'bias': t(blk.ln2.bias)},
            'attn': {
                'in_proj': {'kernel': t(blk.attn.in_proj_weight).T,
                            'bias': t(blk.attn.in_proj_bias)},
                'out_proj': {'kernel': t(blk.attn.out_proj.weight).T,
                             'bias': t(blk.attn.out_proj.bias)},
            },
            'ffn': {
                'fc1': {'kernel': t(blk.fc1.weight).T, 'bias': t(blk.fc1.bias)},
                'fc2': {'kernel': t(blk.fc2.weight).T, 'bias': t(blk.fc2.bias)},
            },
        }
    return {'params': params}


def _flax_model(out_indices, img_size=IMG):
    return MaskClipViT(
        img_size=(img_size, img_size), patch_size=PATCH, embed_dims=EMB,
        num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4, clip_dim=CLIP_DIM,
        out_indices=out_indices, pre_norm=True, final_norm=True,
        return_clip_embed=True, return_qkv=True)


def test_encoder_parity(rng):
    torch.manual_seed(0)
    out_indices = [0, 1, LAYERS]
    tm = TorchViT(out_indices).eval()
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)

    with torch.no_grad():
        t_feats, t_g = tm(torch.from_numpy(img).permute(0, 3, 1, 2))

    fm = _flax_model(out_indices)
    out = fm.apply(_torch_to_flax(tm), jnp.asarray(img))

    assert len(out['feats']) == len(t_feats) == 3
    for got, want in zip(out['feats'], t_feats):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(out['global_emb']), t_g.numpy(),
                               rtol=1e-3, atol=3e-4)


def test_encoder_pos_resize_and_padding(rng):
    """Off-size input: corner-pad to patch multiple + bicubic pos resize
    (reference maskclip_vit.py:431-460 and mmseg PatchEmbed corner pad)."""
    torch.manual_seed(1)
    out_indices = [LAYERS]
    tm = TorchViT(out_indices).eval()
    fm = _flax_model(out_indices)
    params = _torch_to_flax(tm)

    # 36x36 input -> pad to 40 -> 5x5 grid vs 4x4 pos grid
    img = rng.randn(1, 36, 36, 3).astype(np.float32)
    out = fm.apply(params, jnp.asarray(img))
    assert out['feats'][0].shape == (1, 5, 5, CLIP_DIM)

    # torch reference with explicit pad + pos resize
    with torch.no_grad():
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        timg = F.pad(timg, (0, 4, 0, 4))
        pos = tm.pos_embed
        grid = pos[:, 1:].reshape(1, 4, 4, EMB).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(5, 5), mode='bicubic',
                             align_corners=False)
        grid = grid.flatten(2).transpose(1, 2)
        tm.pos_embed = nn.Parameter(torch.cat([pos[:, :1], grid], dim=1))
        t_feats, t_g = tm(timg)
    np.testing.assert_allclose(np.asarray(out['feats'][0]),
                               t_feats[0].numpy(), rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(out['global_emb']), t_g.numpy(),
                               rtol=1e-3, atol=3e-4)


@pytest.mark.slow
def test_skip_last_attn(rng):
    """maskclip_vit.py:542-546: final layer emits the v-path instead of the
    attention-mixed tokens. The dense clip embedding is computed from the
    v-path either way (identical), while the cls/global embedding changes."""
    import jax
    img = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)
    base = _flax_model([LAYERS])
    skip = MaskClipViT(
        img_size=(IMG, IMG), patch_size=PATCH, embed_dims=EMB,
        num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4, clip_dim=CLIP_DIM,
        out_indices=[LAYERS], pre_norm=True, final_norm=True,
        return_clip_embed=True, return_qkv=True, skip_last_attn=True)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    out_b = base.apply(params, img)
    out_s = skip.apply(params, img)
    np.testing.assert_allclose(np.asarray(out_s['feats'][0]),
                               np.asarray(out_b['feats'][0]), atol=1e-6)
    assert not np.allclose(np.asarray(out_s['global_emb']),
                           np.asarray(out_b['global_emb']), atol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out_s['global_emb']), axis=-1), 1.0,
        atol=1e-5)


def test_out_indices_none_gives_clip_embed_only(rng):
    fm = _flax_model(None)
    import jax
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    out = fm.apply(params, jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32))
    assert len(out['feats']) == 1
    assert out['feats'][0].shape == (1, 4, 4, CLIP_DIM)
    norms = np.linalg.norm(np.asarray(out['feats'][0]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.parametrize('remat', [False, True])
def test_token_pad_equivalence(rng, remat):
    """token_pad_to_multiple pads L=4*4+1=17 tokens up to 24 with masked
    attention (clip_vit docstring): feats/global_emb and parameter
    gradients must match the unpadded model to fp32 reduction-order
    tolerance (no parameter changes shape, so checkpoints are
    interchangeable)."""
    out_indices = [0, LAYERS]

    def model(pad_mult):
        return MaskClipViT(
            img_size=(IMG, IMG), patch_size=PATCH, embed_dims=EMB,
            num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4,
            clip_dim=CLIP_DIM, out_indices=out_indices, pre_norm=True,
            final_norm=True, return_clip_embed=True, return_qkv=True,
            remat=remat, token_pad_to_multiple=pad_mult)

    img = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    import jax
    variables = model(1).init(jax.random.PRNGKey(0), img)

    base = model(1).apply(variables, img)
    padded = model(8).apply(variables, img)   # 17 -> 24 tokens

    for got, want in zip(padded['feats'], base['feats']):
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(padded['global_emb']),
                               np.asarray(base['global_emb']),
                               rtol=1e-5, atol=1e-5)

    def loss(m):
        def f(params):
            out = model(m).apply({'params': params}, img)
            return (sum(jnp.sum(ft ** 2) for ft in out['feats'])
                    + jnp.sum(out['global_emb'] ** 2))
        return f

    g_base = jax.grad(loss(1))(variables['params'])
    g_pad = jax.grad(loss(8))(variables['params'])
    flat_b = jax.tree_util.tree_leaves_with_path(g_base)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pad))
    for path, gb in flat_b:
        gp = flat_p[path]
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gb),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(path))
        assert np.all(np.isfinite(np.asarray(gp))), path


def test_ln_stat_barrier_is_identity(rng):
    """ln_stat_barrier (optimization_barrier before LN stats — a TPU
    scheduling hint) must not change any output bit."""
    import jax
    out_indices = [LAYERS]
    img = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)

    def model(flag):
        return MaskClipViT(
            img_size=(IMG, IMG), patch_size=PATCH, embed_dims=EMB,
            num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4,
            clip_dim=CLIP_DIM, out_indices=out_indices,
            ln_stat_barrier=flag)

    variables = model(False).init(jax.random.PRNGKey(0), img)
    a = model(False).apply(variables, img)
    b2 = model(True).apply(variables, img)
    for ga, gb in zip(a['feats'], b2['feats']):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    np.testing.assert_array_equal(np.asarray(a['global_emb']),
                                  np.asarray(b2['global_emb']))


def test_gelu_barrier_is_identity(rng):
    """gelu_barrier (optimization_barrier between fc1 and the erf GELU —
    a TPU scheduling hint) must not change any output bit."""
    import jax
    out_indices = [LAYERS]
    img = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)

    def model(flag):
        return MaskClipViT(
            img_size=(IMG, IMG), patch_size=PATCH, embed_dims=EMB,
            num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4,
            clip_dim=CLIP_DIM, out_indices=out_indices,
            gelu_barrier=flag)

    variables = model(False).init(jax.random.PRNGKey(0), img)
    a = model(False).apply(variables, img)
    b2 = model(True).apply(variables, img)
    for ga, gb in zip(a['feats'], b2['feats']):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    np.testing.assert_array_equal(np.asarray(a['global_emb']),
                                  np.asarray(b2['global_emb']))
