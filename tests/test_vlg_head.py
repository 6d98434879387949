"""VLG head parity: Flax VLGHead vs a PyTorch replica of the reference
decoder math (model/decode_heads/vlg_head.py:140-251), weight-for-weight."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
from einops import rearrange, repeat
from torch import nn

import jax.numpy as jnp

from semivl_tpu.models.vlg_head import VLGHead

# tiny dims (GroupNorm uses ch//16 groups so channels are multiples of 16)
CH, TXT_CH, TXT_IN, HEADS = 32, 32, 16, 2
UP = (32, 16)
SKIP_IN = (12, 12)
SKIP_CH = (8, 4)
N_CLS, B, H = 5, 2, 8
IMG = 32
POOL = (2, 2)
K1 = 3


def gn(c):
    return nn.GroupNorm(max(c // 16, 1), c)


class TorchBlock(nn.Module):
    """mmcv TransformerEncoderLayer equivalent (pre-LN)."""

    def __init__(self, dim, heads, ffn_dim):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim, eps=1e-6)
        self.ln2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.fc1 = nn.Linear(dim, ffn_dim)
        self.fc2 = nn.Linear(ffn_dim, dim)

    def forward(self, x):
        y = self.ln1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        return x + self.fc2(F.gelu(self.fc1(self.ln2(x))))


class TorchSemTr(nn.Module):
    def __init__(self):
        super().__init__()
        self.pool = nn.AvgPool2d(POOL)
        self.tr = TorchBlock(CH + TXT_CH, HEADS, 4 * CH)

    def forward(self, x, text):
        b = x.shape[0]
        xp = rearrange(x, 'b c n h w -> (b n) c h w')
        xp = self.pool(xp)
        xp = rearrange(xp, '(b n) c h w -> b c n h w', b=b)
        _, _, _, hp, wp = xp.shape
        xp = rearrange(xp, 'b c n h w -> (b h w) n c')
        t = repeat(text, 'b n c -> (b h w) n c', h=hp, w=wp)
        xp = self.tr(torch.cat([xp, t], dim=-1))[..., :CH]
        xp = rearrange(xp, '(b h w) n c -> (b n) c h w', h=hp, w=wp)
        xp = F.interpolate(xp, size=x.shape[-2:], mode='bilinear',
                           align_corners=True)
        return x + rearrange(xp, '(b n) c h w -> b c n h w', b=b)


class TorchASPP(nn.Module):
    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList()
        for d in (1, 6, 12, 18):
            k = 1 if d == 1 else 3
            p = 0 if d == 1 else d
            self.convs.append(nn.Sequential(
                nn.Conv2d(CH, CH, k, padding=p, dilation=d, bias=False),
                gn(CH), nn.ReLU(True)))
        self.gap = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                 nn.Conv2d(CH, CH, 1, bias=False),
                                 gn(CH), nn.ReLU(True))
        self.project = nn.Sequential(nn.Conv2d(5 * CH, CH, 1, bias=False),
                                     gn(CH), nn.ReLU(True))

    def forward(self, x):
        h, w = x.shape[-2:]
        feats = [c(x) for c in self.convs]
        feats.append(F.interpolate(self.gap(x), (h, w), mode='bilinear',
                                   align_corners=True))
        return x + self.project(torch.cat(feats, 1))


class TorchUp(nn.Module):
    def __init__(self, in_c, out_c, skip_c):
        super().__init__()
        self.up = nn.ConvTranspose2d(in_c, in_c - skip_c, 2, stride=2)
        self.conv = nn.Sequential(
            nn.Conv2d(in_c, out_c, 3, padding=1, bias=False), gn(out_c),
            nn.ReLU(True),
            nn.Conv2d(out_c, out_c, 3, padding=1, bias=False), gn(out_c),
            nn.ReLU(True))

    def forward(self, x, skip):
        x = self.up(x)
        n = x.size(0) // skip.size(0)
        skip = F.interpolate(skip, size=x.shape[-2:], mode='bilinear',
                             align_corners=True)
        skip = repeat(skip, 'b c h w -> (b n) c h w', n=n)
        return self.conv(torch.cat([x, skip], dim=1))


class TorchVLG(nn.Module):
    """reference vlg_head.py:140-251 on tiny dims."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, CH, K1, padding=(K1 - 1) // 2)
        self.aspp = TorchASPP()
        self.layers = nn.ModuleList([TorchSemTr(), TorchSemTr()])
        self.text_proj = nn.Sequential(nn.Linear(TXT_IN, TXT_CH), nn.ReLU())
        self.skip_proj = nn.ModuleList([
            nn.Sequential(nn.Conv2d(sic, sc, 3, padding=1), nn.ReLU())
            for sic, sc in zip(SKIP_IN, SKIP_CH)])
        self.up1 = TorchUp(CH, UP[0], SKIP_CH[0])
        self.up2 = TorchUp(UP[0], UP[1], SKIP_CH[1])
        self.head = nn.Conv2d(UP[1], 1, 3, padding=1)

    def forward(self, feats, text_feats):
        img_feats = feats[-1]
        skips = feats[:-1][::-1]
        b = img_feats.shape[0]
        text_feats = text_feats.repeat(b, 1, 1).float()
        img_feats = F.normalize(img_feats, dim=1)
        text_feats = F.normalize(text_feats, dim=-1)
        x = torch.einsum('bchw, bnc -> bnhw', img_feats, text_feats)
        x = rearrange(x, 'b n h w -> (b n) () h w')
        x = self.conv1(x)
        x = self.aspp(x)
        x = rearrange(x, '(b n) c h w -> b c n h w', b=b)
        text_feats = self.text_proj(text_feats)
        for layer in self.layers:
            x = layer(x, text_feats)
        skips = [p(f) for p, f in zip(self.skip_proj, skips)]
        x = rearrange(x, 'b c n h w -> (b n) c h w')
        x = self.up1(x, skips[0])
        x = self.up2(x, skips[1])
        x = self.head(x)
        x = rearrange(x, '(b n) () h w -> b n h w', b=b)
        return F.interpolate(x, size=(IMG, IMG), mode='bilinear',
                             align_corners=False)


def _convert(tm):
    def t(x):
        return np.asarray(x.detach())

    def conv(m):
        return {'kernel': t(m.weight).transpose(2, 3, 1, 0),
                **({'bias': t(m.bias)} if m.bias is not None else {})}

    def gn_p(m):
        return {'scale': t(m.weight), 'bias': t(m.bias)}

    def cgr(seq):  # Conv-GN-ReLU sequential
        return {'conv': conv(seq[0]), 'gn': gn_p(seq[1])}

    def block(tb):
        return {
            'ln1': {'scale': t(tb.ln1.weight), 'bias': t(tb.ln1.bias)},
            'ln2': {'scale': t(tb.ln2.weight), 'bias': t(tb.ln2.bias)},
            'attn': {'in_proj': {'kernel': t(tb.attn.in_proj_weight).T,
                                 'bias': t(tb.attn.in_proj_bias)},
                     'out_proj': {'kernel': t(tb.attn.out_proj.weight).T,
                                  'bias': t(tb.attn.out_proj.bias)}},
            'ffn': {'fc1': {'kernel': t(tb.fc1.weight).T, 'bias': t(tb.fc1.bias)},
                    'fc2': {'kernel': t(tb.fc2.weight).T, 'bias': t(tb.fc2.bias)}},
        }

    def up(tu):
        return {'up_kernel': t(tu.up.weight).transpose(2, 3, 0, 1),
                'up_bias': t(tu.up.bias),
                'conv1': {'conv': conv(tu.conv[0]), 'gn': gn_p(tu.conv[1])},
                'conv2': {'conv': conv(tu.conv[3]), 'gn': gn_p(tu.conv[4])}}

    aspp = {f'branch_{i}': cgr(tm.aspp.convs[i]) for i in range(4)}
    aspp['pool'] = {'proj': {'conv': conv(tm.aspp.gap[1]),
                             'gn': gn_p(tm.aspp.gap[2])}}
    aspp['project'] = cgr(tm.aspp.project)

    params = {
        'conv1': conv(tm.conv1),
        'aspp': aspp,
        'text_proj': {'kernel': t(tm.text_proj[0].weight).T,
                      'bias': t(tm.text_proj[0].bias)},
        'up1': up(tm.up1),
        'up2': up(tm.up2),
        'head': conv(tm.head),
    }
    for i, layer in enumerate(tm.layers):
        params[f'layers_{i}'] = {'transformer': block(layer.tr)}
    for i, sp in enumerate(tm.skip_proj):
        params[f'skip_proj_{i}'] = conv(sp[0])
    return {'params': params}


@pytest.mark.slow
def test_vlg_head_parity(rng):
    torch.manual_seed(0)
    tm = TorchVLG().eval()

    clip_feat = rng.randn(B, 512 // 64, H, H).astype(np.float32)  # (B,8,8,8)
    clip_feat = rng.randn(B, TXT_IN, H, H).astype(np.float32)
    skip0 = rng.randn(B, SKIP_IN[0], H, H).astype(np.float32)
    skip1 = rng.randn(B, SKIP_IN[1], H, H).astype(np.float32)
    text = rng.randn(N_CLS, TXT_IN).astype(np.float32)

    with torch.no_grad():
        want = tm([torch.from_numpy(skip1), torch.from_numpy(skip0),
                   torch.from_numpy(clip_feat)],
                  torch.from_numpy(text)).numpy()

    fm = VLGHead(img_size=IMG, num_classes=N_CLS, text_in_channels=TXT_IN,
                 text_channels=TXT_CH, up_channels=UP,
                 skip_in_channels=SKIP_IN, skip_channels=SKIP_CH,
                 skip_from_conv_feat=False, num_layers=2, num_heads=HEADS,
                 channels=CH, pool_size=POOL, conv1_ksize=K1,
                 align_corners=False)
    feats = (jnp.asarray(skip1.transpose(0, 2, 3, 1)),
             jnp.asarray(skip0.transpose(0, 2, 3, 1)),
             jnp.asarray(clip_feat.transpose(0, 2, 3, 1)))
    got = np.asarray(fm.apply(_convert(tm), feats, jnp.asarray(text)))

    assert got.shape == want.shape == (B, N_CLS, IMG, IMG)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_vlg_head_concept_aggregation(rng):
    """Concept text (98 rows for VOC-21) runs 98 class planes through the
    decoder, then max-aggregates to 21 classes in-head (vlg_head.py:242-244
    semantics)."""
    import jax
    from semivl_tpu.text import get_class_to_concept_idxs

    name = 'voc12_wbg_concept4_single'
    c2c = get_class_to_concept_idxs(name)
    n_con = max(max(v) for v in c2c.values()) + 1
    fm = VLGHead(img_size=IMG, num_classes=21, text_in_channels=TXT_IN,
                 text_channels=TXT_CH, up_channels=UP,
                 skip_in_channels=SKIP_IN, skip_channels=SKIP_CH,
                 skip_from_conv_feat=False, num_layers=1, num_heads=HEADS,
                 channels=CH, pool_size=POOL, conv1_ksize=K1,
                 align_corners=False, text_embedding_name=name)
    feats = (jnp.asarray(rng.randn(B, H, H, SKIP_IN[0]), jnp.float32),
             jnp.asarray(rng.randn(B, H, H, SKIP_IN[1]), jnp.float32),
             jnp.asarray(rng.randn(B, H, H, TXT_IN), jnp.float32))
    text = jnp.asarray(rng.randn(n_con, TXT_IN), jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), feats, text)
    out = np.asarray(fm.apply(variables, feats, text))
    assert out.shape == (B, 21, IMG, IMG)
    assert np.isfinite(out).all()
    # max-agg: boosting one concept's text must only ever RAISE its class
    # logits wherever that concept becomes the max, never change others
    out2 = np.asarray(fm.apply(variables, feats,
                               text.at[5].multiply(1.5)))
    changed = np.abs(out2 - out).max(axis=(0, 2, 3)) > 1e-6
    cls_of_5 = [c for c, idxs in c2c.items() if 5 in idxs]
    assert changed[cls_of_5].any() or not changed.any()


@pytest.mark.parametrize('hw', [(8, 8), (13, 11)])
def test_semantic_impl_equivalence(rng, hw):
    """'einsum' (pool/unpool as dot contractions, transposes folded in)
    must match the original 'window' path — incl. non-divisible pooled
    geometry (Cityscapes 801-crop gives 51x51 -> 12x12 with a dropped
    tail, reference nn.AvgPool2d floor mode)."""
    import jax

    from semivl_tpu.models.vlg_head import SemanticTransformer
    h, w = hw
    b, n, c, ct = 2, 5, 32, 16
    x = jnp.asarray(rng.randn(b, n, h, w, c), jnp.float32)
    text = jnp.asarray(rng.randn(b, n, ct), jnp.float32)

    def make(impl):
        return SemanticTransformer(channels=c, text_channels=ct,
                                   num_heads=4, impl=impl)

    variables = make('window').init(jax.random.PRNGKey(0), x, text)
    a = make('window').apply(variables, x, text)
    b2 = make('einsum').apply(variables, x, text)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                               rtol=2e-5, atol=2e-5)

    # gradients agree too
    ga = jax.grad(lambda v: jnp.sum(make('window').apply(v, x, text) ** 2))(
        variables)
    gb = jax.grad(lambda v: jnp.sum(make('einsum').apply(v, x, text) ** 2))(
        variables)
    jax.tree.map(lambda p, q: np.testing.assert_allclose(
        np.asarray(p), np.asarray(q), rtol=3e-4, atol=3e-4), ga, gb)
