"""ZegCLIP VPT CLIP vision transformer (Flax).

Parity: reference third_party/zegclip/models/backbones/clip_vpt_vit.py —
CLIP ViT-B/16 (QuickGELU FFN) with shallow + deep visual prompt tokens:

- 10 prompt tokens (projected by ``prompt_proj``) inserted after the cls
  token at layer 0, replaced per layer from ``deep_prompt_embeddings`` for
  layers 1..total_d_layer (clip_vpt_vit.py:122-204);
- runtime *bilinear* positional-embedding resize (not bicubic; and the cls
  pos gets class_embedding added, clip_vpt_vit.py:114-119);
- final ``prompt_norm`` then ``ln_post`` then the CLIP projection; the dense
  visual embedding (the last H*W tokens) is L2-normalised when a single out
  index is used, plus an L2-normalised global (cls) embedding
  (clip_vpt_vit.py:147-167).

Output contract matches MaskClipViT: {'feats': tuple NHWC, 'global_emb'}.
Prompt params live under names containing 'prompt' so the reference's
``exclude_keys=['prompt']`` freeze semantics apply unchanged
(vlm-zegclip-rd-pt-vitb.py:57).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from semivl_tpu.models.layers import (
    Attention,
    LayerNorm,
    Mlp,
    l2_normalize,
    quick_gelu,
)
from semivl_tpu.ops.resize import resize


class CLIPBlock(nn.Module):
    """CLIP ResidualAttentionBlock: ln_1/attn, ln_2/QuickGELU-mlp.

    ``return_v=True`` additionally computes the MaskCLIP v-path
    (out_proj(v) + x, then the MLP — reference clip_vpt_vit.py:185-195)."""
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_v=False):
        ln1 = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln1')
        ln2 = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln2')
        attn = Attention(num_heads=self.num_heads, dtype=self.dtype,
                         name='attn')
        mlp = Mlp(hidden_dim=4 * x.shape[-1], act=quick_gelu,
                  dtype=self.dtype, name='ffn')
        y = ln1(x)
        v_feat = None
        if return_v:
            attn_out, (_, _, v), out_proj = attn(y, return_qkv=True)
            v_feat = out_proj(v) + x
            v_feat = v_feat + mlp(ln2(v_feat))
        else:
            attn_out = attn(y)
        x = x + attn_out
        x = x + mlp(ln2(x))
        return (x, v_feat) if return_v else x


class CLIPVisionTransformer(nn.Module):
    """Prompt-less zegclip CLIP ViT (reference third_party/zegclip/models/
    backbones/clip_vit.py:8-123): same as the VPT variant without prompt
    tokens; optional ``embed_v`` routes the MaskCLIP v-path through the
    final block before projection."""
    input_resolution: int = 512
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    out_indices: Sequence[int] = (11,)
    embed_v: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        b, h_img, w_img, _ = img.shape
        p = self.patch_size
        gh, gw = h_img // p, w_img // p
        hw = gh * gw
        scale = self.width ** -0.5

        x = nn.Conv(self.width, (p, p), strides=(p, p), padding='VALID',
                    use_bias=False, name='patch_embed', dtype=self.dtype,
                    param_dtype=jnp.float32)(img.astype(self.dtype))
        x = x.reshape(b, hw, self.width)
        cls_emb = self.param('class_embedding', nn.initializers.normal(scale),
                             (self.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(
            cls_emb.astype(self.dtype), (b, 1, self.width)), x], axis=1)
        sp = self.input_resolution // p
        pos = self.param('positional_embedding',
                         nn.initializers.normal(scale),
                         (sp * sp + 1, self.width), jnp.float32)
        cls_pos = (pos[0] + cls_emb)[None, None]
        spatial = pos[1:].reshape(1, sp, sp, self.width)
        if (gh, gw) != (sp, sp):
            spatial = resize(spatial, (gh, gw), mode='bilinear',
                             align_corners=False)
        x = x + jnp.concatenate(
            [cls_pos, spatial.reshape(1, hw, self.width)],
            axis=1).astype(self.dtype)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln_pre')(x)

        feats = []
        v_feat = None
        for i in range(self.layers):
            last = i == self.layers - 1
            if self.embed_v and last:
                # MaskCLIP v-path through the final block (clip_vit.py)
                x, v_feat = CLIPBlock(num_heads=self.heads, dtype=self.dtype,
                                      name=f'layers_{i}')(x, return_v=True)
            else:
                x = CLIPBlock(num_heads=self.heads, dtype=self.dtype,
                              name=f'layers_{i}')(x)
            if len(self.out_indices) > 1 and i in self.out_indices:
                feats.append(x[:, 1:].reshape(b, gh, gw, self.width))

        ln_post = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln_post')
        proj = self.param('proj', nn.initializers.normal(scale),
                          (self.width, self.output_dim), jnp.float32)
        x = ln_post(x) @ proj.astype(x.dtype)
        global_emb = l2_normalize(x[:, 0], axis=-1)
        src = (ln_post(v_feat) @ proj.astype(x.dtype)
               if self.embed_v else x)
        visual = src[:, 1:].reshape(b, gh, gw, self.output_dim)
        if len(self.out_indices) == 1:
            visual = l2_normalize(visual, axis=-1)
            feats.append(visual)
        return {'feats': tuple(feats), 'global_emb': global_emb}


class VPTCLIPVisionTransformer(nn.Module):
    input_resolution: int = 512
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    num_tokens: int = 10
    prompt_dim: int = 768
    total_d_layer: int = 11
    out_indices: Sequence[int] = (11,)
    drop_path_rate: float = 0.0  # disabled under disable_dropout (grid default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        b, h_img, w_img, _ = img.shape
        p = self.patch_size
        gh, gw = h_img // p, w_img // p
        hw = gh * gw
        scale = self.width ** -0.5

        x = nn.Conv(self.width, (p, p), strides=(p, p), padding='VALID',
                    use_bias=False, name='patch_embed', dtype=self.dtype,
                    param_dtype=jnp.float32)(img.astype(self.dtype))
        x = x.reshape(b, hw, self.width)

        cls_emb = self.param('class_embedding',
                             nn.initializers.normal(scale),
                             (self.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(
            cls_emb.astype(self.dtype), (b, 1, self.width)), x], axis=1)

        sp = self.input_resolution // p
        pos = self.param('positional_embedding',
                         nn.initializers.normal(scale),
                         (sp * sp + 1, self.width), jnp.float32)
        # cls pos gets class_embedding added (clip_vpt_vit.py:115); spatial
        # grid bilinear-resized to the input grid (116-118)
        cls_pos = (pos[0] + cls_emb)[None, None]
        spatial = pos[1:].reshape(1, sp, sp, self.width)
        if (gh, gw) != (sp, sp):
            spatial = resize(spatial, (gh, gw), mode='bilinear',
                             align_corners=False)
        pos_full = jnp.concatenate(
            [cls_pos, spatial.reshape(1, hw, self.width)], axis=1)
        x = x + pos_full.astype(self.dtype)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln_pre')(x)

        # ---- prompts ----
        prompt_emb = self.param(
            'prompt_embeddings', nn.initializers.zeros,
            (1, self.num_tokens, self.prompt_dim), jnp.float32)
        deep_prompt_emb = self.param(
            'deep_prompt_embeddings', nn.initializers.zeros,
            (self.total_d_layer, self.num_tokens, self.prompt_dim),
            jnp.float32)
        prompt_proj = nn.Dense(self.prompt_dim, name='prompt_proj',
                               dtype=self.dtype, param_dtype=jnp.float32)
        prompt_norm = LayerNorm(eps=1e-6, dtype=self.dtype,
                                name='prompt_norm')

        def project_prompt(embs):
            return jnp.broadcast_to(
                prompt_proj(embs.astype(self.dtype)),
                (b, self.num_tokens, self.width))

        x = jnp.concatenate(
            [x[:, :1], project_prompt(prompt_emb[0][None]), x[:, 1:]], axis=1)

        feats = []
        for i in range(self.layers):
            if 1 <= i <= self.total_d_layer:
                x = jnp.concatenate(
                    [x[:, :1],
                     project_prompt(deep_prompt_emb[i - 1][None]),
                     x[:, 1 + self.num_tokens:]], axis=1)
            x = CLIPBlock(num_heads=self.heads, dtype=self.dtype,
                          name=f'layers_{i}')(x)
            if len(self.out_indices) > 1 and i in self.out_indices:
                feats.append(x[:, -hw:].reshape(b, gh, gw, self.width))

        x = prompt_norm(x)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln_post')(x)
        proj = self.param('proj', nn.initializers.normal(scale),
                          (self.width, self.output_dim), jnp.float32)
        x = x @ proj.astype(x.dtype)

        global_emb = l2_normalize(x[:, 0], axis=-1)
        visual = x[:, -hw:].reshape(b, gh, gw, self.output_dim)
        if len(self.out_indices) == 1:
            visual = l2_normalize(visual, axis=-1)
            feats.append(visual)
        return {'feats': tuple(feats), 'global_emb': global_emb}
