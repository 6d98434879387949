"""MaskCLIP vision transformer encoder (Flax).

TPU-native re-design of the reference encoder
(third_party/maskclip/models/backbones/maskclip_vit.py:147-603): a CLIP
ViT-B/16 with

- pre-LN (``ln0``) and final norm (``ln1``), bias-free patch embedding,
- bicubic positional-embedding resize for arbitrary input sizes
  (maskclip_vit.py:431-490) via exact-parity matmul resize,
- the MaskCLIP qkv/v-path for out layers (maskclip_vit.py:110-118),
- a 512-d CLIP projection producing an L2-normalised dense visual embedding
  plus a global (cls-token) embedding (maskclip_vit.py:547-594).

Output contract (consumed by VLM / decode heads): a dict
``{'feats': tuple of NHWC feature maps, 'global_emb': (B, 512)}`` where
``feats`` holds the v-path grid features for each ``out_index < num_layers``
(768ch) followed by the dense CLIP embedding (512ch) if
``num_layers in out_indices`` — matching the reference's
``[tuple(features), global_embedding]`` (maskclip_vit.py:577-594).

Everything is static-shaped: images are NHWC float, padded to a multiple of
``patch_size`` with zeros (mmseg PatchEmbed 'corner' padding parity).
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from semivl_tpu.models.layers import LayerNorm, TransformerBlock, l2_normalize
from semivl_tpu.ops.resize import resize_longer_matrix


class MaskClipViT(nn.Module):
    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Optional[Sequence[int]] = None
    qkv_bias: bool = True
    pre_norm: bool = True
    final_norm: bool = True
    return_clip_embed: bool = True
    return_qkv: bool = True
    # maskclip_vit.py:542-546: replace the final layer's attention-mixed
    # output with the v-path (config-reachable in the reference, unused by
    # any shipped experiment).
    skip_last_attn: bool = False
    patch_bias: bool = False
    clip_dim: int = 512
    norm_eps: float = 1e-6
    # rematerialise transformer blocks in backward (mmseg 'with_cp'):
    # trades recompute for activation memory (SURVEY.md §7 hard parts —
    # the 4-forwards-per-step live set)
    remat: bool = False
    # Pad the token count up to a multiple of this (1 = off) with zero
    # tokens AFTER the positional embedding: the encoder's dense GEMMs run
    # at M = B*L, and the flagship L=1025 gives M=4100 — measured ~15%
    # below the M=4096 MXU rate on v5e (tools/encoder_microbench.py). Pad
    # keys are masked inside attention (ops/attention.py valid_len), and
    # the grid/cls outputs slice pads off, so real-token numerics are
    # exactly those of the unpadded model. No parameters change shape.
    token_pad_to_multiple: int = 1
    # optimization_barrier before every block LayerNorm's stat reduction
    # (see models/layers.py LayerNorm.stat_barrier). Numerically identity.
    ln_stat_barrier: bool = False
    # optimization_barrier between each ffn's fc1 GEMM and the erf GELU
    # (models/layers.py Mlp.gelu_barrier). Numerically identity; measured
    # -19% on the stacked-block FORWARD (encoder_microbench barrier_gelu)
    # and +0.93 imgs/sec on the full step (round-4 A/B) — default ON
    # (builder); env SEMIVL_GELU_BARRIER=0 disables.
    gelu_barrier: bool = False
    dtype: Any = jnp.float32

    def _out_indices(self):
        if self.out_indices is None:
            # Reference maskclip_vit.py:288-289: None -> [num_layers],
            # i.e. only the dense CLIP embedding is emitted.
            return (self.num_layers,)
        return tuple(self.out_indices)

    @nn.compact
    def __call__(self, img):
        """img: (B, H, W, 3) float. Returns {'feats': tuple, 'global_emb'}."""
        b, h, w, _ = img.shape
        p = self.patch_size
        pad_h = (-h) % p
        pad_w = (-w) % p
        if pad_h or pad_w:
            # mmseg PatchEmbed padding='corner': zero-pad bottom/right.
            img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        gh, gw = (h + pad_h) // p, (w + pad_w) // p

        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding='VALID',
                    use_bias=self.patch_bias, name='patch_embed',
                    dtype=self.dtype, param_dtype=jnp.float32)(
                        img.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.embed_dims)

        cls_token = self.param('cls_token', nn.initializers.zeros,
                               (1, 1, self.embed_dims), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype),
                              (b, 1, self.embed_dims)), x], axis=1)

        # Positional embedding sized for the configured img_size grid
        # (floor division — reference maskclip_vit.py:278-285); resized at
        # trace time if the token grid differs (maskclip_vit.py:431-460).
        pos_h = self.img_size[0] // p
        pos_w = self.img_size[1] // p
        pos_embed = self.param(
            'pos_embed',
            nn.initializers.truncated_normal(stddev=0.02),
            (1, pos_h * pos_w + 1, self.embed_dims), jnp.float32)
        if (gh, gw) != (pos_h, pos_w):
            pos_embed = resize_longer_matrix(
                pos_embed, (gh, gw), (pos_h, pos_w), mode='bicubic')
        x = x + pos_embed.astype(self.dtype)

        valid_len = None
        if self.token_pad_to_multiple > 1:
            n_pad = (-x.shape[1]) % self.token_pad_to_multiple
            if n_pad:
                valid_len = x.shape[1]
                x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

        if self.pre_norm:
            x = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name='ln0')(x)

        out_indices = self._out_indices()
        final_ln = (LayerNorm(eps=self.norm_eps, dtype=self.dtype, name='ln1')
                    if self.final_norm else None)
        proj = (nn.Dense(self.clip_dim, use_bias=False, name='proj',
                         dtype=self.dtype, param_dtype=jnp.float32)
                if self.return_clip_embed else None)

        def to_grid(tokens):
            return tokens[:, 1:1 + gh * gw].reshape(
                b, gh, gw, tokens.shape[-1])

        block_cls = (nn.remat(TransformerBlock, static_argnums=(2, 3))
                     if self.remat else TransformerBlock)
        feats = []
        clip_embed = None
        global_emb = None
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            need_v = self.return_qkv and (i in out_indices
                                          or (last and self.return_clip_embed)
                                          or (last and self.skip_last_attn))
            x, v = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                norm_eps=self.norm_eps, dtype=self.dtype,
                ln_stat_barrier=self.ln_stat_barrier,
                gelu_barrier=self.gelu_barrier,
                name=f'layers_{i}')(x, need_v, valid_len)
            if last and self.skip_last_attn and v is not None:
                x = v
            if last and self.final_norm:
                x = final_ln(x)
                if v is not None:
                    v = final_ln(v)
            if last and self.return_clip_embed:
                clip_embed = l2_normalize(proj(to_grid(v)), axis=-1)
            if i in out_indices:
                feats.append(to_grid(v if self.return_qkv else x))

        if self.return_clip_embed:
            if self.num_layers in out_indices:
                feats.append(clip_embed)
            global_emb = l2_normalize(proj(x[:, 0]), axis=-1)

        return {'feats': tuple(feats), 'global_emb': global_emb}
