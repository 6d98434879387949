"""TIMM-style ViT-B/16 backbone (Flax).

Parity: reference model/backbone/timm_vit.py:28-81 wrapping timm
``vit_base_patch16_224`` — a standard pre-norm ViT (patch embed WITH bias,
cls token, learned pos embed, exact-GELU FFN, final norm). Differences from
the MaskClip ViT: no qkv v-path, no CLIP projection; ``out_indices`` features
are ``norm(x)`` at those blocks; returns ``[tuple(grid feats), cls_token]``
equivalent — here ``{'feats': ..., 'global_emb': cls}``. Off-size inputs are
bilinear-resized to the train size at eval (timm_vit.py:67-70).

DropPath (0.1 in the ablation config) only fires when ``stochastic=True``;
the SemiVL grid always runs with ``disable_dropout=True`` so student passes
keep it off (reference builder.py:61-64).
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from semivl_tpu.models.layers import LayerNorm, TransformerBlock
from semivl_tpu.ops.resize import resize


class TIMMVisionTransformer(nn.Module):
    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (4, 11)
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, stochastic=False):
        b, h, w, _ = img.shape
        if (h, w) != tuple(self.img_size):
            img = resize(img, self.img_size, mode='bilinear',
                         align_corners=False)
            h, w = self.img_size
        p = self.patch_size
        gh, gw = h // p, w // p

        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding='VALID',
                    use_bias=True, name='patch_embed', dtype=self.dtype,
                    param_dtype=jnp.float32)(img.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.embed_dims)
        cls_token = self.param('cls_token', nn.initializers.zeros,
                               (1, 1, self.embed_dims), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(
            cls_token.astype(self.dtype), (b, 1, self.embed_dims)), x], axis=1)
        pos_embed = self.param(
            'pos_embed', nn.initializers.truncated_normal(stddev=0.02),
            (1, gh * gw + 1, self.embed_dims), jnp.float32)
        x = x + pos_embed.astype(self.dtype)

        final_ln = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name='norm')
        feats = []
        rates = [self.drop_path_rate * i / max(self.num_layers - 1, 1)
                 for i in range(self.num_layers)]
        for i in range(self.num_layers):
            y, _ = TransformerBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                norm_eps=self.norm_eps, dtype=self.dtype,
                name=f'layers_{i}')(x)
            delta = y - x
            if stochastic and rates[i] > 0:
                keep = 1.0 - rates[i]
                mask = jax.random.bernoulli(
                    self.make_rng('droppath'), keep, (b, 1, 1))
                delta = jnp.where(mask, delta / keep, 0.0)
            x = x + delta
            if i in self.out_indices:
                out = final_ln(x)
                feats.append(out[:, 1:].reshape(b, gh, gw, self.embed_dims))
        x = final_ln(x)
        return {'feats': tuple(feats), 'global_emb': x[:, 0]}
