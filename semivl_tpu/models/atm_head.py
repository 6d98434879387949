"""ZegCLIP ATM decoder head (Flax).

Parity: reference third_party/zegclip/models/decode_heads/atm_head.py —
a DETR-style decoder where per-class queries (text embedding, optionally
modulated by the cls token: the "relationship descriptor" ``use_rd``,
atm_head.py:370-380) cross-attend to patch tokens over ``num_layers`` TPN
decoder layers, and the *pre-softmax attention maps themselves* (mean over
heads) are the segmentation masks (atm_head.py:100-120, 309-331).

Returns final-layer mask logits at image size as (B, C, H, W) plus the
per-layer mask stack for the deep-supervision loss (SegLossPlus).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from semivl_tpu.ops.resize import resize
from semivl_tpu.text.embeddings import (
    aggregate_concept_predictions,
    get_class_to_concept_idxs,
)


class CrossAttention(nn.Module):
    """Separate q/k/v projections; returns output AND head-mean pre-softmax
    logits (atm_head.py:84-120)."""
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xq, xk, xv):
        b, nq, c = xq.shape
        nk = xk.shape[1]
        d = c // self.num_heads

        def proj(x, name):
            return nn.Dense(c, name=name, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)

        def heads(x, n):
            return x.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)

        q = heads(proj(xq, 'q'), nq) * (d ** -0.5)
        k = heads(proj(xk, 'k'), nk)
        v = heads(proj(xv, 'v'), nk)
        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        attn_save = jnp.mean(logits.astype(jnp.float32), axis=1)  # (B,Nq,Nk)
        probs = nn.softmax(logits.astype(jnp.float32),
                           axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        out = nn.Dense(c, name='proj', dtype=self.dtype,
                       param_dtype=jnp.float32)(out)
        return out, attn_save


class TPNDecoderLayer(nn.Module):
    """Post-norm decoder layer, cross-attention only (self-attn is created
    but never called in the reference; we simply don't create it)."""
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory):
        c = tgt.shape[-1]
        tgt2, attn = CrossAttention(num_heads=self.num_heads,
                                    dtype=self.dtype, name='attn')(
                                        tgt, memory, memory)
        tgt = tgt + tgt2
        tgt = nn.LayerNorm(epsilon=1e-5, name='norm2',
                           dtype=jnp.float32)(tgt).astype(tgt2.dtype)
        h = nn.Dense(4 * c, name='linear1', dtype=self.dtype,
                     param_dtype=jnp.float32)(tgt)
        h = nn.relu(h)
        h = nn.Dense(c, name='linear2', dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        tgt = tgt + h
        tgt = nn.LayerNorm(epsilon=1e-5, name='norm3',
                           dtype=jnp.float32)(tgt).astype(h.dtype)
        return tgt, attn


class ATMSingleHeadSeg(nn.Module):
    img_size: int
    num_classes: int
    in_channels: int = 512
    embed_dims: int = 512
    num_layers: int = 3
    num_heads: int = 8
    use_stages: int = 1
    use_proj: bool = False
    use_rd: bool = True
    align_corners: bool = False
    text_embedding_name: str = ''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, text_feats, conv_feats=None, output_size=None,
                 train=False, global_emb=None, return_aux=False):
        """feats: NHWC maps; uses the last ``use_stages`` maps (semivl config:
        one stage, the dense CLIP embedding). global_emb: (B, 512) cls-token
        embedding for the relationship descriptor."""
        del conv_feats
        assert self.use_stages == 1, 'multi-stage lateral path not used by any config'
        x = feats[-1]
        b, gh, gw, _ = x.shape
        memory = x.reshape(b, gh * gw, x.shape[-1]).astype(self.dtype)
        if self.use_proj:
            memory = nn.LayerNorm(epsilon=1e-5, name='proj_norm',
                                  dtype=jnp.float32)(
                nn.Dense(self.embed_dims, name='input_proj',
                         dtype=self.dtype,
                         param_dtype=jnp.float32)(memory)).astype(self.dtype)

        if text_feats.ndim == 2:
            text = jnp.broadcast_to(text_feats[None],
                                    (b,) + text_feats.shape)
        else:
            text = text_feats
        text = text.astype(self.dtype)
        n = text.shape[1]
        if self.use_rd:
            assert global_emb is not None
            q1 = jnp.einsum('bd,bcd->bcd', global_emb.astype(self.dtype),
                            text)
            q = jnp.concatenate([q1, text], axis=-1)
        else:
            q = text
        q = nn.Dense(self.embed_dims, name='q_proj', dtype=self.dtype,
                     param_dtype=jnp.float32)(q)

        masks = []
        for i in range(self.num_layers):
            q, attn = TPNDecoderLayer(num_heads=self.num_heads,
                                      dtype=self.dtype,
                                      name=f'decoder_{i}')(q, memory)
            mask = attn.reshape(b, n, gh, gw)
            if n != self.num_classes:
                cls2con = get_class_to_concept_idxs(self.text_embedding_name)
                mask = aggregate_concept_predictions(mask, cls2con)
            masks.append(mask)

        out_hw = output_size or (self.img_size, self.img_size)

        def to_size(m, hw):
            m = m.transpose(0, 2, 3, 1)
            m = resize(m.astype(jnp.float32), hw, mode='bilinear',
                       align_corners=self.align_corners)
            return m.transpose(0, 3, 1, 2)

        pred = to_size(masks[-1], out_hw)
        if return_aux:
            return pred, [to_size(m, (gh, gw)) for m in masks]
        return pred
