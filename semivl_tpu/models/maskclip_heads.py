"""Training-free MaskCLIP heads (Flax).

Parity: reference third_party/maskclip/models/decode_heads/
{maskclip_head.py, maskclip2_head.py}. These are inference-only heads that
classify dense CLIP features with text embeddings:

- ``MaskClip2Head``: conv2d(feat, text_embeddings) + upsample
  (maskclip2_head.py:29-33) — the minimal text-conv classifier; the SemiVL
  guidance path (VLM.forward_maskclip) re-implements the same idea inline.
- ``MaskClipHead`` (ViT path): CLIP-projects v-features, L2-normalises,
  text-conv classifies, then optional *prompt denoising* (suppress classes
  whose max confidence is low) and *key smoothing* (propagate predictions
  between pixels with similar attention keys) refinements
  (maskclip_head.py:71-155).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from semivl_tpu.models.layers import l2_normalize
from semivl_tpu.ops.resize import resize


class MaskClip2Head(nn.Module):
    """conv2d with text embeddings + bilinear upsample to image size."""
    img_size: int
    align_corners: bool = False

    def __call__(self, feat, text_embeddings, output_size=None):
        """feat: (B, h, w, Ct) L2-normalised dense CLIP embedding."""
        logits = jnp.einsum('bhwc,nc->bhwn', feat,
                            text_embeddings.astype(feat.dtype))
        out_hw = output_size or (self.img_size, self.img_size)
        logits = resize(logits.astype(jnp.float32), out_hw, mode='bilinear',
                        align_corners=self.align_corners)
        return logits.transpose(0, 3, 1, 2)


class MaskClipHead(nn.Module):
    """ViT-path MaskCLIP head with key-smoothing / prompt-denoising."""
    text_channels: int = 512
    ks_thresh: float = 0.0
    pd_thresh: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v_feat, text_embeddings, k_feat=None):
        """v_feat: (B, h, w, C) v-path features (pre-projection);
        k_feat: (B, h, w, C) attention keys for key smoothing (optional).
        Returns (B, N, h, w) class logits."""
        feat = nn.Dense(self.text_channels, use_bias=False, name='proj',
                        dtype=self.dtype, param_dtype=jnp.float32)(
                            v_feat.astype(self.dtype))
        feat = l2_normalize(feat, axis=-1)
        output = jnp.einsum('bhwc,nc->bnhw', feat,
                            text_embeddings.astype(feat.dtype))
        output = output.astype(jnp.float32)

        if self.pd_thresh > 0:
            # prompt denoising (maskclip_head.py:130-135)
            probs = jax.nn.softmax(output * 100.0, axis=1)
            max_cls_conf = jnp.max(probs.reshape(probs.shape[:2] + (-1,)),
                                   axis=-1)
            suppress = (max_cls_conf < self.pd_thresh)[:, :, None, None]
            output = jnp.where(suppress, -100.0, output)

        if k_feat is not None and self.ks_thresh > 0:
            # key smoothing (maskclip_head.py:137-153)
            b, n, h, w = output.shape
            probs = jax.nn.softmax(output * 100.0, axis=1)
            probs = probs.reshape(b, n, h * w).transpose(0, 2, 1)  # (B,HW,N)
            k = l2_normalize(
                k_feat.reshape(b, h * w, -1).astype(jnp.float32), axis=-1)
            weight = jnp.einsum('bqc,bkc->bqk', k, k)
            low_conf = jnp.max(probs, axis=-1, keepdims=True) < self.ks_thresh
            smoothed = jnp.einsum('bqk,bkn->bqn', weight, probs)
            probs = jnp.where(low_conf, smoothed, probs)
            output = probs.transpose(0, 2, 1).reshape(b, n, h, w)

        return output
