"""Shared Flax building blocks for the model zoo."""

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from semivl_tpu.ops.attention import multi_head_attention

Dtype = Any


def l2_normalize(x, axis=-1, eps=1e-12):
    """L2 normalisation in float32 (parity with torch ``x / x.norm()``)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    return (x32 / jnp.maximum(norm, eps)).astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm computed in float32, output cast to ``dtype``.

    Matches the reference's fp32-cast LayerNorm
    (third_party/zegclip/models/backbones/utils.py LayerNorm) and mmcv LN
    with eps from config (reference maskclip_vit.py norm_cfg eps=1e-6).
    """
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    # optimization_barrier on the input: stops XLA fusing the fp32
    # mean/var reductions into the producing GEMM's epilogue (the round-3
    # device trace measured 768-out-channel GEMMs dragged to 85-100 TF/s
    # by fused LN-stat epilogues vs a 165-175 TF/s clean-GEMM ceiling;
    # tools/encoder_microbench.py A/Bs this on a block replica).
    # Numerically an identity.
    stat_barrier: bool = False

    @nn.compact
    def __call__(self, x):
        if self.stat_barrier:
            x = jax.lax.optimization_barrier(x)
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        dim = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (dim,), jnp.float32)
        y = y * scale + bias
        return y.astype(self.dtype if self.dtype is not None else orig_dtype)


class LoRAAdapter(nn.Module):
    """Low-rank adapter: x -> scaling * (x A^T) B^T (reference
    model/backbone/lora.py:21-58; A ~ kaiming-uniform, B zero-init so the
    adapter starts as identity)."""
    rank: int
    scaling: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a = self.param('lora_a', nn.initializers.he_uniform(), (c, self.rank),
                       jnp.float32)
        b = self.param('lora_b', nn.initializers.zeros, (self.rank, c),
                       jnp.float32)
        return self.scaling * ((x @ a.astype(x.dtype)) @ b.astype(x.dtype))


class Attention(nn.Module):
    """Packed-QKV multi-head self-attention (torch MultiheadAttention parity).

    Parameters are stored as a single ``in_proj`` (3C) and ``out_proj`` so the
    CLIP checkpoint converter maps 1:1 (reference convert_clip_weights.py
    attn.attn.in_proj_weight / out_proj).

    ``lora_rank`` > 0 adds q/k/v/o low-rank adapters (reference
    model/backbone/lora.py — config-reachable, unused by the paper grid).
    """
    num_heads: int
    qkv_bias: bool = True
    lora_rank: int = 0
    lora_scaling: float = 1.0
    lora_targets: str = 'qkvo'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_qkv=False, valid_len=None):
        c = x.shape[-1]
        in_proj = nn.Dense(3 * c, use_bias=self.qkv_bias, name='in_proj',
                           dtype=self.dtype, param_dtype=jnp.float32)
        out_proj = nn.Dense(c, use_bias=True, name='out_proj',
                            dtype=self.dtype, param_dtype=jnp.float32)
        qkv = in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.lora_rank > 0:
            for t in self.lora_targets:
                if t == 'o':
                    continue
                delta = LoRAAdapter(self.rank_or(), self.lora_scaling,
                                    self.dtype, name=f'lora_{t}')(x)
                if t == 'q':
                    q = q + delta
                elif t == 'k':
                    k = k + delta
                elif t == 'v':
                    v = v + delta
        attn_out = multi_head_attention(q, k, v, self.num_heads,
                                        valid_len=valid_len)
        out = out_proj(attn_out)
        if self.lora_rank > 0 and 'o' in self.lora_targets:
            out = out + LoRAAdapter(self.rank_or(), self.lora_scaling,
                                    self.dtype, name='lora_o')(attn_out)
        if return_qkv:
            return out, (q, k, v), out_proj
        return out

    def rank_or(self):
        return self.lora_rank


def gelu_exact(x):
    """Exact erf GELU (torch nn.GELU default; flax defaults to tanh approx)."""
    return nn.gelu(x, approximate=False)


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (zegclip utils.py)."""
    return x * nn.sigmoid(1.702 * x)


class Mlp(nn.Module):
    """Transformer FFN: fc1 -> GELU -> fc2 (mmcv FFN parity, reference
    maskclip_vit.py:94-100; dropout rates are 0 in every SemiVL config)."""
    hidden_dim: int
    act: Callable = gelu_exact
    # optimization_barrier between the fc1 GEMM and the activation: stops
    # XLA fusing the erf GELU (VPU) into the GEMM epilogue, which was
    # measured to drag the forward GEMM rate (-19% fwd on the 12-block
    # stack at b4 L=1025, tools/encoder_microbench.py barrier_gelu).
    # Numerically identity.
    gelu_barrier: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(self.hidden_dim, name='fc1', dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        if self.gelu_barrier:
            h = jax.lax.optimization_barrier(h)
        h = self.act(h)
        return nn.Dense(c, name='fc2', dtype=self.dtype,
                        param_dtype=jnp.float32)(h)


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block with the MaskCLIP v-path.

    Regular path (reference maskclip_vit.py:120-143):
      ``x = x + attn(ln1(x)); x = x + ffn(ln2(x))``

    v-path (``return_v=True``; reference forward_qkv maskclip_vit.py:110-118):
      ``v' = out_proj(v_of(ln1(x))) + x; v'' = v' + ffn(ln2(v'))``
    i.e. the value vectors are propagated without attention mixing — the
    MaskCLIP trick for dense CLIP features. q/k are not pushed through
    out_proj here because every SemiVL consumer discards them (the reference
    computes then drops them; see vlg_head.py inputs and VLM.extract_feat).
    """
    num_heads: int
    mlp_ratio: int = 4
    mlp_hidden: Optional[int] = None  # overrides mlp_ratio * dim if set
    norm_eps: float = 1e-6
    ln_stat_barrier: bool = False  # see LayerNorm.stat_barrier
    gelu_barrier: bool = False  # see Mlp.gelu_barrier
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_v=False, valid_len=None):
        c = x.shape[-1]
        ln1 = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name='ln1',
                        stat_barrier=self.ln_stat_barrier)
        ln2 = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name='ln2',
                        stat_barrier=self.ln_stat_barrier)
        attn = Attention(num_heads=self.num_heads, dtype=self.dtype,
                         name='attn')
        ffn = Mlp(hidden_dim=self.mlp_hidden or self.mlp_ratio * c,
                  gelu_barrier=self.gelu_barrier, dtype=self.dtype,
                  name='ffn')

        y = ln1(x)
        if return_v:
            attn_out, (q, k, v), out_proj = attn(y, return_qkv=True,
                                                 valid_len=valid_len)
            v_feat = out_proj(v) + x
            v_feat = v_feat + ffn(ln2(v_feat))
        else:
            attn_out = attn(y, valid_len=valid_len)
            v_feat = None
        x = x + attn_out
        x = x + ffn(ln2(x))
        return x, v_feat
