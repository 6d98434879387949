"""Fused multi-head attention Pallas kernel for the ViT encoder.

The encoder's sequence lengths are 1025 (512^2 crops) to 2602 (801^2
Cityscapes crops) tokens with head_dim 64 (SURVEY.md §5). At these lengths
the whole key/value block fits in VMEM, so instead of a streaming
flash-attention loop the kernel computes one q-block against ALL keys in a
single fused pass — logits never round-trip to HBM (the XLA fallback
materialises (B, H, L, L) score tensors in HBM, the attention bandwidth
bottleneck).

Grid: (batch*heads, q_blocks). Per program: (BQ, D) @ (D, L_pad) on the MXU,
masked fp32 softmax on the VPU, (BQ, L_pad) @ (L_pad, D) back on the MXU.
VMEM high-water ~ BQ*L_pad*4B (1.4 MB at L=2704, BQ=128).

Backward currently recomputes attention through the XLA formulation via
``jax.custom_vjp`` (correct, memory paid only in backward); a Pallas
backward kernel is the follow-up optimisation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128  # q rows per program; L_pad is always a multiple of 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    seq = len_ref[0]
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)          # (BQ, D)
    k = k_ref[0]                                            # (L_pad, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (BQ, L_pad)
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < seq, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v_ref.dtype)
    o = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attend_heads(qh, kh, vh):
    """XLA reference attention on (BH, L, D) arrays (used for the VJP)."""
    d = qh.shape[-1]
    s = jnp.einsum('bqd,bkd->bqk', qh * (d ** -0.5), kh)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(vh.dtype)
    return jnp.einsum('bqk,bkd->bqd', p, vh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(qh, kh, vh, interpret):
    return _fused_attention_fwd_impl(qh, kh, vh, interpret)


def _fused_attention_fwd_impl(qh, kh, vh, interpret):
    bh, seq_len, d = qh.shape
    l_pad = _round_up(seq_len, _BQ)
    if l_pad != seq_len:
        pad = ((0, 0), (0, l_pad - seq_len), (0, 0))
        qh = jnp.pad(qh, pad)
        kh = jnp.pad(kh, pad)
        vh = jnp.pad(vh, pad)
    scale = d ** -0.5
    lengths = jnp.full((1,), seq_len, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, l_pad // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, l_pad, d), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, l_pad, d), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BQ, d), lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, l_pad, d), qh.dtype),
        interpret=interpret,
    )(lengths, qh, kh, vh)
    return out[:, :seq_len]


def _fused_attention_fwd(qh, kh, vh, interpret):
    out = _fused_attention_fwd_impl(qh, kh, vh, interpret)
    return out, (qh, kh, vh)


def _fused_attention_bwd(interpret, residuals, g):
    del interpret
    qh, kh, vh = residuals
    _, vjp = jax.vjp(_attend_heads, qh, kh, vh)
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def flash_mha(q, k, v, num_heads, interpret=None):
    """(B, L, C) packed multi-head attention via the fused kernel."""
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    b, l, c = q.shape
    d = c // num_heads

    def split(x):
        return (x.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
                .reshape(b * num_heads, l, d))

    out = _fused_attention(split(q), split(k), split(v), interpret)
    return (out.reshape(b, num_heads, l, d).transpose(0, 2, 1, 3)
            .reshape(b, l, c))
