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

Backward is also a fused Pallas kernel: probabilities are recomputed from
q/k/v in VMEM per q-block (flash-style), then dq, and dk/dv via the
transposed contractions — the (L, L) probability/gradient matrices never
reach HBM in either direction. Set ``SEMIVL_FLASH_BWD=xla`` to fall back to
the XLA-recompute VJP.
"""

import os

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


def _bwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    """Grid: (bh, q_blocks) — same shape as the forward, so the VMEM
    footprint matches the forward's (which fits at every supported L).

    Per program: recompute p = softmax(q k^T) for one q-block; with
    dp = g v^T and the softmax jacobian ds = p * (dp - rowsum(g * o)):
      dq = ds k * scale (written per q-block);
      dk += ds^T q * scale, dv += p^T g (fp32 output blocks revisited and
      accumulated across the sequential q-block grid axis).
    """
    i = pl.program_id(1)
    seq = len_ref[0]

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    k = k_ref[0]                                             # (L_pad, D)
    v = v_ref[0]
    q = q_ref[0]                                             # (BQ, D)
    g = g_ref[0]
    o = o_ref[0]
    qs = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < seq, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)               # (BQ, L)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = p * (dp - delta)                                    # (BQ, L) fp32
    ds_c = ds.astype(k.dtype)
    dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(
        ds_c, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dv_ref[0] += jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fused_attention_bwd_impl(qh, kh, vh, out, g, interpret):
    bh, seq_len, d = qh.shape
    l_pad = _round_up(seq_len, _BQ)
    if l_pad != seq_len:
        pad = ((0, 0), (0, l_pad - seq_len), (0, 0))
        qh, kh, vh = (jnp.pad(x, pad) for x in (qh, kh, vh))
        out, g = (jnp.pad(x, pad) for x in (out, g))
    scale = d ** -0.5
    lengths = jnp.full((1,), seq_len, jnp.int32)
    blocked = pl.BlockSpec((1, _BQ, d), lambda b, i, *_: (b, i, 0))
    full = pl.BlockSpec((1, l_pad, d), lambda b, i, *_: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, l_pad // _BQ),
        in_specs=[blocked, full, full, blocked, blocked],
        out_specs=[blocked, full, full],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, l_pad, d), qh.dtype),
            jax.ShapeDtypeStruct((bh, l_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, l_pad, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(lengths, qh, kh, vh, out, g)
    return (dq[:, :seq_len], dk[:, :seq_len].astype(qh.dtype),
            dv[:, :seq_len].astype(qh.dtype))


def _fused_attention_fwd(qh, kh, vh, interpret):
    out = _fused_attention_fwd_impl(qh, kh, vh, interpret)
    return out, (qh, kh, vh, out)


def _fused_attention_bwd(interpret, residuals, g):
    qh, kh, vh, out = residuals
    if os.environ.get('SEMIVL_FLASH_BWD') == 'xla':
        _, vjp = jax.vjp(_attend_heads, qh, kh, vh)
        return vjp(g)
    return _fused_attention_bwd_impl(qh, kh, vh, out, g, interpret)


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
