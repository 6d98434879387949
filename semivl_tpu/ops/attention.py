"""Multi-head attention compute op.

The single hot op of the encoder (12 blocks x 1025-2602 tokens, reference
maskclip_vit.py:492-596). Exposed as a function so the implementation can be
switched between a plain XLA einsum formulation and the Pallas
flash-attention kernel (semivl_tpu.ops.flash_attention) without touching
model code.
"""


import jax.numpy as jnp

_DEFAULT_IMPL = 'auto'

# 'auto' picks per sequence length at trace time. Measured on v5e (full
# fused train step, round 2): at L=1025 (512^2 crops) XLA's fused attention
# is ~2.4% faster end-to-end (26.79 vs 26.16 imgs/sec); at L=2602 (801^2
# Cityscapes crops) the Pallas flash kernel wins (round-1: fwd 2.44 vs
# 2.98 ms). The crossover is set between the two working points.
_AUTO_PALLAS_MIN_LEN = 1536


def set_default_impl(impl):
    """Set the global attention implementation
    ('auto' | 'xla' | 'pallas')."""
    global _DEFAULT_IMPL
    assert impl in ('auto', 'xla', 'pallas'), impl
    _DEFAULT_IMPL = impl


def get_default_impl():
    return _DEFAULT_IMPL


def _split_heads(x, num_heads):
    b, l, c = x.shape
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _mha_xla(q, k, v, num_heads):
    d_head = q.shape[-1] // num_heads
    scale = 1.0 / (d_head ** 0.5)
    qh = _split_heads(q, num_heads) * jnp.asarray(scale, q.dtype)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh)
    probs = jnp.exp(
        logits.astype(jnp.float32)
        - jnp.max(logits, axis=-1, keepdims=True).astype(jnp.float32))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), vh)
    return _merge_heads(out)


def multi_head_attention(q, k, v, num_heads, impl=None):
    """Self/cross attention over (B, L, C) tensors.

    Math parity with ``torch.nn.MultiheadAttention``: scale q by
    1/sqrt(head_dim), softmax in float32, no masking (the ViT uses full
    bidirectional attention).
    """
    impl = impl or _DEFAULT_IMPL
    if impl == 'auto':
        impl = 'pallas' if q.shape[1] >= _AUTO_PALLAS_MIN_LEN else 'xla'
    if impl == 'pallas':
        from semivl_tpu.ops.flash_attention import flash_mha
        return flash_mha(q, k, v, num_heads)
    return _mha_xla(q, k, v, num_heads)
