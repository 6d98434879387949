"""Multi-head attention compute op.

The single hot op of the encoder (12 blocks x 1025-2602 tokens, reference
maskclip_vit.py:492-596). Exposed as a function so the implementation can be
switched between a plain XLA einsum formulation and the Pallas
flash-attention kernel (semivl_tpu.ops.flash_attention) without touching
model code.
"""


import jax.numpy as jnp

_DEFAULT_IMPL = 'auto'

# 'auto' picks per shape at trace time. Round 3 measurements on v5e
# (scan-chained on-chip timing, b4 L=1025 / b2 L=2602, d=64):
#
#   packed Pallas kernel   fwd 0.242 / fwd+bwd 0.891 ms   |  0.674 / 2.665
#   XLA fused attention    fwd 0.258 / fwd+bwd 1.000 ms   |  1.346 / 5.630
#
# The packed kernel (heads as 128-lane pairs read straight from the
# (B, L, C) layout + MXU/VPU-overlapped sub-chains, flash_attention.py)
# beats XLA at every measured length — including the VLG semantic
# transformer's L=21 class-axis attention, where XLA's 1500-way batch of
# tiny 21x21 matmuls loses ~1.8 imgs/sec end-to-end (bench 'auto' with a
# 512-token floor: 30.3; 'pallas': 32.1) — so on TPU 'auto' routes every
# packed-eligible shape (head_dim 64, even heads) to the kernel; full
# fused step 29.12 -> 32.12 imgs/sec/chip. Shapes that need the
# transpose-wrapped kernel (other head dims) keep the round-2 crossover:
# XLA below 1536 tokens (the transposes erase the kernel win there). On
# CPU 'auto' always means XLA — interpret-mode Pallas is never fastest.
_AUTO_PALLAS_MIN_LEN_UNPACKED = 1536


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


def _mha_xla(q, k, v, num_heads, valid_len=None):
    d_head = q.shape[-1] // num_heads
    scale = 1.0 / (d_head ** 0.5)
    qh = _split_heads(q, num_heads) * jnp.asarray(scale, q.dtype)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh)
    if valid_len is not None and valid_len < k.shape[1]:
        # token-padded input (clip_vit token_pad_to_multiple): mask pad
        # keys with the kernels' -1e30 semantics; exp underflows to exactly
        # 0, so valid rows match the unpadded computation.
        import jax
        kidx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
        logits = jnp.where(kidx < valid_len,
                           logits.astype(jnp.float32), -1e30)
    probs = jnp.exp(
        logits.astype(jnp.float32)
        - jnp.max(logits, axis=-1, keepdims=True).astype(jnp.float32))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), vh)
    return _merge_heads(out)


def multi_head_attention(q, k, v, num_heads, impl=None, valid_len=None):
    """Self/cross attention over (B, L, C) tensors.

    Math parity with ``torch.nn.MultiheadAttention``: scale q by
    1/sqrt(head_dim), softmax in float32, no masking (the ViT uses full
    bidirectional attention). ``valid_len``: number of real tokens when the
    arrays carry trailing pad tokens (only the encoder's
    token_pad_to_multiple path sets this) — pad KEYS are masked out so
    valid rows keep exact unpadded numerics; pad q rows are garbage the
    caller drops.
    """
    impl = impl or _DEFAULT_IMPL
    if k.shape[1] != q.shape[1] or q.shape[-1] % num_heads:
        # Cross-attention (kv length != q length) or a channel count the
        # head split can't tile: the Pallas kernels assume neither —
        # always the XLA formulation (correct for both).
        impl = 'xla'
    if impl == 'auto':
        import jax
        on_tpu = jax.devices()[0].platform == 'tpu'
        packed_ok = (q.shape[-1] == num_heads * 64) and num_heads % 2 == 0
        if not on_tpu:
            impl = 'xla'
        elif packed_ok:
            impl = 'pallas'
        else:
            impl = ('pallas' if q.shape[1] >= _AUTO_PALLAS_MIN_LEN_UNPACKED
                    else 'xla')
    if impl == 'pallas':
        from semivl_tpu.ops.flash_attention import flash_mha
        return flash_mha(q, k, v, num_heads, valid_len=valid_len)
    return _mha_xla(q, k, v, num_heads, valid_len=valid_len)
