"""Fused-attention kernel correctness (interpret mode on CPU) + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.ops.attention import _mha_xla, multi_head_attention
from semivl_tpu.ops.flash_attention import flash_mha


@pytest.mark.parametrize('shape', [
    (2, 65, 32, 4),    # off-block length (pad path)
    (1, 128, 64, 8),   # exact block
    (3, 100, 48, 6),
])
def test_flash_matches_xla(rng, shape):
    b, l, c, h = shape
    q = rng.randn(b, l, c).astype(np.float32)
    k = rng.randn(b, l, c).astype(np.float32)
    v = rng.randn(b, l, c).astype(np.float32)
    want = np.asarray(_mha_xla(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), h))
    got = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), h, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_gradients_match(rng):
    b, l, c, h = 1, 40, 32, 4
    q = jnp.asarray(rng.randn(b, l, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, c), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, h, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_mha_xla(q, k, v, h) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('shape', [
    (2, 100, 128, 2),   # packed path (d=64, even heads), off-block length
    (1, 128, 256, 4),   # packed path, exact block
])
def test_packed_flash_matches_xla(rng, shape):
    b, l, c, h = shape
    q = rng.randn(b, l, c).astype(np.float32)
    k = rng.randn(b, l, c).astype(np.float32)
    v = rng.randn(b, l, c).astype(np.float32)
    want = np.asarray(_mha_xla(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), h))
    got = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), h, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('shape', [
    (2, 100, 128, 2),   # off-block length -> genuinely partial blocks
    (2, 70, 128, 2),
    (1, 128, 256, 4),   # exact block -> partial mode is a no-op
])
def test_packed_partial_blocks_match_padded(rng, shape, monkeypatch):
    """SEMIVL_FLASH_PARTIAL=1 (unpadded kernel operands, in-kernel tail
    masking) must reproduce the jnp.pad path exactly — forward AND all
    three input gradients. Interpret mode fills out-of-bounds block reads
    with garbage, so this also proves the masking neutralises arbitrary
    pad contents, not just zeros."""
    b, l, c, h = shape
    q = jnp.asarray(rng.randn(b, l, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, c), jnp.float32)

    def run():
        def loss(q, k, v):
            return jnp.sum(flash_mha(q, k, v, h, interpret=True) ** 2)

        out = flash_mha(q, k, v, h, interpret=True)
        return out, jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.delenv('SEMIVL_FLASH_PARTIAL', raising=False)
    out_pad, g_pad = run()
    monkeypatch.setenv('SEMIVL_FLASH_PARTIAL', '1')
    out_part, g_part = run()
    np.testing.assert_allclose(np.asarray(out_part), np.asarray(out_pad),
                               rtol=1e-6, atol=1e-6)
    for gp, gq in zip(g_part, g_pad):
        assert np.isfinite(np.asarray(gp)).all()
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gq),
                                   rtol=1e-6, atol=1e-6)


def test_packed_flash_gradients_match(rng):
    b, l, c, h = 2, 70, 128, 2   # d=64 -> packed kernels, padded length
    q = jnp.asarray(rng.randn(b, l, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, c), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, h, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_mha_xla(q, k, v, h) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_packed_block_plan():
    """Block plans encode the on-chip probed limits: 576-row backward
    blocks at the encoder length, conservative 128 at Cityscapes length
    (bq=192 failed Mosaic compile there — full-length buffers add ~5 MB)."""
    from semivl_tpu.ops.flash_attention import _packed_plan
    assert _packed_plan(1025, backward=False) == (1152, 576)
    assert _packed_plan(1025, backward=True) == (1152, 576)
    l_pad, bq = _packed_plan(2602, backward=False)
    assert l_pad == 2688 and bq == 192
    l_pad, bq = _packed_plan(2602, backward=True)
    assert l_pad == 2688 and bq == 128
    for seq in (21, 100, 1025, 2602):
        for backward in (False, True):
            l_pad, bq = _packed_plan(seq, backward)
            assert l_pad % bq == 0 and (bq // 2) % 8 == 0


def test_dispatch_switch(rng):
    from semivl_tpu.ops import attention as attn_mod
    q = jnp.asarray(rng.randn(1, 16, 16), jnp.float32)
    # Default 'auto' routes everything to XLA off-TPU (interpret-mode
    # Pallas is never the fast choice on CPU); explicit 'pallas' still
    # runs the kernel for parity.
    assert attn_mod.get_default_impl() == 'auto'
    out_xla = multi_head_attention(q, q, q, 4)
    attn_mod.set_default_impl('pallas')
    try:
        out_p = multi_head_attention(q, q, q, 4)
    finally:
        attn_mod.set_default_impl('auto')
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)


def test_lora_adapter_starts_as_identity(rng):
    """LoRA B is zero-init: output must equal plain attention at init."""
    import flax.linen as nn_
    from semivl_tpu.models.layers import Attention
    x = jnp.asarray(rng.randn(1, 8, 16), jnp.float32)
    plain = Attention(num_heads=4)
    lora = Attention(num_heads=4, lora_rank=2)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vl = lora.init(jax.random.PRNGKey(0), x)
    # copy shared params
    for k in ('in_proj', 'out_proj'):
        vl['params'][k] = vp['params'][k]
    np.testing.assert_allclose(
        np.asarray(lora.apply(vl, x)), np.asarray(plain.apply(vp, x)),
        atol=1e-6)
    assert 'lora_q' in vl['params'] and 'lora_o' in vl['params']


# ---------------------------------------------------------------------------
# valid_len (token-pad) masking: pad KEYS masked out, valid rows exact.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('impl', ['xla', 'pallas'])
@pytest.mark.parametrize('shape', [
    (2, 40, 128, 2),    # packed kernel path (d=64, even heads)
    (1, 24, 96, 4),     # unpacked kernel path (d=24)
])
def test_valid_len_masks_pad_tokens(rng, impl, shape):
    """Run attention on arrays whose tail rows are JUNK, declaring
    valid_len; the valid rows must match the junk-free computation (exact
    in math — pad probabilities underflow to 0.0 — so any fp difference is
    reduction-order noise; this is the invariant clip_vit's
    token_pad_to_multiple relies on)."""
    b, l, c, h = shape
    n_pad = 7
    q = rng.randn(b, l + n_pad, c).astype(np.float32) * 3
    k = rng.randn(b, l + n_pad, c).astype(np.float32) * 3
    v = rng.randn(b, l + n_pad, c).astype(np.float32) * 3

    def run(fq, fk, fv, valid_len):
        if impl == 'pallas':
            return flash_mha(jnp.asarray(fq), jnp.asarray(fk),
                             jnp.asarray(fv), h, interpret=True,
                             valid_len=valid_len)
        return _mha_xla(jnp.asarray(fq), jnp.asarray(fk), jnp.asarray(fv),
                        h, valid_len=valid_len)

    want = np.asarray(run(q[:, :l], k[:, :l], v[:, :l], None))
    got = np.asarray(run(q, k, v, l))[:, :l]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_valid_len_gradients_match(rng):
    """Gradients through the padded+masked packed kernel equal the unpadded
    gradients on valid rows (and are finite on pad rows)."""
    b, l, c, h = 2, 40, 128, 2
    n_pad = 8
    qp = jnp.asarray(rng.randn(b, l + n_pad, c), jnp.float32)
    kp = jnp.asarray(rng.randn(b, l + n_pad, c), jnp.float32)
    vp = jnp.asarray(rng.randn(b, l + n_pad, c), jnp.float32)

    def loss_pad(q, k, v):
        out = flash_mha(q, k, v, h, interpret=True, valid_len=l)
        return jnp.sum(out[:, :l] ** 2)   # consumers drop pad rows

    def loss_ref(q, k, v):
        return jnp.sum(_mha_xla(q[:, :l], k[:, :l], v[:, :l], h) ** 2)

    g_pad = jax.grad(loss_pad, argnums=(0, 1, 2))(qp, kp, vp)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qp, kp, vp)
    for gp, gr in zip(g_pad, g_ref):
        np.testing.assert_allclose(np.asarray(gp)[:, :l],
                                   np.asarray(gr)[:, :l],
                                   rtol=1e-4, atol=1e-4)
        assert np.all(np.isfinite(np.asarray(gp)))
