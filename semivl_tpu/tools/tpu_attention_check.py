#!/usr/bin/env python
"""Real-TPU validation of the fused attention kernel at both encoder
sequence lengths (1025 for 512^2 crops, 2602 for 801^2 Cityscapes crops):
forward + gradient vs the XLA formulation, plus a micro-benchmark.

    python -m semivl_tpu.tools.tpu_attention_check
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from semivl_tpu.ops.attention import _mha_xla
from semivl_tpu.ops.flash_attention import flash_mha


def check(seq_len, batch=2, heads=12, dim=768, dtype=jnp.bfloat16):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(batch, seq_len, dim), dtype)
    k = jnp.asarray(rs.randn(batch, seq_len, dim), dtype)
    v = jnp.asarray(rs.randn(batch, seq_len, dim), dtype)

    f_pallas = jax.jit(lambda q, k, v: flash_mha(q, k, v, heads,
                                                 interpret=False))
    f_xla = jax.jit(lambda q, k, v: _mha_xla(q, k, v, heads))
    out_p = np.asarray(f_pallas(q, k, v), np.float32)
    out_x = np.asarray(f_xla(q, k, v), np.float32)
    err = np.abs(out_p - out_x).max()
    print(f'L={seq_len}: fwd maxdiff vs XLA = {err:.5f}')
    assert err < 0.05, err  # bf16 tolerance

    def loss_p(q, k, v):
        return jnp.sum(flash_mha(q, k, v, heads, interpret=False)
                       .astype(jnp.float32) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(_mha_xla(q, k, v, heads).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip('qkv', gp, gx):
        scale = np.abs(np.asarray(b, np.float32)).max() + 1e-6
        rel = np.abs(np.asarray(a, np.float32)
                     - np.asarray(b, np.float32)).max() / scale
        print(f'L={seq_len}: d{name} rel maxdiff = {rel:.5f}')
        assert rel < 0.05, (name, rel)

    # chain REPS applications inside ONE jit so per-dispatch tunnel latency
    # (~3 ms/call on this axon link) amortises out of the measurement
    REPS = 20

    def chain(base):
        def run(q, k, v):
            def body(x, _):
                return base(x, k, v).astype(x.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=REPS)
            return out
        return jax.jit(run)

    for name, base in (('pallas',
                        lambda q, k, v: flash_mha(q, k, v, heads,
                                                  interpret=False)),
                       ('xla', lambda q, k, v: _mha_xla(q, k, v, heads))):
        fn = chain(base)
        fn(q, k, v).block_until_ready()
        t0 = time.perf_counter()
        fn(q, k, v).block_until_ready()
        dt = (time.perf_counter() - t0) / REPS
        print(f'L={seq_len}: {name} fwd {dt * 1e3:.3f} ms/call (amortised)')


if __name__ == '__main__':
    for seq in (1025, 2602):
        check(seq)
    print('tpu attention check: OK')
