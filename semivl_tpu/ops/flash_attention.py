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

_BQ = 128  # fallback q rows per program; L_pad is a multiple of 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _block_plan(seq_len, backward):
    """(l_pad, block_q, nsplit) for a sequence length.

    block_q is the q rows per program; nsplit splits each program's q rows
    into independent sub-chains so Mosaic's scheduler OVERLAPS the VPU
    softmax of one sub-chain with the MXU dots of the next (measured on
    v5e at L=1025: fwd 0.342 -> 0.164 ms, at the d=64 MXU floor). Bigger
    block_q amortises the k/v residency; the backward uses a smaller
    block_q at long L to keep its ~3x larger fp32 (BQ, L_pad) live set
    under the scoped-VMEM roof.
    """
    l_pad = _round_up(seq_len, 128)
    for bq in (576, 512, 384, 256, 192, 128, 64, 32, 16, 8):
        if l_pad % bq:
            continue
        if backward and bq * l_pad * 4 * 3 > 9 * 1024 * 1024:
            continue  # s/dp/ds fp32 live set cap
        nsplit = max(n for n in (4, 3, 2, 1)
                     if bq % n == 0 and (bq // n) % 8 == 0)
        return l_pad, bq, nsplit
    return l_pad, 8, 1  # L > ~37k backward: smallest row block


def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, sub, nsplit):
    seq = len_ref[0]
    k = k_ref[0]                                            # (L_pad, D)
    v = v_ref[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (sub, k.shape[0]), 1)
    # Independent per-sub-chain chains: emitted unrolled so the scheduler
    # can run sub-chain j's softmax (VPU) under sub-chain j+1's dots (MXU).
    ss = []
    for j in range(nsplit):
        q = (q_ref[0][j * sub:(j + 1) * sub]
             * jnp.asarray(scale, q_ref.dtype))             # (sub, D)
        ss.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))            # (sub, L_pad)
    ps = []
    for s in ss:
        s = jnp.where(kidx < seq, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ps.append((p / denom).astype(v.dtype))
    for j, p in enumerate(ps):
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, j * sub:(j + 1) * sub, :] = o.astype(o_ref.dtype)


def _attend_heads(qh, kh, vh, valid_len=None):
    """XLA reference attention on (BH, L, D) arrays (used for the VJP).

    Delegates to the dispatcher's reference implementation (one head) so
    the valid_len masking semantics cannot drift between the
    SEMIVL_FLASH_BWD=xla fallback and the production XLA path."""
    from semivl_tpu.ops.attention import _mha_xla
    return _mha_xla(qh, kh, vh, 1, valid_len=valid_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(qh, kh, vh, interpret, valid_len):
    return _fused_attention_fwd_impl(qh, kh, vh, interpret, valid_len)


def _fused_attention_fwd_impl(qh, kh, vh, interpret, valid_len):
    bh, seq_len, d = qh.shape
    l_pad, bq, nsplit = _block_plan(seq_len, backward=False)
    if l_pad != seq_len:
        pad = ((0, 0), (0, l_pad - seq_len), (0, 0))
        qh = jnp.pad(qh, pad)
        kh = jnp.pad(kh, pad)
        vh = jnp.pad(vh, pad)
    scale = d ** -0.5
    lengths = jnp.full((1,), valid_len, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, l_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, l_pad, d), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, l_pad, d), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, sub=bq // nsplit,
                          nsplit=nsplit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, l_pad, d), qh.dtype),
        interpret=interpret,
    )(lengths, qh, kh, vh)
    return out[:, :seq_len]


def _bwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale, sub, nsplit):
    """Grid: (bh, q_blocks) — same shape as the forward.

    Per program: recompute p = softmax(q k^T) for one q-block; with
    dp = g v^T and the softmax jacobian ds = p * (dp - rowsum(g * o)):
      dq = ds k * scale (written per q-block);
      dk += ds^T q * scale, dv += p^T g (fp32 output blocks revisited and
      accumulated across the sequential q-block grid axis).

    Like the forward, the q-block is split into ``nsplit`` independent
    sub-chains, staged dots-then-VPU-then-dots, so the scheduler overlaps
    one sub-chain's softmax/jacobian (VPU) with another's dots (MXU).
    """
    i = pl.program_id(1)
    seq = len_ref[0]

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    k = k_ref[0]                                             # (L_pad, D)
    v = v_ref[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (sub, k.shape[0]), 1)

    qs_j, g_j, ss, dps = [], [], [], []
    for j in range(nsplit):                                  # MXU stage 1
        q = q_ref[0][j * sub:(j + 1) * sub]
        g = g_ref[0][j * sub:(j + 1) * sub]
        qs_j.append(q)
        g_j.append(g)
        qs = q * jnp.asarray(scale, q.dtype)
        ss.append(jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        dps.append(jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    ps, dss = [], []
    for j in range(nsplit):                                  # VPU stage
        s = jnp.where(kidx < seq, ss[j], -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)           # (sub, L)
        o = o_ref[0][j * sub:(j + 1) * sub]
        delta = jnp.sum(g_j[j].astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ps.append(p)
        dss.append(p * (dps[j] - delta))                     # fp32
    dk_acc = None
    dv_acc = None
    for j in range(nsplit):                                  # MXU stage 2
        ds_c = dss[j].astype(k.dtype)
        dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
        dq_ref[0, j * sub:(j + 1) * sub, :] = dq.astype(dq_ref.dtype)
        dk_j = jax.lax.dot_general(
            ds_c, qs_j[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_j = jax.lax.dot_general(
            ps[j].astype(g_j[j].dtype), g_j[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc = dk_j if dk_acc is None else dk_acc + dk_j
        dv_acc = dv_j if dv_acc is None else dv_acc + dv_j
    dk_ref[0] += dk_acc
    dv_ref[0] += dv_acc


def _fused_attention_bwd_impl(qh, kh, vh, out, g, interpret, valid_len):
    bh, seq_len, d = qh.shape
    l_pad, bq, nsplit = _block_plan(seq_len, backward=True)
    if l_pad != seq_len:
        pad = ((0, 0), (0, l_pad - seq_len), (0, 0))
        qh, kh, vh = (jnp.pad(x, pad) for x in (qh, kh, vh))
        out, g = (jnp.pad(x, pad) for x in (out, g))
    scale = d ** -0.5
    lengths = jnp.full((1,), valid_len, jnp.int32)
    blocked = pl.BlockSpec((1, bq, d), lambda b, i, *_: (b, i, 0))
    full = pl.BlockSpec((1, l_pad, d), lambda b, i, *_: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, l_pad // bq),
        in_specs=[blocked, full, full, blocked, blocked],
        out_specs=[blocked, full, full],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, sub=bq // nsplit,
                          nsplit=nsplit),
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


def _fused_attention_fwd(qh, kh, vh, interpret, valid_len):
    out = _fused_attention_fwd_impl(qh, kh, vh, interpret, valid_len)
    return out, (qh, kh, vh, out)


def _fused_attention_bwd(interpret, valid_len, residuals, g):
    qh, kh, vh, out = residuals
    if os.environ.get('SEMIVL_FLASH_BWD') == 'xla':
        _, vjp = jax.vjp(lambda a, b2, c2: _attend_heads(a, b2, c2, valid_len),
                         qh, kh, vh)
        return vjp(g)
    return _fused_attention_bwd_impl(qh, kh, vh, out, g, interpret, valid_len)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def flash_mha(q, k, v, num_heads, interpret=None, valid_len=None):
    """(B, L, C) packed multi-head attention via the fused kernel.

    ``valid_len``: number of real tokens when the arrays carry trailing pad
    tokens (clip_vit ``token_pad_to_multiple``); keys at positions >=
    valid_len are masked out, so valid rows match the unpadded computation
    exactly (pad q rows produce finite garbage, dropped by the caller)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    b, l, c = q.shape
    assert c % num_heads == 0, (c, num_heads)
    assert k.shape[1] == l and v.shape[1] == l, (
        'flash_mha is self-attention only (q/k/v share one sequence '
        'length); the kernels key their mask off q\'s length, so '
        'cross-attention must take the XLA path', q.shape, k.shape)
    d = c // num_heads
    if valid_len is None:
        valid_len = l
    if d == 64 and num_heads % 2 == 0:
        # Packed-layout kernels: heads are read as lane slices of the
        # (B, L, C) arrays inside the kernel, so the (B,H,L,D)
        # split/merge transposes (measured ~0.13 ms/call at the encoder
        # shape — they erased the kernel's whole win) never materialise.
        return _packed_attention(q, k, v, num_heads, interpret, valid_len)

    def split(x):
        return (x.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
                .reshape(b * num_heads, l, d))

    out = _fused_attention(split(q), split(k), split(v), interpret,
                           valid_len)
    return (out.reshape(b, num_heads, l, d).transpose(0, 2, 1, 3)
            .reshape(b, l, c))


# ---------------------------------------------------------------------------
# Packed-layout kernels (no head transposes).
#
# Requires head_dim == 64 and an even head count: each program owns TWO
# heads side by side in a 128-lane block (Pallas requires last-dim blocks
# divisible by 128), giving 2 x nsplit independent sub-chains per program
# for the MXU/VPU overlap. Measured on v5e at B4 H12 L1025 D64 from the
# (B, L, C) interface: fwd 0.237 ms vs XLA's fused attention 0.258.
# ---------------------------------------------------------------------------

_PACKED_NS = 2  # sub-chains per head; x2 heads = 4 independent chains


def _packed_plan(seq_len, backward):
    """(l_pad, block_q) for the packed kernels. The live set per program is
    ~2 heads x (block_q, l_pad) fp32 stage arrays (x2 stages in backward)
    plus the full-length k/v/dk/dv buffers, capped to fit scoped VMEM.

    Backward blocks are probed on-chip, not just estimated: at
    l_pad=1152, bq=576 compiles and runs (fwd+bwd 0.753 vs 0.882 ms at
    bq=288) even though the naive stage estimate (10.6 MB) looks tight —
    Mosaic reuses dead stage buffers; at l_pad=2688 even bq=192
    (8.25 MB stages) fails to compile because the full-length buffers
    add ~4.8 MB — so long sequences keep bq=128."""
    l_pad = _round_up(seq_len, 128)
    if backward:
        if l_pad <= 1152 and l_pad % 576 == 0:
            return l_pad, 576
        cap = 6 * 1024 * 1024
        per_row = l_pad * 16
    else:
        cap = 6 * 1024 * 1024
        per_row = l_pad * 8
    for bq in (576, 512, 384, 288, 256, 192, 128, 96, 64):
        if l_pad % bq or bq % (8 * _PACKED_NS):
            continue
        if bq * per_row <= cap:
            return l_pad, bq
    return l_pad, 64


def _packed_fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, sub,
                       l_real=None):
    seq = len_ref[0]
    kv_k = k_ref[0]                                  # (L_pad, 128): 2 heads
    kv_v = v_ref[0]
    if l_real is not None and l_real < kv_v.shape[0]:
        # Partial-block mode: the (L_pad, 128) block extends past the
        # unpadded array's L rows; Mosaic's out-of-bounds read contents
        # are unspecified. Zero the V tail so p @ v (p is exactly 0 on
        # masked columns, but 0 * NaN = NaN in a dot) matches the
        # jnp.pad path bit for bit. K needs no zeroing: its garbage
        # columns only reach the softmax through scores that the
        # kidx < seq where() replaces before any reduction.
        vidx = jax.lax.broadcasted_iota(jnp.int32, kv_v.shape, 0)
        kv_v = jnp.where(vidx < l_real, kv_v, 0)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (sub, kv_k.shape[0]), 1)
    chains = []
    for hh in range(2):
        lo, hi = 64 * hh, 64 * hh + 64
        kk = kv_k[:, lo:hi]
        for j in range(_PACKED_NS):
            qj = (q_ref[0][j * sub:(j + 1) * sub, lo:hi]
                  * jnp.asarray(scale, q_ref.dtype))
            chains.append((hh, j, jax.lax.dot_general(
                qj, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)))
    probs = []
    for hh, j, s in chains:
        s = jnp.where(kidx < seq, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        probs.append((hh, j, (p / jnp.sum(p, axis=-1, keepdims=True)
                              ).astype(kv_v.dtype)))
    for hh, j, p in probs:
        o = jnp.dot(p, kv_v[:, 64 * hh:64 * hh + 64],
                    preferred_element_type=jnp.float32)
        o_ref[0, j * sub:(j + 1) * sub, 64 * hh:64 * hh + 64] = (
            o.astype(o_ref.dtype))


def _packed_bwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, sub,
                       l_real=None):
    i = pl.program_id(2)
    seq = len_ref[0]

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    kv_k = k_ref[0]                                  # (L_pad, 128)
    kv_v = v_ref[0]
    bq = sub * _PACKED_NS
    partial = l_real is not None and l_real < kv_v.shape[0]  # static
    if partial:
        # See _packed_fwd_kernel: zero the V tail (0 * garbage = NaN in
        # dp's dot otherwise). Unlike the forward, K must be zeroed here
        # too: dq = ds @ kk contracts over L, and ds's exactly-zero tail
        # columns still multiply kk's garbage tail rows inside the dot.
        vidx = jax.lax.broadcasted_iota(jnp.int32, kv_v.shape, 0)
        kv_v = jnp.where(vidx < l_real, kv_v, 0)
        kv_k = jnp.where(vidx < l_real, kv_k, 0)
    # Partial q blocks: rows >= l_real read unspecified data. Unlike the
    # forward (where garbage q rows only corrupt their own, OOB-masked,
    # output rows), dk/dv CONTRACT OVER ROWS — the tail rows' math must
    # reduce to the zeros the jnp.pad path supplies. Zeroing q and g
    # plus masking ds rows makes every tail contribution exactly zero:
    # dv = p^T @ g has g tail rows = 0 with p finite (zeroed q -> s row
    # 0 -> uniform p), and ds (which can still go NaN through delta's
    # g*o product reading garbage o) is where()-selected to 0 before it
    # reaches dq/dk. The row offset i*bq is traced; the mask predicate
    # itself is applied for every block in partial mode (a no-op where
    # the block is fully in range).
    row0 = i * bq
    kidx = jax.lax.broadcasted_iota(jnp.int32, (sub, kv_k.shape[0]), 1)
    stage1 = []
    for hh in range(2):
        lo, hi = 64 * hh, 64 * hh + 64
        kk = kv_k[:, lo:hi]
        vv = kv_v[:, lo:hi]
        for j in range(_PACKED_NS):
            rows = slice(j * sub, (j + 1) * sub)
            q = q_ref[0][rows, lo:hi]
            g = g_ref[0][rows, lo:hi]
            if partial:
                ridx = jax.lax.broadcasted_iota(
                    jnp.int32, (sub, 64), 0) + (row0 + j * sub)
                q = jnp.where(ridx < l_real, q, 0)
                g = jnp.where(ridx < l_real, g, 0)
            qs = q * jnp.asarray(scale, q.dtype)
            s = jax.lax.dot_general(qs, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(g, vv, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            stage1.append((hh, j, q, g, s, dp))
    stage2 = []
    for hh, j, q, g, s, dp in stage1:
        rows = slice(j * sub, (j + 1) * sub)
        s = jnp.where(kidx < seq, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = o_ref[0][rows, 64 * hh:64 * hh + 64]
        delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = p * (dp - delta)
        if partial:
            rvec = jax.lax.broadcasted_iota(
                jnp.int32, (ds.shape[0], 1), 0) + (row0 + j * sub)
            ds = jnp.where(rvec < l_real, ds, 0)
        stage2.append((hh, j, q, g, p, ds))
    accs = {}
    for hh, j, q, g, p, ds in stage2:
        lo, hi = 64 * hh, 64 * hh + 64
        ds_c = ds.astype(kv_k.dtype)
        dq = jnp.dot(ds_c, kv_k[:, lo:hi],
                     preferred_element_type=jnp.float32) * scale
        dq_ref[0, j * sub:(j + 1) * sub, lo:hi] = dq.astype(dq_ref.dtype)
        dk_j = jax.lax.dot_general(
            ds_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_j = jax.lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if hh in accs:
            accs[hh] = (accs[hh][0] + dk_j, accs[hh][1] + dv_j)
        else:
            accs[hh] = (dk_j, dv_j)
    dk_ref[0, :, 0:64] += accs[0][0]
    dk_ref[0, :, 64:128] += accs[1][0]
    dv_ref[0, :, 0:64] += accs[0][1]
    dv_ref[0, :, 64:128] += accs[1][1]


def _packed_pad(x, l_pad):
    b, l, c = x.shape
    if l_pad == l:
        return x
    return jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))


def _partial_blocks_enabled():
    """Partial-block mode: feed the packed kernels UNPADDED (B, L, C)
    operands with BlockSpecs still sized L_pad (Mosaic masks the
    out-of-bounds block tails; the kernels zero/mask what garbage reads
    could reach — see _packed_fwd_kernel/_packed_bwd_kernel). Skips the
    3-4 materialised (B, L_pad, C) pad copies per layer call and the
    unpad slices on every output (the step trace attributes ~22 ms/step
    at flagship shapes to exactly these copies)."""
    return os.environ.get('SEMIVL_FLASH_PARTIAL', '0') == '1'


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _packed_attention(q, k, v, num_heads, interpret, valid_len):
    out, _ = _packed_attention_fwd(q, k, v, num_heads, interpret, valid_len)
    return out


def _packed_attention_fwd_impl(q, k, v, num_heads, interpret, valid_len):
    b, l, c = q.shape
    l_pad, bq = _packed_plan(l, backward=False)
    partial = _partial_blocks_enabled() and l_pad != l
    if partial:
        qp, kp, vp = q, k, v
        l_real, out_l = l, l
    else:
        qp = _packed_pad(q, l_pad)
        kp = _packed_pad(k, l_pad)
        vp = _packed_pad(v, l_pad)
        l_real, out_l = None, l_pad
    lengths = jnp.full((1,), valid_len, jnp.int32)
    scale = (c // num_heads) ** -0.5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_heads // 2, l_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda b, h, i, *_: (b, i, h)),
            pl.BlockSpec((1, l_pad, 128), lambda b, h, i, *_: (b, 0, h)),
            pl.BlockSpec((1, l_pad, 128), lambda b, h, i, *_: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, h, i, *_: (b, i, h)))
    out_p = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale,
                          sub=bq // _PACKED_NS, l_real=l_real),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_l, c), q.dtype),
        interpret=interpret,
    )(lengths, qp, kp, vp)
    return out_p, (qp, kp, vp)


def _packed_attention_fwd(q, k, v, num_heads, interpret, valid_len):
    out_p, (qp, kp, vp) = _packed_attention_fwd_impl(
        q, k, v, num_heads, interpret, valid_len)
    l = q.shape[1]
    return out_p[:, :l], (qp, kp, vp, out_p)


def _packed_attention_bwd(num_heads, interpret, valid_len, residuals, g):
    qp, kp, vp, out_p = residuals
    b, l_pad, c = qp.shape
    l = g.shape[1]
    if os.environ.get('SEMIVL_FLASH_BWD') == 'xla':
        def ref(q, k, v):
            qh = q.reshape(b, l, num_heads, 64).transpose(0, 2, 1, 3)
            kh = k.reshape(b, l, num_heads, 64).transpose(0, 2, 1, 3)
            vh = v.reshape(b, l, num_heads, 64).transpose(0, 2, 1, 3)
            o = _attend_heads(
                qh.reshape(-1, l, 64), kh.reshape(-1, l, 64),
                vh.reshape(-1, l, 64), valid_len)
            return (o.reshape(b, num_heads, l, 64)
                    .transpose(0, 2, 1, 3).reshape(b, l, c))
        _, vjp = jax.vjp(ref, qp[:, :l], kp[:, :l], vp[:, :l])
        return vjp(g)
    l_pad_plan, bq = _packed_plan(l, backward=True)
    partial = l_pad != l_pad_plan  # residuals unpadded => partial mode
    if partial:
        assert l_pad == l, (l_pad, l)
        l_pad = l_pad_plan
        gp = g
        l_real, out_l = l, l
    else:
        assert l_pad_plan == l_pad, (l_pad_plan, l_pad)
        gp = _packed_pad(g, l_pad)
        l_real, out_l = None, l_pad
    lengths = jnp.full((1,), valid_len, jnp.int32)
    scale = (c // num_heads) ** -0.5
    blocked = pl.BlockSpec((1, bq, 128), lambda b, h, i, *_: (b, i, h))
    full = pl.BlockSpec((1, l_pad, 128), lambda b, h, i, *_: (b, 0, h))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_heads // 2, l_pad // bq),
        in_specs=[blocked, full, full, blocked, blocked],
        out_specs=[blocked, full, full])
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale,
                          sub=bq // _PACKED_NS, l_real=l_real),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, out_l, c), qp.dtype),
            jax.ShapeDtypeStruct((b, out_l, c), jnp.float32),
            jax.ShapeDtypeStruct((b, out_l, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            # partial mode's K/V tail-zeroing where()s stage two extra
            # (L_pad, 128) stack buffers (~17 MB total at L=1025,
            # bq=576) — just over the 16 MB default scoped cap; same
            # relief as the stats-saving fused decoder forward
            vmem_limit_bytes=18 * 1024 * 1024 if partial else None),
    )(lengths, qp, kp, vp, out_p, gp)
    return (dq[:, :l], dk[:, :l].astype(qp.dtype),
            dv[:, :l].astype(qp.dtype))


_packed_attention.defvjp(_packed_attention_fwd, _packed_attention_bwd)
