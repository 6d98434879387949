"""Fused VLG Up-stage kernel: conv3x3+GN+ReLU x2 in one Pallas program.

The Up block of the VLG decoder (reference
model/decode_heads/vlg_head.py:116-137) is ConvTranspose2d(k=2,s=2) ->
[concat skip] conv3x3 -> GroupNorm -> ReLU -> conv3x3 -> GroupNorm ->
ReLU over B*N class planes. decoder_stage_bench shows the XLA version
runs at 9-17% MXU utilisation: each conv sits at its im2col GEMM lane
cap while GN/ReLU round-trip every intermediate through HBM at
~250 GB/s (docs/decoder_perf_notes.md).

Split chosen after probing Mosaic's op support on v5e:

- The transpose conv stays in XLA as one einsum that emits the
  interleaved plane directly in flattened channel-first form — its
  2x2-phase interleave needs lane-crossing data movement that Mosaic
  reshapes/rolls cannot express (probed: lane merges and strided stores
  are unsupported), while XLA does it in a single fused pass.
- Everything after it — both convs, both GroupNorms, both ReLUs — is ONE
  Pallas program per class plane, so conv1's output never leaves VMEM.

Kernel layout: each plane lives flattened as (C, H*W) so the minor dim
is a large multiple of 128 regardless of W (rank-3 forms with W=32/64
minors fail Mosaic's layout inference). A 3x3 conv tap (dy, dx) is a
row-offset slice (dy*W elements) plus a jnp.roll of +-1 on the flat axis
with an iota-mod-W column mask (the roll's row-wrap lands exactly on the
masked column). Patches concat to (9C, TR*W) and hit the MXU as
dot((Cout, 9C), (9C, TR*W)). GroupNorm stats accumulate in fp32 during
the conv pass; normalise+ReLU is one full-plane VPU pass.

The skip tensor is per *image* while planes are per image x class: the
skip BlockSpec index_map (p // planes_per_image) re-reads the owning
image's skip instead of materialising the (B*N, Cs, H, W) repeat
(same trick as models/vlg_head.py:_SplitSkipConv).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 128  # flat elements of zero padding before/after the plane


def _conv3x3_flat_tile(src_pair, w_t, o0, tr, width):
    """3x3 conv contribution for output rows [o0, o0+tr) of a flattened
    plane. src_pair: (refA, refB) copies of the plane at flat offsets
    _PAD and _PAD+width — every row-tap slice must start 128-aligned or
    Mosaic gives the loaded vector a rotated lane layout that concatenate
    refuses to mix; with W % 128 != 0 the odd row offsets are only
    aligned in the shifted copy. w_t: (Cout, 9*C) packed (dx, dy, c) —
    dx-major so each column-tap group is one dot.
    Returns (Cout, tr*width) fp32.

    The 3 row taps concat first (uniform layouts), then the column taps
    are single rolls of the concatenated block with iota-mod-width edge
    masks (the roll's row-wrap lands exactly on the masked column).
    """
    c = src_pair[0].shape[0]
    n_copies = len(src_pair)
    blocks = []
    for dy in range(3):
        r = o0 + dy - 1
        k = (-r) % n_copies
        start = _PAD + (k + r) * width
        assert start % 128 == 0, (start, width, r, n_copies)
        blocks.append(src_pair[k][:, start:start + tr * width])
    mid = jnp.concatenate(blocks, axis=0)             # (3C, tr*width)
    cidx = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 1) % width
    zero = jnp.zeros_like(mid)
    left = jnp.where(cidx == 0, zero, jnp.roll(mid, 1, 1))
    right = jnp.where(cidx == width - 1, zero, jnp.roll(mid, -1, 1))
    acc = None
    for j, taps in enumerate((left, mid, right)):
        d = jax.lax.dot_general(
            w_t[:, j * 3 * c:(j + 1) * 3 * c], taps,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _store_plane(copies, val, hw, width, cdt):
    """Write a (C, hw) plane into every aligned copy, zeroing the pads."""
    ch = copies[0].shape[0]
    length = copies[0].shape[1]
    for k, ref in enumerate(copies):
        off = _PAD + k * width
        ref[:, 0:off] = jnp.zeros((ch, off), cdt)
        ref[:, off:off + hw] = val
        ref[:, off + hw:] = jnp.zeros((ch, length - off - hw), cdt)


def _group_stats(ssum, ssq, gmat, eps):
    """Per-channel mean / rstd (C, 1) from per-channel plane sums.

    gmat: (C, C) group-averaging matrix (1/(plane*gsize) within a group,
    0 elsewhere) — a dot instead of reshape/broadcast group reductions,
    which Mosaic cannot lower (sublane<->lane merges)."""
    mean_c = jnp.dot(gmat, ssum, preferred_element_type=jnp.float32)
    ex2_c = jnp.dot(gmat, ssq, preferred_element_type=jnp.float32)
    var_c = ex2_c - mean_c * mean_c
    return mean_c, jax.lax.rsqrt(var_c + eps)


def _conv_gn_relu_pass(w_parts, write, read, gmat, gn_scale, gn_bias,
                       h_out, width, tr, eps, cdt):
    """conv3x3 (summing (src_ref, w_t) pairs — the split skip-concat form)
    -> GroupNorm -> ReLU. `write(o0, tr, values)` stores raw conv rows,
    `read()` returns the full raw plane for the normalise pass (which is
    then written back via `write(0, h_out, ...)`)."""
    ssum = None
    for k in range(h_out // tr):
        acc = None
        for src, w_t in w_parts:
            part = _conv3x3_flat_tile(src, w_t, k * tr, tr, width)
            acc = part if acc is None else acc + part
        write(k * tr, tr, acc.astype(cdt))
        s = jnp.sum(acc, axis=1, keepdims=True)
        q = jnp.sum(acc * acc, axis=1, keepdims=True)
        ssum = s if ssum is None else ssum + s
        ssq = q if k == 0 else ssq + q
    mean_c, rstd_c = _group_stats(ssum, ssq, gmat, eps)
    raw = read().astype(jnp.float32)
    y = (raw - mean_c) * rstd_c * gn_scale + gn_bias
    write(0, h_out, jnp.maximum(y, 0.0).astype(cdt))


def _up_fused_kernel(t_ref, skip_ref, w1p_ref, w1s_ref, g1s_ref, g1b_ref,
                     w2_ref, g2s_ref, g2b_ref, gmat_ref, *rest,
                     up_c, cs, cout, H, W, tr, eps, cdt, fuse_head):
    if fuse_head:
        wh_ref, hb_ref, o_ref = rest[:3]
        scratch = rest[3:]
    else:
        o_ref = rest[0]
        scratch = rest[1:]
    hw = H * W
    # one copy per distinct (row*W mod 128) offset so every row-tap slice
    # is 128-aligned (misaligned loads get rotated lane layouts that
    # concatenate refuses to mix)
    n_bufs = 4 if fuse_head else 3
    c1pad = scratch[2]
    pairs = [tuple(scratch[i::n_bufs]) for i in range(n_bufs)]
    t_pair, sk_pair, c1_pair = pairs[:3]
    _store_plane(t_pair, t_ref[0].astype(cdt), hw, W, cdt)
    _store_plane(sk_pair, skip_ref[0].astype(cdt), hw, W, cdt)

    def write_c1(o0, rows, val):
        if rows == H:  # final normalised plane -> all aligned copies
            _store_plane(c1_pair, val, hw, W, cdt)
        else:
            c1pad[:, _PAD + o0 * W:_PAD + (o0 + rows) * W] = val

    gmat = gmat_ref[:]
    _conv_gn_relu_pass(
        [(t_pair, w1p_ref[:]), (sk_pair, w1s_ref[:])],
        write_c1, lambda: c1pad[:, _PAD:_PAD + hw],
        gmat, g1s_ref[:], g1b_ref[:], H, W, tr, eps, cdt)

    if not fuse_head:
        def write_out(o0, rows, val):
            o_ref[0, :, o0 * W:(o0 + rows) * W] = val

        _conv_gn_relu_pass(
            [(c1_pair, w2_ref[:])],
            write_out, lambda: o_ref[0],
            gmat, g2s_ref[:], g2b_ref[:], H, W, tr, eps, cdt)
        return

    # head fused: conv2's normalised plane goes to scratch copies, then
    # the per-plane 1-channel head conv (reference vlg_head.py:190,239)
    # writes the only HBM output — the (H, W) logit plane.
    c2_pair = pairs[3]
    c2pad = c2_pair[0]

    def write_c2(o0, rows, val):
        if rows == H:
            _store_plane(c2_pair, val, hw, W, cdt)
        else:
            c2pad[:, _PAD + o0 * W:_PAD + (o0 + rows) * W] = val

    _conv_gn_relu_pass(
        [(c1_pair, w2_ref[:])],
        write_c2, lambda: c2pad[:, _PAD:_PAD + hw],
        gmat, g2s_ref[:], g2b_ref[:], H, W, tr, eps, cdt)
    hb = hb_ref[0, 0]
    for k in range(H // tr):
        acc = _conv3x3_flat_tile(c2_pair, wh_ref[:], k * tr, tr, W)
        o_ref[0, :, k * tr * W:(k + 1) * tr * W] = (acc + hb).astype(cdt)


def pack_up_params(params, cdt):
    """Flax Up param tree -> (XLA tconv operands, packed conv weights).

    params: {'up_kernel': (2,2,cin,up_c), 'up_bias': (up_c,),
             'conv1': {'conv': {'kernel': (3,3,up_c+cs,cout)},
                       'gn': {'scale','bias'}},
             'conv2': {'conv': {'kernel': (3,3,cout,cout)}, 'gn': ...}}
    """
    k1 = params['conv1']['conv']['kernel']
    cout = k1.shape[-1]
    cm = params['up_kernel'].shape[-1]
    # rows packed (dx, dy, c) — see _conv3x3_flat_tile
    pack = lambda k: jnp.transpose(k, (3, 1, 0, 2)).reshape(
        k.shape[-1], -1).astype(cdt)
    w1p = pack(k1[:, :, :cm])
    w1s = pack(k1[:, :, cm:])
    w2 = pack(params['conv2']['conv']['kernel'])
    gn = lambda d: (d['scale'].reshape(cout, 1).astype(jnp.float32),
                    d['bias'].reshape(cout, 1).astype(jnp.float32))
    g1s, g1b = gn(params['conv1']['gn'])
    g2s, g2b = gn(params['conv2']['gn'])
    return w1p, w1s, g1s, g1b, w2, g2s, g2b


def _transpose_conv_flat(x, kernel, bias, cdt):
    """ConvTranspose2d(k=2,s=2) on channel-first planes, emitted directly
    in flattened (P, up_c, H*W) form (models/vlg_head.py
    conv_transpose_2x2 math)."""
    p, cin, h, w = x.shape
    up_c = kernel.shape[-1]
    t = jnp.einsum('pchw,ijco->pohiwj', x, kernel.astype(cdt),
                   preferred_element_type=jnp.float32)
    t = t + bias.astype(jnp.float32)[None, :, None, None, None, None]
    return t.astype(cdt).reshape(p, up_c, 4 * h * w)


def fused_up_stage(x, skip, params, *, head_params=None, interpret=None):
    """Fused Up block on channel-first plane tensors.

    x: (P, Cin, h, w) — P = B * num_planes; skip: (B, Cs, 2h, 2w) already
    resized to the output resolution. Returns (P, Cout, 2h, 2w) in x.dtype.
    Math identical to models/vlg_head.py `Up` (bf16 rounding aside).

    head_params ({'kernel': (3,3,Cout,1), 'bias': (1,)}, optional): fuse
    the per-plane 1-channel head conv as a kernel epilogue — the (Cout,
    H, W) activation never reaches HBM and the output is (P, 1, 2h, 2w).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    p, cin, h, w = x.shape
    b, cs, H, W = skip.shape
    assert (H, W) == (2 * h, 2 * w), (x.shape, skip.shape)
    assert p % b == 0 and W <= _PAD
    n = p // b
    cdt = x.dtype
    w1p, w1s, g1s, g1b, w2, g2s, g2b = pack_up_params(params, cdt)
    up_c = params['up_kernel'].shape[-1]
    cout = w2.shape[0]
    hw = H * W
    tr = min(H, max(16, 2048 // W))
    while H % tr:
        tr //= 2
    import math
    n_copies = 128 // math.gcd(W, 128)

    t_flat = _transpose_conv_flat(x, params['up_kernel'],
                                  params['up_bias'], cdt)
    skip_flat = skip.reshape(b, cs, hw).astype(cdt)

    # the XLA path uses nn.GroupNorm(num_groups=features//16): effective
    # group size is cout // (cout//16), which equals 16 only when
    # cout % 16 == 0 (e.g. cout=24 -> ONE 24-channel group)
    num_groups = max(cout // 16, 1)
    assert cout % num_groups == 0, (cout, num_groups)
    gsize = cout // num_groups
    ci = jnp.arange(cout)
    gmat = jnp.asarray(
        (ci[:, None] // gsize == ci[None, :] // gsize),
        jnp.float32) / (hw * gsize)

    fuse_head = head_params is not None
    operands = [t_flat, skip_flat, w1p, w1s, g1s, g1b, w2, g2s, g2b, gmat]
    const = lambda *shape: pl.BlockSpec(shape, lambda pi: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((1, up_c, hw), lambda pi: (pi, 0, 0)),
        pl.BlockSpec((1, cs, hw), lambda pi: (pi // n, 0, 0)),
        const(cout, 9 * up_c), const(cout, 9 * cs),
        const(cout, 1), const(cout, 1),
        const(cout, 9 * cout), const(cout, 1), const(cout, 1),
        const(cout, cout),
    ]
    ch_list = (up_c, cs, cout)
    c_out_planes = cout
    if fuse_head:
        wh = jnp.transpose(head_params['kernel'], (3, 1, 0, 2)).reshape(
            1, 9 * cout).astype(cdt)
        hb = head_params['bias'].reshape(1, 1).astype(jnp.float32)
        operands += [wh, hb]
        in_specs += [const(1, 9 * cout), const(1, 1)]
        ch_list = (up_c, cs, cout, cout)
        c_out_planes = 1

    kernel = functools.partial(
        _up_fused_kernel, up_c=up_c, cs=cs, cout=cout, H=H, W=W,
        tr=tr, eps=1e-5, cdt=cdt, fuse_head=fuse_head)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_out_planes, hw), lambda pi: (pi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p, c_out_planes, hw), cdt),
        scratch_shapes=[
            pltpu.VMEM((ch, hw + 2 * _PAD + (n_copies - 1) * W), cdt)
            for ch in ch_list * n_copies
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(*operands)
    return out.reshape(p, c_out_planes, H, W)


# ---- polyphase composite kernels (round-3 groundwork) ----------------------
#
# The profitable next step for the decoder grad path is absorbing the
# transpose conv INTO conv1 (ROADMAP "Round 3 plan"): the composed op
# conv3x3(conv_transpose2x2(x) + bias) is, per output phase (i, j) of the
# 2x-resolution grid, an exact 2x2 convolution over x augmented with a
# constant-ones channel (which absorbs the bias, including its zero-padding
# edge behaviour). These helpers build and validate that algebra in XLA so
# the future Pallas kernel only has to reproduce verified math.

def composite_phase_kernels(up_kernel, up_bias, conv1_planes_kernel):
    """Compose ConvTranspose2d(k=2,s=2)+bias with a 3x3 conv into four
    2x2 phase kernels over the bias-augmented input.

    up_kernel: (2, 2, Cin, U); up_bias: (U,);
    conv1_planes_kernel: (3, 3, U, Cout).
    Returns K with K[i][j]: (2, 2, Cin+1, Cout) — for output phase
    (i, j), taps (a, b) index x~ = concat([x, ones], channel) at block
    offsets (r + a + a0, s + b + b0) with (a0, b0) = (i-1, j-1) // 1 ...
    concretely: offset_a = a - 1 + i, offset_b = b - 1 + j over a, b in
    {0, 1} — see ``polyphase_up_conv1_reference``.
    """
    _, _, cin, u = up_kernel.shape
    cout = conv1_planes_kernel.shape[-1]
    aug = jnp.concatenate(
        [up_kernel,
         jnp.broadcast_to(up_bias[None, None, None, :], (2, 2, 1, u))],
        axis=2)                                       # (2,2,Cin+1,U)
    ks = [[jnp.zeros((2, 2, cin + 1, cout), up_kernel.dtype)
           for _ in range(2)] for _ in range(2)]
    for i in range(2):
        for j in range(2):
            k = jnp.zeros((2, 2, cin + 1, cout), jnp.float32)
            for dy in range(3):
                m = i + dy - 1
                a = (m // 2) - (i - 1)      # tap row in {0, 1}
                pi = m % 2
                for dx in range(3):
                    mm = j + dx - 1
                    b = (mm // 2) - (j - 1)
                    pj = mm % 2
                    contrib = jnp.einsum(
                        'cu,uo->co', aug[pi, pj].astype(jnp.float32),
                        conv1_planes_kernel[dy, dx].astype(jnp.float32))
                    k = k.at[a, b].add(contrib)
            ks[i][j] = k
    return ks


def polyphase_up_conv1_reference(x, up_kernel, up_bias,
                                 conv1_planes_kernel):
    """XLA reference: conv1(planes part) of the Up block computed via the
    composite phase kernels — must equal
    conv3x3(pad(conv_transpose2x2(x) + bias)) exactly.

    x: (B, h, w, Cin) NHWC. Returns (B, 2h, 2w, Cout).
    """
    b, h, w, cin = x.shape
    cout = conv1_planes_kernel.shape[-1]
    ones = jnp.ones((b, h, w, 1), x.dtype)
    xa = jnp.concatenate([x, ones], axis=-1)
    ks = composite_phase_kernels(up_kernel, up_bias, conv1_planes_kernel)
    dn = ('NHWC', 'HWIO', 'NHWC')
    out = jnp.zeros((b, h, 2, w, 2, cout), jnp.float32)
    for i in range(2):
        for j in range(2):
            # taps (a, b) read x~[r + a - 1 + i, s + b - 1 + j]: SAME-size
            # 2x2 conv with asymmetric zero padding per phase
            pad_r = (1 - i, i)      # i=0: one row padded above; i=1: below
            pad_c = (1 - j, j)
            y = jax.lax.conv_general_dilated(
                xa.astype(jnp.float32), ks[i][j], (1, 1),
                (pad_r, pad_c), dimension_numbers=dn)
            out = out.at[:, :, i, :, j, :].set(y)
    return out.reshape(b, 2 * h, 2 * w, cout)


def fused_up_vmem_bytes(up_c, cs, cout, h, w, itemsize, fuse_head):
    """Conservative VMEM footprint estimate for one fused-up program:
    aligned-copy scratch + double-buffered in/out blocks + live patch
    transients. Used to fall back to the XLA path when the 16 MB scoped
    limit would be exceeded (e.g. float32 models at 512-crop geometry —
    measured 17.4 MB OOM for fp32 up1)."""
    import math
    W, hw = 2 * w, 4 * h * w
    nc = 128 // math.gcd(W, 128)
    length = hw + 2 * _PAD + (nc - 1) * W
    ch = (up_c + cs + cout + (cout if fuse_head else 0)) * nc
    scratch = ch * length * itemsize
    out_ch = 1 if fuse_head else cout
    blocks = 2 * (up_c + cs + out_ch) * hw * itemsize
    tr = min(2 * h, max(16, 2048 // W))
    while (2 * h) % tr:
        tr //= 2
    trw = tr * W
    transients = 9 * max(up_c, cout) * trw * itemsize + cout * trw * 4
    return scratch + blocks + transients


FUSED_VMEM_LIMIT = 14 * 1024 * 1024  # margin under the 16 MB scoped VMEM
