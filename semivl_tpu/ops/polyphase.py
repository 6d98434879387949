"""Polyphase decomposition of the VLG up-sampling decoder.

The decoder tail (reference model/decode_heads/vlg_head.py:116-137,190,
239-240) is two Up stages + a per-plane head:

    up1: tconv2x2(x) -> [concat skip1] conv3x3 -> GN -> ReLU -> conv3x3
         -> GN -> ReLU                           (32-grid -> 64-grid)
    up2: same                                    (64-grid -> 128-grid)
    head: conv3x3 -> 1 channel                   (128-grid)

Everything here is re-expressed as *phases over the base grid* (the
32x32 up1-input grid): a tensor on the 2^L-times-finer grid becomes 4^L
planes of base-grid size, phase v = fine_pos mod 2^L, block q = fine_pos
div 2^L. Two facts make the whole chain uniform in this representation:

1. conv3x3(conv_transpose2x2(x) + bias) is exactly four 2x2 "composite"
   convolutions over the bias-augmented input (ops/fused_up.py
   ``composite_phase_kernels``, exact-tested) — the transpose conv is
   absorbed; the t tensor never exists.
2. any conv at any level maps to *uniform phase-to-phase taps*: output
   phase v with kernel offset d (fine units) always reads input phase
   (v + d) mod 2^L at block shift (v + d) div 2^L — independent of
   position. Block shifts are in {-1, 0, +1}, i.e. flat-index shifts of
   {+-w, +-1} on the base plane.

Consequences for the TPU kernel (ops/fused_decoder.py): every conv in
the chain becomes, per output phase, ONE large-K matmul
(Cout, sum_taps C) @ (sum_taps C, h*w) over rolled base-grid planes —
full-lane MXU work regardless of Cout, any base width w (no 128 |
alignment requirement), and a 4x smaller kernel input than the t-tensor
formulation.

This module holds the *algebra*: tap enumeration, weight packing, and an
XLA reference implementation of a full phase-separated stage, exact-
tested against the flax ``Up`` module. The Pallas kernels consume the
same tap lists, so kernel parity reduces to executing verified math.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from semivl_tpu.ops.fused_up import composite_phase_kernels


# ---------------------------------------------------------------------------
# tap enumeration (pure Python, trace-time)

def _axis_same(level: int, v: int, d: int) -> Tuple[int, int]:
    """Same-level conv: out phase ``v`` with fine-grid offset ``d`` reads
    input phase (v+d) mod 2^level at block shift (v+d) div 2^level."""
    t = v + d
    return t & ((1 << level) - 1), t >> level

def _axis_up(level_out: int, v: int, a: int) -> Tuple[int, int]:
    """Composite 2x2 tap ``a`` in {0,1}: out phase ``v`` at ``level_out``
    reads the level_out-1 input grid at (R >> 1) + (a - 1 + (R & 1)) where
    R is the fine output position; per-phase that is input phase
    ((v>>1) + a - 1 + (v&1)) mod 2^(level_out-1), block shift its div."""
    li = level_out - 1
    t = (v >> 1) + a - 1 + (v & 1)
    return t & ((1 << li) - 1), t >> li


@dataclasses.dataclass(frozen=True)
class Tap:
    src: str          # 'x' (stage input phases) | 'skip' | 'ones' | plain
    phase: int        # flattened source phase index (py * 2^Lsrc + px)
    sy: int           # block shift, rows (-1 | 0 | +1)
    sx: int           # block shift, cols
    channels: int     # source channels contributed to the concat
    wkey: tuple = ()  # weight-slice id: ('comp', a, b) | ('skipk', dy, dx)
                      # | ('compones', a, b) | ('k', dy, dx)


def conv1_taps(level_out: int, vy: int, vx: int, cin: int, cs: int):
    """Tap list for the composite (tconv+conv1) + skip conv of one Up
    stage, for output phase (vy, vx). Order defines the weight-packing
    column order: composite taps (a, b) row-major with the ones channel
    after each x block, then skip taps (dy, dx) row-major."""
    li = level_out - 1
    taps = []
    for a in (0, 1):
        py, sy = _axis_up(level_out, vy, a)
        for b in (0, 1):
            px, sx = _axis_up(level_out, vx, b)
            p = py * (1 << li) + px
            taps.append(Tap('x', p, sy, sx, cin, ('comp', a, b)))
            taps.append(Tap('ones', p, sy, sx, 1, ('compones', a, b)))
    for dy in (-1, 0, 1):
        py, sy = _axis_same(level_out, vy, dy)
        for dx in (-1, 0, 1):
            px, sx = _axis_same(level_out, vx, dx)
            taps.append(Tap('skip', py * (1 << level_out) + px, sy, sx, cs,
                            ('skipk', dy + 1, dx + 1)))
    return taps


def conv3_taps(level: int, vy: int, vx: int, c: int, src: str = 'x'):
    """Same-level 3x3 conv tap list for output phase (vy, vx); order
    (dy, dx) row-major matches the (dy, dx, c) weight packing."""
    taps = []
    for dy in (-1, 0, 1):
        py, sy = _axis_same(level, vy, dy)
        for dx in (-1, 0, 1):
            px, sx = _axis_same(level, vx, dx)
            taps.append(Tap(src, py * (1 << level) + px, sy, sx, c,
                            ('k', dy + 1, dx + 1)))
    return taps


# ---------------------------------------------------------------------------
# weight packing (XLA, differentiable — grads flow back to the raw params)

def pack_conv1_weights(up_kernel, up_bias, conv1_kernel, dtype):
    """-> (2, 2, Cout, 8*(Cin+1) ... ) packed per output-parity class.

    Column order follows ``conv1_taps``: for (a, b) row-major, the
    composite weight K[i][j][a, b] (Cin+1 rows, ones channel LAST — the
    composite aug layout), then skip taps (dy, dx, cs).
    ``conv1_kernel``: (3, 3, Cm + Cs, Cout) with Cm = up channels.
    """
    cm = up_kernel.shape[-1]
    ks = composite_phase_kernels(up_kernel, up_bias, conv1_kernel[:, :, :cm])
    skip_k = conv1_kernel[:, :, cm:]              # (3, 3, Cs, Cout)
    cout = conv1_kernel.shape[-1]
    cs = skip_k.shape[2]
    rows = []
    for i in (0, 1):
        cols_i = []
        for j in (0, 1):
            parts = [ks[i][j][a, b] for a in (0, 1) for b in (0, 1)]
            parts += [skip_k[dy, dx] for dy in range(3) for dx in range(3)]
            cols_i.append(jnp.concatenate(parts, axis=0).T)  # (Cout, K)
        rows.append(jnp.stack(cols_i))
    return jnp.stack(rows).astype(dtype), cout, cs


def pack_conv3_weights(kernel, dtype):
    """(3, 3, C, Cout) -> (Cout, 9C) in (dy, dx, c) column order."""
    k = jnp.transpose(kernel, (3, 0, 1, 2))
    return k.reshape(k.shape[0], -1).astype(dtype)


# ---------------------------------------------------------------------------
# phase (de)composition helpers (XLA)

def to_phases(x, level: int):
    """(B, C, H, W) fine grid -> (B, 4^L, C, h, w) base-grid phases."""
    if level == 0:
        return x[:, None]
    b, c, hh, ww = x.shape
    s = 1 << level
    x = x.reshape(b, c, hh // s, s, ww // s, s)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
    return x.reshape(b, s * s, c, hh // s, ww // s)


def from_phases(x, level: int):
    """(B, 4^L, C, h, w) -> (B, C, 2^L h, 2^L w)."""
    if level == 0:
        return x[:, 0]
    b, _, c, h, w = x.shape
    s = 1 << level
    x = x.reshape(b, s, s, c, h, w)
    x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))
    return x.reshape(b, c, s * h, s * w)


# ---------------------------------------------------------------------------
# XLA reference stage (exact math; used by tests and as the kernel oracle)

def _shifted(plane, sy, sx):
    """Zero-padded block-shift of a (..., h, w) plane: value at (r, s)
    becomes plane[r + sy, s + sx] (zeros outside)."""
    h, w = plane.shape[-2:]
    padded = jnp.pad(plane, [(0, 0)] * (plane.ndim - 2) + [(1, 1), (1, 1)])
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, sy + 1, h, -2), sx + 1, w, -1)


def _gn_relu(phases, scale, bias, gsize, eps=1e-5):
    """GroupNorm over (group channels, ALL phases, h, w) per plane + ReLU.

    phases: (P, n_ph, C, h, w). Stats in fp32, output in input dtype —
    the flax ConvGNReLU semantics (models/vlg_head.py:36-59).
    """
    p, n_ph, c, h, w = phases.shape
    x = phases.astype(jnp.float32).reshape(p, n_ph, c // gsize, gsize, h, w)
    mean = jnp.mean(x, axis=(1, 3, 4, 5), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 3, 4, 5), keepdims=True)
    xhat = ((x - mean) * jax.lax.rsqrt(var + eps)).reshape(
        p, n_ph, c, h, w)
    y = xhat * scale.reshape(1, 1, c, 1, 1) + bias.reshape(1, 1, c, 1, 1)
    return jnp.maximum(y, 0.0).astype(phases.dtype)


def _apply_taps(taps, sources, w_packed):
    """sources: dict src -> (P, n_ph, C, h, w). Concatenate the shifted
    tap planes channel-wise and contract with the packed weight."""
    parts = []
    for t in taps:
        if t.src == 'ones':
            ref = sources['x']
            ones = jnp.ones(ref.shape[:1] + (1,) + ref.shape[3:], ref.dtype)
            parts.append(_shifted(ones, t.sy, t.sx))
        else:
            parts.append(_shifted(sources[t.src][:, t.phase], t.sy, t.sx))
    cat = jnp.concatenate(parts, axis=1)          # (P, K, h, w)
    return jnp.einsum('ok,pkhw->pohw', w_packed.astype(jnp.float32),
                      cat.astype(jnp.float32))


def stage_reference(x_ph, skip_ph, params, level_out: int,
                    head_params=None, dtype=None):
    """One Up stage in phase representation (XLA, exact).

    x_ph: (P, 4^(L-1), Cin, h, w) input phases; skip_ph: (P or B
    broadcastable, 4^L, Cs, h, w) skip phases at the OUTPUT level.
    params: the flax ``Up`` param tree (models/vlg_head.py:204-262).
    Returns (P, 4^L, Cout, h, w) [, (P, 4^L, 1, h, w) head logits].
    """
    dtype = dtype or x_ph.dtype
    cin = x_ph.shape[2]
    k1 = params['conv1']['conv']['kernel']
    w1, cout, cs = pack_conv1_weights(
        params['up_kernel'], params['up_bias'], k1, dtype)
    w2 = pack_conv3_weights(params['conv2']['conv']['kernel'], dtype)
    gsize = cout // max(cout // 16, 1)
    n_ph = 4 ** level_out
    side = 1 << level_out

    if skip_ph.shape[0] != x_ph.shape[0]:   # per-image skip -> per-plane
        skip_ph = jnp.repeat(skip_ph, x_ph.shape[0] // skip_ph.shape[0],
                             axis=0)
    sources = {'x': x_ph, 'skip': skip_ph}
    c1 = []
    for v in range(n_ph):
        vy, vx = v // side, v % side
        taps = conv1_taps(level_out, vy, vx, cin, cs)
        c1.append(_apply_taps(taps, sources, w1[vy & 1, vx & 1]))
    c1 = jnp.stack(c1, axis=1).astype(dtype)      # (P, n_ph, Cout, h, w)
    c1 = _gn_relu(c1, params['conv1']['gn']['scale'],
                  params['conv1']['gn']['bias'], gsize)

    c2 = []
    for v in range(n_ph):
        vy, vx = v // side, v % side
        taps = conv3_taps(level_out, vy, vx, cout)
        c2.append(_apply_taps(taps, {'x': c1}, w2))
    c2 = jnp.stack(c2, axis=1).astype(dtype)
    c2 = _gn_relu(c2, params['conv2']['gn']['scale'],
                  params['conv2']['gn']['bias'], gsize)

    if head_params is None:
        return c2
    wh = pack_conv3_weights(head_params['kernel'], dtype)
    ho = []
    for v in range(n_ph):
        vy, vx = v // side, v % side
        taps = conv3_taps(level_out, vy, vx, cout)
        ho.append(_apply_taps(taps, {'x': c2}, wh))
    ho = jnp.stack(ho, axis=1) + head_params['bias'].astype(jnp.float32)
    return c2, ho.astype(dtype)


def chain_reference(x, skip1_ph, skip2_ph, params1, params2, head_params):
    """Full up1 -> up2 -> head chain on base-plane input x (P, C, h, w);
    returns head logits as level-2 phases (P, 16, 1, h, w)."""
    c2_1 = stage_reference(x[:, None], skip1_ph, params1, 1)
    _, ho = stage_reference(c2_1, skip2_ph, params2, 2,
                            head_params=head_params)
    return ho
