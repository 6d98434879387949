"""Fused residual GroupNorm-ASPP (Pallas TPU), forward + backward.

The VLG spatial-reasoning ASPP (reference model/decode_heads/
vlg_head.py:84-113) runs five branches over each (h, w, 128) class
plane — 1x1, three 3x3 dilations (6/12/18), global pooling — each with
GroupNorm+ReLU, then a 1x1 projection with GroupNorm+ReLU and a
residual add. The XLA version sustains ~25% MXU: every branch round-
trips HBM through its GN, and the dilated convs gather strided patches.

Here one Pallas program per class plane keeps all five branch
activations in VMEM. Dilated taps use the aligned-copy mechanism of
ops/fused_decoder.py generalised to arbitrary static shifts: for tap
shift s (flat lanes), a copy of the plane stored at lane offset
(-s) mod 128 makes the read slice 128-aligned; the ~12 distinct offsets
across all three rates share one copy set. Column-wrap contamination is
masked by iota; row overflow lands in the (640-lane) zero pads.

Backward recomputes the branches in VMEM (flash-style); each conv's
dgrad is the same dilated machinery with flipped-transposed weights
reading alignment copies of that branch's pre-GN gradient (branches are
processed sequentially, reusing one gradient-copy buffer), and wgrads
reuse the forward tap concats. All dots accumulate fp32; GroupNorm
statistics are fp32; activations are stored in bfloat16 (the MXU
multiplies in bf16 at default precision regardless of model dtype).
"""

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CDT = jnp.bfloat16
RATES = (6, 12, 18)


@dataclasses.dataclass(frozen=True)
class AsppGeo:
    h: int
    w: int
    ws: int
    hwp: int
    pad: int           # lane padding each side (multiple of 128)
    L: int
    offsets: tuple     # distinct copy lane-offsets (excluding 0)

    def shift(self, dy, dx, r):
        return dy * r * self.ws + dx * r


def make_aspp_geo(h, w):
    ws = 1
    while ws < w:
        ws *= 2
    hwp = h * ws
    max_s = max(RATES) * (ws + 1)
    pad = -(-max_s // 128) * 128 + 128
    offs = set()
    for r in RATES:
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = dy * r * ws + dx * r
                if s:
                    offs.add((-s) % 128)
    # offset 0 holds the plain padded plane (serves 128-multiple shifts)
    offs.add(0)
    return AsppGeo(h, w, ws, hwp, pad, 2 * pad + hwp,
                   tuple(sorted(offs)))


def _copy_index(geo):
    """offset -> copy slot index."""
    return {o: i for i, o in enumerate(geo.offsets)}


def _build_copies(plane, bufs, geo):
    """plane: (C, hwp) value; bufs: list of (C, L) scratch refs, one per
    nonzero offset. Stores the plane at lane offset pad+o, zero pads."""
    c = plane.shape[0]
    for o, i in _copy_index(geo).items():
        ref = bufs[i]
        off = geo.pad + o
        ref[:, :off] = jnp.zeros((c, off), plane.dtype)
        ref[:, off:off + geo.hwp] = plane
        ref[:, off + geo.hwp:] = jnp.zeros(
            (c, geo.L - off - geo.hwp), plane.dtype)


def _tap_read(plane, bufs, s, geo):
    """Value at out position f of ``src[f + s]`` — an aligned slice of
    the copy stored at lane offset (-s) mod 128."""
    if s == 0:
        return plane
    o = (-s) % 128
    ref = bufs[_copy_index(geo)[o]]
    start = geo.pad + o + s
    assert start % 128 == 0 and start >= 0, (s, o, geo)
    return ref[:, start:start + geo.hwp]


def _col_mask(dx, r, geo, dtype):
    """(1, hwp) multiplicative mask: zero where reading col + dx*r falls
    outside [0, w)."""
    f = jax.lax.broadcasted_iota(jnp.int32, (1, geo.hwp), 1)
    col = f % geo.ws
    cond = (col + dx * r >= 0) & (col + dx * r < geo.w)
    if geo.ws > geo.w:
        cond = cond & (col < geo.w)
    return cond.astype(dtype)


def _dilated_cat(plane, bufs, r, geo, dtype):
    """(9C, hwp) concat of the nine dilated taps (dy, dx row-major)."""
    parts = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = _tap_read(plane, bufs, geo.shift(dy, dx, r), geo)
            if dx != 0 or geo.ws > geo.w:
                v = v * _col_mask(dx, r, geo, dtype)
            parts.append(v)
    return jnp.concatenate(parts, axis=0)


def _gn_fwd(raw_f32, gmat, gs, gb, geo):
    """Plane GroupNorm(ch//16)+ReLU; returns (act_f32, mean, rstd)."""
    val = raw_f32
    if geo.ws > geo.w:
        f = jax.lax.broadcasted_iota(jnp.int32, raw_f32.shape, 1)
        val = jnp.where(f % geo.ws < geo.w, raw_f32, 0.0)
    s = jnp.sum(val, axis=1, keepdims=True)
    q = jnp.sum(val * val, axis=1, keepdims=True)
    mean = jnp.dot(gmat, s, preferred_element_type=jnp.float32)
    ex2 = jnp.dot(gmat, q, preferred_element_type=jnp.float32)
    rstd = jax.lax.rsqrt(ex2 - mean * mean + 1e-5)
    act = jnp.maximum((raw_f32 - mean) * rstd * gs + gb, 0.0)
    if geo.ws > geo.w:
        act = jnp.where(f % geo.ws < geo.w, act, 0.0)
    return act, mean, rstd


def _gn_bwd(g_act, raw_f32, mean, rstd, gs, gb, gmat, geo):
    """Returns (g_raw, g_scale_contrib, g_bias_contrib)."""
    xhat = (raw_f32 - mean) * rstd
    relu_m = (xhat * gs + gb) > 0
    gy = jnp.where(relu_m, g_act, 0.0)
    if geo.ws > geo.w:
        f = jax.lax.broadcasted_iota(jnp.int32, gy.shape, 1)
        gy = jnp.where(f % geo.ws < geo.w, gy, 0.0)
    sgy = jnp.sum(gy, axis=1, keepdims=True)
    sgyx = jnp.sum(gy * xhat, axis=1, keepdims=True)
    mg1 = jnp.dot(gmat, gs * sgy, preferred_element_type=jnp.float32)
    mg2 = jnp.dot(gmat, gs * sgyx, preferred_element_type=jnp.float32)
    g_raw = rstd * (gs * gy - mg1 - xhat * mg2)
    if geo.ws > geo.w:
        g_raw = jnp.where(f % geo.ws < geo.w, g_raw, 0.0)
    return g_raw, sgyx, sgy


def _dot(w, x):
    return jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pool_gn(raw_vec, gmat_pool, gs, gb):
    """GroupNorm+ReLU on the (C, 1) pooled branch (stats over the 16
    channels of each group)."""
    mean = jnp.dot(gmat_pool, raw_vec, preferred_element_type=jnp.float32)
    ex2 = jnp.dot(gmat_pool, raw_vec * raw_vec,
                  preferred_element_type=jnp.float32)
    rstd = jax.lax.rsqrt(ex2 - mean * mean + 1e-5)
    return jnp.maximum((raw_vec - mean) * rstd * gs + gb, 0.0), mean, rstd
