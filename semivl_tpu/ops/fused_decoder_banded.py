"""Row-banded backward for the fused polyphase decoder stages.

The whole-plane backward kernel (ops/fused_decoder.py::_stage_bwd)
holds every intermediate of a class plane in VMEM; at 801-crop
Cityscapes geometry that is 28-36 MB per program -- past v5e's ~16 MB
scoped VMEM, so the fused decoder fell back to XLA for Cityscapes
training. This module re-expresses the stage backward as THREE
shallow-halo Pallas passes over row bands of each plane, with the
inter-pass tensors spilled to HBM and the GroupNorm statistics taken
from the forward (``_stage_fwd_core(save_stats=True)``) instead of
recomputed whole-plane (a band cannot see plane-wide statistics):

  pass A  recompute raw1 (composite conv1) and raw2 (conv2) from the
          stage inputs; form gy2 (the ReLU-masked gradient in pre-GN2
          space, including the fused head's wgrad / bias grad / dgrad
          when present) and the per-plane GN2 reduction partials.
  (XLA)   close the GN2 reductions -> per-plane mean-gradient vectors.
  pass B  solve graw2, conv2 wgrad + dgrad -> g_a1, form gy1 and the
          per-plane GN1 reduction partials.
  (XLA)   close the GN1 reductions.
  pass C  solve graw1, conv1 wgrad, input dgrads g_x / g_skip.

Banding mechanics: each band covers R interior rows plus E extension
rows on each side, where E is a multiple of nc = 128/ws so every
extension offset keeps the 128-lane alignment the tap machinery
requires. The band buffer IS a whole-plane buffer of
``make_geometry(R + 2E, w)``, so all of fused_decoder's slot / tap /
tile helpers run unchanged on bands; plane-coordinate effects (the
composite ones channel, zeroing activations outside the plane,
restricting reductions to a band's interior rows) are handled by the
``row0 = band*R - E`` offset threaded to ``_phase_cat`` and the two
mask helpers below. Band inputs are materialised by XLA as overlapping
(plane, band) copies and kernels write full extended bands (interior
kept at the join) -- an HBM-bandwidth cost of roughly one extra round
trip per consumed tensor, which is the price of fitting VMEM.

Reference math: model/decode_heads/vlg_head.py:116-137,190,239-240
(the Up/Up/head tail this backward differentiates).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semivl_tpu.ops.fused_decoder import (
    _PAD,
    _CDT,
    SlotBufs,
    _fwd_tap_lists,
    _group_mat,
    _input_reads,
    _iota,
    _keys_in,
    _mask_cols,
    _pad_flat,
    _phase_cat,
    _phase_conv,
    _phase_reader,
    _slot_read,
    _slot_scratch,
    _slotified_reader,
    _store_tile,
    _w_at,
    _zero_pads,
    invert_taps,
    make_geometry,
    pack_dgrad,
)


# ---------------------------------------------------------------------------
# band plans and HBM band transport

@dataclasses.dataclass(frozen=True)
class BandPlan:
    h: int                 # plane rows
    w: int
    R: int                 # interior rows per band (multiple of nc)
    E: int                 # extension rows each side (multiple of nc)
    nb: int                # number of bands
    geo: "Geometry"        # band geometry: make_geometry(R + 2E, w)

    @property
    def ext(self):
        return self.R + 2 * self.E


def make_band_plan(h, w, depth, band_rows):
    """A plan whose extension covers ``depth`` rows of conv reach,
    rounded up to the alignment unit nc. ``band_rows`` is rounded UP to
    a multiple of nc (rounding down would silently coarsen a requested
    fine banding — e.g. band_rows=4 at nc=16 must give 16-row bands,
    not one whole-plane band)."""
    nc = make_geometry(h, w).nc
    E = -(-depth // nc) * nc
    R = max(nc, -(-band_rows // nc) * nc)
    nb = -(-h // R)
    return BandPlan(h, w, R, E, nb, make_geometry(R + 2 * E, w))


def band_input_flat(flat, plan, dtype):
    """(P, C, h*ws) row-strided planes -> (P*nb, C, L) extended-band
    buffers (margins and beyond-plane rows zero-filled)."""
    p, c, _ = flat.shape
    g = plan.geo
    ews = plan.E * g.ws
    tail = (plan.nb * plan.R + plan.E) * g.ws - plan.h * g.ws
    full = jnp.pad(flat.astype(dtype), ((0, 0), (0, 0), (ews, tail)))
    bands = jnp.stack(
        [full[:, :, b * plan.R * g.ws:
              b * plan.R * g.ws + plan.ext * g.ws]
         for b in range(plan.nb)], axis=1)
    return _pad_flat(bands.reshape(p * plan.nb, c, plan.ext * g.ws), g)


def band_input(x, plan, dtype):
    """(P, C, h, w) planes -> (P*nb, C, L) extended-band buffers."""
    p, c, h, w = x.shape
    g = plan.geo
    flat = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, g.ws - w))).reshape(
        p, c, h * g.ws)
    return band_input_flat(flat, plan, dtype)


def band_join(o, plan):
    """(P, C, nb*ext_hwp) kernel output -> (P, C, h*ws) interior rows."""
    p, c, _ = o.shape
    g = plan.geo
    o = o.reshape(p, c, plan.nb, plan.ext * g.ws)
    o = o[:, :, :, plan.E * g.ws:(plan.E + plan.R) * g.ws]
    return o.reshape(p, c, plan.nb * plan.R * g.ws)[:, :, :plan.h * g.ws]


def _unflat(flat, plan):
    """(P, C, h*ws) -> (P, C, h, w)."""
    p, c, _ = flat.shape
    g = plan.geo
    return flat.reshape(p, c, plan.h, g.ws)[..., :plan.w]


# ---------------------------------------------------------------------------
# in-kernel band masks

def _mask_plane_rows(val, geo, f0, F, row0, h_tot):
    """Zero rows outside the PLANE [0, h_tot) (row0 = plane row of the
    band buffer's row 0; may be traced)."""
    row = _iota(geo, f0, F, rows=val.shape[0]) // geo.ws + row0
    return jnp.where((row >= 0) & (row < h_tot), val,
                     jnp.zeros((), val.dtype))


def _mask_interior(val, geo, f0, F, row0, E, R, h_tot):
    """Zero rows outside the band's interior [E, E+R) or beyond the
    plane (reductions and wgrad contributions must count each plane row
    exactly once across bands)."""
    row = _iota(geo, f0, F, rows=val.shape[0]) // geo.ws
    keep = (row >= E) & (row < E + R) & (row + row0 < h_tot)
    return jnp.where(keep, val, jnp.zeros((), val.dtype))


# ---------------------------------------------------------------------------
# pass A: recompute + head grads + GN2 reduction partials

def _pass_a_kernel(x_ref, skip_ref, g_ref, m1_ref, r1_ref, m2_ref, r2_ref,
                   w1_ref, g1s_ref, g1b_ref, w2_ref, g2s_ref, g2b_ref,
                   *rest, cin, cs, cout, geo, h_tot, R, E, fuse_head, cdt,
                   t1, t2, thdg):
    if fuse_head:
        whdg_ref = rest[0]
        (oraw1_ref, oraw2_ref, ogy2_ref, osgy_ref, osgyx_ref,
         ogwh_ref, oghb_ref) = rest[1:8]
        scr = rest[8:]
    else:
        (oraw1_ref, oraw2_ref, ogy2_ref, osgy_ref, osgyx_ref) = rest[:5]
        ogwh_ref = oghb_ref = whdg_ref = None
        scr = rest[5:]

    x_keys, in_keys, full_keys = _keys_in(geo)
    xs = SlotBufs(scr, x_keys)
    ss = SlotBufs(scr[xs.used:], in_keys)
    c1 = SlotBufs(scr[xs.used + ss.used:], full_keys)
    off = xs.used + ss.used + c1.used
    if fuse_head:
        c2 = SlotBufs(scr[off:], full_keys)
        off += c2.used
        gho = SlotBufs(scr[off:], in_keys)
        off += gho.used
        gbuf = scr[off:off + 4]

    row0 = pl.program_id(1) * R - E
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    mean1, rstd1 = m1_ref[0], r1_ref[0]
    mean2, rstd2 = m2_ref[0], r2_ref[0]
    g1s, g1b = g1s_ref[:], g1b_ref[:]
    g2s, g2b = g2s_ref[:], g2b_ref[:]
    k1 = 4 * (cin + 1) + 9 * cs
    tiles1 = geo.tiles(k1)
    tiles2 = geo.tiles(9 * cout)

    # conv1 -> raw1 (spilled) -> a1 slots (normalized with the forward
    # stats, zeroed outside the plane: conv2 edge reads need conv-pad
    # zeros exactly as the whole-plane kernel's buffer margins provide)
    read1 = _input_reads(x_ref, skip_ref, xs, ss, geo, cs)
    for q in range(4):
        _zero_pads(c1, q, geo, cdt)
    w1at = _w_at(w1_ref, cout)
    for v in range(4):
        for f0, F in tiles1:
            acc = _mask_cols(
                _phase_conv(t1[v], read1, geo, w1at(v), cdt, f0, F,
                            row0, h_tot), geo, f0, F)
            _store_tile(c1, v, acc.astype(cdt), geo, f0, slots=(0,))
    for v in range(4):
        for f0, F in tiles2:
            r = _slot_read(c1, v, 0, geo, f0, F)
            oraw1_ref[0, v * cout:(v + 1) * cout, f0:f0 + F] = r
            y = jnp.maximum(
                (r.astype(jnp.float32) - mean1) * rstd1 * g1s + g1b, 0.0)
            y = _mask_plane_rows(_mask_cols(y, geo, f0, F), geo, f0, F,
                                 row0, h_tot)
            _store_tile(c1, v, y.astype(cdt), geo, f0)

    # conv2 -> raw2 (spilled; read back for xhat2)
    read_a1 = _phase_reader(c1, geo)
    w2at = _w_at(w2_ref, cout)
    for v in range(4):
        for f0, F in tiles2:
            acc = _mask_cols(
                _phase_conv(t2[v], read_a1, geo, w2at(v), cdt, f0, F),
                geo, f0, F)
            oraw2_ref[0, v * cout:(v + 1) * cout, f0:f0 + F] = \
                acc.astype(cdt)

    # gradient w.r.t. c2 activations
    if fuse_head:
        # c2 = relu(GN2(raw2)) row-masked, for the head wgrad tap concat
        for q in range(4):
            _zero_pads(c2, q, geo, cdt)
        for v in range(4):
            for f0, F in tiles2:
                raw = oraw2_ref[0, v * cout:(v + 1) * cout,
                                f0:f0 + F].astype(jnp.float32)
                y = jnp.maximum((raw - mean2) * rstd2 * g2s + g2b, 0.0)
                y = _mask_plane_rows(_mask_cols(y, geo, f0, F), geo,
                                     f0, F, row0, h_tot)
                _store_tile(c2, v, y.astype(cdt), geo, f0)

        @pl.when(first)
        def _():
            ogwh_ref[...] = jnp.zeros(ogwh_ref.shape, ogwh_ref.dtype)
            oghb_ref[...] = jnp.zeros(oghb_ref.shape, oghb_ref.dtype)
        read3 = _phase_reader(c2, geo)
        hbacc = None
        for v in range(4):
            for f0, F in tiles2:
                gvt = g_ref[0, v:v + 1,
                            _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
                gvt = _mask_interior(gvt, geo, f0, F, row0, E, R, h_tot)
                cat = _phase_cat(t2[v], read3, geo, cdt, f0, F)
                ogwh_ref[v:v + 1] += jax.lax.dot_general(
                    gvt, cat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = jnp.sum(gvt, axis=1, keepdims=True)
                hbacc = s if hbacc is None else hbacc + s
        oghb_ref[...] += hbacc

        read_gho = _slotified_reader(
            lambda q, s, F: g_ref[0, q:q + 1, s:s + F], gho, 4, geo)
        for v in range(4):
            for f0, F in tiles2:
                gc2 = _mask_cols(
                    _phase_conv(thdg[v], read_gho, geo,
                                whdg_ref[v * cout:(v + 1) * cout], cdt,
                                f0, F), geo, f0, F)
                gbuf[v][:, f0:f0 + F] = gc2.astype(cdt)

        def read_gc2(v, f0, F):
            return gbuf[v][:, f0:f0 + F]
    else:
        def read_gc2(v, f0, F):
            return g_ref[0, v * cout:(v + 1) * cout,
                         _PAD + f0:_PAD + f0 + F]

    # gy2 (spilled) + per-plane GN2 reduction partials over the interior
    sgy = sgyx = None
    for v in range(4):
        for f0, F in tiles2:
            raw = oraw2_ref[0, v * cout:(v + 1) * cout,
                            f0:f0 + F].astype(jnp.float32)
            xhat = (raw - mean2) * rstd2
            relu_m = (xhat * g2s + g2b) > 0
            gy = jnp.where(relu_m, read_gc2(v, f0, F).astype(jnp.float32),
                           0.0)
            gy = _mask_cols(gy, geo, f0, F)
            ogy2_ref[0, v * cout:(v + 1) * cout, f0:f0 + F] = \
                gy.astype(cdt)
            gyi = _mask_interior(gy, geo, f0, F, row0, E, R, h_tot)
            s = jnp.sum(gyi, axis=1, keepdims=True)
            q = jnp.sum(gyi * xhat, axis=1, keepdims=True)
            sgy = s if sgy is None else sgy + s
            sgyx = q if sgyx is None else sgyx + q

    @pl.when(pl.program_id(1) == 0)
    def _():
        osgy_ref[...] = jnp.zeros(osgy_ref.shape, osgy_ref.dtype)
        osgyx_ref[...] = jnp.zeros(osgyx_ref.shape, osgyx_ref.dtype)
    osgy_ref[0] += sgy
    osgyx_ref[0] += sgyx


# ---------------------------------------------------------------------------
# pass B: GN2 solve, conv2 wgrad + dgrad, GN1 reduction partials

def _pass_b_kernel(raw1_ref, raw2_ref, gy2_ref, m1_ref, r1_ref, m2_ref,
                   r2_ref, mg1_ref, mg2_ref, g1s_ref, g1b_ref, g2s_ref,
                   w2dg_ref, ogy1_ref, osgy_ref, osgyx_ref, ogw2_ref,
                   *scr, cout, geo, h_tot, R, E, cdt, t2, t2dg):
    _, _, full_keys = _keys_in(geo)
    a1 = SlotBufs(scr, full_keys)
    graw2 = SlotBufs(scr[a1.used:], full_keys)
    gbuf = scr[a1.used + graw2.used:a1.used + graw2.used + 4]

    row0 = pl.program_id(1) * R - E
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    mean1, rstd1 = m1_ref[0], r1_ref[0]
    mean2, rstd2 = m2_ref[0], r2_ref[0]
    mg1, mg2 = mg1_ref[0], mg2_ref[0]
    g1s, g1b = g1s_ref[:], g1b_ref[:]
    g2s = g2s_ref[:]
    tiles2 = geo.tiles(9 * cout)
    tilesd = geo.tiles(16 * cout)

    # a1 (normalized raw1, plane-masked) and graw2 (GN2 solve) slots
    for q in range(4):
        _zero_pads(a1, q, geo, cdt)
        _zero_pads(graw2, q, geo, cdt)
    for v in range(4):
        for f0, F in tiles2:
            raw = raw1_ref[0, v * cout:(v + 1) * cout,
                           _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
            y = jnp.maximum((raw - mean1) * rstd1 * g1s + g1b, 0.0)
            y = _mask_plane_rows(_mask_cols(y, geo, f0, F), geo, f0, F,
                                 row0, h_tot)
            _store_tile(a1, v, y.astype(cdt), geo, f0)
    for v in range(4):
        for f0, F in tiles2:
            raw = raw2_ref[0, v * cout:(v + 1) * cout,
                           _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
            xhat = (raw - mean2) * rstd2
            gy = gy2_ref[0, v * cout:(v + 1) * cout,
                         _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
            g = rstd2 * (g2s * gy - mg1 - xhat * mg2)
            g = _mask_plane_rows(_mask_cols(g, geo, f0, F), geo, f0, F,
                                 row0, h_tot)
            _store_tile(graw2, v, g.astype(cdt), geo, f0)

    # conv2 wgrad (interior rows only) and dgrad -> g_a1
    @pl.when(first)
    def _():
        ogw2_ref[...] = jnp.zeros(ogw2_ref.shape, ogw2_ref.dtype)
    read_a1 = _phase_reader(a1, geo)
    for v in range(4):
        for f0, F in tiles2:
            cat = _phase_cat(t2[v], read_a1, geo, cdt, f0, F)
            gvt = _mask_interior(_slot_read(graw2, v, 0, geo, f0, F),
                                 geo, f0, F, row0, E, R, h_tot)
            ogw2_ref[v * cout:(v + 1) * cout] += jax.lax.dot_general(
                gvt, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    read_graw2 = _phase_reader(graw2, geo)
    for q in range(4):
        for f0, F in tilesd:
            gc1 = _mask_cols(
                _phase_conv(t2dg[q], read_graw2, geo,
                            w2dg_ref[q * cout:(q + 1) * cout], cdt,
                            f0, F), geo, f0, F)
            gbuf[q][:, f0:f0 + F] = gc1.astype(cdt)

    # gy1 (spilled) + per-plane GN1 reduction partials
    sgy = sgyx = None
    for v in range(4):
        for f0, F in tiles2:
            raw = raw1_ref[0, v * cout:(v + 1) * cout,
                           _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
            xhat = (raw - mean1) * rstd1
            relu_m = (xhat * g1s + g1b) > 0
            gy = jnp.where(relu_m, gbuf[v][:, f0:f0 + F].astype(jnp.float32),
                           0.0)
            gy = _mask_cols(gy, geo, f0, F)
            ogy1_ref[0, v * cout:(v + 1) * cout, f0:f0 + F] = \
                gy.astype(cdt)
            gyi = _mask_interior(gy, geo, f0, F, row0, E, R, h_tot)
            s = jnp.sum(gyi, axis=1, keepdims=True)
            q2 = jnp.sum(gyi * xhat, axis=1, keepdims=True)
            sgy = s if sgy is None else sgy + s
            sgyx = q2 if sgyx is None else sgyx + q2

    @pl.when(pl.program_id(1) == 0)
    def _():
        osgy_ref[...] = jnp.zeros(osgy_ref.shape, osgy_ref.dtype)
        osgyx_ref[...] = jnp.zeros(osgyx_ref.shape, osgyx_ref.dtype)
    osgy_ref[0] += sgy
    osgyx_ref[0] += sgyx


# ---------------------------------------------------------------------------
# pass C: GN1 solve, conv1 wgrad, input dgrads

def _pass_c_kernel(x_ref, skip_ref, raw1_ref, gy1_ref, m1_ref, r1_ref,
                   mg1_ref, mg2_ref, g1s_ref, w1dgx_ref, w1dgs_ref,
                   ogx_ref, ogskip_ref, ogw1_ref, *scr,
                   cin, cs, cout, geo, h_tot, R, E, cdt, t1, t1dgx, t1dgs):
    x_keys, in_keys, full_keys = _keys_in(geo)
    xs = SlotBufs(scr, x_keys)
    ss = SlotBufs(scr[xs.used:], in_keys)
    graw1 = SlotBufs(scr[xs.used + ss.used:], full_keys)

    row0 = pl.program_id(1) * R - E
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    mean1, rstd1 = m1_ref[0], r1_ref[0]
    mg1, mg2 = mg1_ref[0], mg2_ref[0]
    g1s = g1s_ref[:]
    k1 = 4 * (cin + 1) + 9 * cs
    tiles1 = geo.tiles(k1)
    tiles2 = geo.tiles(9 * cout)
    tilesd = geo.tiles(16 * cout)

    # graw1 (GN1 solve, plane-masked) slots
    for q in range(4):
        _zero_pads(graw1, q, geo, cdt)
    for v in range(4):
        for f0, F in tiles2:
            raw = raw1_ref[0, v * cout:(v + 1) * cout,
                           _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
            xhat = (raw - mean1) * rstd1
            gy = gy1_ref[0, v * cout:(v + 1) * cout,
                         _PAD + f0:_PAD + f0 + F].astype(jnp.float32)
            g = rstd1 * (g1s * gy - mg1 - xhat * mg2)
            g = _mask_plane_rows(_mask_cols(g, geo, f0, F), geo, f0, F,
                                 row0, h_tot)
            _store_tile(graw1, v, g.astype(cdt), geo, f0)

    # conv1 wgrad (interior rows only)
    @pl.when(first)
    def _():
        ogw1_ref[...] = jnp.zeros(ogw1_ref.shape, ogw1_ref.dtype)
    read_in = _input_reads(x_ref, skip_ref, xs, ss, geo, cs)
    for v in range(4):
        for f0, F in tiles1:
            cat = _phase_cat(t1[v], read_in, geo, cdt, f0, F, row0, h_tot)
            gvt = _mask_interior(_slot_read(graw1, v, 0, geo, f0, F),
                                 geo, f0, F, row0, E, R, h_tot)
            ogw1_ref[v * cout:(v + 1) * cout] += jax.lax.dot_general(
                gvt, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    # input dgrads
    read_g = _phase_reader(graw1, geo)
    for f0, F in tilesd:
        gx = _mask_cols(
            _phase_conv(t1dgx[0], read_g, geo, w1dgx_ref[:], cdt, f0, F),
            geo, f0, F)
        ogx_ref[0, :, f0:f0 + F] = gx.astype(ogx_ref.dtype)
    for q in range(4):
        for f0, F in tilesd:
            gs = _mask_cols(
                _phase_conv(t1dgs[q], read_g, geo,
                            w1dgs_ref[q * cs:(q + 1) * cs], cdt, f0, F),
                geo, f0, F)
            ogskip_ref[0, q * cs:(q + 1) * cs, f0:f0 + F] = \
                gs.astype(ogskip_ref.dtype)


# ---------------------------------------------------------------------------
# orchestrator

def _specs(plan, n_rep):
    nb = plan.nb
    band = lambda c: pl.BlockSpec((1, c, plan.geo.L),
                                  lambda pi, bi: (pi * nb + bi, 0, 0))
    skip_band = lambda c: pl.BlockSpec(
        (1, c, plan.geo.L),
        lambda pi, bi: ((pi // n_rep) * nb + bi, 0, 0))
    plane_vec = lambda c: pl.BlockSpec((1, c, 1), lambda pi, bi: (pi, 0, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda pi, bi: (0,) * a.ndim)
    out_band = lambda c: pl.BlockSpec((1, c, plan.geo.hwp),
                                      lambda pi, bi: (pi, 0, bi))
    # Reduction vectors: one (c, 1) block per PLANE, revisited across the
    # inner band axis and accumulated in-kernel (a (1, c, 1) block over a
    # (p, c, nb) array would violate Mosaic's last-dim block rule: 1 is
    # neither 128-divisible nor equal to nb).
    out_vec = lambda c: pl.BlockSpec((1, c, 1), lambda pi, bi: (pi, 0, 0))
    return band, skip_band, plane_vec, const, out_band, out_vec


def _mg_vectors(gmat, gs, sgy, sgyx):
    """Per-plane GN mean-gradient vectors from the closed reductions."""
    mg1 = jnp.einsum('ij,pjk->pik', gmat, gs * sgy)
    mg2 = jnp.einsum('ij,pjk->pik', gmat, gs * sgyx)
    return mg1, mg2


def _stage_bwd_banded(x, skip_ph, g_out, stats, w1, g1s, g1b, w2, g2s,
                      g2b, wh=None, hb=None, interpret=None, storage=None,
                      band_rows=None, stop_after=None):
    """Row-banded drop-in for ``_stage_bwd`` (same returns), consuming
    the forward-saved GroupNorm statistics ``stats = (m1, r1, m2, r2)``
    (each (P, Cout, 1) float32 from ``_stage_fwd_core(save_stats=True)``).

    ``stop_after`` ('A' | 'B') returns that pass's raw outputs instead of
    completing — per-pass cost attribution for tools/banded_decoder_check
    (the full chain is A ∘ B ∘ C, so B = time(A..B) - time(A), etc.).
    """
    cdt = storage or _CDT
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    p, cin, h, w = x.shape
    b = skip_ph.shape[0]
    cs = skip_ph.shape[2]
    n_rep = p // b
    cout = w2.shape[1]
    fuse_head = wh is not None
    m1, r1, m2, r2 = stats
    t1, t2 = _fwd_tap_lists(cin, cs, cout)
    t2dg = invert_taps(t2, 'x', 4, cout)
    flat_w = lambda a: a.reshape(-1, a.shape[-1])
    w2dg = flat_w(pack_dgrad(w2, t2, t2dg, cdt))
    g_c = g_out.shape[2]
    if band_rows is None:
        band_rows = choose_band_rows(cin, cs, cout, h, w, fuse_head)
        if band_rows is None:
            raise ValueError(
                'banded backward does not fit VMEM at this geometry '
                f'({cin=}, {cs=}, {cout=}, {h=}, {w=}, {fuse_head=}); '
                'fused_decoder_ok should have gated it to the XLA path')

    # ---- pass A
    planA = make_band_plan(h, w, 3 if fuse_head else 2, band_rows)
    geoA = planA.geo
    xb = band_input(x, planA, cdt)
    skb = band_input(skip_ph.reshape(b, 4 * cs, h, w), planA, cdt)
    gb = band_input(g_out.reshape(p, 4 * g_c, h, w), planA, cdt)
    band, skip_band, plane_vec, const, out_band, out_vec = _specs(
        planA, n_rep)
    thdg = None
    head_ops = []
    if fuse_head:
        thdg = invert_taps(t2, 'x', 4, 1)
        head_ops = [flat_w(pack_dgrad(wh, t2, thdg, cdt))]
    packed = [flat_w(w1).astype(cdt), g1s, g1b, flat_w(w2).astype(cdt),
              g2s, g2b]
    in_specs = ([band(cin), skip_band(4 * cs), band(4 * g_c)]
                + [plane_vec(cout)] * 4 + [const(a) for a in packed]
                + [const(a) for a in head_ops])
    sp_band = lambda: (jax.ShapeDtypeStruct(
        (p, 4 * cout, planA.nb * geoA.hwp), cdt), out_band(4 * cout))
    sp_vec = lambda: (jax.ShapeDtypeStruct((p, cout, 1),
                                           jnp.float32), out_vec(cout))
    out_shapes, out_specs = [], []
    for mk in (sp_band, sp_band, sp_band, sp_vec, sp_vec):
        sh, sp = mk()
        out_shapes.append(sh)
        out_specs.append(sp)
    if fuse_head:
        out_shapes += [jax.ShapeDtypeStruct((4, wh.shape[-1]), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        out_specs += [pl.BlockSpec((4, wh.shape[-1]),
                                   lambda pi, bi: (0, 0)),
                      pl.BlockSpec((1, 1), lambda pi, bi: (0, 0))]
    x_keys, in_keys, full_keys = _keys_in(geoA)
    scratch = (_slot_scratch(x_keys, cin, geoA.L, cdt)
               + _slot_scratch(in_keys, cs, geoA.L, cdt)
               + _slot_scratch(full_keys, cout, geoA.L, cdt))
    if fuse_head:
        scratch += (_slot_scratch(full_keys, cout, geoA.L, cdt)
                    + _slot_scratch(in_keys, 1, geoA.L, cdt)
                    + [pltpu.VMEM((cout, geoA.hwp), cdt) for _ in range(4)])
    kernel = functools.partial(
        _pass_a_kernel, cin=cin, cs=cs, cout=cout, geo=geoA, h_tot=h,
        R=planA.R, E=planA.E, fuse_head=fuse_head, cdt=cdt, t1=t1, t2=t2,
        thdg=thdg)
    outs = pl.pallas_call(
        kernel,
        grid=(p, planA.nb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(xb, skb, gb, m1, r1, m2, r2, *packed, *head_ops)
    if fuse_head:
        raw1_sp, raw2_sp, gy2_sp, sgy2, sgyx2, gwh, ghb = outs
    else:
        raw1_sp, raw2_sp, gy2_sp, sgy2, sgyx2 = outs
        gwh = ghb = None
    if stop_after == 'A':
        return outs

    # ---- close GN2 reductions (XLA)
    gmat = _group_mat(cout, h * w)
    sgy2 = jnp.sum(sgy2, axis=2, keepdims=True)
    sgyx2 = jnp.sum(sgyx2, axis=2, keepdims=True)
    gg2s = jnp.sum(sgyx2, axis=0)
    gg2b = jnp.sum(sgy2, axis=0)
    mg1_2, mg2_2 = _mg_vectors(gmat, g2s, sgy2, sgyx2)

    # ---- pass B
    planB = make_band_plan(h, w, 1, band_rows)
    geoB = planB.geo
    raw1_fl = band_join(raw1_sp, planA)
    raw1_b = band_input_flat(raw1_fl, planB, cdt)
    raw2_b = band_input_flat(band_join(raw2_sp, planA), planB, cdt)
    gy2_b = band_input_flat(band_join(gy2_sp, planA), planB, cdt)
    band, skip_band, plane_vec, const, out_band, out_vec = _specs(
        planB, n_rep)
    in_specs_b = ([band(4 * cout)] * 3 + [plane_vec(cout)] * 6
                  + [const(g1s), const(g1b), const(g2s), const(w2dg)])
    out_shapes_b = [
        jax.ShapeDtypeStruct((p, 4 * cout, planB.nb * geoB.hwp), cdt),
        jax.ShapeDtypeStruct((p, cout, 1), jnp.float32),
        jax.ShapeDtypeStruct((p, cout, 1), jnp.float32),
        jax.ShapeDtypeStruct((4 * cout, w2.shape[-1]), jnp.float32),
    ]
    out_specs_b = [out_band(4 * cout), out_vec(cout), out_vec(cout),
                   pl.BlockSpec((4 * cout, w2.shape[-1]),
                                lambda pi, bi: (0, 0))]
    _, _, full_keys_b = _keys_in(geoB)
    scratch_b = (_slot_scratch(full_keys_b, cout, geoB.L, cdt)       # a1
                 + _slot_scratch(full_keys_b, cout, geoB.L, cdt)     # graw2
                 + [pltpu.VMEM((cout, geoB.hwp), cdt) for _ in range(4)])
    kernel_b = functools.partial(
        _pass_b_kernel, cout=cout, geo=geoB, h_tot=h, R=planB.R,
        E=planB.E, cdt=cdt, t2=t2, t2dg=t2dg)
    gy1_sp, sgy1, sgyx1, gw2 = pl.pallas_call(
        kernel_b,
        grid=(p, planB.nb),
        in_specs=in_specs_b,
        out_specs=tuple(out_specs_b),
        out_shape=tuple(out_shapes_b),
        scratch_shapes=scratch_b,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(raw1_b, raw2_b, gy2_b, m1, r1, m2, r2, mg1_2, mg2_2, g1s, g1b,
      g2s, w2dg)
    if stop_after == 'B':
        return gy1_sp, sgy1, sgyx1, gw2

    # ---- close GN1 reductions (XLA)
    sgy1 = jnp.sum(sgy1, axis=2, keepdims=True)
    sgyx1 = jnp.sum(sgyx1, axis=2, keepdims=True)
    gg1s = jnp.sum(sgyx1, axis=0)
    gg1b = jnp.sum(sgy1, axis=0)
    mg1_1, mg2_1 = _mg_vectors(gmat, g1s, sgy1, sgyx1)

    # ---- pass C
    t1dgx = invert_taps(t1, 'x', 1, cout)
    t1dgs = invert_taps(t1, 'skip', 4, cout)
    w1dgx = flat_w(pack_dgrad(w1, t1, t1dgx, cdt))
    w1dgs = flat_w(pack_dgrad(w1, t1, t1dgs, cdt))
    planC = planB          # same depth-1 halo -> identical band layout
    geoC = planC.geo
    if (planC.R, planC.E) == (planA.R, planA.E):
        # nc >= conv depth (e.g. 801-crop stage 1: nc=2, depth 2): pass
        # A's extension equals the depth-1 extension, so its x/skip band
        # copies are element-identical — reuse rather than re-band
        # (guarantees the HBM saving instead of relying on XLA CSE).
        xc, skc = xb, skb
    else:
        xc = band_input(x, planC, cdt)
        skc = band_input(skip_ph.reshape(b, 4 * cs, h, w), planC, cdt)
    raw1_c = raw1_b        # reuse pass B's halo copy (same plan)
    gy1_c = band_input_flat(band_join(gy1_sp, planB), planC, cdt)
    band, skip_band, plane_vec, const, out_band, out_vec = _specs(
        planC, n_rep)
    in_specs_c = ([band(cin), skip_band(4 * cs), band(4 * cout),
                   band(4 * cout)] + [plane_vec(cout)] * 4
                  + [const(g1s), const(w1dgx), const(w1dgs)])
    out_shapes_c = [
        jax.ShapeDtypeStruct((p, cin, planC.nb * geoC.hwp), cdt),
        jax.ShapeDtypeStruct((p, 4 * cs, planC.nb * geoC.hwp),
                             jnp.float32),
        jax.ShapeDtypeStruct((4 * cout, w1.shape[-1]), jnp.float32),
    ]
    out_specs_c = [out_band(cin), out_band(4 * cs),
                   pl.BlockSpec((4 * cout, w1.shape[-1]),
                                lambda pi, bi: (0, 0))]
    x_keys_c, in_keys_c, full_keys_c = _keys_in(geoC)
    scratch_c = (_slot_scratch(x_keys_c, cin, geoC.L, cdt)
                 + _slot_scratch(in_keys_c, cs, geoC.L, cdt)
                 + _slot_scratch(full_keys_c, cout, geoC.L, cdt))
    kernel_c = functools.partial(
        _pass_c_kernel, cin=cin, cs=cs, cout=cout, geo=geoC, h_tot=h,
        R=planC.R, E=planC.E, cdt=cdt, t1=t1, t1dgx=t1dgx, t1dgs=t1dgs)
    gx_sp, gskip_sp, gw1 = pl.pallas_call(
        kernel_c,
        grid=(p, planC.nb),
        in_specs=in_specs_c,
        out_specs=tuple(out_specs_c),
        out_shape=tuple(out_shapes_c),
        scratch_shapes=scratch_c,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(xc, skc, raw1_c, gy1_c, m1, r1, mg1_1, mg2_1, g1s, w1dgx, w1dgs)

    gx = _unflat(band_join(gx_sp, planC), planC).astype(x.dtype)
    gskip = band_join(gskip_sp, planC).reshape(
        b, n_rep, 4, cs, h * geoC.ws).sum(axis=1)
    gskip = gskip.reshape(b, 4, cs, h, geoC.ws)[..., :w].astype(
        skip_ph.dtype)
    res = [gx, gskip, gw1.reshape(w1.shape).astype(w1.dtype), gg1s, gg1b,
           gw2.reshape(w2.shape).astype(w2.dtype), gg2s, gg2b]
    if fuse_head:
        res += [gwh.reshape(wh.shape).astype(wh.dtype),
                ghb.reshape(hb.shape)]
    return tuple(res)


# ---------------------------------------------------------------------------
# VMEM sizing and gating

def banded_vmem_bytes(cin, cs, cout, h, w, fuse_head, band_rows):
    """Analytic per-program VMEM estimate of the LARGEST banded pass,
    mirroring the kernels' allocations (bf16 storage, double-buffered
    blocks)."""
    it = 2
    est = []
    for depth, kind in ((3 if fuse_head else 2, 'A'), (1, 'B'),
                        (1, 'C')):
        plan = make_band_plan(h, w, depth, band_rows)
        geo = plan.geo
        na, ns = len(geo.aligns), geo.ns_phase
        L, hwp = geo.L, geo.hwp
        k1 = 4 * (cin + 1) + 9 * cs
        F = max(t[1] for t in geo.tiles(k1))
        trans = int(2.5 * k1 * F * it) + cout * F * 4
        slots_full = sum(len(ks) for ks in
                         [geo.phase_aligns(v // 2) for v in range(4)])
        if kind == 'A':
            blocks = (cin + 4 * cs + 4 * (1 if fuse_head else cout)) * L * 2
            outs = 3 * 4 * cout * hwp * 2
            scr = (max(na - 1, 1) * cin + 4 * max(ns - 1, 1) * cs) * L * 2
            scr += slots_full * cout * L * 2
            if fuse_head:
                scr += slots_full * cout * L * 2 + 4 * cout * hwp * 2
            # packed weight operands w1 (k1 x 4cout) + w2 (9cout x 4cout)
            weights = 4 * cout * (k1 + 9 * cout) * 2
            outw = 0
        elif kind == 'B':
            blocks = 3 * 4 * cout * L * 2
            outs = 4 * cout * hwp * 2
            scr = 2 * slots_full * cout * L * 2 + 4 * cout * hwp * 2
            # w2dg operand + the revisited gw2 fp32 wgrad accumulator
            weights = 4 * cout * 9 * cout * 2
            outw = 4 * cout * 9 * cout * 4
        else:
            blocks = (cin + 4 * cs + 8 * cout) * L * 2
            outs = cin * hwp * 2 + 4 * cs * hwp * 4
            scr = (max(na - 1, 1) * cin + 4 * max(ns - 1, 1) * cs) * L * 2
            scr += slots_full * cout * L * 2
            # w1dgx + w1dgs operands (each k1 x 4cout) + the revisited
            # gw1 fp32 wgrad accumulator (k1 x 4cout)
            weights = 2 * 4 * cout * k1 * 2
            outw = 4 * cout * k1 * 4
        est.append((blocks + outs) * it + scr + trans
                   + weights * it + outw)
    return max(est)


BANDED_VMEM_LIMIT = 14 * 1024 * 1024


def choose_band_rows(cin, cs, cout, h, w, fuse_head,
                     limit=BANDED_VMEM_LIMIT):
    """Largest band (fewest passes over the halos) that fits the
    per-program VMEM budget; None if even the minimum band does not."""
    nc = make_geometry(h, w).nc
    best = None
    r = nc
    while r <= max(h, nc):
        if banded_vmem_bytes(cin, cs, cout, h, w, fuse_head, r) <= limit:
            best = r
        r += nc
    return best
