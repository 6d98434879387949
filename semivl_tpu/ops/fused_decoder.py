"""Fused polyphase VLG decoder stages (Pallas TPU), forward + backward.

Executes the phase-separated Up-stage algebra of ops/polyphase.py as one
Pallas program per class plane: composite (tconv-absorbed) conv1 + skip
conv -> GN -> ReLU -> conv2 -> GN -> ReLU [-> head conv], with every
intermediate resident in VMEM. Each stage works on its OWN input grid
(h, w) and produces the four output phases of the 2x-finer grid, so the
transpose conv never materialises the t tensor (reference
model/decode_heads/vlg_head.py:116-137,190,239-240) and kernel input is
4x smaller than the round-2 fused_up formulation.

Mechanism (chosen by on-chip probing, see docs/decoder_perf_notes.md):

- Plane buffers are flat (C, L) rows with row stride ws = the smallest
  power of two >= w (cols [w, ws) zero), data at lane offset 128. A row
  stride dividing 128 makes row-block taps 128-ALIGNED slices — the only
  fast load form (unaligned value slices relayout at ~1 TF/s; arbitrary-
  amount jnp.roll runs at ~20 GB/s; both probed catastrophic on v5e).
- Each source plane is stored at n_align <= 3 lane alignments
  (k in {0, 1, nc-1}, nc = 128/ws) so every row shift sy in {-1,0,+1}
  has an aligned read; unaligned *stores* are cheap.
- Column taps group by sx: concat the row parts, then ONE jnp.roll of
  +-1 per group (the only fast roll amount) with a wrap mask when
  ws == w. The composite ones channel (absorbs the tconv bias) is
  generated as an iota mask and appended post-roll.
- Compute runs over row-aligned lane tiles (tile starts are multiples of
  128), bounding the concat transient; tile-local +-1 rolls are exact
  because the lane that wraps at a tile edge is either a zero pad column
  (ws > w) or masked by the edge mask (ws == w).
- Per output phase and tile, everything lands in ONE
  (Cout, K) @ (K, F) MXU dot with K in the hundreds — full lanes at any
  Cout. Weights are packed per phase in the sorted tap order by XLA
  (differentiable: the custom_vjp returns grads w.r.t. the packed arrays
  and XLA chains them back to up_kernel/up_bias/conv kernels).
- Internal activation storage is ALWAYS bfloat16 (float32 dot
  accumulation, float32 GroupNorm statistics). On the MXU a float32
  model runs bf16 multiplies at default precision anyway; models that
  need strict fp32 decoder numerics use the XLA path.

Backward (two kernels per stage, flash-style recompute from the stage
inputs): dgrad of every conv is again a phase conv (flipped-transposed
weights, same pad/mask semantics), so the same executor runs it; wgrads
reuse the forward tap concat — g_w_packed[v] += g[v] @ cat[v]^T — and
accumulate across the sequential grid into constant-index output blocks.
"""

import dataclasses
import functools
import os
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semivl_tpu.ops.polyphase import (
    Tap,
    composite_phase_kernels,
    conv1_taps,
    conv3_taps,
)

_PAD = 128
_CDT = jnp.bfloat16   # internal activation/grad storage dtype


# ---------------------------------------------------------------------------
# geometry and tap ordering

@dataclasses.dataclass(frozen=True)
class Geometry:
    h: int
    w: int
    ws: int            # row stride (power of two >= w, <= 128)
    nc: int            # 128 // ws
    aligns: tuple      # stored lane alignments (k values)
    hwp: int           # h * ws
    L: int             # buffer length

    @property
    def masked(self):
        return self.ws == self.w

    def phase_aligns(self, py):
        """Row alignments ever read for a level-1 phase of row parity
        ``py``: every phase is read at sy=0, and additionally at sy=+1
        (py == 0, from out-phase row 1's dy=+1 taps -> k = nc-1) or
        sy=-1 (py == 1 -> k = 1). Storing only these slots saves a third
        of the phase-buffer VMEM at nc = 4."""
        ks = {0, (self.nc - 1) % self.nc} if py == 0 else {0, 1 % self.nc}
        return tuple(sorted(ks))

    @property
    def ns_phase(self):
        return min(self.nc, 2)

    def tiles(self, max_k):
        """Row-aligned lane tiles (f0, F): f0 multiples of 128, sized so
        a (max_k, F) bf16 concat stays under ~1 MB (the concat and its
        rolled pieces are STACK allocations inside the kernel body; the
        up2 backward was measured 253 KB over the 16 MB scoped-VMEM edge
        at a 1.5 MB target)."""
        target = max(128, (1024 * 1024 // (2 * max_k)) // 128 * 128)
        rows_per = max(self.nc, (target // self.ws) // self.nc * self.nc)
        out = []
        r = 0
        while r < self.h:
            rr = min(rows_per, self.h - r)
            out.append((r * self.ws, rr * self.ws))
            r += rr
        return out


def make_geometry(h, w):
    assert w <= 128, (h, w)
    ws = 1
    while ws < w:
        ws *= 2
    nc = 128 // ws
    aligns = tuple(sorted({0, 1 % nc, (nc - 1) % nc}))
    return Geometry(h, w, ws, nc, aligns, h * ws,
                    2 * _PAD + h * ws + (nc - 1) * ws)


def sort_taps(taps: List[Tap]):
    """Group by column shift, ones parts last in each group (they are
    appended after the group roll); stable within."""
    return sorted(taps, key=lambda t: (t.sx, t.src == 'ones'))


def _fwd_tap_lists(cin, cs, cout):
    t1 = [sort_taps(conv1_taps(1, v // 2, v % 2, cin, cs))
          for v in range(4)]
    t2 = [sort_taps(conv3_taps(1, v // 2, v % 2, cout)) for v in range(4)]
    return t1, t2


def invert_taps(fwd_lists, src, n_src, cout):
    """dgrad tap lists: for each source phase of ``src``, taps that read
    the output-gradient phases with negated shifts (the flipped-
    transposed conv). wkey keeps (v, fwd-tap) identity for packing."""
    out = [[] for _ in range(n_src)]
    for v, taps in enumerate(fwd_lists):
        for ti, t in enumerate(taps):
            if t.src != src:
                continue
            out[t.phase].append(Tap('g', v, -t.sy, -t.sx, cout, (v, ti)))
    return [sort_taps(l) for l in out]


# ---------------------------------------------------------------------------
# in-kernel plane IO

class SlotBufs:
    """Per-(plane, alignment-k) 2D VMEM buffers.

    Rank-4 VMEM scratch makes Mosaic's compile time explode (~130x,
    probed on v5e: 64 s vs 0.5 s for identical 2D buffers), so every
    slot buffer is a separate (C, L) scratch ref, plane-major."""

    def __init__(self, bufs, keys_per_plane):
        self.keys = keys_per_plane
        self.bufs = []
        i = 0
        for ks in keys_per_plane:
            self.bufs.append(bufs[i:i + len(ks)])
            i += len(ks)
        self.used = i

    def buf(self, q, k):
        return self.bufs[q][self.keys[q].index(k)]


def _slot_scratch(keys_per_plane, c, L, dt):
    return [pltpu.VMEM((c, L), dt)
            for ks in keys_per_plane for _ in ks]


def _zero_pads(sb: SlotBufs, q, geo, dtype):
    """Zero the non-data lanes of every alignment slot row."""
    for k in sb.keys[q]:
        b = sb.buf(q, k)
        c = b.shape[0]
        off = _PAD + k * geo.ws
        b[:, :off] = jnp.zeros((c, off), dtype)
        b[:, off + geo.hwp:] = jnp.zeros((c, geo.L - off - geo.hwp), dtype)


def _store_tile(sb: SlotBufs, q, val, geo, f0, slots=None):
    """Write a (C, F) tile at plane offset f0 into alignment slots."""
    for k in sb.keys[q]:
        if slots is not None and k not in slots:
            continue
        off = _PAD + k * geo.ws + f0
        sb.buf(q, k)[:, off:off + val.shape[1]] = val


def _slot_read(sb: SlotBufs, q, sy, geo, f0, F):
    """(C, F) row-shifted tile — an aligned slice of the right slot."""
    k = (-sy) % geo.nc
    start = _PAD + (k + sy) * geo.ws + f0
    assert start % 128 == 0 and start >= 0, (k, sy, geo)
    return sb.buf(q, k)[:, start:start + F]


def _iota(geo, f0, F, rows=1):
    return f0 + jax.lax.broadcasted_iota(jnp.int32, (rows, F), 1)


def _ones_part(t, geo, dtype, f0, F, row0=0, h_tot=None):
    """Composite ones-channel tile. ``row0``/``h_tot`` shift the row
    bounds to PLANE coordinates when the buffer is a band of a larger
    plane (row0 may be traced); defaults reproduce whole-plane
    behavior."""
    if h_tot is None:
        h_tot = geo.h
    f = _iota(geo, f0, F)
    row, col = f // geo.ws + row0, f % geo.ws
    cond = ((row + t.sy >= 0) & (row + t.sy < h_tot)
            & (col + t.sx >= 0) & (col + t.sx < geo.w))
    return cond.astype(dtype)


def _phase_cat(sorted_taps, read, geo, dtype, f0, F, row0=0, h_tot=None):
    """The (K, F) tap concat for one output phase and tile.

    ``read(tap, f0, F) -> (C, F)``: aligned row-shifted tile of the
    source. Tile-local +-1 rolls are exact (see module docstring)."""
    groups = []
    for sx in (-1, 0, 1):
        parts = [t for t in sorted_taps if t.sx == sx and t.src != 'ones']
        ones = [t for t in sorted_taps if t.sx == sx and t.src == 'ones']
        if parts:
            cat = (read(parts[0], f0, F) if len(parts) == 1
                   else jnp.concatenate(
                       [read(t, f0, F) for t in parts], axis=0))
            if sx:
                block = jnp.roll(cat, -sx, 1)
                if geo.masked:
                    col = _iota(geo, f0, F, rows=block.shape[0]) % geo.ws
                    edge = (col != 0) if sx < 0 else (col != geo.w - 1)
                    block = jnp.where(edge, block,
                                      jnp.zeros((), block.dtype))
            else:
                block = cat
            groups.append(block)
        groups.extend(_ones_part(t, geo, dtype, f0, F, row0, h_tot)
                      for t in ones)
    return groups[0] if len(groups) == 1 else jnp.concatenate(groups, 0)


def _phase_conv(sorted_taps, read, geo, w_packed, dtype, f0, F, row0=0,
                h_tot=None):
    cat = _phase_cat(sorted_taps, read, geo, dtype, f0, F, row0, h_tot)
    return jax.lax.dot_general(
        w_packed, cat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mask_cols(val, geo, f0, F):
    """Zero the pad columns [w, ws) of a tile (no-op when ws == w)."""
    if geo.masked:
        return val
    col = _iota(geo, f0, F, rows=val.shape[0]) % geo.ws
    return jnp.where(col < geo.w, val, jnp.zeros((), val.dtype))


# ---------------------------------------------------------------------------
# weight packing (XLA, differentiable)

def conv1_wslices(up_kernel, up_bias, conv1_kernel, vy, vx):
    """wkey -> (C, Cout) slices for output phase (vy, vx) of a stage."""
    cm = up_kernel.shape[-1]
    ks = composite_phase_kernels(up_kernel, up_bias, conv1_kernel[:, :, :cm])
    k = ks[vy & 1][vx & 1]                       # (2, 2, Cin+1, Cout)
    cin = up_kernel.shape[2]
    sl = {}
    for a in (0, 1):
        for b in (0, 1):
            sl[('comp', a, b)] = k[a, b, :cin]
            sl[('compones', a, b)] = k[a, b, cin:cin + 1]
    skip_k = conv1_kernel[:, :, cm:]
    for dy in range(3):
        for dx in range(3):
            sl[('skipk', dy, dx)] = skip_k[dy, dx]
    return sl


def conv3_wslices(kernel):
    return {('k', dy, dx): kernel[dy, dx]
            for dy in range(3) for dx in range(3)}


def pack_phase(sorted_taps, wslices, dtype):
    cols = [wslices[t.wkey] for t in sorted_taps]
    return jnp.concatenate(cols, axis=0).T.astype(dtype)


def _tap_cols(sorted_taps):
    """Column ranges of each tap inside the packed (Cout, K) weight."""
    cols, c0 = [], 0
    for t in sorted_taps:
        cols.append((c0, t.channels))
        c0 += t.channels
    return cols


def pack_dgrad(packed_w, fwd_lists, bwd_lists, dtype):
    """Packed dgrad weights from the packed forward arrays.

    packed_w: (4, Cout, K); bwd tap wkey = (v, fwd_tap_idx). Returns
    (n_src, C, K_bwd) with columns W[v, tap]^T in bwd sorted order."""
    col_ranges = [_tap_cols(l) for l in fwd_lists]
    out = []
    for taps in bwd_lists:
        cols = []
        for t in taps:
            v, ti = t.wkey
            c0, c = col_ranges[v][ti]
            cols.append(packed_w[v][:, c0:c0 + c].T)   # (C, Cout)
        out.append(jnp.concatenate([c.T for c in cols], axis=0).T)
    return jnp.stack(out).astype(dtype)


def _group_mat(cout, hw):
    """(Cout, Cout) fp32 group-average matrix over (4 phases, hw)."""
    num_groups = max(cout // 16, 1)
    assert cout % num_groups == 0, (cout, num_groups)
    gsize = cout // num_groups
    ci = jnp.arange(cout)
    return jnp.asarray(ci[:, None] // gsize == ci[None, :] // gsize,
                       jnp.float32) / (4 * hw * gsize)


def _gn_stats(ssum, ssq, gmat, eps=1e-5):
    mean = jnp.dot(gmat, ssum, preferred_element_type=jnp.float32)
    ex2 = jnp.dot(gmat, ssq, preferred_element_type=jnp.float32)
    return mean, jax.lax.rsqrt(ex2 - mean * mean + eps)


# ---------------------------------------------------------------------------
# shared kernel passes

def _conv_pass(taps_lists, read, w_at, geo, cdt, store, tiles):
    """Raw conv for all 4 phases; returns per-channel (sum, sumsq)."""
    ssum = ssq = None
    for v in range(4):
        for f0, F in tiles:
            acc = _mask_cols(
                _phase_conv(taps_lists[v], read, geo, w_at(v), cdt, f0, F),
                geo, f0, F)
            store(v, f0, acc)
            s = jnp.sum(acc, axis=1, keepdims=True)
            q = jnp.sum(acc * acc, axis=1, keepdims=True)
            ssum = s if ssum is None else ssum + s
            ssq = q if ssq is None else ssq + q
    return ssum, ssq


def _phase_keys(geo):
    return [geo.phase_aligns(v // 2) for v in range(4)]


def _normalize_pass(act: SlotBufs, geo, cdt, mean, rstd, gs, gb, tiles,
                    raw=None):
    """(raw - mean)*rstd*gs + gb -> relu -> all alignment slots.
    Raw planes are read from slot 0 of ``act`` (optionally also saved to
    the ``raw`` 2D buffers for backward)."""
    for v in range(4):
        for f0, F in tiles:
            r = _slot_read(act, v, 0, geo, f0, F)
            if raw is not None:
                raw[v][:, f0:f0 + F] = r
            y = jnp.maximum(
                (r.astype(jnp.float32) - mean) * rstd * gs + gb, 0.0)
            y = _mask_cols(y, geo, f0, F)
            _store_tile(act, v, y.astype(cdt), geo, f0)


def _fwd_conv_gn(taps_lists, read, w_at, act: SlotBufs, gmat, gs, gb, geo,
                 cdt, tiles, raw=None):
    def store(v, f0, acc):
        _store_tile(act, v, acc.astype(cdt), geo, f0, slots=(0,))

    ssum, ssq = _conv_pass(taps_lists, read, w_at, geo, cdt, store, tiles)
    mean, rstd = _gn_stats(ssum, ssq, gmat)
    _normalize_pass(act, geo, cdt, mean, rstd, gs, gb, tiles, raw=raw)
    return mean, rstd


def _phase_reader(sb: SlotBufs, geo):
    def read(t, f0, F):
        return _slot_read(sb, t.phase, t.sy, geo, f0, F)

    return read


def _nz_keys(keys):
    return tuple(k for k in keys if k != 0)


def _slotified_reader(read_block, sb: SlotBufs, n_planes, geo):
    """Slot builder + reader for a padded INPUT block: alignment-0 reads
    (including every read when nc == 1 — +-ws shifts are then 128-
    aligned) come straight from the block; only nonzero alignments get
    scratch copies.

    read_block(q, start, F) -> (C, F) slice of plane ``q``'s padded
    block row."""
    for q in range(n_planes):
        if not sb.keys[q]:
            continue
        for f0, F in geo.tiles(1):
            _store_tile(sb, q, read_block(q, _PAD + f0, F), geo, f0)
        _zero_pads(sb, q, geo, sb.buf(q, sb.keys[q][0]).dtype)

    def read(t, f0, F):
        k = (-t.sy) % geo.nc
        if k == 0:
            return read_block(t.phase, _PAD + t.sy * geo.ws + f0, F)
        return _slot_read(sb, t.phase, t.sy, geo, f0, F)

    return read


def _input_reads(x_ref, skip_ref, xs: SlotBufs, ss: SlotBufs, geo, cs):
    """Slot copies + read fn for the stage inputs (blocks are rank-3:
    skip phases flattened into the channel rows)."""
    read_x = _slotified_reader(
        lambda q, s, F: x_ref[0, :, s:s + F], xs, 1, geo)
    read_s = _slotified_reader(
        lambda q, s, F: skip_ref[0, q * cs:(q + 1) * cs, s:s + F],
        ss, 4, geo)

    def read(t, f0, F):
        return read_x(t, f0, F) if t.src == 'x' else read_s(t, f0, F)

    return read


def _keys_in(geo):
    """Scratch key layouts: block-backed x / 4-phase sources (nonzero
    alignments only) and computed 4-phase planes (all alignments)."""
    pk = _phase_keys(geo)
    x_keys = [_nz_keys(geo.aligns)]
    in_keys = [_nz_keys(pk[q]) for q in range(4)]
    full_keys = [pk[q] for q in range(4)]
    return x_keys, in_keys, full_keys


def _w_at(w_ref, cout):
    return lambda v: w_ref[v * cout:(v + 1) * cout]


# ---------------------------------------------------------------------------
# forward kernel

def _stage_fwd_kernel(x_ref, skip_ref, w1_ref, g1s_ref, g1b_ref, w2_ref,
                      g2s_ref, g2b_ref, gmat_ref, *rest,
                      cin, cs, cout, geo, fuse_head, cdt, t1, t2,
                      save_stats=False):
    if fuse_head:
        wh_ref, hb_ref, o_ref = rest[:3]
        scr = rest[3:]
    else:
        o_ref = rest[0]
        scr = rest[1:]
    stat_refs = None
    if save_stats:
        stat_refs = scr[:4]          # m1, r1, m2, r2 outputs (cout, 1)
        scr = scr[4:]
    x_keys, in_keys, full_keys = _keys_in(geo)
    xs = SlotBufs(scr, x_keys)
    ss = SlotBufs(scr[xs.used:], in_keys)
    c1 = SlotBufs(scr[xs.used + ss.used:], full_keys)

    read1 = _input_reads(x_ref, skip_ref, xs, ss, geo, cs)
    gmat = gmat_ref[:]
    k1 = 4 * (cin + 1) + 9 * cs
    tiles1 = geo.tiles(k1)
    tiles2 = geo.tiles(9 * cout)
    for q in range(4):
        _zero_pads(c1, q, geo, cdt)
    mean1, rstd1 = _fwd_conv_gn(t1, read1, _w_at(w1_ref, cout), c1, gmat,
                                g1s_ref[:], g1b_ref[:], geo, cdt, tiles1)
    if save_stats:
        stat_refs[0][0] = mean1
        stat_refs[1][0] = rstd1

    read2 = _phase_reader(c1, geo)
    if fuse_head:
        c2 = SlotBufs(scr[xs.used + ss.used + c1.used:], full_keys)
        for q in range(4):
            _zero_pads(c2, q, geo, cdt)
        mean2, rstd2 = _fwd_conv_gn(t2, read2, _w_at(w2_ref, cout), c2,
                                    gmat, g2s_ref[:], g2b_ref[:], geo,
                                    cdt, tiles2)
        if save_stats:
            stat_refs[2][0] = mean2
            stat_refs[3][0] = rstd2
        hb = hb_ref[0, 0]
        read3 = _phase_reader(c2, geo)
        for v in range(4):
            for f0, F in tiles2:
                acc = _phase_conv(t2[v], read3, geo, wh_ref[v:v + 1], cdt,
                                  f0, F) + hb
                o_ref[0, v:v + 1, f0:f0 + F] = _mask_cols(
                    acc, geo, f0, F).astype(o_ref.dtype)
    else:
        def store(v, f0, acc):
            o_ref[0, v * cout:(v + 1) * cout, f0:f0 + acc.shape[1]] = \
                acc.astype(o_ref.dtype)

        ssum, ssq = _conv_pass(t2, read2, _w_at(w2_ref, cout), geo, cdt,
                               store, tiles2)
        mean, rstd = _gn_stats(ssum, ssq, gmat)
        if save_stats:
            stat_refs[2][0] = mean
            stat_refs[3][0] = rstd
        for v in range(4):
            for f0, F in tiles2:
                raw = o_ref[0, v * cout:(v + 1) * cout,
                            f0:f0 + F].astype(jnp.float32)
                y = jnp.maximum((raw - mean) * rstd * g2s_ref[:]
                                + g2b_ref[:], 0.0)
                o_ref[0, v * cout:(v + 1) * cout, f0:f0 + F] = _mask_cols(
                    y, geo, f0, F).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels

def _stage_bwd_tail_kernel(
        x_ref, skip_ref, w1_ref, g1s_ref, g1b_ref, w2_ref, g2s_ref,
        g2b_ref, gmat_ref, w2dg_ref, g_ref, *rest,
        cin, cs, cout, geo, fuse_head, cdt, t1, t2, t2dg, thdg):
    """Tail grads: recompute c1/raw2[/c2], then GN2/head backward,
    conv2 wgrad+dgrad, GN1 backward -> g_raw1 (+ per-channel GN grads
    accumulated across the grid).

    VMEM economy: with a head, the c2 slot buffers are REUSED for the
    g_raw2 slots (c2 is dead after the head wgrad); without a head,
    g_c2 is read straight from the gradient input block."""
    if fuse_head:
        (wh_ref, whdg_ref, hb_ref, ograw1_ref, ogw2_ref, og2s_ref,
         og2b_ref, og1s_ref, og1b_ref, ogwh_ref, oghb_ref) = rest[:11]
        scr = rest[11:]
    else:
        (ograw1_ref, ogw2_ref, og2s_ref, og2b_ref, og1s_ref,
         og1b_ref) = rest[:6]
        scr = rest[6:]
        wh_ref = whdg_ref = hb_ref = ogwh_ref = oghb_ref = None

    x_keys, in_keys, full_keys = _keys_in(geo)
    xs = SlotBufs(scr, x_keys)
    ss = SlotBufs(scr[xs.used:], in_keys)
    c1 = SlotBufs(scr[xs.used + ss.used:], full_keys)
    off = xs.used + ss.used + c1.used
    gsrc = SlotBufs(scr[off:], full_keys)   # head: doubles as c2 slots
    off += gsrc.used
    raw1 = scr[off:off + 4]
    raw2 = scr[off + 4:off + 8]
    gbuf = scr[off + 8:off + 12]
    off += 12
    gho = SlotBufs(scr[off:], in_keys) if fuse_head else None
    c2 = gsrc

    p0 = pl.program_id(0) == 0
    gmat = gmat_ref[:]
    k1 = 4 * (cin + 1) + 9 * cs
    tiles1 = geo.tiles(k1)
    tiles2 = geo.tiles(9 * cout)
    read1 = _input_reads(x_ref, skip_ref, xs, ss, geo, cs)
    for q in range(4):
        _zero_pads(c1, q, geo, cdt)
    mean1, rstd1 = _fwd_conv_gn(t1, read1, _w_at(w1_ref, cout), c1, gmat,
                                g1s_ref[:], g1b_ref[:], geo, cdt, tiles1,
                                raw=raw1)

    read_c1 = _phase_reader(c1, geo)

    # raw2 (and, with a head, c2 activations)
    if fuse_head:
        for q in range(4):
            _zero_pads(c2, q, geo, cdt)
        mean2, rstd2 = _fwd_conv_gn(t2, read_c1, _w_at(w2_ref, cout), c2,
                                    gmat, g2s_ref[:], g2b_ref[:], geo,
                                    cdt, tiles2, raw=raw2)
    else:
        def store_raw2(v, f0, acc):
            raw2[v][:, f0:f0 + acc.shape[1]] = acc.astype(cdt)

        ssum, ssq = _conv_pass(t2, read_c1, _w_at(w2_ref, cout), geo, cdt,
                               store_raw2, tiles2)
        mean2, rstd2 = _gn_stats(ssum, ssq, gmat)

    # gradient w.r.t. c2 activations
    if fuse_head:
        read_gho = _slotified_reader(
            lambda q, s, F: g_ref[0, q:q + 1, s:s + F], gho, 4, geo)

        # head wgrad / bias grad (consumes c2), then head dgrad -> gbuf
        @pl.when(p0)
        def _():
            ogwh_ref[...] = jnp.zeros(ogwh_ref.shape, ogwh_ref.dtype)
            oghb_ref[...] = jnp.zeros(oghb_ref.shape, oghb_ref.dtype)
        hbacc = None
        read3 = _phase_reader(c2, geo)
        for v in range(4):
            gv = g_ref[0, v:v + 1, _PAD:_PAD + geo.hwp].astype(jnp.float32)
            s = jnp.sum(gv, axis=1, keepdims=True)
            hbacc = s if hbacc is None else hbacc + s
            for f0, F in tiles2:
                cat = _phase_cat(t2[v], read3, geo, cdt, f0, F)
                gvt = g_ref[0, v:v + 1, _PAD + f0:_PAD + f0 + F]
                ogwh_ref[v:v + 1] += jax.lax.dot_general(
                    gvt, cat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        oghb_ref[...] += hbacc
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

    # GN2 + ReLU backward -> g_raw2 (stored into gsrc slots)
    g2s = g2s_ref[:]
    g2b = g2b_ref[:]
    sgy = sgyx = None
    for v in range(4):
        for f0, F in tiles2:
            raw = raw2[v][:, f0:f0 + F].astype(jnp.float32)
            xhat = (raw - mean2) * rstd2
            relu_m = (xhat * g2s + g2b) > 0
            gy = jnp.where(relu_m, read_gc2(v, f0, F).astype(jnp.float32),
                           0.0)
            gy = _mask_cols(gy, geo, f0, F)
            s = jnp.sum(gy, axis=1, keepdims=True)
            q = jnp.sum(gy * xhat, axis=1, keepdims=True)
            sgy = s if sgy is None else sgy + s
            sgyx = q if sgyx is None else sgyx + q

    @pl.when(p0)
    def _():
        og2s_ref[...] = jnp.zeros(og2s_ref.shape, og2s_ref.dtype)
        og2b_ref[...] = jnp.zeros(og2b_ref.shape, og2b_ref.dtype)
        og1s_ref[...] = jnp.zeros(og1s_ref.shape, og1s_ref.dtype)
        og1b_ref[...] = jnp.zeros(og1b_ref.shape, og1b_ref.dtype)
        ogw2_ref[...] = jnp.zeros(ogw2_ref.shape, ogw2_ref.dtype)
    og2s_ref[...] += sgyx
    og2b_ref[...] += sgy
    mg1 = jnp.dot(gmat, g2s * sgy, preferred_element_type=jnp.float32)
    mg2 = jnp.dot(gmat, g2s * sgyx, preferred_element_type=jnp.float32)
    for q in range(4):
        _zero_pads(gsrc, q, geo, cdt)
    for v in range(4):
        for f0, F in tiles2:
            raw = raw2[v][:, f0:f0 + F].astype(jnp.float32)
            xhat = (raw - mean2) * rstd2
            relu_m = (xhat * g2s + g2b) > 0
            gy = jnp.where(relu_m, read_gc2(v, f0, F).astype(jnp.float32),
                           0.0)
            graw2 = rstd2 * (g2s * gy - mg1 - xhat * mg2)
            graw2 = _mask_cols(graw2, geo, f0, F)
            _store_tile(gsrc, v, graw2.astype(cdt), geo, f0)

    # conv2 wgrad (reuses the forward tap concat) and dgrad -> g_c1
    for v in range(4):
        for f0, F in tiles2:
            cat = _phase_cat(t2[v], read_c1, geo, cdt, f0, F)
            gvt = _slot_read(gsrc, v, 0, geo, f0, F)
            ogw2_ref[v * cout:(v + 1) * cout] += jax.lax.dot_general(
                gvt, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    read_graw2 = _phase_reader(gsrc, geo)
    for q in range(4):
        for f0, F in tiles2:
            gc1 = _mask_cols(
                _phase_conv(t2dg[q], read_graw2, geo,
                            w2dg_ref[q * cout:(q + 1) * cout], cdt,
                            f0, F), geo, f0, F)
            gbuf[q][:, f0:f0 + F] = gc1.astype(cdt)

    # GN1 + ReLU backward -> g_raw1 out
    g1s = g1s_ref[:]
    g1b = g1b_ref[:]
    sgy = sgyx = None
    for v in range(4):
        for f0, F in tiles1:
            raw = raw1[v][:, f0:f0 + F].astype(jnp.float32)
            xhat = (raw - mean1) * rstd1
            relu_m = (xhat * g1s + g1b) > 0
            gy = jnp.where(relu_m, gbuf[v][:, f0:f0 + F].astype(jnp.float32),
                           0.0)
            gy = _mask_cols(gy, geo, f0, F)
            s = jnp.sum(gy, axis=1, keepdims=True)
            q = jnp.sum(gy * xhat, axis=1, keepdims=True)
            sgy = s if sgy is None else sgy + s
            sgyx = q if sgyx is None else sgyx + q
    og1s_ref[...] += sgyx
    og1b_ref[...] += sgy
    mg1 = jnp.dot(gmat, g1s * sgy, preferred_element_type=jnp.float32)
    mg2 = jnp.dot(gmat, g1s * sgyx, preferred_element_type=jnp.float32)
    for v in range(4):
        for f0, F in tiles1:
            raw = raw1[v][:, f0:f0 + F].astype(jnp.float32)
            xhat = (raw - mean1) * rstd1
            relu_m = (xhat * g1s + g1b) > 0
            gy = jnp.where(relu_m, gbuf[v][:, f0:f0 + F].astype(jnp.float32),
                           0.0)
            graw1 = rstd1 * (g1s * gy - mg1 - xhat * mg2)
            graw1 = _mask_cols(graw1, geo, f0, F)
            ograw1_ref[0, v * cout:(v + 1) * cout, f0:f0 + F] = \
                graw1.astype(ograw1_ref.dtype)


def _stage_bwd_input_kernel(
        x_ref, skip_ref, graw1_ref, w1dgx_ref, w1dgs_ref, *rest,
        cin, cs, cout, geo, n_rep, cdt, t1, t1dgx, t1dgs):
    """Input grads: g_x (per plane), g_skip phases (accumulated per
    image), and the packed conv1 weight grad (accumulated globally)."""
    ogx_ref, ogskip_ref, ogw1_ref = rest[:3]
    scr = rest[3:]
    x_keys, in_keys, _ = _keys_in(geo)
    xs = SlotBufs(scr, x_keys)
    ss = SlotBufs(scr[xs.used:], in_keys)
    gsrc = SlotBufs(scr[xs.used + ss.used:], in_keys)

    p = pl.program_id(0)
    k1 = 4 * (cin + 1) + 9 * cs
    tiles1 = geo.tiles(k1)
    tilesd = geo.tiles(16 * cout)
    read_in = _input_reads(x_ref, skip_ref, xs, ss, geo, cs)
    read_g = _slotified_reader(
        lambda q, s, F: graw1_ref[0, q * cout:(q + 1) * cout, s:s + F],
        gsrc, 4, geo)

    # g_x
    for f0, F in tilesd:
        gx = _mask_cols(
            _phase_conv(t1dgx[0], read_g, geo, w1dgx_ref[:], cdt, f0, F),
            geo, f0, F)
        ogx_ref[0, :, f0:f0 + F] = gx.astype(ogx_ref.dtype)

    # g_skip (accumulate over the n_rep planes of this image)
    first_of_image = jax.lax.rem(p, n_rep) == 0
    for q in range(4):
        for f0, F in tilesd:
            gs = _mask_cols(
                _phase_conv(t1dgs[q], read_g, geo,
                            w1dgs_ref[q * cs:(q + 1) * cs], cdt,
                            f0, F), geo, f0, F)

            @pl.when(first_of_image)
            def _(q=q, f0=f0, gs=gs):
                ogskip_ref[0, q * cs:(q + 1) * cs, f0:f0 + gs.shape[1]] = \
                    gs.astype(ogskip_ref.dtype)

            @pl.when(jnp.logical_not(first_of_image))
            def _(q=q, f0=f0, gs=gs):
                ogskip_ref[0, q * cs:(q + 1) * cs, f0:f0 + gs.shape[1]] += \
                    gs.astype(ogskip_ref.dtype)

    # conv1 packed wgrad
    @pl.when(p == 0)
    def _():
        ogw1_ref[...] = jnp.zeros(ogw1_ref.shape, ogw1_ref.dtype)
    for v in range(4):
        for f0, F in tiles1:
            cat = _phase_cat(t1[v], read_in, geo, cdt, f0, F)
            gvt = graw1_ref[0, v * cout:(v + 1) * cout,
                            _PAD + f0:_PAD + f0 + F]
            ogw1_ref[v * cout:(v + 1) * cout] += jax.lax.dot_general(
                gvt, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


def _pad_plane_rows(x, geo):
    """(..., C, h, w) -> (..., C, L) flat padded planes (row stride ws,
    data at lane offset 128)."""
    pads = [(0, 0)] * (x.ndim - 1) + [(0, geo.ws - geo.w)]
    flat = jnp.pad(x, pads).reshape(x.shape[:-2] + (geo.hwp,))
    lane = [(0, 0)] * (flat.ndim - 1) + [(_PAD, geo.L - _PAD - geo.hwp)]
    return jnp.pad(flat, lane)


def _unpad(out, geo):
    return out.reshape(out.shape[:-1] + (geo.h, geo.ws))[..., :geo.w]


def _pad_flat(x, geo):
    """Lane-pad planes already in row-strided flat (..., hwp) form."""
    lane = [(0, 0)] * (x.ndim - 1) + [(_PAD, geo.L - _PAD - geo.hwp)]
    return jnp.pad(x, lane)


def _pack_stage_weights(params, head_params, t1, t2, dtype=_CDT):
    k1 = params['conv1']['conv']['kernel']
    w1 = jnp.stack([
        pack_phase(t1[v], conv1_wslices(
            params['up_kernel'], params['up_bias'], k1, v // 2, v % 2),
            dtype)
        for v in range(4)])
    sl2 = conv3_wslices(params['conv2']['conv']['kernel'])
    w2 = jnp.stack([pack_phase(t2[v], sl2, dtype) for v in range(4)])
    cout = k1.shape[-1]
    gn = lambda d: (d['scale'].reshape(cout, 1).astype(jnp.float32),
                    d['bias'].reshape(cout, 1).astype(jnp.float32))
    g1s, g1b = gn(params['conv1']['gn'])
    g2s, g2b = gn(params['conv2']['gn'])
    packed = dict(w1=w1, g1s=g1s, g1b=g1b, w2=w2, g2s=g2s, g2b=g2b)
    if head_params is not None:
        slh = conv3_wslices(head_params['kernel'])
        packed['wh'] = jnp.stack([pack_phase(t2[v], slh, dtype)
                                  for v in range(4)])
        packed['hb'] = head_params['bias'].reshape(1, 1).astype(jnp.float32)
    return packed


def stage_vmem_bytes(cin, cs, cout, h, w, fuse_head, backward=False):
    """Analytic per-program VMEM estimate mirroring the kernels'
    allocations (bf16 storage; backward = kernel A, the larger one)."""
    geo = make_geometry(h, w)
    na, ns = len(geo.aligns), geo.ns_phase
    it = 2
    L, hwp = geo.L, geo.hwp
    k1 = 4 * (cin + 1) + 9 * cs
    xs = max(na - 1, 1) * cin * L
    ss = 4 * max(ns - 1, 1) * cs * L
    c1 = 4 * ns * cout * L
    weights = 4 * cout * (k1 + 9 * cout) * it
    F = max(t[1] for t in geo.tiles(k1))
    trans = int(2.5 * k1 * F * it) + cout * F * 4
    if not backward:
        out_c = 1 if fuse_head else cout
        blocks = 2 * (cin + 4 * cs) * L + 2 * 4 * out_c * hwp
        c2 = 4 * ns * cout * L if fuse_head else 0
        return (blocks + xs + ss + c1 + c2) * it + weights + trans
    g_c = 1 if fuse_head else cout
    blocks = 2 * (cin + 4 * cs + 4 * g_c) * L + 2 * 4 * cout * hwp
    raws = 3 * 4 * cout * hwp
    over = 4 * ns * cout * L                  # c2/graw2 overlay or graw2
    gho = 4 * max(ns - 1, 1) * L if fuse_head else 0
    outw = 4 * cout * 9 * cout * 4
    return ((blocks + xs + ss + c1 + over + gho + raws) * it
            + 2 * weights + outw + trans)


# Calibrated against Mosaic compile success on v5e (the analytic
# transient term is conservative): the flagship backward (estimate
# 17.9 MB) and the 801-crop FORWARD chain (estimates 17.1/21.5 MB)
# both compile and run; the 801-crop backward (30-39 MB) does not fit.
FUSED_VMEM_LIMIT = 19 * 1024 * 1024
FUSED_VMEM_LIMIT_FWD = 22 * 1024 * 1024


def _common_specs(x_pad, skip_pad, geo, n_rep, packed_ops):
    cin = x_pad.shape[1]
    rows = skip_pad.shape[1]
    const = lambda a: pl.BlockSpec(a.shape, lambda pi: (0,) * a.ndim)
    in_specs = [
        pl.BlockSpec((1, cin, geo.L), lambda pi: (pi, 0, 0)),
        pl.BlockSpec((1, rows, geo.L), lambda pi: (pi // n_rep, 0, 0)),
    ] + [const(a) for a in packed_ops]
    return in_specs


def _stage_fwd_core(x, skip_ph, w1, g1s, g1b, w2, g2s, g2b, wh=None,
                    hb=None, interpret=None, storage=None,
                    save_stats=False):
    """Forward with pre-packed weights (the custom_vjp primal).

    ``save_stats=True`` additionally returns the per-plane GroupNorm
    statistics ``(mean1, rstd1, mean2, rstd2)``, each (P, Cout, 1)
    float32 — the residuals of the banded backward
    (ops/fused_decoder_banded.py), which consumes forward stats instead
    of recomputing them whole-plane."""
    cdt = storage or _CDT
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    p, cin, h, w = x.shape
    b, nph, cs, _, _ = skip_ph.shape
    assert nph == 4 and p % b == 0
    n_rep = p // b
    geo = make_geometry(h, w)
    cout = w2.shape[1]
    fuse_head = wh is not None
    t1, t2 = _fwd_tap_lists(cin, cs, cout)

    x_pad = _pad_plane_rows(x.astype(cdt), geo)
    # rank-3 blocks: phases flattened into channel rows (higher-rank
    # blocks inflate Mosaic compile times like higher-rank scratch)
    skip_pad = _pad_plane_rows(skip_ph.astype(cdt), geo).reshape(
        b, 4 * cs, geo.L)
    gmat = _group_mat(cout, h * w)

    flat_w = lambda a: a.reshape(-1, a.shape[-1])
    packed = [flat_w(w1).astype(cdt), g1s, g1b, flat_w(w2).astype(cdt),
              g2s, g2b, gmat]
    if fuse_head:
        packed += [flat_w(wh).astype(cdt), hb]
    in_specs = _common_specs(x_pad, skip_pad, geo, n_rep, packed)
    x_keys, in_keys, full_keys = _keys_in(geo)
    scratch = (_slot_scratch(x_keys, cin, geo.L, cdt)
               + _slot_scratch(in_keys, cs, geo.L, cdt)
               + _slot_scratch(full_keys, cout, geo.L, cdt))
    out_c = cout
    if fuse_head:
        scratch += _slot_scratch(full_keys, cout, geo.L, cdt)
        out_c = 1

    kernel = functools.partial(
        _stage_fwd_kernel, cin=cin, cs=cs, cout=cout, geo=geo,
        fuse_head=fuse_head, cdt=cdt, t1=t1, t2=t2, save_stats=save_stats)
    out_specs = [pl.BlockSpec((1, 4 * out_c, geo.hwp),
                              lambda pi: (pi, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((p, 4 * out_c, geo.hwp), cdt)]
    if save_stats:
        for _ in range(4):
            out_specs.append(pl.BlockSpec((1, cout, 1),
                                          lambda pi: (pi, 0, 0)))
            out_shapes.append(
                jax.ShapeDtypeStruct((p, cout, 1), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if save_stats else out_specs[0],
        out_shape=tuple(out_shapes) if save_stats else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # the stats-saving forward (banded-backward residuals) at
            # 801-crop geometry needs 18.10 MB of scoped VMEM (compiler
            # measured); the plain forward stays at the default budget
            vmem_limit_bytes=20 * 1024 * 1024 if save_stats else None),
    )(x_pad, skip_pad, *packed)
    if save_stats:
        out, m1, r1, m2, r2 = outs
        return (_unpad(out.reshape(p, 4, out_c, geo.hwp), geo),
                (m1, r1, m2, r2))
    return _unpad(outs.reshape(p, 4, out_c, geo.hwp), geo)


def _stage_bwd(x, skip_ph, g_out, w1, g1s, g1b, w2, g2s, g2b, wh=None,
               hb=None, interpret=None, storage=None):
    """Full backward for one stage; returns
    (g_x, g_skip_ph, g_w1, g_g1s, g_g1b, g_w2, g_g2s, g_g2b[, g_wh, g_hb])."""
    cdt = storage or _CDT
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    p, cin, h, w = x.shape
    b = skip_ph.shape[0]
    cs = skip_ph.shape[2]
    n_rep = p // b
    geo = make_geometry(h, w)
    cout = w2.shape[1]
    fuse_head = wh is not None
    t1, t2 = _fwd_tap_lists(cin, cs, cout)
    t2dg = invert_taps(t2, 'x', 4, cout)
    flat_w = lambda a: a.reshape(-1, a.shape[-1])
    w2dg = flat_w(pack_dgrad(w2, t2, t2dg, cdt))

    x_pad = _pad_plane_rows(x.astype(cdt), geo)
    skip_pad = _pad_plane_rows(skip_ph.astype(cdt), geo).reshape(
        b, 4 * cs, geo.L)
    g_c = g_out.shape[2]
    g_pad = _pad_plane_rows(g_out.astype(cdt), geo).reshape(
        p, 4 * g_c, geo.L)
    gmat = _group_mat(cout, h * w)
    k1 = 4 * (cin + 1) + 9 * cs
    x_keys, in_keys, full_keys = _keys_in(geo)

    # ---- kernel A: tail grads -> g_raw1 + weight/GN grads
    packed = [flat_w(w1).astype(cdt), g1s, g1b, flat_w(w2).astype(cdt),
              g2s, g2b, gmat, w2dg]
    head_extra = []
    thdg = None
    if fuse_head:
        thdg = invert_taps(t2, 'x', 4, 1)
        whdg = flat_w(pack_dgrad(wh, t2, thdg, cdt))
        head_extra = [flat_w(wh).astype(cdt), whdg, hb]
    in_specs = _common_specs(x_pad, skip_pad, geo, n_rep, packed)
    in_specs.append(
        pl.BlockSpec((1, 4 * g_c, geo.L), lambda pi: (pi, 0, 0)))
    const = lambda a: pl.BlockSpec(a.shape, lambda pi: (0,) * a.ndim)
    in_specs += [const(a) for a in head_extra]

    cvec = lambda: (jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                    pl.BlockSpec((cout, 1), lambda pi: (0, 0)))
    out_shapes = [jax.ShapeDtypeStruct((p, 4 * cout, geo.hwp), cdt)]
    out_specs = [pl.BlockSpec((1, 4 * cout, geo.hwp),
                              lambda pi: (pi, 0, 0))]
    out_shapes.append(jax.ShapeDtypeStruct((4 * cout, w2.shape[-1]),
                                           jnp.float32))
    out_specs.append(pl.BlockSpec((4 * cout, w2.shape[-1]),
                                  lambda pi: (0, 0)))
    for _ in range(4):
        sh, sp = cvec()
        out_shapes.append(sh)
        out_specs.append(sp)
    if fuse_head:
        out_shapes += [jax.ShapeDtypeStruct((4, wh.shape[-1]), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        out_specs += [pl.BlockSpec((4, wh.shape[-1]), lambda pi: (0, 0)),
                      pl.BlockSpec((1, 1), lambda pi: (0, 0))]

    scratch = (_slot_scratch(x_keys, cin, geo.L, cdt)
               + _slot_scratch(in_keys, cs, geo.L, cdt)
               + _slot_scratch(full_keys, cout, geo.L, cdt)
               + _slot_scratch(full_keys, cout, geo.L, cdt)  # gsrc/c2
               + [pltpu.VMEM((cout, geo.hwp), cdt)
                  for _ in range(12)])                        # raw1/2, gbuf
    if fuse_head:
        scratch += _slot_scratch(in_keys, 1, geo.L, cdt)      # g_ho
    kernel = functools.partial(
        _stage_bwd_tail_kernel, cin=cin, cs=cs, cout=cout, geo=geo,
        fuse_head=fuse_head, cdt=cdt, t1=t1, t2=t2, t2dg=t2dg, thdg=thdg)
    outs = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # the backward-tail's scratch + stack sits at the default
            # 16 MB scoped budget's edge in some surrounding programs;
            # v5e's physical VMEM accommodates the raised cap (validated
            # by running, not just compiling)
            vmem_limit_bytes=18 * 1024 * 1024),
    )(x_pad, skip_pad, *packed, g_pad, *head_extra)
    if fuse_head:
        graw1, gw2, gg2s, gg2b, gg1s, gg1b, gwh, ghb = outs
    else:
        graw1, gw2, gg2s, gg2b, gg1s, gg1b = outs
        gwh = ghb = None

    # ---- kernel B: input grads + conv1 packed wgrad
    t1dgx = invert_taps(t1, 'x', 1, cout)
    t1dgs = invert_taps(t1, 'skip', 4, cout)
    w1dgx = flat_w(pack_dgrad(w1, t1, t1dgx, cdt))
    w1dgs = flat_w(pack_dgrad(w1, t1, t1dgs, cdt))
    graw1_pad = _pad_flat(graw1, geo)

    in_specs_b = [
        pl.BlockSpec((1, cin, geo.L), lambda pi: (pi, 0, 0)),
        pl.BlockSpec((1, 4 * cs, geo.L), lambda pi: (pi // n_rep, 0, 0)),
        pl.BlockSpec((1, 4 * cout, geo.L), lambda pi: (pi, 0, 0)),
        const(w1dgx), const(w1dgs),
    ]
    out_shapes_b = [
        jax.ShapeDtypeStruct((p, cin, geo.hwp), cdt),            # g_x
        jax.ShapeDtypeStruct((b, 4 * cs, geo.hwp), jnp.float32),  # g_skip
        jax.ShapeDtypeStruct((4 * cout, w1.shape[-1]), jnp.float32),
    ]
    out_specs_b = [
        pl.BlockSpec((1, cin, geo.hwp), lambda pi: (pi, 0, 0)),
        pl.BlockSpec((1, 4 * cs, geo.hwp), lambda pi: (pi // n_rep, 0, 0)),
        pl.BlockSpec((4 * cout, w1.shape[-1]), lambda pi: (0, 0)),
    ]
    scratch_b = (_slot_scratch(x_keys, cin, geo.L, cdt)
                 + _slot_scratch(in_keys, cs, geo.L, cdt)
                 + _slot_scratch(in_keys, cout, geo.L, cdt))  # g_raw1
    kernel_b = functools.partial(
        _stage_bwd_input_kernel, cin=cin, cs=cs, cout=cout, geo=geo,
        n_rep=n_rep, cdt=cdt, t1=t1, t1dgx=t1dgx, t1dgs=t1dgs)
    gx, gskip, gw1 = pl.pallas_call(
        kernel_b,
        grid=(p,),
        in_specs=in_specs_b,
        out_specs=tuple(out_specs_b),
        out_shape=tuple(out_shapes_b),
        scratch_shapes=scratch_b,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(x_pad, skip_pad, graw1_pad, w1dgx, w1dgs)

    res = [_unpad(gx, geo).astype(x.dtype),
           _unpad(gskip.reshape(b, 4, cs, geo.hwp),
                  geo).astype(skip_ph.dtype),
           gw1.reshape(w1.shape).astype(w1.dtype), gg1s, gg1b,
           gw2.reshape(w2.shape).astype(w2.dtype), gg2s, gg2b]
    if fuse_head:
        res += [gwh.reshape(wh.shape).astype(wh.dtype),
                ghb.reshape(hb.shape)]
    return tuple(res)


# ---------------------------------------------------------------------------
# public API

def fused_stage(x, skip_ph, params, head_params=None, interpret=None,
                storage=None):
    """One fused Up stage, forward only.

    x: (P, Cin, h, w) interleaved planes on the stage's input grid;
    skip_ph: (B, 4, Cs, h, w) phases of the (2h, 2w) skip tensor.
    Returns the four output phases (P, 4, Cout, h, w), or the fused head
    logits (P, 4, 1, h, w) when ``head_params`` is given."""
    cdt = storage or _CDT
    cout = params['conv1']['conv']['kernel'].shape[-1]
    t1, t2 = _fwd_tap_lists(x.shape[1], skip_ph.shape[2], cout)
    packed = _pack_stage_weights(params, head_params, t1, t2, cdt)
    args = [packed['w1'], packed['g1s'], packed['g1b'], packed['w2'],
            packed['g2s'], packed['g2b']]
    if head_params is not None:
        args += [packed['wh'], packed['hb']]
    return _stage_fwd_core(x, skip_ph, *args, interpret=interpret,
                           storage=cdt)


def _interleave(phases):
    """(P, 4, C, h, w) -> (P, C, 2h, 2w)."""
    p, _, c, h, w = phases.shape
    x = phases.reshape(p, 2, 2, c, h, w)
    return jnp.transpose(x, (0, 3, 4, 1, 5, 2)).reshape(p, c, 2 * h, 2 * w)


def _deinterleave(x):
    """(P, C, 2h, 2w) -> (P, 4, C, h, w)."""
    p, c, hh, ww = x.shape
    x = x.reshape(p, c, hh // 2, 2, ww // 2, 2)
    return jnp.transpose(x, (0, 3, 5, 1, 2, 4)).reshape(
        p, 4, c, hh // 2, ww // 2)


def _stage_banded(cin, cs, cout, h, w, fuse_head):
    """Whether a stage's backward must take the row-banded path
    (ops/fused_decoder_banded.py) because the whole-plane backward
    kernel exceeds the scoped-VMEM limit. SEMIVL_FORCE_BANDED_BWD=1
    forces the banded route at any geometry (tool/test A-B knob)."""
    if os.environ.get('SEMIVL_FORCE_BANDED_BWD') == '1':
        return True
    return stage_vmem_bytes(cin, cs, cout, h, w, fuse_head,
                            backward=True) > FUSED_VMEM_LIMIT


def _chain_banded(interpret, storage, x, s1_ph, s2_ph, pw1, pw2):
    cout1 = pw1['w2'].shape[1]
    cout2 = pw2['w2'].shape[1]
    h, w = x.shape[2], x.shape[3]
    b1 = _stage_banded(x.shape[1], s1_ph.shape[2], cout1, h, w, False)
    b2 = _stage_banded(cout1, s2_ph.shape[2], cout2, 2 * h, 2 * w, True)
    return b1, b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chain_core(interpret, storage, x, s1_ph, s2_ph, pw1, pw2):
    return _chain_fwd(interpret, storage, x, s1_ph, s2_ph, pw1, pw2)[0]


def _chain_fwd(interpret, storage, x, s1_ph, s2_ph, pw1, pw2):
    """Chain forward. Stages whose backward is row-banded save their
    GroupNorm statistics as residuals (the banded backward cannot
    recompute plane-wide statistics from a band)."""
    banded1, banded2 = _chain_banded(interpret, storage, x, s1_ph, s2_ph,
                                     pw1, pw2)
    out1 = _stage_fwd_core(
        x, s1_ph, pw1['w1'], pw1['g1s'], pw1['g1b'], pw1['w2'],
        pw1['g2s'], pw1['g2b'], interpret=interpret, storage=storage,
        save_stats=banded1)
    c2_ph, st1 = out1 if banded1 else (out1, None)
    x2 = _interleave(c2_ph)
    out2 = _stage_fwd_core(
        x2, s2_ph, pw2['w1'], pw2['g1s'], pw2['g1b'], pw2['w2'],
        pw2['g2s'], pw2['g2b'], pw2['wh'], pw2['hb'], interpret=interpret,
        storage=storage, save_stats=banded2)
    ho, st2 = out2 if banded2 else (out2, None)
    return ho, (x, s1_ph, s2_ph, x2, pw1, pw2, st1, st2)


def _chain_bwd(interpret, storage, res, g_ho):
    from semivl_tpu.ops.fused_decoder_banded import _stage_bwd_banded
    x, s1_ph, s2_ph, x2, pw1, pw2, st1, st2 = res
    if st2 is not None:
        outs2 = _stage_bwd_banded(
            x2, s2_ph, g_ho, st2, pw2['w1'], pw2['g1s'], pw2['g1b'],
            pw2['w2'], pw2['g2s'], pw2['g2b'], pw2['wh'], pw2['hb'],
            interpret=interpret, storage=storage)
    else:
        outs2 = _stage_bwd(
            x2, s2_ph, g_ho, pw2['w1'], pw2['g1s'], pw2['g1b'], pw2['w2'],
            pw2['g2s'], pw2['g2b'], pw2['wh'], pw2['hb'],
            interpret=interpret, storage=storage)
    (gx2, gs2, gw1_2, gg1s_2, gg1b_2, gw2_2, gg2s_2, gg2b_2,
     gwh, ghb) = outs2
    g_c2_ph = _deinterleave(gx2)
    if st1 is not None:
        outs1 = _stage_bwd_banded(
            x, s1_ph, g_c2_ph, st1, pw1['w1'], pw1['g1s'], pw1['g1b'],
            pw1['w2'], pw1['g2s'], pw1['g2b'], interpret=interpret,
            storage=storage)
    else:
        outs1 = _stage_bwd(
            x, s1_ph, g_c2_ph, pw1['w1'], pw1['g1s'], pw1['g1b'],
            pw1['w2'], pw1['g2s'], pw1['g2b'], interpret=interpret,
            storage=storage)
    gx1, gs1, gw1_1, gg1s_1, gg1b_1, gw2_1, gg2s_1, gg2b_1 = outs1
    gpw1 = dict(w1=gw1_1, g1s=gg1s_1, g1b=gg1b_1, w2=gw2_1,
                g2s=gg2s_1, g2b=gg2b_1)
    gpw2 = dict(w1=gw1_2, g1s=gg1s_2, g1b=gg1b_2, w2=gw2_2,
                g2s=gg2s_2, g2b=gg2b_2, wh=gwh, hb=ghb)
    return gx1, gs1, gs2, gpw1, gpw2


_chain_core.defvjp(_chain_fwd, _chain_bwd)


def fused_vlg_decoder(x, skip1, skip2, params1, params2, head_params,
                      interpret=None, storage=None):
    """Full up1 -> up2 -> head decoder tail, differentiable.

    x: (P, C, h, w) planes (P = B*N); skip1: (B, Cs1, 2h, 2w);
    skip2: (B, Cs2, 4h, 4w) — both already resized to their stage's
    output resolution. Returns (P, 1, 4h, 4w) logits in bfloat16.

    Reference math: model/decode_heads/vlg_head.py:116-137,190,239-240;
    backward is a custom VJP over two fused Pallas kernels per stage.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    storage = storage or _CDT
    cout1 = params1['conv1']['conv']['kernel'].shape[-1]
    cout2 = params2['conv1']['conv']['kernel'].shape[-1]
    cs1 = skip1.shape[1]
    cs2 = skip2.shape[1]
    t1a, t2a = _fwd_tap_lists(x.shape[1], cs1, cout1)
    t1b, t2b = _fwd_tap_lists(cout1, cs2, cout2)
    pw1 = _pack_stage_weights(params1, None, t1a, t2a, storage)
    pw2 = _pack_stage_weights(params2, head_params, t1b, t2b, storage)
    s1_ph = _deinterleave(skip1)
    s2_ph = _deinterleave(skip2)
    ho_ph = _chain_core(interpret, storage, x, s1_ph, s2_ph, pw1, pw2)
    return _interleave(ho_ph)


def fused_decoder_ok(cin, cs1, cout1, cs2, cout2, h, w, backward=True):
    """VMEM gate for the fused chain at a given geometry.

    ``backward=False`` gates forward-only use (teacher pass, eval) where
    only the forward kernels' footprint matters. With ``backward=True``
    a stage whose whole-plane backward kernel does not fit is REJECTED
    by default even though the row-banded backward
    (ops/fused_decoder_banded.py) would fit: measured on v5e at
    801-crop Cityscapes geometry (2026-08-18,
    tools/banded_decoder_check.py), the three-pass banded backward runs
    fwd+bwd at 82.4 ms vs XLA's 38.5 ms — the per-pass in-VMEM forward
    recompute triples the work, so XLA wins whenever banding is needed.
    SEMIVL_FORCE_BANDED_BWD=1 opts back in (tool/test A-B knob)."""
    if w > 64:      # base widths w and 2w must fit a 128-lane row stride
        return False
    stages = [(cin, cs1, cout1, h, w, False),
              (cout1, cs2, cout2, 2 * h, 2 * w, True)]
    if not backward:
        return all(stage_vmem_bytes(*s, backward=False)
                   <= FUSED_VMEM_LIMIT_FWD for s in stages)
    from semivl_tpu.ops.fused_decoder_banded import choose_band_rows
    allow_banded = os.environ.get('SEMIVL_FORCE_BANDED_BWD') == '1'
    for s in stages:
        if stage_vmem_bytes(*s, backward=False) > FUSED_VMEM_LIMIT_FWD:
            return False
        if stage_vmem_bytes(*s, backward=True) > FUSED_VMEM_LIMIT:
            if not (allow_banded and choose_band_rows(*s) is not None):
                return False
    return True
