"""Exact-parity separable image resizing for TPU.

PyTorch's ``F.interpolate`` semantics (bilinear/bicubic, with and without
``align_corners``, no antialiasing) are reproduced by precomputing static
per-axis interpolation weight matrices on the host and applying them as two
matmuls. This is bit-faithful to the reference's resize behavior (used for
pos-embed resizing, decoder upsampling and logit resizing, e.g. reference
maskclip_vit.py:462-490, vlg_head.py:63,134,247, builder.py:93-97) while
mapping onto the MXU instead of gather-based interpolation.

Note: ``jax.image.resize`` uses the Keys cubic kernel (A=-0.5); PyTorch uses
A=-0.75, and its half-pixel/align-corner coordinate rules differ from naive
resampling — hence the custom weights.

All functions take NHWC arrays.
"""

import functools

import jax.numpy as jnp
import numpy as np


def _source_coords(out_size, in_size, align_corners):
    """Source x-coordinate for each output index (PyTorch convention)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1, dtype=np.float64)
        return i * (in_size - 1) / (out_size - 1)
    scale = in_size / out_size
    return i * scale + 0.5 * scale - 0.5


def _linear_weights(out_size, in_size, align_corners):
    src = _source_coords(out_size, in_size, align_corners)
    if not align_corners:
        # PyTorch clamps negative source coords to 0 for linear interpolation.
        src = np.clip(src, 0.0, None)
    x0 = np.floor(src).astype(np.int64)
    frac = src - x0
    w = np.zeros((out_size, in_size), dtype=np.float64)
    idx0 = np.clip(x0, 0, in_size - 1)
    idx1 = np.clip(x0 + 1, 0, in_size - 1)
    rows = np.arange(out_size)
    np.add.at(w, (rows, idx0), 1.0 - frac)
    np.add.at(w, (rows, idx1), frac)
    return w


def _cubic_kernel(x, a=-0.75):
    """Cubic convolution kernel with PyTorch's A=-0.75."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1
    m2 = (x > 1) & (x < 2)
    out[m1] = ((a + 2) * x[m1] - (a + 3)) * x[m1] * x[m1] + 1
    out[m2] = (((x[m2] - 5) * x[m2] + 8) * x[m2] - 4) * a
    return out


def _cubic_weights(out_size, in_size, align_corners):
    src = _source_coords(out_size, in_size, align_corners)
    x0 = np.floor(src).astype(np.int64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for t in (-1, 0, 1, 2):
        idx = x0 + t
        kern = _cubic_kernel(src - idx)
        # Border handling: PyTorch clamps the access index (replicate padding).
        np.add.at(w, (rows, np.clip(idx, 0, in_size - 1)), kern)
    return w


@functools.lru_cache(maxsize=256)
def _axis_weights(out_size, in_size, mode, align_corners, dtype_name):
    """Numpy (out, in) interpolation weights (cached; numpy only — caching a
    device array here would leak tracers across jit scopes)."""
    if out_size == in_size:
        w = np.eye(out_size)
    elif mode == 'bilinear':
        w = _linear_weights(out_size, in_size, align_corners)
    elif mode == 'bicubic':
        w = _cubic_weights(out_size, in_size, align_corners)
    elif mode == 'nearest':
        # PyTorch 'nearest' (legacy): floor(i * in/out).
        idx = np.minimum(
            (np.arange(out_size) * (in_size / out_size)).astype(np.int64),
            in_size - 1)
        w = np.zeros((out_size, in_size))
        w[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(mode)
    return w.astype(np.dtype(dtype_name))


def resize(x, out_hw, mode='bilinear', align_corners=False):
    """Resize NHWC (or NHW) ``x`` to ``out_hw`` with PyTorch interpolate parity.

    Weights are computed in float32 and the contraction runs in float32
    regardless of input dtype (cast back at the end) to keep parity tight.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x[..., 0] if squeeze else x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    wh = _axis_weights(out_h, in_h, mode, bool(align_corners),
                       np.dtype(compute_dtype).name)
    ww = _axis_weights(out_w, in_w, mode, bool(align_corners),
                       np.dtype(compute_dtype).name)
    y = jnp.einsum('hH,bHWc->bhWc', wh, x.astype(compute_dtype),
                   precision='highest')
    y = jnp.einsum('wW,bhWc->bhwc', ww, y, precision='highest')
    y = y.astype(x.dtype)
    return y[..., 0] if squeeze else y


def resize_longer_matrix(pos_embed, new_hw, old_hw, mode='bicubic'):
    """Resize a flattened (1, 1+H*W, C) positional embedding grid.

    Parity: reference maskclip_vit.py:462-490 ``resize_pos_embed`` — keep the
    cls token, bicubic-resize the spatial grid (align_corners=False).
    """
    cls_tok = pos_embed[:, :1]
    grid = pos_embed[:, 1:]
    c = grid.shape[-1]
    grid = grid.reshape(1, old_hw[0], old_hw[1], c)
    grid = resize(grid, new_hw, mode=mode, align_corners=False)
    grid = grid.reshape(1, new_hw[0] * new_hw[1], c)
    return jnp.concatenate([cls_tok, grid], axis=1)
