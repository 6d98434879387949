"""Padded-batch helpers — the TPU-idiomatic DETR ``NestedTensor``.

Reference: third_party/zegclip/models/misc.py:24-109 (``NestedTensor``,
``nested_tensor_from_tensor_list``, ``is_dist_avail_and_initialized``,
``get_world_size``). The reference pads a list of variable-size CHW
tensors to their max shape and carries a boolean padding mask; under XLA
the equivalent contract is a STATIC padded shape (rounded to a bucket so
jit programs don't re-specialise per image) plus the valid extent, which
is how the sliding-window evaluator feeds variable-size val images to
fixed-shape device programs (evaluation/predict.py).

``PaddedImage`` is that contract for the common corner-anchored case;
``padded_batch_from_list`` reproduces the reference's max-shape batching
semantics (mask and all) for API parity.
"""

import dataclasses
from typing import Any, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class PaddedImage:
    """A zero-padded (1, Hp, Wp, C) array plus its valid (h, w) extent.

    The valid region is corner-anchored (top-left), so the extent fully
    determines the reference's boolean mask (``.mask``) without storing
    it — slicing programs only need (h, w) scalars.
    """
    data: Any           # np.ndarray or jax array, (1, Hp, Wp, C)
    valid_hw: tuple

    @property
    def mask(self):
        """Boolean (1, Hp, Wp) padding mask, True on PAD pixels —
        the reference NestedTensor mask convention (misc.py:24-38)."""
        _, hp, wp, _ = self.data.shape
        h, w = self.valid_hw
        m = np.ones((1, hp, wp), bool)
        m[:, :h, :w] = False
        return m


def pad_image_to(img, hp, wp):
    """Zero-pad a (1, H, W, C) host image to (1, hp, wp, C).

    The single-image bucket-rounded variant of the reference's
    ``nested_tensor_from_tensor_list`` (misc.py:41-54): padding with
    zeros at the bottom/right, valid data corner-anchored.
    """
    _, h, w, c = img.shape
    assert h <= hp and w <= wp, (img.shape, hp, wp)
    pad = np.zeros((1, hp, wp, c), img.dtype)
    pad[:, :h, :w] = img
    return PaddedImage(data=pad, valid_hw=(h, w))


def padded_batch_from_list(arrays: Sequence[np.ndarray], bucket: int = 1):
    """Batch variable-size (H, W, C) arrays: pad each to the max shape
    (rounded up to ``bucket`` multiples) and stack, returning the batch
    plus the per-sample True-on-pad mask — reference
    ``nested_tensor_from_tensor_list`` (misc.py:41-54) with HWC layout
    and XLA-friendly bucket rounding.
    """
    assert arrays and all(a.ndim == 3 for a in arrays)
    hp = -(-max(a.shape[0] for a in arrays) // bucket) * bucket
    wp = -(-max(a.shape[1] for a in arrays) // bucket) * bucket
    c = arrays[0].shape[2]
    batch = np.zeros((len(arrays), hp, wp, c), arrays[0].dtype)
    mask = np.ones((len(arrays), hp, wp), bool)
    for i, a in enumerate(arrays):
        h, w, _ = a.shape
        batch[i, :h, :w] = a
        mask[i, :h, :w] = False
    return batch, mask


def is_dist_available():
    """Reference ``is_dist_avail_and_initialized`` (misc.py:56-63):
    under SPMD JAX the runtime is always initialised; 'distributed' means
    more than one participating process."""
    import jax
    return jax.process_count() > 1


def world_size():
    """Reference ``get_world_size`` (misc.py:66-70) — process count (the
    per-device world lives inside the mesh, not here)."""
    import jax
    return jax.process_count()
