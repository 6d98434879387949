"""Cross-entropy losses.

Parity with ``torch.nn.CrossEntropyLoss(ignore_index=255)`` (reference
semivl.py:142-164) and the OHEM variant
(third_party/unimatch/util/ohem.py:8-57). Logits are (B, C, H, W) float;
labels (B, H, W) int with 255 = ignore. All reductions in float32.
"""

import jax
import jax.numpy as jnp

# 19-entry Cityscapes class-frequency weights used by the reference OHEM's
# ``use_weight=True`` branch (third_party/unimatch/util/ohem.py:17-20).
CITYSCAPES_OHEM_WEIGHT = (
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489,
    0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955,
    1.0865, 1.1529, 1.0507)


def _select_true_class(values, labels):
    """values (B, C, H, W) gathered at labels (B, H, W) -> (B, H, W).

    One-hot select instead of ``take_along_axis``: the channel-axis gather
    (and the scatter in its VJP) lowers catastrophically on TPU — measured
    33 ms fwd for a (8,21,512,512) CE call vs ~1 ms for this formulation
    (bandwidth-bound compare+mask+reduce, whose VJP is the same mask).
    """
    classes = jnp.arange(values.shape[1], dtype=labels.dtype)
    onehot = labels[:, None] == classes[None, :, None, None]
    return jnp.sum(jnp.where(onehot, values, 0), axis=1)


def _per_pixel_ce(logits, labels, ignore_index=255):
    """Per-pixel CE map (0 at ignored pixels) and the valid mask."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=1)
    picked = _select_true_class(logits, safe_labels)
    ce = jnp.where(valid, logz - picked, 0.0)
    return ce, valid


def cross_entropy(logits, labels, ignore_index=255, reduction='mean'):
    """reduction: 'mean' (over valid pixels, torch parity) | 'none' | 'sum'."""
    ce, valid = _per_pixel_ce(logits, labels, ignore_index)
    if reduction == 'none':
        return ce
    if reduction == 'sum':
        return jnp.sum(ce)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


def ohem_cross_entropy(logits, labels, ignore_index=255, thresh=0.7,
                       min_kept=200000, weight=None):
    """Prob-threshold online hard example mining CE (reference ohem.py:8-57).

    Keeps pixels whose predicted prob of the true class is below a threshold;
    the threshold is raised so at least ``min_kept`` pixels survive.
    Static-shape implementation: instead of indexing/sorting a dynamic set,
    compute the min_kept-th smallest true-class prob via a sorted gather and
    mask — identical selection, XLA-friendly.

    ``weight``: optional (C,) per-class weights — the reference's
    ``use_weight=True`` Cityscapes table (ohem.py:17-23). Matches torch's
    weighted ``CrossEntropyLoss(reduction='mean')``: the loss over kept
    pixels is a weighted sum normalised by the summed weights of those
    pixels (not the pixel count).
    """
    logits32 = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    probs = jax.nn.softmax(logits32, axis=1)
    true_prob = _select_true_class(probs, safe_labels)
    # invalid pixels get prob 1.0 so they sort to the easy end
    true_prob = jnp.where(valid, true_prob, 1.0)

    flat = true_prob.reshape(-1)
    num_valid = jnp.sum(valid)
    kept = jnp.minimum(min_kept, flat.shape[0]) - 1
    kth = jnp.sort(flat)[jnp.maximum(kept, 0)]
    threshold = jnp.maximum(kth, thresh)
    keep = valid & (true_prob <= threshold)

    ce, _ = _per_pixel_ce(logits, labels, ignore_index)
    if weight is not None:
        w = jnp.asarray(weight, jnp.float32)[safe_labels]
        ce = jnp.where(keep, ce * w, 0.0)
        denom = jnp.maximum(jnp.sum(jnp.where(keep, w, 0.0)), 1e-12)
    else:
        ce = jnp.where(keep, ce, 0.0)
        denom = jnp.maximum(jnp.sum(keep), 1)
    return jnp.where(num_valid > 0, jnp.sum(ce) / denom, 0.0)
