"""MaskFormer-style segmentation loss for the ATM head (SegLossPlus).

Parity: reference third_party/zegclip/losses/{atm_loss.py,atm_criterion.py}
re-formulated with static shapes for XLA:

- per-class binary target masks built by scatter over the label map
  (atm_loss.py:54-74, atm_criterion.py:156-167); the identity matching
  (class c <-> query c) of the reference makes Hungarian machinery moot;
- sigmoid focal loss (alpha .25, gamma 2) over ALL B*C masks, mean over
  pixels, sum / num_masks (atm_criterion.py:40-66);
- dice loss only over classes PRESENT in each image — expressed as a masked
  sum instead of gather (atm_criterion.py:21-37, 128-154);
- ``num_masks`` = total present classes, all-reduced over the data axis and
  divided by world size (atm_criterion.py:204-209) — ``axis_name`` here;
- deep supervision: same loss per decoder layer (aux weights equal).

Ignore pixels (255) count as background in both focal and dice targets,
matching the reference exactly.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _binary_targets(labels, num_classes):
    """(B, H, W) int labels -> (B, C, H, W) float one-hot; 255 -> all-zero."""
    valid = labels != 255
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, num_classes, axis=1, dtype=jnp.float32)
    return onehot * valid[:, None]


def _sigmoid_focal(pred, target, alpha=0.25, gamma=2.0):
    """per-mask focal: mean over pixels -> (B, C)."""
    pred = pred.astype(jnp.float32)
    ce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    prob = jax.nn.sigmoid(pred)
    p_t = prob * target + (1 - prob) * (1 - target)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * target + (1 - alpha) * (1 - target)
    loss = alpha_t * loss
    return jnp.mean(loss, axis=(2, 3))


def _dice(pred, target):
    """per-mask dice -> (B, C)."""
    prob = jax.nn.sigmoid(pred.astype(jnp.float32))
    num = 2 * jnp.sum(prob * target, axis=(2, 3))
    den = jnp.sum(prob, axis=(2, 3)) + jnp.sum(target, axis=(2, 3))
    return 1 - (num + 1) / (den + 1)


def seg_loss_plus(pred_masks, labels, num_classes, aux_masks=None,
                  mask_weight=20.0, dice_weight=1.0, loss_weight=1.0,
                  axis_name: Optional[str] = None):
    """pred_masks: (B, C, H, W) logits; labels: (B, h, w) int (255 ignore).

    Returns the summed scalar loss (the reference's ``_parse_losses`` sums
    the loss dict, semivl.py:270-271).
    """
    targets = _binary_targets(labels, num_classes)  # (B, C, h, w)
    if pred_masks.shape[-2:] != targets.shape[-2:]:
        from semivl_tpu.ops.resize import resize
        p = pred_masks.transpose(0, 2, 3, 1)
        p = resize(p.astype(jnp.float32), targets.shape[-2:],
                   mode='bilinear', align_corners=False)
        pred_masks = p.transpose(0, 3, 1, 2)

    present = jnp.any(targets > 0, axis=(2, 3))  # (B, C)
    num_masks = jnp.sum(present.astype(jnp.float32))
    if axis_name is not None:
        num_masks = jax.lax.pmean(num_masks, axis_name)
    num_masks = jnp.maximum(num_masks, 1.0)

    def one_level(pm):
        focal = jnp.sum(_sigmoid_focal(pm, targets)) / num_masks
        dice = jnp.sum(_dice(pm, targets) * present) / num_masks
        return mask_weight * focal + dice_weight * dice

    loss = one_level(pred_masks)
    for aux in (aux_masks or []):
        loss = loss + one_level(aux)
    return loss_weight * loss
