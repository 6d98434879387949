"""Confidence weighting of unlabeled CE loss maps.

Parity with reference utils/train_utils.py:30-49 (three modes). Operates on
the per-device batch so normalisations are per-rank exactly as under DDP
(SURVEY.md §2.6 gradient semantics).
"""

import jax.numpy as jnp


def confidence_weighted_loss(loss_map, conf_map, ignore_mask, conf_mode,
                             conf_thresh):
    """loss_map/conf_map: (B, H, W) float; ignore_mask: (B, H, W) int.

    Returns a scalar. Modes:
      - pixelwise: zero low-confidence pixels, mean over valid pixels;
      - pixelratio: scale each sample's loss by its high-confidence fraction;
      - pixelavg: scale the summed loss by each sample's mean confidence
        (replicated literally, including the reference's scalar-broadcast
        quirk at train_utils.py:45).
    """
    loss_map = loss_map.astype(jnp.float32)
    conf_map = conf_map.astype(jnp.float32)
    valid = (ignore_mask != 255)
    valid_f = valid.astype(jnp.float32)
    total_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    if conf_mode == 'pixelwise':
        kept = (conf_map >= conf_thresh) & valid
        return jnp.sum(loss_map * kept) / total_valid
    if conf_mode == 'pixelratio':
        per = ((conf_map >= conf_thresh) & valid).astype(jnp.float32)
        ratio = (jnp.sum(per, axis=(1, 2), keepdims=True)
                 / jnp.maximum(jnp.sum(valid_f, axis=(1, 2), keepdims=True),
                               1.0))
        return jnp.sum(loss_map * ratio) / total_valid
    if conf_mode == 'pixelavg':
        avg_conf = (jnp.sum(conf_map * valid_f, axis=(1, 2))
                    / jnp.maximum(jnp.sum(valid_f, axis=(1, 2)), 1.0))
        # reference: loss.sum() * avg_conf -> (B,) -> .sum() / valid.sum()
        return jnp.sum(loss_map) * jnp.sum(avg_conf) / total_valid
    raise ValueError(conf_mode)
