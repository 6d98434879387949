"""Confidence-weighting parity with the reference formulas
(utils/train_utils.py:30-49), checked against an independent numpy
transcription including the pixelavg scalar-broadcast quirk."""

import numpy as np
import pytest

import jax.numpy as jnp

from semivl_tpu.losses.conf_weight import confidence_weighted_loss

THRESH = 0.95


def _np_reference(loss, conf, ignore, mode):
    valid = ignore != 255
    if mode == 'pixelwise':
        out = loss * ((conf >= THRESH) & valid)
        return out.sum() / valid.sum()
    if mode == 'pixelratio':
        high = ((conf >= THRESH) & valid).sum(axis=(1, 2), keepdims=True)
        ratio = high / valid.sum(axis=(1, 2), keepdims=True)
        return (loss * ratio).sum() / valid.sum()
    if mode == 'pixelavg':
        avg = ((conf * valid).sum(axis=(1, 2), keepdims=True)
               / valid.sum(axis=(1, 2), keepdims=True))
        scaled = loss.sum() * avg          # scalar * (B,1,1)
        return scaled.sum() / valid.sum()
    raise ValueError(mode)


@pytest.mark.parametrize('mode', ['pixelwise', 'pixelratio', 'pixelavg'])
def test_conf_weight_matches_reference(mode, rng):
    loss = rng.rand(3, 10, 12).astype(np.float32)
    conf = rng.rand(3, 10, 12).astype(np.float32)
    conf[0, :4] = 0.99  # some high-confidence regions
    ignore = np.zeros((3, 10, 12), np.int32)
    ignore[1, :3] = 255
    want = _np_reference(loss.astype(np.float64), conf.astype(np.float64),
                         ignore, mode)
    got = float(confidence_weighted_loss(
        jnp.asarray(loss), jnp.asarray(conf), jnp.asarray(ignore), mode,
        THRESH))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_conf_weight_all_ignored(rng):
    """Fully-ignored batch must not divide by zero."""
    loss = rng.rand(1, 4, 4).astype(np.float32)
    conf = rng.rand(1, 4, 4).astype(np.float32)
    ignore = np.full((1, 4, 4), 255, np.int32)
    for mode in ('pixelwise', 'pixelratio', 'pixelavg'):
        got = float(confidence_weighted_loss(
            jnp.asarray(loss), jnp.asarray(conf), jnp.asarray(ignore),
            mode, THRESH))
        assert np.isfinite(got)
