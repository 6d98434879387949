"""Channel dropout (feature perturbation).

Equivalent of ``F.dropout2d`` on NCHW in the reference feature-perturbation
path (reference model/builder.py:66-91): zeroes whole channels per sample and
rescales survivors by 1/(1-p). Operates on NHWC here.
"""

import jax
import jax.numpy as jnp


def dropout2d(rng, x, rate):
    """Drop whole channels of NHWC ``x`` with probability ``rate``."""
    if rate == 0.0:
        return x
    b, _, _, c = x.shape
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape=(b, 1, 1, c))
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), dtype=x.dtype))
