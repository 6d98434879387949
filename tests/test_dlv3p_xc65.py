"""dlv3p-xc65 build path (Xception DeepLabV3+ baseline)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from semivl_tpu.configs import config_from_vars
from semivl_tpu.models.builder import build_model


@pytest.mark.slow
def test_dlv3p_xc65_builds_and_runs(rng):
    cfg = config_from_vars(
        exp_id=99, model='dlv3p-xc65', opt='original', lr=1e-3,
        criterion='CELoss', criterion_u='CELoss', img_scale=None,
        crop_size=64, eval_mode='original')
    assert cfg['backbone'] == 'xception'
    bundle = build_model(cfg)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)}, x)
    out = bundle.module.apply(variables, x)
    assert out.shape == (1, 21, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
