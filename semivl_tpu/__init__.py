"""SemiVL-TPU: a TPU-native (JAX/Flax/pjit/Pallas) semi-supervised semantic
segmentation framework with the capabilities of google-research/semivl.

The reference implementation (CUDA/PyTorch/mmseg) is re-designed TPU-first:

- one SPMD program per train step (``jit``/``shard_map`` over a ``data`` mesh)
  instead of DDP processes + NCCL,
- functional Flax modules instead of mmseg registries and monkey-patched
  ``forward``,
- device-resident text embeddings instead of per-step ``np.load``
  (reference: model/vlm.py:116),
- explicit PRNG threading for the feature-perturbation dropout instead of
  global RNG state,
- exact-parity bicubic/bilinear resizes expressed as precomputed weight
  matmuls (MXU-friendly),
- Pallas fused attention for the ViT hot path.
"""

import os as _os

from semivl_tpu.version import __version__

# The deployment host's sitecustomize pins the axon TPU backend over the
# JAX_PLATFORMS env var; an explicit cpu request (tests, tool dry-runs,
# driver virtual-device mode) would otherwise hang on the TPU tunnel.
# Honour it for every semivl_tpu entry point. Must run before the jax
# backend initialises — i.e. before any jax array op — which importing
# this package guarantees for all our CLIs/tools.
if _os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

__all__ = ["__version__"]
