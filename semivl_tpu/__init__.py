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

from semivl_tpu.version import __version__

__all__ = ["__version__"]
