"""Resize parity against PyTorch F.interpolate (CPU reference)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from semivl_tpu.ops.resize import resize, resize_longer_matrix


@pytest.mark.parametrize('mode', ['bilinear', 'bicubic'])
@pytest.mark.parametrize('align_corners', [False, True])
@pytest.mark.parametrize('shape', [
    ((2, 8, 8, 3), (16, 16)),    # 2x upsample
    ((1, 14, 14, 4), (32, 32)),  # pos-embed style
    ((2, 32, 32, 5), (512, 512)),  # logit upsample
    ((1, 33, 17, 2), (20, 50)),  # odd down/up mix
])
def test_matches_torch(rng, mode, align_corners, shape):
    in_shape, out_hw = shape
    x = rng.randn(*in_shape).astype(np.float32)
    got = np.asarray(resize(x, out_hw, mode=mode, align_corners=align_corners))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode=mode,
        align_corners=align_corners).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nhw_mask_resize(rng):
    x = (rng.rand(2, 10, 12) > 0.5).astype(np.float32)
    got = np.asarray(resize(x, (20, 24), mode='bilinear', align_corners=True))
    want = F.interpolate(torch.from_numpy(x)[:, None], size=(20, 24),
                         mode='bilinear', align_corners=True)[:, 0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pos_embed_resize_matches_torch(rng):
    """Parity with reference maskclip_vit.py:462-490 (bicubic, ac=False)."""
    c = 16
    pos = rng.randn(1, 1 + 14 * 14, c).astype(np.float32)
    got = np.asarray(resize_longer_matrix(pos, (32, 32), (14, 14)))
    grid = torch.from_numpy(pos[:, 1:]).reshape(1, 14, 14, c).permute(0, 3, 1, 2)
    grid = F.interpolate(grid, size=(32, 32), mode='bicubic', align_corners=False)
    grid = grid.flatten(2).transpose(1, 2)
    want = torch.cat([torch.from_numpy(pos[:, :1]), grid], dim=1).numpy()
    assert got.shape == (1, 1 + 32 * 32, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_identity_passthrough(rng):
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize(x, (8, 8))), x)
