"""PaddedImage / padded_batch_from_list — the TPU-shaped NestedTensor
(reference third_party/zegclip/models/misc.py:24-109)."""

import numpy as np

from semivl_tpu.utils.nested import (
    is_dist_available,
    pad_image_to,
    padded_batch_from_list,
    world_size,
)


def test_pad_image_to_corner_anchored():
    img = np.arange(2 * 3 * 3, dtype=np.float32).reshape(1, 2, 3, 3)
    p = pad_image_to(img, 4, 5)
    assert p.data.shape == (1, 4, 5, 3) and p.valid_hw == (2, 3)
    np.testing.assert_array_equal(p.data[:, :2, :3], img)
    assert p.data[:, 2:].sum() == 0 and p.data[:, :, 3:].sum() == 0
    # mask: True on PAD (reference NestedTensor convention, misc.py:24-38)
    m = p.mask
    assert m.shape == (1, 4, 5)
    assert not m[:, :2, :3].any() and m[:, 2:].all() and m[:, :, 3:].all()


def test_padded_batch_from_list_max_shape_and_mask():
    a = np.ones((2, 3, 1), np.float32)
    b = 2 * np.ones((4, 2, 1), np.float32)
    batch, mask = padded_batch_from_list([a, b])
    assert batch.shape == (2, 4, 3, 1) and mask.shape == (2, 4, 3)
    np.testing.assert_array_equal(batch[0, :2, :3, 0], 1)
    np.testing.assert_array_equal(batch[1, :4, :2, 0], 2)
    assert batch[0, 2:].sum() == 0 and batch[1, :, 2:].sum() == 0
    assert (~mask[0])[:2, :3].all() and mask[0, 2:].all()
    assert (~mask[1])[:4, :2].all() and mask[1, :, 2:].all()


def test_padded_batch_bucket_rounding():
    batch, mask = padded_batch_from_list(
        [np.zeros((5, 9, 3), np.uint8)], bucket=8)
    assert batch.shape == (1, 8, 16, 3)
    assert mask[0, :5, :9].sum() == 0 and mask.sum() == 8 * 16 - 45


def test_dist_helpers_single_process():
    assert world_size() == 1
    assert is_dist_available() is False
