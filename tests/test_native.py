"""Native image-core tests: decode/resample parity vs PIL."""

import io

import numpy as np
import pytest
from PIL import Image

from semivl_tpu.native import (
    decode_image,
    native_available,
    normalize_imagenet,
    resize_bilinear,
    resize_nearest,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native image core not built')


def test_jpeg_decode_matches_pil(rng):
    img = rng.randint(0, 256, (37, 53, 3)).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, 'JPEG', quality=95)
    data = b.getvalue()
    ours = decode_image(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    np.testing.assert_array_equal(ours, pil)


def test_png_decode_lossless(rng):
    img = rng.randint(0, 256, (20, 31, 3)).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, 'PNG')
    np.testing.assert_array_equal(decode_image(b.getvalue()), img)


def test_mask_png_keeps_indices(rng):
    mask = rng.randint(0, 21, (20, 31)).astype(np.uint8)
    mask[0, 0] = 255
    b = io.BytesIO()
    Image.fromarray(mask).save(b, 'PNG')
    np.testing.assert_array_equal(decode_image(b.getvalue(), channels=1),
                                  mask)


def test_scaled_jpeg_decode(rng):
    img = rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, 'JPEG', quality=95)
    half = decode_image(b.getvalue(), scale_denom=2)
    assert half.shape == (32, 48, 3)


@pytest.mark.parametrize('target', [(20, 30), (74, 106), (37, 53)])
def test_resize_parity(rng, target):
    img = rng.randint(0, 256, (37, 53, 3)).astype(np.uint8)
    ours = resize_bilinear(img, *target)
    pil = np.asarray(Image.fromarray(img).resize((target[1], target[0]),
                                                 Image.BILINEAR))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1

    mask = rng.randint(0, 21, (37, 53)).astype(np.uint8)
    ours_n = resize_nearest(mask, *target)
    pil_n = np.asarray(Image.fromarray(mask).resize((target[1], target[0]),
                                                    Image.NEAREST))
    np.testing.assert_array_equal(ours_n, pil_n)


def test_normalize_parity(rng):
    from semivl_tpu.data.transforms import normalize
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    np.testing.assert_allclose(normalize_imagenet(img),
                               normalize(Image.fromarray(img)), atol=1e-6)


def test_dataset_native_mode(tmp_path):
    from synth_data import make_synth_dataset, synth_cfg
    from semivl_tpu.data.dataset import SemiDataset
    root = str(tmp_path)
    paths = make_synth_dataset(root)
    cfg = synth_cfg(root)
    cfg['native_decode'] = True
    ds = SemiDataset(cfg, 'train_l', id_path=paths['labeled'])
    assert ds.native_decode
    s = ds.get(0)
    # identical output to the PIL path (PNG is lossless, augs deterministic)
    cfg2 = synth_cfg(root)
    ds2 = SemiDataset(cfg2, 'train_l', id_path=paths['labeled'])
    s2 = ds2.get(0)
    np.testing.assert_allclose(s['img'], s2['img'], atol=1e-6)
    np.testing.assert_array_equal(s['mask'], s2['mask'])
