"""On-device augmentation tests: value ranges, stochastic behavior, and
distribution sanity against torchvision-like expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.ops.augment import (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_hue,
    _adjust_saturation,
    _gaussian_blur_one,
    normalize_imagenet,
    strong_augment,
)


def test_adjust_ops_blend_semantics(rng):
    """torchvision blend formulas: brightness toward black, contrast toward
    the grayscale mean, saturation toward grayscale (torchvision is not
    installed here, so assert the formulas directly)."""
    img = rng.rand(16, 16, 3).astype(np.float32)
    j = jnp.asarray(img)

    np.testing.assert_allclose(np.asarray(_adjust_brightness(j, 0.6)),
                               img * 0.6, atol=1e-6)
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]
    np.testing.assert_allclose(np.asarray(_adjust_saturation(j, 0.0)),
                               np.broadcast_to(gray, img.shape), atol=1e-5)
    mean = gray.mean()
    np.testing.assert_allclose(np.asarray(_adjust_contrast(j, 0.0)),
                               np.full_like(img, mean), atol=1e-5)
    # identity factors are no-ops
    for op in (_adjust_brightness, _adjust_contrast, _adjust_saturation):
        np.testing.assert_allclose(np.asarray(op(j, 1.0)), img, atol=1e-5)
    # hue: roundtrip sanity (shift then unshift)
    h1 = _adjust_hue(j, 0.2)
    h2 = _adjust_hue(h1, -0.2)
    np.testing.assert_allclose(np.asarray(h2), img, atol=1e-3)
    np.testing.assert_allclose(np.asarray(_adjust_hue(j, 0.0)), img,
                               atol=1e-3)


def test_blur_preserves_mean(rng):
    img = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    out = _gaussian_blur_one(jax.random.PRNGKey(0), img)
    assert abs(float(out.mean()) - float(img.mean())) < 1e-2
    assert float(jnp.var(out)) < float(jnp.var(img))


@pytest.mark.slow
def test_strong_augment_batch(rng):
    imgs = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    out1 = strong_augment(jax.random.PRNGKey(0), imgs)
    out2 = strong_augment(jax.random.PRNGKey(1), imgs)
    assert out1.shape == imgs.shape
    # normalised stats: not in [0,1] anymore
    assert float(out1.min()) < -0.5
    # stochastic across keys, deterministic per key
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-3
    out1b = strong_augment(jax.random.PRNGKey(0), imgs)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))
    # per-sample independence: sample 0 differs from sample 1's augs
    assert np.abs(np.asarray(out1[0]) - np.asarray(out1[1])).max() > 1e-3


@pytest.mark.slow
def test_photometric_distortion_stats(rng):
    """Distribution-level parity with the host mmseg-style PMD: same image,
    many independent draws, per-channel output means agree."""
    from PIL import Image
    from semivl_tpu.data.transforms import photometric_distortion as host_pmd
    from semivl_tpu.ops.augment import photometric_distortion

    img_u8 = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    n = 400
    imgs = jnp.broadcast_to(jnp.asarray(img_u8 / 255.0, jnp.float32),
                            (n, 24, 24, 3))
    dev = np.asarray(photometric_distortion(jax.random.PRNGKey(0), imgs))
    assert dev.min() >= 0.0 and dev.max() <= 1.0
    # deterministic per key, stochastic across samples
    dev2 = np.asarray(photometric_distortion(jax.random.PRNGKey(0), imgs))
    np.testing.assert_array_equal(dev, dev2)
    assert np.abs(dev[0] - dev[1]).max() > 1e-4

    rs = np.random.RandomState(0)
    host = np.stack([
        np.asarray(host_pmd(Image.fromarray(img_u8), rs), np.float32) / 255.0
        for _ in range(n)])
    np.testing.assert_allclose(dev.mean(axis=(0, 1, 2)),
                               host.mean(axis=(0, 1, 2)), atol=0.02)
    np.testing.assert_allclose(dev.std(), host.std(), atol=0.03)


def test_normalize_imagenet_matches_host():
    from semivl_tpu.data.transforms import normalize
    from PIL import Image
    arr = np.full((4, 4, 3), 128, np.uint8)
    host = normalize(Image.fromarray(arr))
    dev = np.asarray(normalize_imagenet(jnp.asarray(arr / 255.0,
                                                    jnp.float32)))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_dataset_on_device_mode(tmp_path):
    from synth_data import make_synth_dataset, synth_cfg
    from semivl_tpu.data.dataset import SemiDataset
    root = str(tmp_path)
    paths = make_synth_dataset(root)
    cfg = synth_cfg(root)
    cfg['strong_aug_on_device'] = True
    ds = SemiDataset(cfg, 'train_u', id_path=paths['unlabeled'])
    s = ds.get(0)
    assert set(s) == {'img_raw', 'ignore_mask', 'cutmix_box1', 'cutmix_box2'}
    # uint8 transport: 4x less host->device traffic
    assert s['img_raw'].dtype == np.uint8
    ds_l = SemiDataset(cfg, 'train_l', id_path=paths['labeled'])
    sl = ds_l.get(0)
    assert sl['img_u8'].dtype == np.uint8
