"""On-device photometric strong augmentation.

The reference runs ColorJitter/grayscale/blur on the host via PIL
(semi.py:85-97) — on this runtime the host has a single CPU core, so the
strong augs move onto the TPU: the dataset ships ONE [0,1] RGB weak crop per
sample and the fused train step derives both strong views in-graph
(vectorised elementwise ops + separable gaussian blur). Distribution parity
with torchvision:

- ColorJitter(0.5, 0.5, 0.5, 0.25) with per-op uniform factors and a random
  op order (all 24 permutations, lax.switch), applied with p=0.8;
- RandomGrayscale(p=0.2) via ITU-R 601 luma;
- GaussianBlur sigma ~ U[0.1, 2] with p=0.5 (13-tap separable kernel);
- ImageNet normalisation fused at the end.

Differences from PIL (uint8 quantisation, PIL's approximate gaussian) are
distribution-level only (SURVEY.md §7 "aug parity").
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_PERMS = list(itertools.permutations(range(4)))  # 24 op orders


def _luma(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1]
            + 0.114 * x[..., 2])[..., None]


def _adjust_brightness(x, f):
    return x * f


def _adjust_contrast(x, f):
    # torchvision: blend with the mean of the grayscale image
    mean = jnp.mean(_luma(x), axis=(-3, -2, -1), keepdims=True)
    return (x - mean) * f + mean


def _adjust_saturation(x, f):
    g = _luma(x)
    return (x - g) * f + g


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    # branchless formulation (f(n) = v - v*s*clip(min(k, 4-k), 0, 1) with
    # k = (n + 6h) mod 6): pure VPU arithmetic. The previous jnp.choose
    # sextet lowered to gathers costing ~25 ms per 2x512^2 batch on TPU.
    def chan(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def _adjust_hue(x, f):
    h, s, v = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    return _hsv_to_rgb((h + f) % 1.0, s, v)


def _color_jitter_one(rng, img, brightness=0.5, contrast=0.5, saturation=0.5,
                      hue=0.25):
    """Single image (H, W, 3) in [0,1]."""
    kb, kc, ks, kh, kp = jax.random.split(rng, 5)
    fb = jax.random.uniform(kb, (), minval=max(0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    # Random op order, evaluated as 4 sequential stages each selecting one
    # of the 4 ops. Same composition semantics (and the same RNG stream) as
    # a lax.switch over all 24 permutations, but under vmap the switch
    # evaluates EVERY branch for the whole batch — 96 op applications per
    # sample (measured 404 ms for a 2x512^2 batch); this form does 16.
    perm_idx = jax.random.randint(kp, (), 0, len(_PERMS))
    perm = jnp.asarray(np.asarray(_PERMS, np.int32))[perm_idx]

    def stage(im, op_id):
        outs = jnp.stack([
            jnp.clip(_adjust_brightness(im, fb), 0.0, 1.0),
            jnp.clip(_adjust_contrast(im, fc), 0.0, 1.0),
            jnp.clip(_adjust_saturation(im, fs), 0.0, 1.0),
            _adjust_hue(im, fh)])
        return outs[op_id]

    for s in range(4):
        img = stage(img, perm[s])
    return img


def _gaussian_blur_one(rng, img, taps=13):
    """Separable gaussian blur, sigma ~ U[0.1, 2], replicate padding."""
    sigma = jax.random.uniform(rng, (), minval=0.1, maxval=2.0)
    half = taps // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs / sigma) ** 2)
    w = w / jnp.sum(w)

    def blur_axis(x, axis):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (half, half)
        xp = jnp.pad(x, pads, mode='edge')
        out = jnp.zeros_like(x)
        for k in range(taps):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(k, k + x.shape[axis])
            out = out + w[k] * xp[tuple(sl)]
        return out

    return blur_axis(blur_axis(img, 0), 1)


def strong_augment(rng, imgs):
    """Batch (B, H, W, 3) [0,1] -> ImageNet-normalised strong views.

    Per sample: ColorJitter p=0.8, grayscale p=0.2, blur p=0.5
    (reference semi.py:87-97).
    """
    def one(rng, img):
        k_cj, k_cjp, k_gs, k_gsp, k_bl, k_blp = jax.random.split(rng, 6)
        jittered = _color_jitter_one(k_cj, img)
        img = jnp.where(jax.random.uniform(k_cjp) < 0.8, jittered, img)
        gray = jnp.broadcast_to(_luma(img), img.shape)
        img = jnp.where(jax.random.uniform(k_gsp) < 0.2, gray, img)
        blurred = _gaussian_blur_one(k_bl, img)
        img = jnp.where(jax.random.uniform(k_blp) < 0.5, blurred, img)
        return img

    rngs = jax.random.split(rng, imgs.shape[0])
    out = jax.vmap(one)(rngs, imgs)
    return normalize_imagenet(out)


def photometric_distortion(rng, imgs):
    """Batch (B, H, W, 3) [0,1] -> distorted [0,1].

    mmseg PhotoMetricDistortion parity in [0,1] scale (the reference applies
    it to labeled Cityscapes crops, semi.py:79-82): brightness delta 32/255,
    contrast [0.5, 1.5] applied randomly before or after the saturation/hue
    pair, saturation [0.5, 1.5], hue +-18/360 — each op with p=0.5.
    Saturation uses the same luma blend as the host path (distribution-level
    parity with mmseg's HSV scaling).
    """
    def one(rng, img):
        ks = jax.random.split(rng, 9)
        delta = jax.random.uniform(ks[0], (), minval=-32 / 255,
                                   maxval=32 / 255)
        img = jnp.where(jax.random.bernoulli(ks[1]),
                        jnp.clip(img + delta, 0.0, 1.0), img)
        contrast_last = jax.random.bernoulli(ks[2])
        alpha = jax.random.uniform(ks[3], (), minval=0.5, maxval=1.5)
        apply_contrast = jax.random.bernoulli(ks[4])
        contrasted = lambda im: jnp.clip(im * alpha, 0.0, 1.0)
        img = jnp.where(apply_contrast & ~contrast_last, contrasted(img), img)
        fs = jax.random.uniform(ks[5], (), minval=0.5, maxval=1.5)
        img = jnp.where(jax.random.bernoulli(ks[6]),
                        jnp.clip(_adjust_saturation(img, fs), 0.0, 1.0), img)
        fh = jax.random.uniform(ks[7], (), minval=-18 / 360, maxval=18 / 360)
        img = jnp.where(jax.random.bernoulli(ks[8]), _adjust_hue(img, fh),
                        img)
        img = jnp.where(apply_contrast & contrast_last, contrasted(img), img)
        return img

    rngs = jax.random.split(rng, imgs.shape[0])
    return jax.vmap(one)(rngs, imgs)


def normalize_imagenet(imgs):
    mean = jnp.asarray(IMAGENET_MEAN, imgs.dtype)
    std = jnp.asarray(IMAGENET_STD, imgs.dtype)
    return (imgs - mean) / std
