"""Image augmentation ops in pure jnp (device-side AutoAugment).

The reference applies AutoAugment per sample on the host with PIL/cv2
(aug/cpu/*.py); at >=5k img/s that needs a rack of CPU cores. Here every op
is a jittable function over float32 [H, W, 3] images in [0, 1], vmappable
over the batch, so the whole augmentation pipeline fuses into the input side
of the train step (AUG.SINGLE_AUG_DEVICE='device').

Magnitude semantics follow timm's AutoAugment conventions (magnitude 0-10):
rotate <=30deg, shear <=0.3, translate <=0.45*size, enhance factors 1±0.9m/10
with random sign, posterize bit ranges, solarize thresholds.

Geometric ops use bilinear resampling via jax.scipy.ndimage.map_coordinates;
Equalize/AutoContrast quantize to 256 bins with vectorized histogram math.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_MAX_MAG = 10.0


def _rand_sign(rng):
    return jnp.where(jax.random.bernoulli(rng, 0.5), 1.0, -1.0)


# ---------------------------------------------------------------- geometric
def _affine_sample(img: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply inverse-affine 2x3 matrix (maps output coords -> input coords)."""
    H, W, C = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yc, xc = ys - cy, xs - cx
    src_y = matrix[0, 0] * yc + matrix[0, 1] * xc + matrix[0, 2] + cy
    src_x = matrix[1, 0] * yc + matrix[1, 1] * xc + matrix[1, 2] + cx
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def one_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="constant", cval=0.5
        ).reshape(H, W)

    return jnp.stack([one_channel(img[..., c]) for c in range(C)], axis=-1)


def rotate(img, magnitude, rng):
    angle = jnp.deg2rad(30.0 * magnitude / _MAX_MAG) * _rand_sign(rng)
    c, s = jnp.cos(angle), jnp.sin(angle)
    m = jnp.array([[c, -s, 0.0], [s, c, 0.0]])
    return _affine_sample(img, m)


def shear_x(img, magnitude, rng):
    k = 0.3 * magnitude / _MAX_MAG * _rand_sign(rng)
    m = jnp.array([[1.0, 0.0, 0.0], [k, 1.0, 0.0]])
    return _affine_sample(img, m)


def shear_y(img, magnitude, rng):
    k = 0.3 * magnitude / _MAX_MAG * _rand_sign(rng)
    m = jnp.array([[1.0, k, 0.0], [0.0, 1.0, 0.0]])
    return _affine_sample(img, m)


def translate_x_rel(img, magnitude, rng):
    shift = 0.45 * magnitude / _MAX_MAG * img.shape[1] * _rand_sign(rng)
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, shift]])
    return _affine_sample(img, m)


def translate_y_rel(img, magnitude, rng):
    shift = 0.45 * magnitude / _MAX_MAG * img.shape[0] * _rand_sign(rng)
    m = jnp.array([[1.0, 0.0, shift], [0.0, 1.0, 0.0]])
    return _affine_sample(img, m)


# ------------------------------------------------------------------- color
def _grayscale(img):
    w = jnp.array([0.299, 0.587, 0.114])
    g = (img * w).sum(-1, keepdims=True)
    return jnp.broadcast_to(g, img.shape)


def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def _enhance_factor(magnitude, rng):
    return 1.0 + 0.9 * magnitude / _MAX_MAG * _rand_sign(rng)


def color(img, magnitude, rng):
    return _blend(img, _grayscale(img), _enhance_factor(magnitude, rng))


def contrast(img, magnitude, rng):
    mean = _grayscale(img).mean()
    return _blend(img, jnp.full_like(img, mean), _enhance_factor(magnitude, rng))


def brightness(img, magnitude, rng):
    return _blend(img, jnp.zeros_like(img), _enhance_factor(magnitude, rng))


def sharpness(img, magnitude, rng):
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = _conv2d_same(img, kernel)
    return _blend(img, blurred, _enhance_factor(magnitude, rng))


def desaturate(img, magnitude, rng):
    del rng
    return _blend(_grayscale(img), img, magnitude / _MAX_MAG)


def invert(img, magnitude, rng):
    del magnitude, rng
    return 1.0 - img


def solarize(img, magnitude, rng):
    del rng
    threshold = 1.0 - magnitude / _MAX_MAG
    return jnp.where(img >= threshold, 1.0 - img, img)


def solarize_add(img, magnitude, rng):
    del rng
    add = (110.0 / 255.0) * magnitude / _MAX_MAG
    return jnp.where(img < 0.5, jnp.clip(img + add, 0.0, 1.0), img)


def posterize_original(img, magnitude, rng):
    del rng
    bits = 4 + jnp.floor(4 * (1 - magnitude / _MAX_MAG)).astype(jnp.int32)
    return _posterize_bits(img, bits)


def posterize_increasing(img, magnitude, rng):
    del rng
    bits = 8 - jnp.floor(4 * magnitude / _MAX_MAG).astype(jnp.int32)
    return _posterize_bits(img, bits)


def _posterize_bits(img, bits):
    levels = jnp.power(2.0, bits.astype(jnp.float32))
    q = jnp.floor(img * 255.0 / (256.0 / levels)) * (256.0 / levels)
    return jnp.clip(q / 255.0, 0.0, 1.0)


def autocontrast(img, magnitude, rng):
    del magnitude, rng

    def per_channel(ch):
        lo, hi = ch.min(), ch.max()
        scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
        return jnp.clip((ch - lo) * scale, 0.0, 1.0)

    return jnp.stack([per_channel(img[..., c]) for c in range(3)], axis=-1)


def equalize(img, magnitude, rng):
    del magnitude, rng

    def per_channel(ch):
        q = jnp.clip((ch * 255.0).astype(jnp.int32), 0, 255)
        hist = jnp.bincount(q.ravel(), length=256).astype(jnp.float32)
        # PIL-style: step = (total - last_nonzero_bin) // 255
        nonzero = hist > 0
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = (hist.sum() - hist[last_idx]) / 255.0
        cdf = jnp.cumsum(hist)
        lut = jnp.where(
            step > 0,
            jnp.clip((cdf - hist / 2.0) / jnp.maximum(step, 1e-8), 0, 255),
            jnp.arange(256, dtype=jnp.float32),
        )
        return lut[q] / 255.0

    return jnp.stack([per_channel(img[..., c]) for c in range(3)], axis=-1)


def _conv2d_same(img, kernel):
    k = kernel[..., None, None]  # (kh, kw, 1, 1)
    out = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],  # (C, 1, H, W)
        k.transpose(2, 3, 0, 1),  # (1, 1, kh, kw)
        window_strides=(1, 1),
        padding="SAME",
    )
    return out[:, 0].transpose(1, 2, 0)


def gaussian_blur_rand(img, magnitude, rng):
    max_sigma = jnp.maximum(2.0 * magnitude / _MAX_MAG, 0.1)
    sigma = jax.random.uniform(rng, (), minval=0.1, maxval=max_sigma)
    radius = 4
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1d = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k1d = k1d / k1d.sum()
    kernel = jnp.outer(k1d, k1d)
    return _conv2d_same(img, kernel)


def random_erasing(img, rng, area_range=(0.02, 0.4), aspect_range=(0.3, 3.3),
                   mode: str = "pixel"):
    """Erase one random rectangle (reference: aug/base.py RandomErasing)."""
    H, W, C = img.shape
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    area = jax.random.uniform(r1, (), minval=area_range[0], maxval=area_range[1])
    log_ar = jax.random.uniform(
        r2, (), minval=jnp.log(aspect_range[0]), maxval=jnp.log(aspect_range[1])
    )
    aspect = jnp.exp(log_ar)
    target = area * H * W
    eh = jnp.clip(jnp.sqrt(target * aspect), 1, H - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(target / aspect), 1, W - 1).astype(jnp.int32)
    y0 = jax.random.randint(r3, (), 0, H - eh + 1)
    x0 = jax.random.randint(r4, (), 0, W - ew + 1)
    ys = jnp.arange(H)[:, None, None]
    xs = jnp.arange(W)[None, :, None]
    mask = (ys >= y0) & (ys < y0 + eh) & (xs >= x0) & (xs < x0 + ew)
    if mode == "pixel":
        fill = jax.random.normal(r5, img.shape) * 0.2 + 0.5
    else:
        fill = jnp.zeros_like(img)
    return jnp.where(mask, jnp.clip(fill, 0.0, 1.0), img)


def color_jitter(img, rng, strength: float = 0.4):
    """Random brightness/contrast/saturation jitter (AUG.AUTOAUG.COLOR_JITTER)."""
    rb, rc, rs = jax.random.split(rng, 3)

    def factor(r):
        return jax.random.uniform(r, (), minval=1 - strength, maxval=1 + strength)

    img = jnp.clip(img * factor(rb), 0.0, 1.0)
    mean = _grayscale(img).mean()
    img = jnp.clip(mean + (img - mean) * factor(rc), 0.0, 1.0)
    gray = _grayscale(img)
    img = jnp.clip(gray + (img - gray) * factor(rs), 0.0, 1.0)
    return img


OP_REGISTRY: dict[str, Callable] = {
    "Rotate": rotate,
    "ShearX": shear_x,
    "ShearY": shear_y,
    "TranslateXRel": translate_x_rel,
    "TranslateYRel": translate_y_rel,
    "Color": color,
    "Contrast": contrast,
    "Brightness": brightness,
    "Sharpness": sharpness,
    "Desaturate": desaturate,
    "Invert": invert,
    "Solarize": solarize,
    "SolarizeAdd": solarize_add,
    "PosterizeOriginal": posterize_original,
    "PosterizeIncreasing": posterize_increasing,
    "AutoContrast": autocontrast,
    "Equalize": equalize,
    "GaussianBlurRand": gaussian_blur_rand,
}
