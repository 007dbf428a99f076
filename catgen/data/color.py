"""Color-space conversions, vectorized on-device.

Rebuilds the per-image host loops of the reference
(/root/reference/utils/nn_utils.lua:188-278 and torch ``image.rgb2yuv`` /
``rgb2hsl``) as batched XLA ops on NHWC float tensors in [0,1].

  * ``y``: the reference's custom luma weights 0.21 R + 0.72 G + 0.07 B
    (nn_utils.lua:269-271) — NOT the BT.601 weights.
  * ``yuv``: torch image package BT.601 full-range matrices.
  * ``hsl``: standard HSL, all channels in [0,1] (hue wraps).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# numpy constants on purpose: module-level jnp.array would initialize the
# jax backend at import time, breaking late platform selection
# (cli.common.apply_platform)
_Y_WEIGHTS = np.array([0.21, 0.72, 0.07], np.float32)  # nn_utils.lua:269-271

_RGB2YUV = np.array([
    [0.299, 0.587, 0.114],
    [-0.14713, -0.28886, 0.436],
    [0.615, -0.51499, -0.10001],
], np.float32)
_YUV2RGB = np.array([
    [1.0, 0.0, 1.13983],
    [1.0, -0.39465, -0.58060],
    [1.0, 2.03211, 0.0],
], np.float32)


def rgb_to_y(images: jnp.ndarray) -> jnp.ndarray:
    """(N,H,W,3) -> (N,H,W,1) with the 0.21/0.72/0.07 mix."""
    return jnp.einsum("nhwc,c->nhw", images, _Y_WEIGHTS)[..., None]


def y_to_rgb(images: jnp.ndarray) -> jnp.ndarray:
    """(N,H,W,1) -> (N,H,W,3) by channel repeat (nn_utils.lua:205)."""
    return jnp.repeat(images, 3, axis=-1)


def rgb_to_yuv(images: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("nhwc,dc->nhwd", images, _RGB2YUV)


def yuv_to_rgb(images: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("nhwc,dc->nhwd", images, _YUV2RGB)


def rgb_to_hsl(images: jnp.ndarray) -> jnp.ndarray:
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) * 0.5
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(
        delta > 0,
        delta / jnp.where(l < 0.5, maxc + minc, 2.0 - maxc - minc + 1e-12),
        0.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, l], axis=-1)


def hsl_to_rgb(images: jnp.ndarray) -> jnp.ndarray:
    h, s, l = images[..., 0], images[..., 1], images[..., 2]
    q = jnp.where(l < 0.5, l * (1 + s), l + s - l * s)
    p = 2 * l - q

    def hue(t):
        t = t % 1.0
        return jnp.where(
            t < 1 / 6, p + (q - p) * 6 * t,
            jnp.where(t < 1 / 2, q,
                      jnp.where(t < 2 / 3, p + (q - p) * (2 / 3 - t) * 6, p)))

    r = hue(h + 1 / 3)
    g = hue(h)
    b = hue(h - 1 / 3)
    return jnp.stack([r, g, b], axis=-1)


_TO = {"rgb": lambda x: x, "y": rgb_to_y, "yuv": rgb_to_yuv,
       "hsl": rgb_to_hsl}
_FROM = {"rgb": lambda x: x, "y": y_to_rgb, "yuv": yuv_to_rgb,
         "hsl": hsl_to_rgb}


def rgb_to_colorspace(images: jnp.ndarray, colorspace: str) -> jnp.ndarray:
    """nn_utils.rgbToColorSpace (nn_utils.lua:223-249)."""
    try:
        return _TO[colorspace](images)
    except KeyError:
        raise ValueError(f"unknown color space {colorspace!r}")


def colorspace_to_rgb(images: jnp.ndarray, colorspace: str) -> jnp.ndarray:
    """nn_utils.toRgb (nn_utils.lua:188-221)."""
    try:
        return _FROM[colorspace](images)
    except KeyError:
        raise ValueError(f"unknown color space {colorspace!r}")


def channels(colorspace: str) -> int:
    return 1 if colorspace == "y" else 3


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] with clamping (nn_utils.lua:396-408). Off by default
    in training, like the reference (train.lua:51 NORMALIZE=false)."""
    return jnp.clip(images * 2.0 - 1.0, -1.0, 1.0)


def denormalize(images: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip((images + 1.0) * 0.5, 0.0, 1.0)
