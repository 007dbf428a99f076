"""On-device image ops: resize + train-time augmentation.

The reference resizes on the host per image (``image.scale`` in
dataset.lua:98-99,127) and does all augmentation offline in Python
(generate_dataset.py:68-73). Here both run batched on-device as part of the
input pipeline: the host only decodes JPEGs once into a uint8 cache, and the
XLA stage does downscale / color conversion / random affine augmentation
(the "XLA-fused on-device augmentation" called for by BASELINE.json).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from catgen.nn.spatial_transformer import affine_grid, bilinear_sample


def downscale2(images: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x2 area-average downscale (64->32), NHWC."""
    n, h, w, c = images.shape
    x = images.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


@functools.lru_cache(maxsize=64)
def _resample_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """(n_out, n_in) align-corners bilinear resampling matrix — the exact
    row weights ``affine_grid`` (identity theta) + ``bilinear_sample``
    would gather: fy = i·(n_in−1)/(n_out−1), 2 taps per output row."""
    fy = (np.linspace(-1.0, 1.0, n_out) + 1.0) * 0.5 * (n_in - 1)
    fy = np.clip(fy, 0.0, max(n_in - 1, 0))
    if n_in > 1:
        y0 = np.clip(np.floor(fy), 0, n_in - 2).astype(np.int64)
    else:
        y0 = np.zeros(n_out, np.int64)
    y1 = np.minimum(y0 + 1, n_in - 1)
    wy = (fy - y0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    np.add.at(m, (np.arange(n_out), y0), 1.0 - wy)
    np.add.at(m, (np.arange(n_out), y1), wy)
    return m


def resize_bilinear(images: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize (align-corners), as two small matmuls — no gather.

    A resize's sample grid is STATIC, so the op is ``My @ img @ Mx^T``
    with 2-tap (out, in) interpolation matrices, and its VJP is the
    transposed matmuls (MXU both ways). The gather formulation this
    replaces was the entire 64px-step bottleneck: the RefineStage's 2×
    bilinear upsample lowered to 4 gathers forward and a sort +
    scatter-add VJP — 94 of the 136 ms step at bs=256 (KERNELS.md §6).
    Matches ``bilinear_sample(affine_grid(identity))`` to f32 rounding.
    """
    n, h, w, c = images.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return images
    my = jnp.asarray(_resample_matrix(h, oh))            # (oh, h)
    mx = jnp.asarray(_resample_matrix(w, ow))            # (ow, w)
    y = jnp.einsum("oh,nhwc->nowc", my, images.astype(jnp.float32))
    y = jnp.einsum("pw,nowc->nopc", mx, y)
    return y.astype(images.dtype)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """The reference's offline augmentation parameter set
    (generate_dataset.py:68-73): hflip 50%, equal-axis scale 0.93-1.08,
    rotation +-8 deg, translation +-4 px (at 64 px scale, rescaled to the
    actual image size), brightness +-15%, gaussian noise sigma 0.02."""
    hflip: bool = True
    scale_min: float = 0.93
    scale_max: float = 1.08
    rotation_deg: float = 8.0
    translation_px: float = 4.0
    translation_ref_size: int = 64
    brightness: float = 0.15
    noise_std: float = 0.02


def augment_batch(rng: jax.Array, images: jnp.ndarray,
                  config: AugmentConfig = AugmentConfig()) -> jnp.ndarray:
    """Applies one random augmentation per image, fully on device.

    images: (N,H,W,C) in [0,1]. The affine component (flip+scale+rot+trans)
    is a single bilinear warp; brightness/noise are fused elementwise ops.
    """
    n, h, w, _ = images.shape
    k_flip, k_scale, k_rot, k_tx, k_ty, k_bri, k_noise = jax.random.split(rng, 7)

    dtype = images.dtype
    scale = jax.random.uniform(k_scale, (n,), dtype,
                               config.scale_min, config.scale_max)
    angle = jax.random.uniform(
        k_rot, (n,), dtype,
        -config.rotation_deg, config.rotation_deg) * (jnp.pi / 180.0)
    tpx = config.translation_px * h / config.translation_ref_size
    # pixel translation -> normalized align-corners units
    tn = 2.0 * tpx / max(h - 1, 1)
    ty = jax.random.uniform(k_ty, (n,), dtype, -tn, tn)
    tx = jax.random.uniform(k_tx, (n,), dtype, -tn, tn)
    flip = jnp.where(
        jax.random.bernoulli(k_flip, 0.5, (n,)), -1.0, 1.0
    ).astype(dtype) if config.hflip else jnp.ones((n,), dtype)

    # inverse warp: sample-grid = (1/scale) * R(-angle) applied to output
    # coords, then translated; x axis additionally sign-flipped for hflip.
    inv = 1.0 / scale
    cos = jnp.cos(angle) * inv
    sin = jnp.sin(angle) * inv
    row0 = jnp.stack([cos, -sin * flip, ty], axis=-1)
    row1 = jnp.stack([sin, cos * flip, tx], axis=-1)
    theta = jnp.stack([row0, row1], axis=1)           # (N,2,3)
    from catgen.kernels import config as kconfig
    if (kconfig.resolve_sampler_impl() == "mxu"
            and kconfig.sampler_kernel == "v4"):
        # data path, no grads needed: the lane-wide Pallas sampler is
        # ~10x the gather formulation at 32x32x3 (KERNELS.md §2); bf16
        # operand rounding is immaterial under +-15% brightness noise
        from catgen.kernels.pallas_bilinear_v4 import bilinear_sample_rows
        from catgen.nn.spatial_transformer import affine_grid_rows
        rows = affine_grid_rows(theta, h, w).astype(dtype)
        out = bilinear_sample_rows(images, rows, (h, w))
    else:
        grid = affine_grid(theta, h, w)
        out = bilinear_sample(images, grid)

    # multiplicative brightness +-15%, matching the offline pipeline and the
    # reference (generate_dataset.py:73 via ImageAugmenter multiply semantics,
    # data/offline.py FaceImage.augment)
    bri = jax.random.uniform(k_bri, (n, 1, 1, 1), dtype,
                             -config.brightness, config.brightness)
    out = out * (1.0 + bri)
    if config.noise_std > 0:
        out = out + config.noise_std * jax.random.normal(
            k_noise, out.shape, dtype)
    return jnp.clip(out, 0.0, 1.0)
