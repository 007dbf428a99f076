"""Laplacian-pyramid refinement stage: 32x32 -> 64x64 upscale-and-sharpen.

BASELINE.json config #4. The reference's README frames its single G as "a
full Laplacian pyramid in one network" (README.md:156-188) and stops at
32x32; this stage extends the pyramid one level the same way LAPGAN-style
refiners do: the coarse image is bilinearly upsampled to 64x64 and a
conv net predicts a bounded residual ("sharpening") on top of it:

    out = clip(upsample(x) + 0.5 * tanh(residual), 0, 1)

The residual head sees both the learned features (fused upsample-conv
path) and the upsampled base (skip concat). ``create_G64_stack`` composes
noise -> G32up-c -> refine into one 64x64 generator trainable end-to-end
against a 64px D (``create_D64``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from catgen.core.module import (Module, Sequential, child_variables,
                                merge_variables)
from catgen.kernels.upsample_conv import UpsampleConv
from catgen.nn.layers import BatchNorm, Conv, Dropout, Dense, Flatten, \
    PReLU, Sigmoid, SpatialDropout, AvgPool
from catgen.models.zoo import ImageShape, create_G_decoder_upsampling32c


def _upsample2_bilinear(x: jax.Array) -> jax.Array:
    from catgen.data.ops import resize_bilinear

    n, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w))


class RefineStage(Module):
    """32x32xC image -> 64x64xC refined image."""

    def __init__(self, channels: int, width: int = 64,
                 axis_name: Optional[str] = None):
        self.channels = channels
        self.trunk = Sequential([
            Conv(width, (3, 3)), PReLU(),
            UpsampleConv(width, (5, 5)), BatchNorm(axis_name=axis_name),
            PReLU(),
            Conv(width // 2, (3, 3)), PReLU(),
        ], name="trunk")
        self.head = Conv(channels, (3, 3))

    def init(self, key, x_shape):
        k1, k2 = jax.random.split(key)
        trunk_vars = self.trunk.init(k1, x_shape)
        trunk_out = self.trunk.out_shape(x_shape)
        head_in = trunk_out[:-1] + (trunk_out[-1] + self.channels,)
        head_vars = self.head.init(k2, head_in)
        return merge_variables({"trunk": trunk_vars, "head": head_vars})

    def apply(self, variables, x, *, train=False, rng=None):
        base = _upsample2_bilinear(x)
        feats, trunk_state = self.trunk.apply(
            child_variables(variables, "trunk"), x, train=train, rng=rng)
        h = jnp.concatenate([feats, base.astype(feats.dtype)], axis=-1)
        residual, head_state = self.head.apply(
            child_variables(variables, "head"), h, train=train, rng=rng)
        out = jnp.clip(base + 0.5 * jnp.tanh(residual), 0.0, 1.0)
        return out, {"trunk": trunk_state, "head": head_state}

    def out_shape(self, x_shape):
        n, h, w, _ = x_shape
        return (n, 2 * h, 2 * w, self.channels)

    @property
    def name(self):
        return "RefineStage"


def create_G_refine64(image: ImageShape, noise_dim: int = 100,
                      axis_name: Optional[str] = None) -> Module:
    """Standalone refinement stage (consumes 32x32 images)."""
    del noise_dim
    return RefineStage(image[2], axis_name=axis_name)


def create_G64_stack(image: ImageShape, noise_dim: int,
                     axis_name: Optional[str] = None) -> Module:
    """noise -> G32up-c -> refine -> 64x64 image, one generator."""
    h, w, c = image
    assert (h, w) == (64, 64), "stacked generator emits 64x64"
    base = create_G_decoder_upsampling32c((32, 32, c), noise_dim, axis_name)
    refine = RefineStage(c, axis_name=axis_name)
    return Sequential([base, refine], name="G64_stack")


def create_D64(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """64px discriminator, D32e-topology (models.lua:526-569) with one
    extra stride-2 stage for the larger input."""
    return Sequential([
        Conv(64, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(256, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(256, (3, 3)), PReLU(), SpatialDropout(0.5),
        Flatten(),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(512), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D64")
