"""Core layers (NHWC, TPU-native).

TPU-native equivalents of the Torch7 layers the reference builds its models
from (/root/reference/models.lua): SpatialConvolution → ``Conv`` (XLA
``conv_general_dilated``, NHWC/HWIO so the channel dim rides the 128-lane MXU
axis), Linear → ``Dense``, (Spatial)BatchNormalization → ``BatchNorm`` with
optional cross-device ``axis_name`` sync, PReLU/LeakyReLU(1/3), Dropout /
SpatialDropout, Max/Avg pooling, nearest-neighbour upsampling, and the
reference's defined-but-unused ``SpatialConvolutionUpsample`` (sub-pixel conv,
layers/SpatialConvolutionUpsample.lua) and ``UnPooling`` (zero-stuffing,
layers/UnPooling.lua — without its string-key index-collision bug).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from catgen.core import initializers
from catgen.core.module import Module, Stateless, make_variables


# ---------------------------------------------------------------------------
# parametric layers
# ---------------------------------------------------------------------------


class Dense(Module):
    """Linear layer. weight-init per reference heuristic by default
    (weight-init.lua:64-65: fan_in = in_features, fan_out = out_features)."""

    def __init__(self, features: int, init: str = "heuristic",
                 use_bias: bool = True, dtype=jnp.float32):
        self.features = features
        self.init_method = init
        self.use_bias = use_bias
        self.dtype = dtype

    def init(self, key, x_shape):
        in_features = x_shape[-1]
        w_init = initializers.uniform_fan(self.init_method)
        params = {"kernel": w_init(key, (in_features, self.features),
                                   in_features, self.features, self.dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.features,), self.dtype)
        return make_variables(params)

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables["params"]
        y = jnp.dot(x, p["kernel"].astype(x.dtype))
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y, variables["state"]

    def out_shape(self, x_shape):
        return x_shape[:-1] + (self.features,)


class Conv(Module):
    """2-D convolution, NHWC input, HWIO kernel, 'same'-style padding of
    (k-1)/2 per side for odd kernels (matches the reference's explicit
    SpatialConvolution padding, models.lua passim).

    fan_in/fan_out for init follow weight-init.lua:54-55:
    fan_in = Cin*kh*kw, fan_out = Cout*kh*kw.
    """

    def __init__(self, features: int, kernel_size: Tuple[int, int] = (3, 3),
                 strides: Tuple[int, int] = (1, 1),
                 padding: Optional[Tuple[int, int]] = None,
                 init: str = "heuristic", use_bias: bool = True,
                 dtype=jnp.float32):
        self.features = features
        self.kernel_size = tuple(kernel_size)
        self.strides = tuple(strides)
        if padding is None:
            padding = ((self.kernel_size[0] - 1) // 2,
                       (self.kernel_size[1] - 1) // 2)
        self.padding = tuple(padding)
        self.init_method = init
        self.use_bias = use_bias
        self.dtype = dtype

    def init(self, key, x_shape):
        kh, kw = self.kernel_size
        cin = x_shape[-1]
        fan_in = cin * kh * kw
        fan_out = self.features * kh * kw
        w_init = initializers.uniform_fan(self.init_method)
        params = {"kernel": w_init(key, (kh, kw, cin, self.features),
                                   fan_in, fan_out, self.dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.features,), self.dtype)
        return make_variables(params)

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables["params"]
        ph, pw = self.padding
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        if (cin <= 4 and self.strides == (1, 1)
                and kh % 2 == 1 and kw % 2 == 1   # conv_small_cin precondition
                and (ph, pw) == ((kh - 1) // 2, (kw - 1) // 2)):
            from catgen.kernels import config as kconfig
            if kconfig.resolve_smallcin_impl() == "banded":
                from catgen.kernels.smallcin_conv import conv_small_cin
                bias = (p["bias"] if self.use_bias
                        else jnp.zeros((self.features,), p["kernel"].dtype))
                y = conv_small_cin(x, p["kernel"].astype(x.dtype),
                                   bias.astype(x.dtype))
                return y, variables["state"]
        # no preferred_element_type: TPU convs accumulate fp32 internally
        # for bf16 operands, and a f32-preferred output breaks the
        # transpose-rhs (kernel-gradient) rule under mixed precision
        y = lax.conv_general_dilated(
            x, p["kernel"].astype(x.dtype),
            window_strides=self.strides,
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y, variables["state"]

    def out_shape(self, x_shape):
        n, h, w, _ = x_shape
        kh, kw = self.kernel_size
        sh, sw = self.strides
        ph, pw = self.padding
        oh = (h + 2 * ph - kh) // sh + 1
        ow = (w + 2 * pw - kw) // sw + 1
        return (n, oh, ow, self.features)


class BatchNorm(Module):
    """BatchNorm over all axes except the last (channel/feature).

    Works for both NHWC (≡ SpatialBatchNormalization) and NF
    (≡ BatchNormalization) inputs. Torch defaults: eps 1e-5, momentum 0.1,
    affine. Running var stores the unbiased estimate; normalization uses the
    biased batch variance (Torch THNN semantics).

    ``axis_name``: when set and running under shard_map/pmap, batch statistics
    are synchronized across the mesh axis with ``lax.pmean`` — the DP-correct
    BN called for in SURVEY.md §2.3.
    """

    def __init__(self, momentum: float = 0.1, eps: float = 1e-5,
                 axis_name: Optional[str] = None, dtype=jnp.float32):
        self.momentum = momentum
        self.eps = eps
        self.axis_name = axis_name
        self.dtype = dtype

    def init(self, key, x_shape):
        del key
        c = x_shape[-1]
        params = {"scale": jnp.ones((c,), self.dtype),
                  "bias": jnp.zeros((c,), self.dtype)}
        state = {"mean": jnp.zeros((c,), self.dtype),
                 "var": jnp.ones((c,), self.dtype)}
        return make_variables(params, state)

    def apply(self, variables, x, *, train=False, rng=None):
        p, st = variables["params"], variables["state"]
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = math.prod(x.shape[:-1])
            if self.axis_name is not None:
                mean = lax.pmean(mean, self.axis_name)
                mean_sq = lax.pmean(mean_sq, self.axis_name)
                n = n * lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                "mean": ((1 - m) * st["mean"] + m * mean).astype(self.dtype),
                "var": ((1 - m) * st["var"] + m * unbiased).astype(self.dtype),
            }
        else:
            mean, var = st["mean"], st["var"]
            new_state = st
        inv = lax.rsqrt(var.astype(jnp.float32) + self.eps)
        scale = (p["scale"] * inv).astype(x.dtype)
        shift = (p["bias"] - p["scale"] * mean * inv).astype(x.dtype)
        return x * scale + shift, new_state

    def out_shape(self, x_shape):
        return x_shape


class PReLU(Module):
    """PReLU with a single shared slope (Torch nn.PReLU() default,
    init 0.25), used throughout the reference's G decoders and Ds
    (models.lua:94,112-222,286-698). ``channelwise=True`` gives one slope per
    channel."""

    def __init__(self, channelwise: bool = False, init_value: float = 0.25,
                 dtype=jnp.float32):
        self.channelwise = channelwise
        self.init_value = init_value
        self.dtype = dtype

    def init(self, key, x_shape):
        del key
        shape = (x_shape[-1],) if self.channelwise else (1,)
        return make_variables({"alpha": jnp.full(shape, self.init_value,
                                                 self.dtype)})

    def apply(self, variables, x, *, train=False, rng=None):
        alpha = variables["params"]["alpha"].astype(x.dtype)
        y = jnp.where(x >= 0, x, alpha * x)
        return y, variables["state"]

    def out_shape(self, x_shape):
        return x_shape


# ---------------------------------------------------------------------------
# stateless layers
# ---------------------------------------------------------------------------


class LeakyReLU(Stateless):
    """LeakyReLU with the reference's default slope 1/3
    (/root/reference/LeakyReLU.lua:9: 0.333)."""

    def __init__(self, negative_slope: float = 1.0 / 3.0):
        self.negative_slope = negative_slope

    def forward(self, x, *, train, rng):
        return jnp.where(x >= 0, x, self.negative_slope * x)


class Sigmoid(Stateless):
    def forward(self, x, *, train, rng):
        return jax.nn.sigmoid(x)


class Tanh(Stateless):
    def forward(self, x, *, train, rng):
        return jnp.tanh(x)


class Softmax(Stateless):
    def __init__(self, axis: int = -1):
        self.axis = axis

    def forward(self, x, *, train, rng):
        return jax.nn.softmax(x, axis=self.axis)


class Dropout(Stateless):
    """Inverted dropout (train-time 1/(1-p) scaling, eval = identity), the
    Torch nn.Dropout(v2) semantics. Default p=0.5."""

    def __init__(self, rate: float = 0.5):
        assert 0.0 <= rate < 1.0
        self.rate = rate

    def forward(self, x, *, train, rng):
        if not train or self.rate == 0.0:
            return x
        if rng is None:
            raise ValueError("Dropout needs an rng when train=True")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class SpatialDropout(Stateless):
    """Drops whole feature maps (channels), NHWC: mask shape (N,1,1,C).
    Torch nn.SpatialDropout default p=0.5."""

    def __init__(self, rate: float = 0.5):
        assert 0.0 <= rate < 1.0
        self.rate = rate

    def forward(self, x, *, train, rng):
        if not train or self.rate == 0.0:
            return x
        if rng is None:
            raise ValueError("SpatialDropout needs an rng when train=True")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class MaxPool(Stateless):
    def __init__(self, window: int = 2, stride: Optional[int] = None):
        self.window = window
        self.stride = stride or window

    def forward(self, x, *, train, rng):
        from catgen.kernels.maxpool import max_pool
        return max_pool(x, self.window, self.stride)

    def out_shape(self, x_shape):
        n, h, w, c = x_shape
        oh = (h - self.window) // self.stride + 1
        ow = (w - self.window) // self.stride + 1
        return (n, oh, ow, c)


class AvgPool(Stateless):
    def __init__(self, window: int = 2, stride: Optional[int] = None):
        self.window = window
        self.stride = stride or window

    def forward(self, x, *, train, rng):
        summed = lax.reduce_window(
            x, 0.0, lax.add,
            (1, self.window, self.window, 1),
            (1, self.stride, self.stride, 1),
            "VALID")
        return summed / (self.window * self.window)

    def out_shape(self, x_shape):
        n, h, w, c = x_shape
        oh = (h - self.window) // self.stride + 1
        ow = (w - self.window) // self.stride + 1
        return (n, oh, ow, c)


class UpsampleNearest(Stateless):
    """Nearest-neighbour 2x (or Nx) upsampling
    (≡ nn.SpatialUpSamplingNearest, models.lua:114-217). Prefer the fused
    ``catgen.kernels.upsample_conv`` path in G decoders; this standalone layer
    exists for parity and as a test reference."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def forward(self, x, *, train, rng):
        f = self.factor
        n, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, f, w, f, c))
        return x.reshape(n, h * f, w * f, c)

    def out_shape(self, x_shape):
        n, h, w, c = x_shape
        return (n, h * self.factor, w * self.factor, c)


class Flatten(Stateless):
    def forward(self, x, *, train, rng):
        return x.reshape(x.shape[0], -1)

    def out_shape(self, x_shape):
        return (x_shape[0], math.prod(x_shape[1:]))


class Reshape(Stateless):
    """Per-sample reshape (batch dim preserved). ``shape`` excludes batch.
    NHWC convention: the reference's ``nn.View(128, 8, 8)`` (CHW) becomes
    Reshape((8, 8, 128))."""

    def __init__(self, shape: Tuple[int, ...]):
        self.shape = tuple(shape)

    def forward(self, x, *, train, rng):
        return x.reshape((x.shape[0],) + self.shape)

    def out_shape(self, x_shape):
        return (x_shape[0],) + self.shape


class SubPixelConv(Module):
    """Convolution to Cout*f^2 channels followed by depth-to-space — the
    TPU-native form of the reference's fused upsampling conv
    (layers/SpatialConvolutionUpsample.lua:3-28, defined but unused by the
    current models; provided for parity)."""

    def __init__(self, features: int, factor: int = 2,
                 kernel_size: Tuple[int, int] = (3, 3),
                 init: str = "heuristic", dtype=jnp.float32):
        assert kernel_size[0] % 2 == 1 and kernel_size[1] % 2 == 1, (
            "kernel size must be odd")  # same assert as the reference layer
        self.features = features
        self.factor = factor
        self.conv = Conv(features * factor * factor, kernel_size,
                         init=init, dtype=dtype)

    def init(self, key, x_shape):
        return self.conv.init(key, x_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        y, st = self.conv.apply(variables, x, train=train, rng=rng)
        n, h, w, _ = y.shape
        f = self.factor
        y = y.reshape(n, h, w, f, f, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5)  # N,H,f,W,f,C
        y = y.reshape(n, h * f, w * f, self.features)
        return y, st

    def out_shape(self, x_shape):
        n, h, w, _ = x_shape
        f = self.factor
        return (n, h * f, w * f, self.features)


class UnPooling(Stateless):
    """Zero-stuffing unpool: each input pixel goes to the top-left of an
    f x f block (layers/UnPooling.lua:15-44, defined but unused; implemented
    without the reference's host loops or its ``ii..jj`` string-key collision
    bug, UnPooling.lua:37)."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def forward(self, x, *, train, rng):
        f = self.factor
        n, h, w, c = x.shape
        out = jnp.zeros((n, h, f, w, f, c), x.dtype)
        out = out.at[:, :, 0, :, 0, :].set(x)
        return out.reshape(n, h * f, w * f, c)

    def out_shape(self, x_shape):
        n, h, w, c = x_shape
        return (n, h * self.factor, w * self.factor, c)
