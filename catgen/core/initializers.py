"""Weight initializers.

Reimplements the four schemes of the reference's weight-init
(/root/reference/weight-init.lua:14-37): each returns a scale ``std`` and the
weight is drawn uniform(-std, std) (Torch ``reset`` semantics); biases are
zeroed (weight-init.lua:70-72).

fan_in / fan_out conventions (weight-init.lua:54-65):
  * conv:   fan_in = in_channels * kh * kw, fan_out = out_channels * kh * kw
  * linear: fan_in = in_features,           fan_out = out_features
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

InitFn = Callable[[jax.Array, tuple, jnp.dtype], jax.Array]


def _scale_heuristic(fan_in: int, fan_out: int) -> float:
    # "Efficient backprop", LeCun 1998 (weight-init.lua:14-16)
    return math.sqrt(1.0 / (3.0 * fan_in))


def _scale_xavier(fan_in: int, fan_out: int) -> float:
    return math.sqrt(2.0 / (fan_in + fan_out))


def _scale_xavier_caffe(fan_in: int, fan_out: int) -> float:
    return math.sqrt(1.0 / fan_in)


def _scale_kaiming(fan_in: int, fan_out: int) -> float:
    # note: the reference's "kaiming" is sqrt(4/(fan_in+fan_out))
    # (weight-init.lua:35-37), not the usual sqrt(2/fan_in); we match it.
    return math.sqrt(4.0 / (fan_in + fan_out))


_SCALES = {
    "heuristic": _scale_heuristic,
    "xavier": _scale_xavier,
    "xavier_caffe": _scale_xavier_caffe,
    "kaiming": _scale_kaiming,
}


def uniform_fan(method: str) -> Callable[[jax.Array, tuple, int, int, jnp.dtype], jax.Array]:
    """Returns init(key, shape, fan_in, fan_out, dtype) -> uniform(-std, std)."""
    try:
        scale_fn = _SCALES[method]
    except KeyError:
        raise ValueError(f"unknown init method {method!r}; options: {sorted(_SCALES)}")

    def init(key, shape, fan_in, fan_out, dtype=jnp.float32):
        std = scale_fn(fan_in, fan_out)
        return jax.random.uniform(key, shape, dtype, minval=-std, maxval=std)

    return init


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init
