"""Non-overlapping max-pool with a mask-multiply backward.

Reference semantics: ``nn.SpatialMaxPooling(2, 2, 2, 2)`` in every D/V
model (models.lua:287,330,577-ff,640-711,765-804) — window == stride, no
overlap. XLA differentiates ``lax.reduce_window(max)`` with a
``select_and_scatter`` op, which is expensive on TPU (serialized
window-scan semantics). For the non-overlapping case the pool is just a
reshape + max over the intra-block axes, and the backward is an
elementwise compare + multiply:

    blocks = x.reshape(n, oh, s, ow, s, c)
    y      = blocks.max(axis=(2, 4))
    dx     = (blocks == y) * dy / ties      (broadcasted, no scatter)

Tie handling: ``select_and_scatter`` (and the Torch reference) route the
whole gradient to ONE of the tied maxima (first in scan order); this
formulation splits it evenly, preserving the gradient sum. With
continuous activations ties are measure-zero; the one systematic source
in these models — blocks zeroed by SpatialDropout — is gradient-dead
anyway (the dropout backward multiplies by the same zero mask), so the
split is observationally equivalent in training. tests/test_maxpool.py
asserts exact gradient equality against the reduce_window VJP on tie-free
inputs and sum preservation on ties.

Selection: ``CATGEN_MAXPOOL_BWD=mask|sas`` (kernels/config.py). ``auto``
resolves per measurement, recorded in KERNELS.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _crop_shapes(h: int, w: int, window: int, stride: int):
    oh = (h - window) // stride + 1
    ow = (w - window) // stride + 1
    return oh, ow


def max_pool_sas(x, window: int = 2, stride: int | None = None):
    """The plain XLA formulation (select_and_scatter backward)."""
    stride = stride or window
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_mask(x, window: int = 2):
    """Non-overlapping (stride == window) max pool, mask-multiply VJP."""
    y, _ = _mask_fwd(x, window)
    return y


def _blocks(x, window: int):
    n, h, w, c = x.shape
    oh, ow = _crop_shapes(h, w, window, window)
    xc = x[:, : oh * window, : ow * window, :]
    return xc.reshape(n, oh, window, ow, window, c), oh, ow


def _mask_fwd(x, window: int):
    b, _, _ = _blocks(x, window)
    y = b.max(axis=(2, 4))
    return y, (x, y)


def _mask_bwd(window: int, res, g):
    x, y = res
    n, h, w, c = x.shape
    b, oh, ow = _blocks(x, window)
    yb = y[:, :, None, :, None, :]
    mask = (b == yb).astype(g.dtype)
    ties = mask.sum(axis=(2, 4), keepdims=True)
    dxb = mask * (g[:, :, None, :, None, :] / ties)
    dx = dxb.reshape(n, oh * window, ow * window, c)
    if oh * window != h or ow * window != w:
        dx = jnp.pad(dx, ((0, 0), (0, h - oh * window),
                          (0, w - ow * window), (0, 0)))
    return (dx,)


max_pool_mask.defvjp(_mask_fwd, _mask_bwd)


def max_pool(x, window: int = 2, stride: int | None = None):
    """Dispatch: mask-multiply backward for the non-overlapping case when
    selected, select_and_scatter otherwise."""
    from catgen.kernels import config

    stride = stride or window
    if stride == window and config.resolve_maxpool_bwd() == "mask":
        return max_pool_mask(x, window)
    return max_pool_sas(x, window, stride)
