"""Pallas TPU kernel: bilinear sampling as an MXU one-hot matmul.

The XLA sampler (catgen/nn/spatial_transformer.py) lowers to 4 gathers +
lerp. Gathers are serviced by the scalar/vector memory path on TPU; for the
ST's small grids (32x32, 16x16) the same computation can instead be phrased
as a sparse-weights matmul that rides the MXU:

    out[p, c] = sum_j M[p, j] * img[j, c],   M (Ho*Wo, H*W): <=4 nnz/row

M is built **inside VMEM per sample** from four broadcast compares (never
materialized in HBM — at B=1024 a dense M would be 4 GB), then one
(Ho*Wo, H*W) x (H*W, C) matmul per sample. This mirrors SURVEY.md §7's
"one-hot matmul for small 32x32 grids is competitive" design note.

The op is differentiable: backward reuses the XLA sampler's VJP (same
mathematical function), so the kernel is a pure forward-path accelerator
that can be dropped into the SpatialTransformer via
``catgen.kernels.config.use_mxu_sampler``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from catgen.nn import spatial_transformer as st_ref


def _sampler_kernel(h: int, w: int, c: int, ho: int, wo: int, bt: int):
    hw = h * w
    p = ho * wo

    def kernel_fn(img_ref, coords_ref, out_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (p, hw), 1)
        for s in range(bt):
            img = img_ref[s].reshape(hw, c)
            crd = coords_ref[s].reshape(p, 2).astype(jnp.float32)
            fy = (crd[:, 0] + 1.0) * 0.5 * (h - 1)
            fx = (crd[:, 1] + 1.0) * 0.5 * (w - 1)
            fy = jnp.clip(fy, 0.0, h - 1)
            fx = jnp.clip(fx, 0.0, w - 1)
            y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32)
            x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32)
            wy = (fy - y0.astype(jnp.float32))[:, None]
            wx = (fx - x0.astype(jnp.float32))[:, None]
            i00 = (y0 * w + x0)[:, None]
            m = ((cols == i00) * ((1 - wy) * (1 - wx))
                 + (cols == i00 + 1) * ((1 - wy) * wx)
                 + (cols == i00 + w) * (wy * (1 - wx))
                 + (cols == i00 + w + 1) * (wy * wx))
            out = jnp.dot(m.astype(jnp.float32),
                          img.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            out_ref[s] = out.reshape(ho, wo, c).astype(out_ref.dtype)

    return kernel_fn


def _forward(img: jax.Array, coords: jax.Array, batch_tile: int,
             interpret: bool) -> jax.Array:
    n, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    bt = min(batch_tile, n)
    while n % bt:
        bt -= 1
    kernel_fn = _sampler_kernel(h, w, c, ho, wo, bt)
    return pl.pallas_call(
        kernel_fn,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ho, wo, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), img.dtype),
        interpret=interpret,
    )(img, coords)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_mxu(img: jax.Array, coords: jax.Array,
                        batch_tile: int = 8,
                        interpret: bool = False) -> jax.Array:
    """Drop-in for spatial_transformer.bilinear_sample (same semantics:
    normalized (y,x) coords, border clamp), forward on the MXU."""
    return _forward(img, coords, batch_tile, interpret)


def _fwd(img, coords, batch_tile, interpret):
    return _forward(img, coords, batch_tile, interpret), (img, coords)


def _bwd(batch_tile, interpret, res, g):
    img, coords = res
    # same function, XLA formulation -> reuse its VJP for the backward
    _, vjp = jax.vjp(st_ref.bilinear_sample, img, coords)
    return vjp(g)


bilinear_sample_mxu.defvjp(_fwd, _bwd)
