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

The op is differentiable with its own Pallas backward (``_bwd_kernel``,
registered via custom_vjp below): d_img = M^T @ g and d_coords from four
corner one-hot matmuls — no scatters anywhere. Selectable via
``catgen.kernels.config.set_sampler_impl("mxu")`` +
``CATGEN_SAMPLER_KERNEL=v1``; the lane-wide tiled **v4** kernel is the
measured-fastest default (KERNELS.md §2), and this dense v1 form is kept
as the simplest measured baseline.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _auto_batch_tile(n, h, w, c, ho, wo,
                     budget_bytes=10 * 1024 * 1024) -> int:
    """Fit (double-buffered img+coords+out blocks) + the per-sample one-hot
    M matrix (Ho*Wo, H*W) fp32 into the VMEM budget."""
    per_sample = (2 * h * w * c + 2 * ho * wo * 2 + 2 * ho * wo * c
                  + ho * wo * h * w) * 4
    return max(min(int(budget_bytes // per_sample), n), 1)


def _forward(img: jax.Array, coords: jax.Array, batch_tile: int,
             interpret: bool) -> jax.Array:
    n, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    bt = min(batch_tile if batch_tile > 0
             else _auto_batch_tile(n, h, w, c, ho, wo), n)
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
                        batch_tile: int = 0,
                        interpret: bool = False) -> jax.Array:
    """Drop-in for spatial_transformer.bilinear_sample (same semantics:
    normalized (y,x) coords, border clamp), forward on the MXU."""
    return _forward(img, coords, batch_tile, interpret)


def _fwd(img, coords, batch_tile, interpret):
    return _forward(img, coords, batch_tile, interpret), (img, coords)


def _bwd_kernel(h: int, w: int, c: int, ho: int, wo: int, bt: int):
    """Backward: d_img = M^T @ g (matmul, no scatter); d_coords from the
    four corner values (four more one-hot matmuls) chained through the
    lerp weights."""
    hw = h * w
    p = ho * wo

    def kernel_fn(img_ref, coords_ref, g_ref, dimg_ref, dcrd_ref):
        cols_t = jax.lax.broadcasted_iota(jnp.int32, (hw, p), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (p, hw), 1)
        for s in range(bt):
            img = img_ref[s].reshape(hw, c).astype(jnp.float32)
            g = g_ref[s].reshape(p, c).astype(jnp.float32)
            crd = coords_ref[s].reshape(p, 2).astype(jnp.float32)
            fy_raw = (crd[:, 0] + 1.0) * 0.5 * (h - 1)
            fx_raw = (crd[:, 1] + 1.0) * 0.5 * (w - 1)
            fy = jnp.clip(fy_raw, 0.0, h - 1)
            fx = jnp.clip(fx_raw, 0.0, w - 1)
            in_y = ((fy_raw >= 0.0) & (fy_raw <= h - 1)).astype(jnp.float32)
            in_x = ((fx_raw >= 0.0) & (fx_raw <= w - 1)).astype(jnp.float32)
            y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32)
            x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32)
            wy = (fy - y0.astype(jnp.float32))[:, None]
            wx = (fx - x0.astype(jnp.float32))[:, None]
            i00c = (y0 * w + x0)[:, None]       # (p, 1)
            i00r = i00c.reshape(1, p)           # (1, p)

            # ---- d_img: M^T (hw, p) @ g (p, c)
            w00 = ((1 - wy) * (1 - wx)).reshape(1, p)
            w01 = ((1 - wy) * wx).reshape(1, p)
            w10 = (wy * (1 - wx)).reshape(1, p)
            w11 = (wy * wx).reshape(1, p)
            mt = ((cols_t == i00r) * w00
                  + (cols_t == i00r + 1) * w01
                  + (cols_t == i00r + w) * w10
                  + (cols_t == i00r + w + 1) * w11)
            dimg = jnp.dot(mt, g, preferred_element_type=jnp.float32)
            dimg_ref[s] = dimg.reshape(h, w, c).astype(dimg_ref.dtype)

            # ---- corner values via one-hot matmuls (p, c)
            v00 = jnp.dot((cols == i00c).astype(jnp.float32), img,
                          preferred_element_type=jnp.float32)
            v01 = jnp.dot((cols == i00c + 1).astype(jnp.float32), img,
                          preferred_element_type=jnp.float32)
            v10 = jnp.dot((cols == i00c + w).astype(jnp.float32), img,
                          preferred_element_type=jnp.float32)
            v11 = jnp.dot((cols == i00c + w + 1).astype(jnp.float32), img,
                          preferred_element_type=jnp.float32)
            dfy = jnp.sum(g * ((1 - wx) * (v10 - v00) + wx * (v11 - v01)),
                          axis=1)
            dfx = jnp.sum(g * ((1 - wy) * (v01 - v00) + wy * (v11 - v10)),
                          axis=1)
            # clip zones kill the gradient; chain to normalized coords
            dy = dfy * in_y * (0.5 * (h - 1))
            dx = dfx * in_x * (0.5 * (w - 1))
            dcrd = jnp.stack([dy, dx], axis=1)   # (p, 2)
            dcrd_ref[s] = dcrd.reshape(ho, wo, 2).astype(dcrd_ref.dtype)

    return kernel_fn


def _backward(img, coords, g, batch_tile: int, interpret: bool):
    n, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    bt = min(batch_tile if batch_tile > 0
             else max(_auto_batch_tile(n, h, w, c, ho, wo) // 2, 1), n)
    while n % bt:
        bt -= 1
    kernel_fn = _bwd_kernel(h, w, c, ho, wo, bt)
    dimg, dcrd = pl.pallas_call(
        kernel_fn,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, c), img.dtype),
            jax.ShapeDtypeStruct((n, ho, wo, 2), coords.dtype),
        ),
        interpret=interpret,
    )(img, coords, g)
    return dimg, dcrd


def _bwd(batch_tile, interpret, res, g):
    img, coords = res
    return _backward(img, coords, g, batch_tile, interpret)


bilinear_sample_mxu.defvjp(_fwd, _bwd)
