"""Pallas TPU kernel v2: separable bilinear sampling on the MXU.

The v1 kernel (pallas_bilinear.py) builds a dense one-hot matrix
M (Ho*Wo, H*W) per sample — the four broadcast compares over P x HW
dominate its cost when channels are small (the D32_st3 input ST samples a
32x32x**3** image). Bilinear weights are separable per axis:

    out[p,c] = sum_y A[p,y] * sum_x B[p,x] * img[y,x,c]

with A (P,H) and B (P,W) each holding two nonzeros per row. The kernel
computes, per sample,

    T    = B @ imgW                  (P,W) x (W, H*C)    stage-1 matmul
    out  = (Ae * T) @ S              (P,H*C) x (H*C, C)  stage-2 matmul

where imgW is the image in (x, y-major*c) layout, Ae broadcasts A over the
channel sublane (built directly at (P, H*C) via lane//C compares — no
reshapes), and S is a fixed 0/1 summation matrix. Mask-build cost drops
from O(P*HW) to O(P*(H+W)); all heavy ops are matmuls.

The backward runs the same algebra transposed (d_img = B^T @ (Ae*gB);
d_coords from dA/dfy, dB/dfx row-sums) — no scatters anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _coords_to_weights(crd, h, w):
    """crd (P,2) normalized -> (fy weights) A-parts and (fx weights)
    B-parts plus inclusion masks for the clip-zone gradient."""
    fy_raw = (crd[:, 0] + 1.0) * 0.5 * (h - 1)
    fx_raw = (crd[:, 1] + 1.0) * 0.5 * (w - 1)
    fy = jnp.clip(fy_raw, 0.0, h - 1)
    fx = jnp.clip(fx_raw, 0.0, w - 1)
    in_y = ((fy_raw >= 0.0) & (fy_raw <= h - 1)).astype(jnp.float32)
    in_x = ((fx_raw >= 0.0) & (fx_raw <= w - 1)).astype(jnp.float32)
    y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32)
    wy = fy - y0.astype(jnp.float32)
    wx = fx - x0.astype(jnp.float32)
    return y0, x0, wy, wx, in_y, in_x


def _fwd_kernel(h: int, w: int, c: int, ho: int, wo: int, bt: int):
    hw_c = h * c
    p = ho * wo

    def kernel_fn(img_ref, coords_ref, out_ref):
        lane_x = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
        lane_hc = jax.lax.broadcasted_iota(jnp.int32, (p, hw_c), 1)
        y_of_lane = lane_hc // c
        # fixed summation matrix S (H*C, C): S[y*C+cc, cc] = 1
        s_rows = jax.lax.broadcasted_iota(jnp.int32, (hw_c, c), 0) % c
        s_cols = jax.lax.broadcasted_iota(jnp.int32, (hw_c, c), 1)
        s_mat = (s_rows == s_cols).astype(jnp.float32)
        for s in range(bt):
            img_w = img_ref[s].astype(jnp.float32)        # (w, h*c)
            crd = coords_ref[s].reshape(p, 2).astype(jnp.float32)
            y0, x0, wy, wx, _, _ = _coords_to_weights(crd, h, w)
            b = ((lane_x == x0[:, None]) * (1 - wx)[:, None]
                 + (lane_x == x0[:, None] + 1) * wx[:, None])
            t = jnp.dot(b, img_w, preferred_element_type=jnp.float32)
            ae = ((y_of_lane == y0[:, None]) * (1 - wy)[:, None]
                  + (y_of_lane == y0[:, None] + 1) * wy[:, None])
            out = jnp.dot(ae * t, s_mat, preferred_element_type=jnp.float32)
            out_ref[s] = out.reshape(ho, wo, c).astype(out_ref.dtype)

    return kernel_fn


def _bwd_kernel(h: int, w: int, c: int, ho: int, wo: int, bt: int):
    hw_c = h * c
    p = ho * wo

    def kernel_fn(img_ref, coords_ref, g_ref, dimg_ref, dcrd_ref):
        lane_x = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
        lane_hc = jax.lax.broadcasted_iota(jnp.int32, (p, hw_c), 1)
        y_of_lane = lane_hc // c
        s_rows = jax.lax.broadcasted_iota(jnp.int32, (hw_c, c), 0) % c
        s_cols = jax.lax.broadcasted_iota(jnp.int32, (hw_c, c), 1)
        s_mat_t = (s_rows == s_cols).astype(jnp.float32).T   # (c, hw_c)
        for s in range(bt):
            img_w = img_ref[s].astype(jnp.float32)        # (w, h*c)
            g = g_ref[s].reshape(p, c).astype(jnp.float32)
            crd = coords_ref[s].reshape(p, 2).astype(jnp.float32)
            y0, x0, wy, wx, in_y, in_x = _coords_to_weights(crd, h, w)

            b = ((lane_x == x0[:, None]) * (1 - wx)[:, None]
                 + (lane_x == x0[:, None] + 1) * wx[:, None])
            ae = ((y_of_lane == y0[:, None]) * (1 - wy)[:, None]
                  + (y_of_lane == y0[:, None] + 1) * wy[:, None])
            g_b = jnp.dot(g, s_mat_t,
                          preferred_element_type=jnp.float32)  # (p, hw_c)

            # d_img in (w, h*c) layout; relayout happens outside
            d_imgw = jnp.dot(b.T, ae * g_b,
                             preferred_element_type=jnp.float32)
            dimg_ref[s] = d_imgw.astype(dimg_ref.dtype)

            # T for the dA path
            t = jnp.dot(b, img_w, preferred_element_type=jnp.float32)
            d_ae = ((y_of_lane == y0[:, None] + 1).astype(jnp.float32)
                    - (y_of_lane == y0[:, None]).astype(jnp.float32))
            dfy = jnp.sum(d_ae * t * g_b, axis=1)

            # U for the dB path: (Ae*gB) @ imgW^T
            u = jnp.dot(ae * g_b, img_w.T,
                        preferred_element_type=jnp.float32)   # (p, w)
            d_b = ((lane_x == x0[:, None] + 1).astype(jnp.float32)
                   - (lane_x == x0[:, None]).astype(jnp.float32))
            dfx = jnp.sum(d_b * u, axis=1)

            dy = dfy * in_y * (0.5 * (h - 1))
            dx = dfx * in_x * (0.5 * (w - 1))
            dcrd_ref[s] = jnp.stack([dy, dx], axis=1).reshape(
                ho, wo, 2).astype(dcrd_ref.dtype)

    return kernel_fn


def _auto_bt(n, h, w, c, ho, wo, budget=9 * 1024 * 1024) -> int:
    # account for the ~6 live (P, H*C) fp32 temporaries per in-flight sample
    per_sample = (2 * h * w * c + 2 * ho * wo * 2 + 2 * ho * wo * c
                  + 6 * ho * wo * h * c + 2 * ho * wo * w) * 4
    return max(min(int(budget // per_sample), n), 1)


def _forward(img, coords, batch_tile, interpret):
    n, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    bt = min(batch_tile if batch_tile > 0 else _auto_bt(n, h, w, c, ho, wo), n)
    while n % bt:
        bt -= 1
    img_w = img.transpose(0, 2, 1, 3).reshape(n, w, h * c)
    return pl.pallas_call(
        _fwd_kernel(h, w, c, ho, wo, bt),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, w, h * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ho, wo, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), img.dtype),
        interpret=interpret,
    )(img_w, coords)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_sep(img: jax.Array, coords: jax.Array,
                        batch_tile: int = 0,
                        interpret: bool = False) -> jax.Array:
    """Separable MXU bilinear sampler; same semantics as
    spatial_transformer.bilinear_sample."""
    return _forward(img, coords, batch_tile, interpret)


def _fwd(img, coords, batch_tile, interpret):
    return _forward(img, coords, batch_tile, interpret), (img, coords)


def _bwd(batch_tile, interpret, res, g):
    img, coords = res
    n, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    bt = min(batch_tile if batch_tile > 0
             else max(_auto_bt(n, h, w, c, ho, wo) // 2, 1), n)
    while n % bt:
        bt -= 1
    img_w = img.transpose(0, 2, 1, 3).reshape(n, w, h * c)
    dimg_w, dcrd = pl.pallas_call(
        _bwd_kernel(h, w, c, ho, wo, bt),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, w, h * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, w, h * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, w, h * c), img.dtype),
            jax.ShapeDtypeStruct((n, ho, wo, 2), coords.dtype),
        ),
        interpret=interpret,
    )(img_w, coords, g)
    dimg = dimg_w.reshape(n, w, h, c).transpose(0, 2, 1, 3)
    return dimg, dcrd


bilinear_sample_sep.defvjp(_fwd, _bwd)
