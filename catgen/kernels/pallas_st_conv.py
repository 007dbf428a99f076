"""Pallas TPU kernel: fused input-ST sampling + first conv + PReLU.

D32_st3 opens with [SpatialTransformer -> Conv(64, 3x3) -> PReLU]
(models.lua:643-652): an affine resample of the 32x32x**3** input followed
by a conv whose C=3 input channel count is pathological for XLA on TPU —
the round-2 device traces attribute ~2.2 ms/step to layout copies around
the C=3 conv pair (KERNELS.md §5). This kernel runs the whole prefix in
one pass:

  * **in-kernel affine grid**: the kernel takes theta (N, 2, 3) and builds
    the normalized sample coordinates for its pixel tile from a lane iota
    (exactly ``affine_grid_rows`` math) — no coords array, no halo
    materialization, and the *extended* tile (+/- one image row of halo)
    needed by the conv costs only arithmetic.
  * **v4 separable sampling** (same math/helpers as pallas_bilinear_v4):
    transposed lane-wide masks contracted on the MXU, image entering as
    the free (H, W*C) reshape.
  * **conv epilogue**: 3x3 'same' conv as 9 halo-shifted slices of the
    sampled tile, each a K=C matmul against its kernel tap, with
    x-boundary masks built by in-layout iota compares (no relayouts);
    bias + PReLU in-register. Out-of-image halo rows are zeroed via the
    sampling mask, which reproduces the conv's zero padding.

The backward needs no new kernel: dz comes from the saved pre-activation
z; kernel/input cotangents are skinny MXU matmuls over the saved sampled
tile S, with the 3x3 taps realized as flattened-p sublane shifts + edge
masks (never C=3 NHWC rolls, which cost lane relayouts) — and
(d_img, dtheta) reuse the v4 sampler VJP + one small grid einsum.

Selection: CATGEN_ST_CONV=fused|split (kernels/config.py); the split path
is the reference Sequential [ST, Conv, PReLU] and the equality test's
baseline.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from catgen.kernels.pallas_bilinear_v4 import (
    V4_BUDGET, V4_VMEM_LIMIT, _contract_t, _expand, _expanders, _mask_t,
    _weights_rows)

# conv tap order must match XLA NHWC x HWIO 'same' correlation:
# out[y, x, f] = sum_{ky, kx, ci} x[y+ky-1, x+kx-1, ci] * K[ky, kx, ci, f]
_OFFSETS = [(ky - 1, kx - 1) for ky in range(3) for kx in range(3)]


def _st_conv_kernel(h: int, w: int, c: int, f: int, bt: int, pt: int,
                    halo: int, out_dtype):
    hw = h * w
    pt_e = pt + 2 * halo

    def kernel_fn(img_ref, theta_ref, e_ref, s_ref, kmat_ref, bias_ref,
                  alpha_ref, out_ref, samp_ref, z_ref):
        j = pl.program_id(1)
        # ---- extended-tile coords from theta (affine_grid_rows math) ----
        p_ext = (jax.lax.broadcasted_iota(jnp.int32, (bt, pt_e), 1)
                 + j * pt - halo)
        y_idx = jnp.floor_divide(p_ext, w)
        x_idx = p_ext - y_idx * w
        gy = y_idx.astype(jnp.float32) * (2.0 / (h - 1)) - 1.0
        gx = x_idx.astype(jnp.float32) * (2.0 / (w - 1)) - 1.0
        th = theta_ref[:].astype(jnp.float32)            # (bt, 2, 3)
        ty, tx = th[:, 0], th[:, 1]                      # (bt, 3) squeezes
        fy_n = ty[:, 0:1] * gy + ty[:, 1:2] * gx + ty[:, 2:3]
        fx_n = tx[:, 0:1] * gy + tx[:, 1:2] * gx + tx[:, 2:3]
        y0, x0, wy, wx, _, _ = _weights_rows(fy_n, fx_n, h, w)

        # ---- v4 separable sampling over the extended tile ----
        # validity mask built directly at rank 3 (a [:, None, :] expand of
        # a bf16 vector is an unsupported Mosaic shape cast)
        p_row3 = (jax.lax.broadcasted_iota(jnp.int32, (bt, 1, pt_e), 2)
                  + j * pt - halo)
        valid3 = ((p_row3 >= 0) & (p_row3 < hw)).astype(jnp.bfloat16)
        a_t = _mask_t(y0, wy, h, bt, pt_e) * valid3
        t_c = _contract_t(a_t, img_ref[:])               # (bt, pt_e, wc)
        b_t = _mask_t(x0, wx, w, bt, pt_e)
        b_exp = _expand(b_t, e_ref)                      # (bt, pt_e, wc)
        s_e = jax.lax.dot_general(                       # (bt, pt_e, c) f32
            b_exp * t_c, s_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        samp_ref[:] = jax.lax.slice_in_dim(
            s_e, halo, halo + pt, axis=1).astype(samp_ref.dtype)

        # ---- conv epilogue: x-boundary masks in the target layout ----
        x_pos = (jax.lax.broadcasted_iota(jnp.int32, (bt, pt, c), 1)
                 + j * pt) % w                           # pt % w == 0
        m_l = (x_pos != 0).astype(jnp.bfloat16)          # allow dx = -1
        m_r = (x_pos != w - 1).astype(jnp.bfloat16)      # allow dx = +1

        z = None
        for k, (dy, dx) in enumerate(_OFFSETS):
            off = dy * w + dx
            src = jax.lax.slice_in_dim(s_e, halo + off, halo + off + pt,
                                       axis=1)           # (bt, pt, c)
            if dx == -1:
                src = src * m_l
            elif dx == 1:
                src = src * m_r
            tap = jax.lax.slice_in_dim(kmat_ref[:], k * c, (k + 1) * c,
                                       axis=0)           # (c, f)
            contrib = jax.lax.dot_general(
                src, tap, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = contrib if z is None else z + contrib
        z = z + bias_ref[:].astype(jnp.float32)
        z_ref[:] = z.astype(z_ref.dtype)     # saved for the VJP's PReLU
        alpha = alpha_ref[:].astype(jnp.float32)
        y = jnp.where(z >= 0, z, alpha * z)
        out_ref[:] = y.astype(out_dtype)

    return kernel_fn


def _tiles(n: int, p: int, w: int, c: int, f: int):
    """(bt, pt): pt must be a multiple of w (x-mask periodicity) and divide
    p; rows sized to the VMEM budget like the v4 separable path."""
    wc_pad = max(((w * c + 127) // 128) * 128, 128)
    f_pad = max(((f + 127) // 128) * 128, 128)
    # bf16 temporaries per extended row: t_c, b_exp, product, s_e (+ f32 z
    # per center row)
    bytes_per_row = 4 * 2 * wc_pad + 2 * 128 + 4 * f_pad + 4 * 128
    rows = max(V4_BUDGET // bytes_per_row, 128)
    pt = p
    while pt > max(rows, 2 * w) and pt % 2 == 0 and (pt // 2) % w == 0:
        pt //= 2
    bt = max(int(rows // pt), 1)
    bt = min(bt, n)
    while n % bt:
        bt -= 1
    return bt, pt


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def st_conv_prelu(img, theta, kernel, bias, alpha, interpret=False):
    """Fused [affine-ST sample -> conv3x3 'same' -> PReLU] forward.

    img (N, H, W, C) NHWC; theta (N, 2, 3) affine (y, x rows, the
    ``affine_matrix`` convention); kernel (3, 3, C, F) HWIO; bias (F,);
    alpha (1,) or (F,) PReLU slope. Returns (N, H, W, F)."""
    out, _, _ = _forward(img, theta, kernel, bias, alpha, interpret)
    return out


def _forward(img, theta, kernel, bias, alpha, interpret):
    n, h, w, c = img.shape
    kh, kw, kc, f = kernel.shape
    assert (kh, kw) == (3, 3) and kc == c, (kernel.shape, img.shape)
    p = h * w
    halo = w + 1
    bt, pt = _tiles(n, p, w, c, f)
    e, s = _expanders(w, c)
    kmat = kernel.reshape(9 * c, f).astype(jnp.bfloat16)
    bias2 = bias.reshape(1, f).astype(jnp.float32)
    alpha2 = jnp.broadcast_to(alpha.reshape(1, -1).astype(jnp.float32),
                              (1, f) if alpha.size == f else (1, 1))
    img_h = img.reshape(n, h, w * c)
    out, samp, z = pl.pallas_call(
        _st_conv_kernel(h, w, c, f, bt, pt, halo, img.dtype),
        grid=(n // bt, p // pt),
        in_specs=[
            pl.BlockSpec((bt, h, w * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha2.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, pt, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, pt, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, p, f), img.dtype),
            jax.ShapeDtypeStruct((n, p, c), img.dtype),
            jax.ShapeDtypeStruct((n, p, f), jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=V4_VMEM_LIMIT),
        interpret=interpret,
    )(img_h, theta.astype(jnp.float32), e, s, kmat, bias2, alpha2)
    return out.reshape(n, h, w, f), samp, z


def _shift_p(x, off, h, w):
    """Shift (N, P, C) along the flattened row-major pixel axis by ``off``
    pixels with zero fill — T[p] = x[p + off]. Combined with the x-edge
    masks this realizes the 3x3 'same' zero-pad taps WITHOUT reshaping to
    (H, W) — the p axis stays second-minor, so XLA emits sublane slices
    instead of the lane-relayout rolls a C=3 NHWC shift costs."""
    n, p, c = x.shape
    if off == 0:
        return x
    if off > 0:
        return jnp.concatenate(
            [x[:, off:], jnp.zeros((n, off, c), x.dtype)], axis=1)
    return jnp.concatenate(
        [jnp.zeros((n, -off, c), x.dtype), x[:, :off]], axis=1)


def _edge_masks(p, h, w, dtype):
    """(P, 1) output-pixel masks: mL[p]=0 at x==0 (blocks dx=-1 taps),
    mR[p]=0 at x==w-1 (blocks dx=+1)."""
    x_pos = np.arange(p) % w
    ml = (x_pos != 0).astype(np.float32).reshape(p, 1)
    mr = (x_pos != w - 1).astype(np.float32).reshape(p, 1)
    return jnp.asarray(ml, dtype), jnp.asarray(mr, dtype)


def _vjp_fwd(img, theta, kernel, bias, alpha, interpret):
    out, samp, z = _forward(img, theta, kernel, bias, alpha, interpret)
    return out, (img, theta, kernel, bias, alpha, samp, z)


def _vjp_bwd(interpret, res, g):
    img, theta, kernel, bias, alpha, samp, z = res
    n, h, w, c = img.shape
    f = kernel.shape[-1]
    p = h * w
    g2 = g.reshape(n, p, f).astype(jnp.float32)
    zf = z.astype(jnp.float32)                             # saved pre-act

    a = alpha.astype(jnp.float32)
    a_b = a if a.size == 1 else a.reshape(1, 1, f)
    dz = jnp.where(zf >= 0, g2, a_b * g2)                  # (n, p, f)
    neg = jnp.where(zf < 0, g2 * zf, 0.0)
    if alpha.size == 1:
        dalpha = jnp.sum(neg).reshape(alpha.shape)
    else:
        dalpha = jnp.sum(neg, axis=(0, 1)).reshape(alpha.shape)
    dbias = jnp.sum(dz, axis=(0, 1)).astype(bias.dtype)

    # conv cotangents via flattened-p shifts (no C=3 lane relayouts):
    # dK_k = sum_p (S[p+off_k] * m_k[p])^T dz[p];  dS = sum_k
    # shift(U_k * m_k, -off_k) with U = dz @ K^T — all skinny MXU matmuls
    kmat = kernel.reshape(9 * c, f).astype(jnp.float32)
    ml, mr = _edge_masks(p, h, w, jnp.float32)
    s32 = samp.astype(jnp.float32)                         # (n, p, c)
    u = dz @ kmat.T                                        # (n, p, 9c)
    dk_rows = []
    ds = jnp.zeros((n, p, c), jnp.float32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        off = dy * w + dx
        mask = ml if dx == -1 else (mr if dx == 1 else None)
        s_shift = _shift_p(s32, off, h, w)                 # S[p + off]
        u_k = u[:, :, k * c:(k + 1) * c]
        if mask is not None:
            s_shift = s_shift * mask
            u_k = u_k * mask
        dk_rows.append(jnp.einsum("npc,npf->cf", s_shift, dz))
        ds = ds + _shift_p(u_k, -off, h, w)
    dkernel = jnp.concatenate(dk_rows, axis=0).reshape(
        kernel.shape).astype(kernel.dtype)
    ds = ds.reshape(n, h, w, c)

    # (d_img, dtheta) through the v4 sampler VJP + the grid einsum
    from catgen.kernels.pallas_bilinear_v4 import bilinear_sample_rows
    from catgen.nn.spatial_transformer import affine_grid_rows

    rows = affine_grid_rows(theta.astype(jnp.float32), h, w)

    def sample_fn(im, cr):
        return bilinear_sample_rows(im, cr, (h, w), interpret)

    _, vjp = jax.vjp(sample_fn, img, rows.astype(img.dtype))
    d_img, d_rows = vjp(ds.astype(img.dtype))

    ys = np.linspace(-1.0, 1.0, h, dtype=np.float32)
    xs = np.linspace(-1.0, 1.0, w, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    base = jnp.asarray(np.stack([gy.reshape(-1), gx.reshape(-1),
                                 np.ones(h * w, np.float32)], axis=0))
    dtheta = jnp.einsum("bip,jp->bij", d_rows.astype(jnp.float32),
                        base).astype(theta.dtype)
    return d_img, dtheta, dkernel, dbias, dalpha.astype(alpha.dtype)


st_conv_prelu.defvjp(_vjp_fwd, _vjp_bwd)
