"""Pallas TPU kernel v4: separable bilinear sampling — lane-wide, tiled,
relayout-free.

Why v4: profiling the full train step (tools/profile_capture.py) showed
three problems with v3 (pallas_bilinear_v3.py):

  1. *Latency-bound grids.* v3 keeps ~8 fp32 temporaries of shape
     (bt, P, H*C) live, so its VMEM auto-tiler is forced down to batch
     tiles of 1-2 samples -> 256-512 grid steps of a few microseconds
     each (measured 4-5 ms per call where the arithmetic is worth <1 ms).
  2. *Relayout tax.* v3 contracts over x first, which needs the image as
     (W, H*C) — a real transpose. The step profile shows ~13 batch-minor
     copy ops (~0.2 ms each) shuttling activations into that layout.
  3. *Hidden lane padding.* Narrow-lane blocks (coords (.., 2), masks
     (.., H)) pad their minor dim to 128 lanes in VMEM — a 4-64x
     inflation that silently blows the scoped-VMEM budget.

v4 (same math):

  * contracts over **y first**: the image enters as (H, W*C), the natural
    NHWC flattening — a *free* reshape both ways.
  * coords travel as (N, 2, P) "row" layout, which ``affine_grid_rows``
    emits natively from theta at zero cost (and the input-grid cotangent
    leaves the same way). Lanes = P, no padding.
  * every in-kernel array is lane-wide: masks are built transposed —
    (bt, H, pt)/(bt, W, pt), lanes = pt — and the MXU contracts them
    directly (dot_general handles the transposed contraction); per-axis
    weights expand to (., W*C) via one-hot *matmuls*, never via
    (bt, P, H*C) iota compares on the VPU.
  * 2-D grid (batch tiles x pixel tiles): the working set per block is
    (bt*pt, W*C), so blocks reach thousands of matmul rows for any shape.
  * bf16 operands and bf16 accumulation on the expand matmuls (each
    output element is a sum of <= 2 nonzero taps, so bf16 accumulation is
    exact-ish); fp32 accumulation for image/coordinate cotangents.

Backward: dcoords tiles with the pixel grid; d_img accumulates across
pixel tiles into a revisited fp32 block (pixel axis is the minor/fastest
grid dimension, as Mosaic requires for revisiting).

Replaces the reference's CPU-pinned torch STN sampler workaround
(models.lua:888-906) like v1-v3: deterministic matmuls, no scatters.

Math (per sample; A (P,H) / B (P,W) are bilinear weights over y / x):

    out[p, c]  = sum_y A[p, y] * sum_x B[p, x] * img[y, x, c]
    t          = A @ imgH                    imgH = img.reshape(H, W*C)
    out        = ((B @ E) * t) @ S           E (W, W*C), S (W*C, C) one-hot

    d_img      = A^T @ ((B @ E) * (g @ S^T))
    d_fy[p]    = sum_y dA[p, y] * (imgH @ bgb^T)[y, p]
    d_fx[p]    = sum_xc (dB @ E)[p, xc] * (t * (g @ S^T))[p, xc]
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights_rows(y_n, x_n, h, w):
    """Normalized (bt, pt) y/x coords -> y0,x0 int32, wy,wx,in_y,in_x f32."""
    fy_raw = (y_n + 1.0) * 0.5 * (h - 1)
    fx_raw = (x_n + 1.0) * 0.5 * (w - 1)
    fy = jnp.clip(fy_raw, 0.0, h - 1)
    fx = jnp.clip(fx_raw, 0.0, w - 1)
    in_y = ((fy_raw >= 0.0) & (fy_raw <= h - 1)).astype(jnp.float32)
    in_x = ((fx_raw >= 0.0) & (fx_raw <= w - 1)).astype(jnp.float32)
    y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32)
    wy = fy - y0.astype(jnp.float32)
    wx = fx - x0.astype(jnp.float32)
    return y0, x0, wy, wx, in_y, in_x


def _mask_t(i0, wgt, size, bt, pt, d=False):
    """Transposed bilinear (or derivative) weights: (bt, size, pt) bf16.
    Lanes = pt (wide); the contraction dim lives in sublanes."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (bt, size, pt), 1)
    i0b = i0[:, None, :]
    m0 = (sub == i0b).astype(jnp.float32)
    m1 = (sub == i0b + 1).astype(jnp.float32)
    if d:
        return (m1 - m0).astype(jnp.bfloat16)
    return (m0 + wgt[:, None, :] * (m1 - m0)).astype(jnp.bfloat16)


def _dmask_rows(i0, size, bt, pt):
    """Row-layout derivative mask: (bt, pt, size) f32 with
    d[p, i] = [i == i0+1] - [i == i0]. Lane dim = size (narrow, pads to
    128 lanes) — used by the 'eyt' d_coords formulation to reduce a
    per-axis (bt, pt, size) sum, far smaller than the (bt, pt, h*w)
    dense derivative masks it replaces."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, pt, size), 2)
    i0b = i0[..., None]
    return ((lane == i0b + 1).astype(jnp.float32)
            - (lane == i0b).astype(jnp.float32))


def _contract_t(mask_t, rhs):
    """(bt, k, pt) x (bt, k, n) -> (bt, pt, n) bf16: batched matmul with
    the contraction dim in sublanes of the LHS (MXU takes transposed LHS).
    Mosaic requires a 32-bit accumulator; the cast back is fused."""
    return jax.lax.dot_general(
        mask_t, rhs.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _expand(mask_t, e_ref):
    """(bt, k, pt) x (k, kc) -> (bt, pt, kc) bf16: one-hot lane expansion."""
    return jax.lax.dot_general(
        mask_t, e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _expanders(w: int, c: int):
    """One-hot helpers (tiny, built outside the kernel):
    E (w, w*c): E[x, x*c + c'] = 1   (expand per-x weights to lane width)
    S (w*c, c): S[x*c + c', c'] = 1  (sum out x / select channel)."""
    import numpy as np
    e = np.zeros((w, w * c), np.float32)
    s = np.zeros((w * c, c), np.float32)
    for x in range(w):
        for cc in range(c):
            e[x, x * c + cc] = 1.0
            s[x * c + cc, cc] = 1.0
    return jnp.asarray(e, jnp.bfloat16), jnp.asarray(s, jnp.bfloat16)


def _fwd_kernel(h: int, w: int, c: int, bt: int, pt: int):
    def kernel_fn(img_ref, crd_ref, e_ref, s_ref, out_ref):
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(crd[:, 0, :], crd[:, 1, :],
                                             h, w)
        a_t = _mask_t(y0, wy, h, bt, pt)                 # (bt, h, pt)
        t = _contract_t(a_t, img_ref[:])                 # (bt, pt, wc)
        b_t = _mask_t(x0, wx, w, bt, pt)                 # (bt, w, pt)
        b_exp = _expand(b_t, e_ref)                      # (bt, pt, wc)
        out = jax.lax.dot_general(                       # (bt, pt, c) f32
            b_exp * t, s_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel_fn


def _dfx_sep_eyt(x0, tg, w, bt, pt, et_ref):
    """'eyt' separable dfx: collapse the (bt, pt, w*c) product tg down to
    per-x sums with one full-K (K=w*c) matmul against Eᵀ, then reduce a
    narrow (bt, pt, w) product — replaces the dB expander dot, a wide
    multiply and a w*c-lane VPU reduction (KERNELS.md §2d)."""
    u = jax.lax.dot_general(                             # (bt, pt, w) f32
        tg, et_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.sum(_dmask_rows(x0, w, bt, pt) * u, axis=2)


def _bwd_kernel(h: int, w: int, c: int, bt: int, pt: int,
                dcrd: str = "mask"):
    def kernel_fn(img_ref, crd_ref, g_ref, e_ref, st_ref, *rest):
        dimg_ref, dcrd_ref = rest[-2], rest[-1]
        j = pl.program_id(1)
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, in_y, in_x = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)

        b_t = _mask_t(x0, wx, w, bt, pt)                 # (bt, w, pt)
        b_exp = _expand(b_t, e_ref)                      # (bt, pt, wc)
        g_exp = jax.lax.dot_general(                     # (bt, pt, wc)
            g_ref[:].astype(jnp.bfloat16), st_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        bgb = b_exp * g_exp

        a_t = _mask_t(y0, wy, h, bt, pt)                 # (bt, h, pt)
        contrib = jax.lax.dot_general(                   # (bt, h, wc) f32
            a_t, bgb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

        # dfy: v_t[b, y, p] = sum_xc img[b, y, xc] * bgb[b, p, xc]
        v_t = jax.lax.dot_general(                       # (bt, h, pt) f32
            img_ref[:].astype(jnp.bfloat16), bgb,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        d_a = _mask_t(y0, wy, h, bt, pt, d=True).astype(jnp.float32)
        dfy = jnp.sum(d_a * v_t, axis=1)                 # (bt, pt)

        # dfx: sum_xc (dB @ E) * (t * g_exp)
        t = _contract_t(a_t, img_ref[:])                 # (bt, pt, wc)
        tg = t * g_exp
        if dcrd == "eyt":
            dfx = _dfx_sep_eyt(x0, tg, w, bt, pt, rest[0])
        else:
            db_exp = _expand(_mask_t(x0, wx, w, bt, pt, d=True), e_ref)
            dfx = jnp.sum((db_exp * tg).astype(jnp.float32), axis=2)

        dy = dfy * in_y * (0.5 * (h - 1))
        dx = dfx * in_x * (0.5 * (w - 1))
        dcrd_ref[:] = jnp.stack([dy, dx], axis=1).astype(dcrd_ref.dtype)

    return kernel_fn


def _fwd_kernel_res(h: int, w: int, c: int, bt: int, pt: int):
    """Residual-emitting separable forward: also writes the transposed
    per-axis bilinear weights A (bt, h, pt) / B (bt, w, pt) bf16 for the
    VJP to replay (VERDICT r3 item 1)."""
    def kernel_fn(img_ref, crd_ref, e_ref, s_ref, out_ref, at_ref, bt_ref):
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(crd[:, 0, :], crd[:, 1, :],
                                             h, w)
        a_t = _mask_t(y0, wy, h, bt, pt)                 # (bt, h, pt)
        at_ref[:] = a_t
        t = _contract_t(a_t, img_ref[:])                 # (bt, pt, wc)
        b_t = _mask_t(x0, wx, w, bt, pt)                 # (bt, w, pt)
        bt_ref[:] = b_t
        b_exp = _expand(b_t, e_ref)                      # (bt, pt, wc)
        out = jax.lax.dot_general(                       # (bt, pt, c) f32
            b_exp * t, s_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel_fn


def _bwd_kernel_res_dimg(h: int, w: int, c: int, bt: int, pt: int):
    """d_img from the SAVED separable weights A/B — skips the coord
    decode + mask builds. Split from d_coords so the D-phase input ST
    (dead image gradient) DCEs this call."""
    def kernel_fn(at_ref, btm_ref, g_ref, e_ref, st_ref, dimg_ref):
        j = pl.program_id(1)
        b_exp = _expand(btm_ref[:], e_ref)               # (bt, pt, wc)
        g_exp = jax.lax.dot_general(                     # (bt, pt, wc)
            g_ref[:].astype(jnp.bfloat16), st_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        bgb = b_exp * g_exp
        contrib = jax.lax.dot_general(                   # (bt, h, wc) f32
            at_ref[:], bgb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

    return kernel_fn


def _bwd_kernel_dimg(h: int, w: int, c: int, bt: int, pt: int):
    """d_img half of the separable backward (split formulation): the f32
    accumulation across pixel tiles, nothing else. Split out so that
    when the sampled image needs no gradient — the D-phase input ST
    samples the *data* batch (models.lua:845-855 applies the ST straight
    to the input) — the whole call is dead code and DCE removes it; the
    monolithic kernel's second output keeps it alive."""
    def kernel_fn(img_ref, crd_ref, g_ref, e_ref, st_ref, dimg_ref):
        j = pl.program_id(1)
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)

        b_t = _mask_t(x0, wx, w, bt, pt)                 # (bt, w, pt)
        b_exp = _expand(b_t, e_ref)                      # (bt, pt, wc)
        g_exp = jax.lax.dot_general(                     # (bt, pt, wc)
            g_ref[:].astype(jnp.bfloat16), st_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        bgb = b_exp * g_exp

        a_t = _mask_t(y0, wy, h, bt, pt)                 # (bt, h, pt)
        contrib = jax.lax.dot_general(                   # (bt, h, wc) f32
            a_t, bgb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

    return kernel_fn


def _bwd_kernel_dcrd(h: int, w: int, c: int, bt: int, pt: int,
                     dcrd: str = "mask"):
    """d_coords half of the split separable backward. With the revisited
    d_img accumulator gone, both grid dimensions are parallel (better
    pipelining) and the f32 accumulator block drops out of the VMEM
    working set."""
    def kernel_fn(img_ref, crd_ref, g_ref, e_ref, st_ref, *rest):
        dcrd_ref = rest[-1]
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, in_y, in_x = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)

        b_t = _mask_t(x0, wx, w, bt, pt)                 # (bt, w, pt)
        b_exp = _expand(b_t, e_ref)                      # (bt, pt, wc)
        g_exp = jax.lax.dot_general(                     # (bt, pt, wc)
            g_ref[:].astype(jnp.bfloat16), st_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        bgb = b_exp * g_exp

        a_t = _mask_t(y0, wy, h, bt, pt)                 # (bt, h, pt)
        # dfy: v_t[b, y, p] = sum_xc img[b, y, xc] * bgb[b, p, xc]
        v_t = jax.lax.dot_general(                       # (bt, h, pt) f32
            img_ref[:].astype(jnp.bfloat16), bgb,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        d_a = _mask_t(y0, wy, h, bt, pt, d=True).astype(jnp.float32)
        dfy = jnp.sum(d_a * v_t, axis=1)                 # (bt, pt)

        # dfx: sum_xc (dB @ E) * (t * g_exp)
        t = _contract_t(a_t, img_ref[:])                 # (bt, pt, wc)
        tg = t * g_exp
        if dcrd == "eyt":
            dfx = _dfx_sep_eyt(x0, tg, w, bt, pt, rest[0])
        else:
            db_exp = _expand(_mask_t(x0, wx, w, bt, pt, d=True), e_ref)
            dfx = jnp.sum((db_exp * tg).astype(jnp.float32), axis=2)

        dy = dfy * in_y * (0.5 * (h - 1))
        dx = dfx * in_x * (0.5 * (w - 1))
        dcrd_ref[:] = jnp.stack([dy, dx], axis=1).astype(dcrd_ref.dtype)

    return kernel_fn


def _axis_expanders(h: int, w: int):
    """One-hot expanders for MXU mask building:
    Ey (h, h*w): Ey[y, y*w+x] = 1 (spread a per-y weight across its row)
    Ex (w, h*w): Ex[x, y*w+x] = 1 (spread a per-x weight down its column)."""
    import numpy as np
    ey = np.zeros((h, h * w), np.float32)
    ex = np.zeros((w, h * w), np.float32)
    for y in range(h):
        ey[y, y * w:(y + 1) * w] = 1.0
    for x in range(w):
        ex[x, x::w] = 1.0
    return jnp.asarray(ey, jnp.bfloat16), jnp.asarray(ex, jnp.bfloat16)


def _axis_collapsers(h: int, w: int):
    """Transposed expanders for the 'eyt' d_coords formulation:
    EyT (h*w, h) / ExT (h*w, w) — contract an (.., h*w) lane tensor down
    to per-axis sums with ONE full-K (K = h*w) matmul instead of
    materializing (.., h*w) derivative masks. f32: the collapsed operand
    (mask * imgg) is f32 and the entries are exactly 1.0, so the dot
    stays lossless."""
    import numpy as np
    eyt = np.zeros((h * w, h), np.float32)
    ext = np.zeros((h * w, w), np.float32)
    for y in range(h):
        eyt[y * w:(y + 1) * w, y] = 1.0
    for x in range(w):
        ext[x::w, x] = 1.0
    return jnp.asarray(eyt), jnp.asarray(ext)


def _dense_mask_parts_mxu(y0, x0, wy, wx, h, w, bt, pt, ey_ref, ex_ref,
                          derivs: bool):
    """MXU formulation of the dense mask parts: per-axis transposed masks
    (O(P*(h+w)) VPU compares) expanded to (bt, pt, h*w) by one-hot
    matmuls — moves the O(P*h*w) of _dense_mask_parts' iota compares from
    the VPU onto the MXU (CATGEN_V4_DENSE_MASK=mxu; measured A/B in
    KERNELS.md)."""
    a_t = _mask_t(y0, wy, h, bt, pt)                     # (bt, h, pt)
    b_t = _mask_t(x0, wx, w, bt, pt)                     # (bt, w, pt)
    my = _expand(a_t, ey_ref).astype(jnp.float32)        # (bt, pt, hw)
    mx = _expand(b_t, ex_ref).astype(jnp.float32)
    if not derivs:
        return my, mx, None, None
    dmy = _expand(_mask_t(y0, wy, h, bt, pt, d=True),
                  ey_ref).astype(jnp.float32)
    dmx = _expand(_mask_t(x0, wx, w, bt, pt, d=True),
                  ex_ref).astype(jnp.float32)
    return my, mx, dmy, dmx


def _dense_mask_parts(y0, x0, wy, wx, h, w, bt, pt):
    """Per-axis dense weights my, mx, dmy, dmx — all (bt, pt, h*w) f32,
    built from one lane-wide iota and four compares (shared between the
    value mask M = my*mx and both derivative masks). f32 VPU arithmetic
    measured faster than bf16 here (conversion overhead dominates)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, pt, h * w), 2)
    ly = lane // w
    lx = lane - ly * w
    y0b, x0b = y0[..., None], x0[..., None]
    my0 = (ly == y0b).astype(jnp.float32)
    dmy = (ly == y0b + 1).astype(jnp.float32) - my0
    mx0 = (lx == x0b).astype(jnp.float32)
    dmx = (lx == x0b + 1).astype(jnp.float32) - mx0
    my = my0 + wy[..., None] * dmy
    mx = mx0 + wx[..., None] * dmx
    return my, mx, dmy, dmx


def _dense_mask(y0, x0, wy, wx, h, w, bt, pt):
    """Dense bilinear weight matrix M (bt, pt, h*w) bf16:
    M[p, y*w + x] = A[p, y] * B[p, x]."""
    my, mx, _, _ = _dense_mask_parts(y0, x0, wy, wx, h, w, bt, pt)
    return (my * mx).astype(jnp.bfloat16)


def _dense_fwd_kernel(h: int, w: int, c: int, bt: int, pt: int):
    def kernel_fn(img_ref, crd_ref, out_ref):
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(crd[:, 0, :], crd[:, 1, :],
                                             h, w)
        m = _dense_mask(y0, x0, wy, wx, h, w, bt, pt)    # (bt, pt, hw)
        out = jax.lax.dot_general(                       # (bt, pt, c) f32
            m, img_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel_fn


def _dense_fwd_kernel_mxu(h: int, w: int, c: int, bt: int, pt: int):
    def kernel_fn(img_ref, crd_ref, ey_ref, ex_ref, out_ref):
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(crd[:, 0, :], crd[:, 1, :],
                                             h, w)
        my, mx, _, _ = _dense_mask_parts_mxu(y0, x0, wy, wx, h, w, bt, pt,
                                             ey_ref, ex_ref, derivs=False)
        out = jax.lax.dot_general(
            (my * mx).astype(jnp.bfloat16), img_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel_fn


def _dense_bwd_kernel(h: int, w: int, c: int, bt: int, pt: int):
    def kernel_fn(img_ref, crd_ref, g_ref, dimg_ref, dcrd_ref):
        j = pl.program_id(1)
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, in_y, in_x = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)
        g = g_ref[:].astype(jnp.bfloat16)

        my, mx, dmy, dmx = _dense_mask_parts(y0, x0, wy, wx, h, w, bt, pt)
        contrib = jax.lax.dot_general(                   # (bt, hw, c) f32
            (my * mx).astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

        # imgg[p, yx] = sum_c g[p, c] * img[yx, c]  (K = c, full rows)
        imgg = jax.lax.dot_general(                      # (bt, pt, hw) f32
            g, img_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dfy = jnp.sum(dmy * mx * imgg, axis=2)           # (bt, pt)
        dfx = jnp.sum(my * dmx * imgg, axis=2)

        dy = dfy * in_y * (0.5 * (h - 1))
        dx = dfx * in_x * (0.5 * (w - 1))
        dcrd_ref[:] = jnp.stack([dy, dx], axis=1).astype(dcrd_ref.dtype)

    return kernel_fn


def _dcrd_dense_eyt(y0, x0, imgg, my, mx, h, w, bt, pt, eyt_ref, ext_ref):
    """'eyt' dense d_coords: instead of expanding TWO (bt, pt, h*w) f32
    derivative masks and reducing their triple products on the VPU,
    contract (mask * imgg) against the transposed one-hot expanders with
    one full-K (K=h*w) f32 matmul per axis, then reduce a narrow
    (bt, pt, h|w) product:

        dfy[p] = sum_y dA[p,y] * (sum_x mx[p,yx] * imgg[p,yx])
               = sum_y dA[p,y] * ((mx*imgg) @ EyT)[p,y]

    Removes 2 expander dots, 2 wide f32 temporaries and 2 h*w-lane VPU
    reductions from the critical path (A/B in KERNELS.md §2d)."""
    u = jax.lax.dot_general(                             # (bt, pt, h) f32
        mx * imgg, eyt_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    v = jax.lax.dot_general(                             # (bt, pt, w) f32
        my * imgg, ext_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dfy = jnp.sum(_dmask_rows(y0, h, bt, pt) * u, axis=2)
    dfx = jnp.sum(_dmask_rows(x0, w, bt, pt) * v, axis=2)
    return dfy, dfx


def _dense_bwd_kernel_mxu_dimg(h: int, w: int, c: int, bt: int, pt: int):
    """d_img half of the split dense backward (see _bwd_kernel_dimg)."""
    def kernel_fn(img_ref, crd_ref, g_ref, ey_ref, ex_ref, dimg_ref):
        j = pl.program_id(1)
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)
        g = g_ref[:].astype(jnp.bfloat16)
        my, mx, _, _ = _dense_mask_parts_mxu(
            y0, x0, wy, wx, h, w, bt, pt, ey_ref, ex_ref, derivs=False)
        contrib = jax.lax.dot_general(
            (my * mx).astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

    return kernel_fn


def _dense_bwd_kernel_mxu_dcrd(h: int, w: int, c: int, bt: int, pt: int,
                               dcrd: str = "mask"):
    """d_coords half of the split dense backward: no revisited f32
    accumulator, both grid dims parallel. dcrd='eyt' takes two extra
    collapser refs (see _dcrd_dense_eyt)."""
    def kernel_fn(img_ref, crd_ref, g_ref, ey_ref, ex_ref, *rest):
        dcrd_ref = rest[-1]
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, in_y, in_x = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)
        g = g_ref[:].astype(jnp.bfloat16)
        my, mx, dmy, dmx = _dense_mask_parts_mxu(
            y0, x0, wy, wx, h, w, bt, pt, ey_ref, ex_ref,
            derivs=(dcrd == "mask"))
        imgg = jax.lax.dot_general(
            g, img_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if dcrd == "eyt":
            eyt_ref, ext_ref = rest[0], rest[1]
            dfy, dfx = _dcrd_dense_eyt(y0, x0, imgg, my, mx, h, w, bt, pt,
                                       eyt_ref, ext_ref)
        else:
            dfy = jnp.sum(dmy * mx * imgg, axis=2)
            dfx = jnp.sum(my * dmx * imgg, axis=2)

        dy = dfy * in_y * (0.5 * (h - 1))
        dx = dfx * in_x * (0.5 * (w - 1))
        dcrd_ref[:] = jnp.stack([dy, dx], axis=1).astype(dcrd_ref.dtype)

    return kernel_fn


def _dense_bwd_kernel_mxu(h: int, w: int, c: int, bt: int, pt: int,
                          dcrd: str = "mask"):
    def kernel_fn(img_ref, crd_ref, g_ref, ey_ref, ex_ref, *rest):
        dimg_ref, dcrd_ref = rest[-2], rest[-1]
        j = pl.program_id(1)
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, in_y, in_x = _weights_rows(
            crd[:, 0, :], crd[:, 1, :], h, w)
        g = g_ref[:].astype(jnp.bfloat16)

        my, mx, dmy, dmx = _dense_mask_parts_mxu(
            y0, x0, wy, wx, h, w, bt, pt, ey_ref, ex_ref,
            derivs=(dcrd == "mask"))
        contrib = jax.lax.dot_general(
            (my * mx).astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

        imgg = jax.lax.dot_general(
            g, img_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if dcrd == "eyt":
            eyt_ref, ext_ref = rest[0], rest[1]
            dfy, dfx = _dcrd_dense_eyt(y0, x0, imgg, my, mx, h, w, bt, pt,
                                       eyt_ref, ext_ref)
        else:
            dfy = jnp.sum(dmy * mx * imgg, axis=2)
            dfx = jnp.sum(my * dmx * imgg, axis=2)

        dy = dfy * in_y * (0.5 * (h - 1))
        dx = dfx * in_x * (0.5 * (w - 1))
        dcrd_ref[:] = jnp.stack([dy, dx], axis=1).astype(dcrd_ref.dtype)

    return kernel_fn


def _dense_fwd_kernel_mxu_res(h: int, w: int, c: int, bt: int, pt: int):
    """Residual-emitting dense forward (CATGEN_V4_RESIDUAL=1): also
    writes the bf16 bilinear weight matrix M (bt, pt, h*w) so the VJP
    can replay it instead of rebuilding (VERDICT r3 item 1 — trades
    HBM traffic for the backward's mask-build VPU/MXU work)."""
    def kernel_fn(img_ref, crd_ref, ey_ref, ex_ref, out_ref, m_ref):
        crd = crd_ref[:].astype(jnp.float32)
        y0, x0, wy, wx, _, _ = _weights_rows(crd[:, 0, :], crd[:, 1, :],
                                             h, w)
        my, mx, _, _ = _dense_mask_parts_mxu(y0, x0, wy, wx, h, w, bt, pt,
                                             ey_ref, ex_ref, derivs=False)
        m = (my * mx).astype(jnp.bfloat16)
        m_ref[:] = m
        out = jax.lax.dot_general(
            m, img_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel_fn


def _dense_bwd_kernel_res_dimg(h: int, w: int, c: int, bt: int, pt: int):
    """d_img from the SAVED forward mask M: one transposed contraction,
    zero mask building. Split from d_coords so the D-phase input ST
    (dead image gradient) DCEs this call entirely."""
    def kernel_fn(m_ref, g_ref, dimg_ref):
        j = pl.program_id(1)
        contrib = jax.lax.dot_general(
            m_ref[:], g_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            dimg_ref[:] = contrib

        @pl.when(j > 0)
        def _acc():
            dimg_ref[:] = dimg_ref[:] + contrib

    return kernel_fn


# sampling formulation dispatch: the dense one-hot matrix M is (P, H*W) —
# for small feature maps one full-K matmul beats two K=H underfilled
# separable contractions plus lane expansions (measured, KERNELS.md §2).
# The backward has its own threshold: its mask work is 4x the forward's
# (value + derivative masks), so the dense path's O(P*HW) VPU cost bites
# sooner there.
_DENSE_MAX_HW = 256
# Measured at bs=512: dense bwd 35.2 ms step vs separable bwd 37.5 for
# the 16x16x64 branch ST — the dense mask VPU cost is still cheaper than
# the separable path's K=16 lane expansions. Knob kept for re-measuring.
_DENSE_MAX_HW_BWD = int(os.environ.get("CATGEN_V4_DENSE_BWD_HW", "256"))
# dense-mask construction: "mxu" (default) = per-axis masks + one-hot
# expander matmuls, "vpu" = O(P*HW) iota compares (the round-2 original).
# Measured at bs=512 (full step): mxu 35.9 ms vs vpu 37.2 — the expander
# matmuls beat the dense iota-compare floor (KERNELS.md §5).
_DENSE_MASK_IMPL = os.environ.get("CATGEN_V4_DENSE_MASK", "mxu")
if _DENSE_MASK_IMPL not in ("mxu", "vpu"):
    raise ValueError(f"CATGEN_V4_DENSE_MASK={_DENSE_MASK_IMPL!r} invalid; "
                     f"pick 'mxu' or 'vpu'")
# separable backward as TWO pallas_calls (d_img / d_coords) instead of
# one: when the sampled image needs no gradient — the D-phase input ST
# samples the raw data batch — the d_img call has no consumers and DCE
# removes it entirely (a monolithic kernel's dead output can't be
# eliminated). Costs a duplicated mask build when BOTH cotangents are
# live (the G phase). Measured at bs=512 (full step): monolithic 35.45
# ms/iter vs split 36.29 — the duplicated G-phase build outweighs the
# one D-phase DCE win, so the default stays 0 (KERNELS.md §2c).
_SPLIT_BWD = os.environ.get("CATGEN_V4_SPLIT_BWD", "0") == "1"
# Round-4 A/B (device traces, bs=512, KERNELS.md §2d): default 33.38 ms
# step / 4.65 ms sampler bwd; eyt 34.29 (+0.9 — narrow-lane ops at 1/8
# occupancy lose to full-occupancy wide VPU chains); residual 34.45
# (+1.1 — the saved-mask HBM traffic costs more than the post-round-3
# mask rebuild, even though the dead D-phase d_img call IS DCE'd);
# residual+eyt 35.32. Defaults stay mask/off.
# d_coords formulation inside the backward kernels: "mask" = expand
# per-axis derivative masks to (., h*w) / (., w*c) and reduce the triple
# product on the VPU (round-3 formulation); "eyt" = contract
# (value-mask * imgg) against transposed one-hot expanders with one
# full-K matmul per axis, then reduce a narrow (., h|w) product — no
# wide derivative masks materialized at all (_dcrd_dense_eyt /
# _dfx_sep_eyt). Applies to the mxu dense path and the separable path;
# the vpu dense path keeps its round-2 mask formulation as the baseline.
_DCRD_IMPL = os.environ.get("CATGEN_V4_DCRD", "mask")
if _DCRD_IMPL not in ("mask", "eyt"):
    raise ValueError(f"CATGEN_V4_DCRD={_DCRD_IMPL!r} invalid; "
                     f"pick 'mask' or 'eyt'")
# residual-reuse backward (VERDICT r3 item 1): the forward also emits its
# bilinear weight products (dense M (N,P,HW) bf16, or separable A/B
# transposed weights) as custom-VJP residuals; the backward replays them
# for d_img instead of rebuilding masks from coords, and — because the
# d_img half is then its own pallas_call — a dead image gradient (the
# D-phase input ST samples the *data* batch) DCEs the whole call without
# the split-bwd duplicate-mask-build penalty. Trades HBM traffic
# (write+read of the saved masks) for the backward's mask-build work.
_RESIDUAL = os.environ.get("CATGEN_V4_RESIDUAL", "0") == "1"
if _SPLIT_BWD and _DENSE_MASK_IMPL == "vpu":
    import warnings
    warnings.warn(
        "CATGEN_V4_SPLIT_BWD=1 is only implemented for the mxu dense-mask "
        "backward (and the separable path); STs on the dense path with "
        "CATGEN_V4_DENSE_MASK=vpu fall back to the monolithic backward "
        "kernel — the d_img DCE saving will NOT be active there",
        stacklevel=2)


# Per-kernel scoped-VMEM ceiling. The Mosaic default is 16 MB but v5e has
# 128 MB of VMEM; raising the limit lets blocks grow ~4x, which divides the
# grid-step count (these kernels are pipeline/latency-bound, not FLOP-bound).
V4_VMEM_LIMIT = 64 * 1024 * 1024
V4_BUDGET = 40 * 1024 * 1024


def _dense_tiles(n: int, p: int, h: int, w: int, c: int, bwd: bool,
                 res: bool = False):
    hw_pad = max(((h * w + 127) // 128) * 128, 128)
    # bwd: 4 f32 mask parts + m (bf16) + the f32 imgg + iota staging;
    # fwd: 2 f32 mask parts + m (bf16) + iota staging; res fwd adds the
    # double-buffered bf16 M output block. The eyt backward never
    # materializes the two wide f32 derivative masks — its narrow
    # (., h|w) row masks and u/v products are charged at one padded lane
    # tile each.
    if bwd and _DCRD_IMPL == "eyt":
        bytes_per_row = 18 * hw_pad + 16 * 128
    else:
        bytes_per_row = (26 if bwd else (18 if res else 14)) * hw_pad \
            + 4 * 128
    budget = V4_BUDGET
    rows = max(budget // bytes_per_row, 128)
    pt = p
    while pt > max(rows, 256) and pt % 2 == 0:
        pt //= 2
    bt = max(int(rows // pt), 1)
    bt = min(bt, n)
    while n % bt:
        bt -= 1
    return bt, pt


def _tiles(n: int, p: int, h: int, w: int, c: int, bwd: bool,
           res: bool = False):
    """(bt, pt): maximize matmul rows per block within the VMEM budget.

    Row cost counts the (rows, W*C)-shaped bf16 temporaries (lane-padded)
    plus the fp32 (rows, c->128) result staging; image-height blocks and
    masks scale with bt / small dims and are charged separately."""
    wc_pad = max(((w * c + 127) // 128) * 128, 128)
    big = 3 if not bwd else 5
    bytes_per_row = big * 2 * wc_pad + 4 * 128 + (2 * (h + w) if res else 0)
    budget = V4_BUDGET
    rows = max(budget // bytes_per_row, 128)

    pt = p
    while pt > max(rows, 256) and pt % 2 == 0:
        pt //= 2
    bt = max(int(rows // pt), 1)
    bt = min(bt, n)
    while n % bt:
        bt -= 1
    # (bt, h, wc) image (+ f32 d_img accumulator) blocks, double-buffered
    img_bytes = h * wc_pad * (2 + (4 + 4 if bwd else 0))
    while bt > 1 and 2 * bt * img_bytes > V4_BUDGET // 3:
        bt -= 1
    while n % bt:
        bt -= 1
    return bt, pt


def _forward(img, coords_rows, out_hw, interpret, want_res=False):
    """want_res=True (the CATGEN_V4_RESIDUAL fwd under jax.vjp): returns
    (out, saved) where saved is the dense M (n, p, h*w) bf16 or the
    separable (a_t (n, h, p), b_t (n, w, p)) bf16 pair."""
    n, h, w, c = img.shape
    ho, wo = out_hw
    p = ho * wo
    assert coords_rows.shape == (n, 2, p), (coords_rows.shape, (n, 2, p))
    if h * w <= _DENSE_MAX_HW:
        bt, pt = _dense_tiles(n, p, h, w, c, bwd=False, res=want_res)
        in_specs = [
            pl.BlockSpec((bt, h * w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands = [img.reshape(n, h * w, c), coords_rows]
        if _DENSE_MASK_IMPL == "mxu" or want_res:
            ey, ex = _axis_expanders(h, w)
            in_specs += [
                pl.BlockSpec((h, h * w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, h * w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands += [ey, ex]
            kernel = (_dense_fwd_kernel_mxu_res(h, w, c, bt, pt) if want_res
                      else _dense_fwd_kernel_mxu(h, w, c, bt, pt))
        else:
            kernel = _dense_fwd_kernel(h, w, c, bt, pt)
        out_specs = pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, p, c), img.dtype)
        if want_res:
            out_specs = (out_specs,
                         pl.BlockSpec((bt, pt, h * w), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((n, p, h * w), jnp.bfloat16))
        out = pl.pallas_call(
            kernel,
            grid=(n // bt, p // pt),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=V4_VMEM_LIMIT),
            interpret=interpret,
        )(*operands)
        if want_res:
            out, m = out
            return out.reshape(n, ho, wo, c), m
        return out.reshape(n, ho, wo, c)
    bt, pt = _tiles(n, p, h, w, c, bwd=False, res=want_res)
    e, s = _expanders(w, c)
    img_h = img.reshape(n, h, w * c)                     # free reshape
    out_specs = pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, p, c), img.dtype)
    if want_res:
        out_specs = (out_specs,
                     pl.BlockSpec((bt, h, pt), lambda i, j: (i, 0, j),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((bt, w, pt), lambda i, j: (i, 0, j),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, h, p), jnp.bfloat16),
                     jax.ShapeDtypeStruct((n, w, p), jnp.bfloat16))
    out = pl.pallas_call(
        _fwd_kernel_res(h, w, c, bt, pt) if want_res
        else _fwd_kernel(h, w, c, bt, pt),
        grid=(n // bt, p // pt),
        in_specs=[
            pl.BlockSpec((bt, h, w * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=V4_VMEM_LIMIT),
        interpret=interpret,
    )(img_h, coords_rows, e, s)
    if want_res:
        out, a_t, b_t = out
        return out.reshape(n, ho, wo, c), (a_t, b_t)
    return out.reshape(n, ho, wo, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_rows(img: jax.Array, coords_rows: jax.Array,
                         out_hw: tuple, interpret: bool = False) -> jax.Array:
    """Lane-wide tiled MXU bilinear sampler.

    img (N, H, W, C); coords_rows (N, 2, Ho*Wo) normalized (y; x) rows —
    the zero-relayout layout ``affine_grid_rows`` emits. Returns
    (N, Ho, Wo, C). Same sampling semantics as
    spatial_transformer.bilinear_sample (edge-clamped bilinear, grads to
    both image and coordinates)."""
    return _forward(img, coords_rows, out_hw, interpret)


def _fwd(img, coords_rows, out_hw, interpret):
    if _RESIDUAL:
        out, saved = _forward(img, coords_rows, out_hw, interpret,
                              want_res=True)
        return out, (img, coords_rows, saved)
    return (_forward(img, coords_rows, out_hw, interpret),
            (img, coords_rows, None))


def _bwd(out_hw, interpret, res, g):
    img, coords_rows, saved = res
    n, h, w, c = img.shape
    ho, wo = out_hw
    p = ho * wo
    if h * w <= _DENSE_MAX_HW_BWD:
        bt, pt = _dense_tiles(n, p, h, w, c, bwd=True)
        in_specs = [
            pl.BlockSpec((bt, h * w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        g2 = g.reshape(n, p, c)
        operands = [img.reshape(n, h * w, c), coords_rows, g2]
        if _DENSE_MASK_IMPL == "mxu" or saved is not None:
            ey, ex = _axis_expanders(h, w)
            in_specs += [
                pl.BlockSpec((h, h * w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, h * w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands += [ey, ex]
            extra_specs, extra_ops = [], []
            if _DCRD_IMPL == "eyt":
                eyt, ext = _axis_collapsers(h, w)
                extra_specs = [
                    pl.BlockSpec((h * w, h), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((h * w, w), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ]
                extra_ops = [eyt, ext]
            dcrd_call = functools.partial(
                pl.pallas_call,
                _dense_bwd_kernel_mxu_dcrd(h, w, c, bt, pt,
                                           dcrd=_DCRD_IMPL),
                grid=(n // bt, p // pt),
                in_specs=in_specs + extra_specs,
                out_specs=pl.BlockSpec(
                    (bt, 2, pt), lambda i, j: (i, 0, j),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 2, p),
                                               coords_rows.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=V4_VMEM_LIMIT),
                interpret=interpret)
            if saved is not None:
                # residual path: d_img straight from the saved M; d_coords
                # rebuilds per-axis masks from coords (M = my*mx cannot be
                # factored back into the per-axis values dfy/dfx need).
                m = saved
                dimg_f = pl.pallas_call(
                    _dense_bwd_kernel_res_dimg(h, w, c, bt, pt),
                    grid=(n // bt, p // pt),
                    in_specs=[
                        pl.BlockSpec((bt, pt, h * w),
                                     lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (bt, h * w, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n, h * w, c),
                                                   jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "arbitrary"),
                        vmem_limit_bytes=V4_VMEM_LIMIT),
                    interpret=interpret,
                )(m, g2)
                dcrd = dcrd_call()(*operands, *extra_ops)
                return (dimg_f.reshape(n, h, w, c).astype(img.dtype),
                        dcrd)
            if _SPLIT_BWD:
                dimg_f = pl.pallas_call(
                    _dense_bwd_kernel_mxu_dimg(h, w, c, bt, pt),
                    grid=(n // bt, p // pt),
                    in_specs=in_specs,
                    out_specs=pl.BlockSpec(
                        (bt, h * w, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n, h * w, c),
                                                   jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "arbitrary"),
                        vmem_limit_bytes=V4_VMEM_LIMIT),
                    interpret=interpret,
                )(*operands)
                dcrd = dcrd_call()(*operands, *extra_ops)
                return (dimg_f.reshape(n, h, w, c).astype(img.dtype),
                        dcrd)
            kernel = _dense_bwd_kernel_mxu(h, w, c, bt, pt,
                                           dcrd=_DCRD_IMPL)
            in_specs = in_specs + extra_specs
            operands = operands + extra_ops
        else:
            kernel = _dense_bwd_kernel(h, w, c, bt, pt)
        dimg_f, dcrd = pl.pallas_call(
            kernel,
            grid=(n // bt, p // pt),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((bt, h * w, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, h * w, c), jnp.float32),
                jax.ShapeDtypeStruct((n, 2, p), coords_rows.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=V4_VMEM_LIMIT),
            interpret=interpret,
        )(*operands)
        return dimg_f.reshape(n, h, w, c).astype(img.dtype), dcrd
    bt, pt = _tiles(n, p, h, w, c, bwd=True)
    e, s = _expanders(w, c)
    img_h = img.reshape(n, h, w * c)
    g2 = g.reshape(n, p, c)
    in_specs = [
        pl.BlockSpec((bt, h, w * c), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w, w * c), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, w * c), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [img_h, coords_rows, g2, e, s.T]
    extra_specs, extra_ops = [], []
    if _DCRD_IMPL == "eyt":
        extra_specs = [pl.BlockSpec((w * c, w), lambda i, j: (0, 0),
                                    memory_space=pltpu.VMEM)]
        extra_ops = [e.T]
    dcrd_call = functools.partial(
        pl.pallas_call,
        _bwd_kernel_dcrd(h, w, c, bt, pt, dcrd=_DCRD_IMPL),
        grid=(n // bt, p // pt),
        in_specs=in_specs + extra_specs,
        out_specs=pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, p), coords_rows.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=V4_VMEM_LIMIT),
        interpret=interpret)
    if saved is not None:
        # residual path: d_img replays the saved A/B transposed weights;
        # d_coords rebuilds from coords (its derivative masks aren't
        # derivable from A/B where the fractional weight is exactly 0).
        a_t, b_tm = saved
        dimg_h = pl.pallas_call(
            _bwd_kernel_res_dimg(h, w, c, bt, pt),
            grid=(n // bt, p // pt),
            in_specs=[
                pl.BlockSpec((bt, h, pt), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, w, pt), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, pt, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, w * c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, w * c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, h, w * c), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w * c), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=V4_VMEM_LIMIT),
            interpret=interpret,
        )(a_t, b_tm, g2, e, s.T)
        dcrd = dcrd_call()(*operands, *extra_ops)
        return dimg_h.reshape(n, h, w, c).astype(img.dtype), dcrd
    if _SPLIT_BWD:
        dimg_h = pl.pallas_call(
            _bwd_kernel_dimg(h, w, c, bt, pt),
            grid=(n // bt, p // pt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bt, h, w * c), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w * c), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=V4_VMEM_LIMIT),
            interpret=interpret,
        )(*operands)
        dcrd = dcrd_call()(*operands, *extra_ops)
        dimg = dimg_h.reshape(n, h, w, c).astype(img.dtype)
        return dimg, dcrd
    dimg_h, dcrd = pl.pallas_call(
        _bwd_kernel(h, w, c, bt, pt, dcrd=_DCRD_IMPL),
        grid=(n // bt, p // pt),
        in_specs=in_specs + extra_specs,
        out_specs=(
            pl.BlockSpec((bt, h, w * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w * c), jnp.float32),
            jax.ShapeDtypeStruct((n, 2, p), coords_rows.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=V4_VMEM_LIMIT),
        interpret=interpret,
    )(*operands, *extra_ops)
    dimg = dimg_h.reshape(n, h, w, c).astype(img.dtype)  # free reshape
    return dimg, dcrd


bilinear_sample_rows.defvjp(_fwd, _bwd)


def bilinear_sample_tiled(img: jax.Array, coords: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """NHWC-coords convenience wrapper: coords (N, Ho, Wo, 2) like
    spatial_transformer.bilinear_sample. Pays one small coord transpose;
    the ST modules use ``affine_grid_rows`` + ``bilinear_sample_rows``
    to skip it."""
    n, ho, wo, _ = coords.shape
    rows = coords.reshape(n, ho * wo, 2).transpose(0, 2, 1)
    return bilinear_sample_rows(img, rows, (ho, wo), interpret)
