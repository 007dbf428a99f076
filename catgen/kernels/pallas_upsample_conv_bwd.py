"""Pallas TPU kernels: backward pass of the fused nearest-upsample+conv.

Forward (pallas_upsample_conv.py) computes four parity convolutions with
collapsed kernels CK_de. The backward decomposes symmetrically:

  dX[q] = sum_{de,u} CK_de[u]^T . G_de[q - off_de - u]
          -> four *transposed* parity correlations on the parity planes of
             the cotangent, accumulated into one (N,H,W,Cin) output —
             structurally the same kernel as the forward with
             (Cin <-> Cout) swapped and taps flipped.

  dCK_de[u,v] = sum_n Xp_shift^T . G_de     (Cin, btHW) x (btHW, Cout)
          -> tap-wise matmuls with K = bt*H*W (MXU-friendly), accumulated
             across the batch grid into a revisited output block; the
             chain back to the original kxk kernel (dW = collapse^T(dCK))
             is a tiny einsum outside.

Both kernels avoid XLA's conv-transpose lowering entirely; everything is
MXU matmuls over VMEM-resident blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from catgen.kernels.upsample_conv import _collapse_matrix
from catgen.kernels.pallas_upsample_conv import (VMEM_LIMIT,
                                                 _collapsed_weights_and_pads)


def _dx_kernel(h: int, w: int, cin: int, cout: int, bt: int,
               tap_hw: Tuple[int, int]):
    kp_h, kp_w = tap_hw

    def kernel_fn(g_ref, wt_ref, out_ref):
        # g_ref: (bt, 4, h + kp_h - 1 + pad, w + kp_w - 1 + pad, cout)
        # wt_ref: (4, kp_h, kp_w, cout, cin) — flipped+transposed collapsed
        g = g_ref[:]
        acc = jnp.zeros((bt * h * w, cin), jnp.float32)
        for p in range(4):
            for u in range(kp_h):
                for v in range(kp_w):
                    gs = jax.lax.slice(
                        g, (0, p, u, v, 0),
                        (bt, p + 1, u + h, v + w, cout))
                    gs2 = gs.reshape(bt * h * w, cout)
                    acc = acc + jnp.dot(
                        gs2, wt_ref[p, u, v],
                        preferred_element_type=jnp.float32)
        out_ref[:] = acc.reshape(bt, h, w, cin).astype(out_ref.dtype)

    return kernel_fn


def _dw_kernel(h: int, w: int, cin: int, cout: int, bt: int,
               tap_hw: Tuple[int, int], offsets):
    kp_h, kp_w = tap_hw

    def kernel_fn(xp_ref, g_ref, out_ref):
        # xp_ref: (bt, hp, wp, cin); g_ref: (bt, 4, h, w, cout)
        # out_ref: (4, kp_h, kp_w, cin, cout), revisited across the grid
        i = pl.program_id(0)
        x = xp_ref[:]
        g = g_ref[:]
        for p in range(4):
            off_h, off_w = offsets[p]
            g2 = g[:, p].reshape(bt * h * w, cout)
            for u in range(kp_h):
                for v in range(kp_w):
                    xs = jax.lax.slice(
                        x, (0, off_h + u, off_w + v, 0),
                        (bt, off_h + u + h, off_w + v + w, cin))
                    xs2 = xs.reshape(bt * h * w, cin)
                    # contract the leading (bt*h*w) dims directly — avoids
                    # materializing the transpose in VMEM
                    contrib = jax.lax.dot_general(
                        xs2, g2,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                    @pl.when(i == 0)
                    def _init(p=p, u=u, v=v, contrib=contrib):
                        out_ref[p, u, v] = contrib

                    @pl.when(i > 0)
                    def _acc(p=p, u=u, v=v, contrib=contrib):
                        out_ref[p, u, v] = out_ref[p, u, v] + contrib

    return kernel_fn


def _parity_planes(g: jax.Array) -> jax.Array:
    """(N,2H,2W,Cout) -> (N,4,H,W,Cout) in parity order (d,e)."""
    n, hh, ww, cout = g.shape
    g6 = g.reshape(n, hh // 2, 2, ww // 2, 2, cout)
    return g6.transpose(0, 2, 4, 1, 3, 5).reshape(
        n, 4, hh // 2, ww // 2, cout)


def upsample2_conv_backward(x: jax.Array, kernel: jax.Array,
                            g: jax.Array, interpret=None):
    """Returns (dx, dkernel, dbias) for y = upsample2_conv(x, kernel)+bias.

    ``interpret=None`` resolves to ``config.pallas_interpret`` so the
    CATGEN_UPSAMPLE_BWD=pallas|hybrid selections are CPU-testable."""
    if interpret is None:
        from catgen.kernels import config as _kc
        interpret = _kc.pallas_interpret
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k_h, k_w = kernel.shape[0], kernel.shape[1]
    collapsed, (pt, pb, plft, prt), offsets = \
        _collapsed_weights_and_pads(kernel)
    kp_h = max(c.shape[0] for c in collapsed)
    kp_w = max(c.shape[1] for c in collapsed)

    planes = _parity_planes(g)                       # (n,4,h,w,cout)

    # ---- dX: pad parity planes so tap reads line up; per-parity padding
    # (left = u_max_de, right = -u_min_de) realized inside the union pad
    # with per-parity slice offsets folded into a shifted write instead:
    # simplest correct form — pad each parity plane to (h+kp_h-1, ...)
    # with (kp_h-1-shift, shift) where shift = off (forward slice start).
    padded = []
    wts = []
    for pidx, ck in enumerate(collapsed):
        off_h, off_w = offsets[pidx]
        # dxp[q] = sum_u CK^T[u] G[q - off - u]; q in [pt, pt+h)
        # => G index g_i = (q - pt) + (pt - off - u) = i + pt - off - u
        # pad G left by (off + kp-1 - pt ... ) derive: i + pt - off - u,
        # u in [0,kp): min index = i + pt - off - kp + 1, max = i + pt - off
        # left pad L = kp - 1 + off - pt (>=0), right pad R so that
        # i=h-1,u=0 -> h-1+pt-off <= h-1+R  => R = pt - off (>= -(kp-1))
        lp_h = kp_h - 1 + off_h - pt
        rp_h = pt - off_h
        lp_w = kp_w - 1 + off_w - plft
        rp_w = plft - off_w
        plane = planes[:, pidx]
        plane = jnp.pad(plane, ((0, 0),
                                (max(lp_h, 0), max(rp_h, 0)),
                                (max(lp_w, 0), max(rp_w, 0)),
                                (0, 0)))
        if lp_h < 0 or rp_h < 0 or lp_w < 0 or rp_w < 0:
            plane = plane[:,
                          max(-lp_h, 0):plane.shape[1] - max(-rp_h, 0),
                          max(-lp_w, 0):plane.shape[2] - max(-rp_w, 0)]
        padded.append(plane)
        ckp = jnp.zeros((kp_h, kp_w) + ck.shape[2:], ck.dtype)
        ckp = ckp.at[:ck.shape[0], :ck.shape[1]].set(ck)
        # taps flipped, channels transposed
        wts.append(ckp[::-1, ::-1].transpose(0, 1, 3, 2))
    # uniform pad to same shape (zero-padded kernels read in-bounds zeros)
    max_h = max(p.shape[1] for p in padded)
    max_w = max(p.shape[2] for p in padded)
    padded = [jnp.pad(p, ((0, 0), (0, max_h - p.shape[1]),
                          (0, max_w - p.shape[2]), (0, 0)))
              for p in padded]
    gstack = jnp.stack(padded, axis=1)               # (n,4,max_h,max_w,cout)
    wtstack = jnp.stack(wts, axis=0)                 # (4,kp,kp,cout,cin)

    def pick_bt(per_sample_bytes, budget=9 * 1024 * 1024):
        bt = max(int(budget // per_sample_bytes), 1)
        bt = min(bt, n)
        while n % bt:
            bt -= 1
        return bt

    bt_dx = pick_bt((2 * 4 * max_h * max_w * cout
                     + 2 * h * w * cin + h * w * cout * 2) * 4)
    dx = pl.pallas_call(
        _dx_kernel(h, w, cin, cout, bt_dx, (kp_h, kp_w)),
        grid=(n // bt_dx,),
        in_specs=[
            pl.BlockSpec((bt_dx, 4, max_h, max_w, cout),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, kp_h, kp_w, cout, cin),
                         lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt_dx, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cin), x.dtype),
        interpret=interpret,
    )(gstack, wtstack)

    # ---- dW via dCK accumulation
    xp = jnp.pad(x, ((0, 0), (pt, pb + kp_h - 1), (plft, prt + kp_w - 1),
                     (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    bt_dw = pick_bt((2 * hp * wp * cin + 2 * 4 * h * w * cout
                     + h * w * max(cin, cout) * 2) * 4)
    dck = pl.pallas_call(
        _dw_kernel(h, w, cin, cout, bt_dw, (kp_h, kp_w), offsets),
        grid=(n // bt_dw,),
        in_specs=[
            pl.BlockSpec((bt_dw, hp, wp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt_dw, 4, h, w, cout), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, kp_h, kp_w, cin, cout),
                               lambda i: (0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, kp_h, kp_w, cin, cout),
                                       jnp.float32),
        interpret=interpret,
    )(xp, _parity_planes(g))

    # chain dCK -> dW through the (linear) collapse: dW = M^T dCK
    dkernel = jnp.zeros((k_h, k_w, cin, cout), jnp.float32)
    pidx = 0
    for d in (0, 1):
        mh, _ = _collapse_matrix(k_h, d)
        for e in (0, 1):
            mw, _ = _collapse_matrix(k_w, e)
            dk = jnp.einsum("ua,vb,uvio->abio",
                            mh, mw, dck[pidx][:mh.shape[0], :mw.shape[0]],
                            preferred_element_type=jnp.float32)
            dkernel = dkernel + dk
            pidx += 1

    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dkernel.astype(kernel.dtype), dbias.astype(kernel.dtype)


# ---------------------------------------------------------------------------
# single-pass backward of the boundary-fused ladder block
# (pallas_upsample_conv.upsample2_conv_block): one kernel computes
#   dX, dCK partials, d(scale)/d(shift)/d(alpha) and d(bias)
# with the stats-cotangent fold (g = gy + gs1 + 2 y gs2) done in VMEM —
# no XLA parity de-interleave, kernel transposes or g_tot materialization.
# ---------------------------------------------------------------------------


def _fused_block_bwd_kernel(h: int, w: int, cin: int, cout: int, bt: int,
                            tap_hw: Tuple[int, int], offsets,
                            pads: Tuple[int, int, int, int]):
    kp_h, kp_w = tap_hw
    pt, pb, plft, prt = pads

    def kernel_fn(x_ref, y_ref, gy_ref, gs_ref, w_ref, sc_ref, sh_ref,
                  al_ref, dx_ref, dck_ref, dtr_ref, db_ref):
        i = pl.program_id(0)
        f32 = jnp.float32
        x = x_ref[:]                                   # (bt,h,w,cin)
        sc = sc_ref[0, :].astype(f32)
        sh = sh_ref[0, :].astype(f32)
        al = al_ref[0, :].astype(f32)
        xt = x.astype(f32) * sc + sh
        mask = xt >= 0
        xn = jnp.where(mask, xt, al * xt).astype(x.dtype)
        xpad = jnp.pad(xn, ((0, 0), (pt, pb + kp_h - 1),
                            (plft, prt + kp_w - 1), (0, 0)))

        # fold the BN-stats cotangents into the output cotangent in VMEM
        y = y_ref[:].astype(f32)                       # (bt,2h,2w,cout)
        gs1 = gs_ref[0, 0, :].astype(f32)
        gs2 = gs_ref[0, 1, :].astype(f32)
        g32 = gy_ref[:].astype(f32) + gs1 + 2.0 * y * gs2
        db = jnp.sum(g32, axis=(0, 1, 2))              # (cout,) bias grad
        g = g32.astype(x.dtype)

        # de-interleave the parity planes (inverse of the forward's
        # in-kernel depth-to-space: sublane/major dims only, lanes intact)
        gr = g.reshape(bt, h, 2, 2 * w, cout)
        planes = []
        for d in (0, 1):
            row = jax.lax.slice(
                gr, (0, 0, d, 0, 0), (bt, h, d + 1, 2 * w, cout)
            ).reshape(bt, h, w, 2, cout)
            for e in (0, 1):
                planes.append(jax.lax.slice(
                    row, (0, 0, 0, e, 0), (bt, h, w, e + 1, cout)
                ).reshape(bt, h, w, cout))

        # dX: correlation of each padded parity plane with the flipped
        # collapsed kernel; contraction hits cout on BOTH operands so the
        # weight transpose never materializes (MXU loads it transposed)
        acc_dx = jnp.zeros((bt * h * w, cin), f32)
        for p, (oh, ow) in enumerate(offsets):
            lp_h, rp_h = kp_h - 1 - pt + oh, pt - oh
            lp_w, rp_w = kp_w - 1 - plft + ow, plft - ow
            gpad = jnp.pad(planes[p], ((0, 0), (lp_h, rp_h),
                                       (lp_w, rp_w), (0, 0)))
            for u in range(kp_h):
                for v in range(kp_w):
                    gsl = jax.lax.slice(
                        gpad, (0, u, v, 0), (bt, u + h, v + w, cout)
                    ).reshape(bt * h * w, cout)
                    acc_dx = acc_dx + jax.lax.dot_general(
                        gsl, w_ref[p, kp_h - 1 - u, kp_w - 1 - v],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
        dxn = acc_dx.reshape(bt, h, w, cin)
        dxt = dxn * jnp.where(mask, 1.0, al)
        dx_ref[:] = (dxt * sc).astype(dx_ref.dtype)
        dsc = jnp.sum(dxt * x.astype(f32), axis=(0, 1, 2))
        dsh = jnp.sum(dxt, axis=(0, 1, 2))
        dal = jnp.sum(dxn * jnp.where(mask, 0.0, xt), axis=(0, 1, 2))
        dtr = jnp.stack([dsc, dsh, dal])               # (3, cin)

        # dCK: tap-wise (cin, btHW) x (btHW, cout) matmuls, accumulated
        # into the revisited fp32 output block across the batch grid
        for p, (oh, ow) in enumerate(offsets):
            g2 = planes[p].reshape(bt * h * w, cout)
            for u in range(kp_h):
                for v in range(kp_w):
                    xs = jax.lax.slice(
                        xpad, (0, oh + u, ow + v, 0),
                        (bt, oh + u + h, ow + v + w, cin)
                    ).reshape(bt * h * w, cin)
                    contrib = jax.lax.dot_general(
                        xs, g2, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32)

                    @pl.when(i == 0)
                    def _init(p=p, u=u, v=v, c=contrib):
                        dck_ref[p, u, v] = c

                    @pl.when(i > 0)
                    def _acc(p=p, u=u, v=v, c=contrib):
                        dck_ref[p, u, v] = dck_ref[p, u, v] + c

        @pl.when(i == 0)
        def _init_small():
            dtr_ref[:] = dtr
            db_ref[0, :] = db

        @pl.when(i > 0)
        def _acc_small():
            dtr_ref[:] = dtr_ref[:] + dtr
            db_ref[0, :] = db_ref[0, :] + db

    return kernel_fn


def fused_block_backward(x: jax.Array, in_scale: jax.Array,
                         in_shift: jax.Array, in_alpha: jax.Array,
                         kernel: jax.Array, y: jax.Array, gy: jax.Array,
                         gs1: jax.Array, gs2: jax.Array,
                         interpret: bool = False):
    """Full VJP of ``upsample2_conv_block`` in one Pallas pass.

    Returns (dx, dscale, dshift, dalpha(cin,), dkernel, dbias); the caller
    reduces dalpha to (1,) for a shared-slope PReLU.
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k_h, k_w = kernel.shape[0], kernel.shape[1]
    collapsed, (pt, pb, plft, prt), offsets = \
        _collapsed_weights_and_pads(kernel)
    kp_h = max(c.shape[0] for c in collapsed)
    kp_w = max(c.shape[1] for c in collapsed)
    for oh, ow in offsets:   # gpad pads must be non-negative (see kernel)
        assert 0 <= pt - oh <= kp_h - 1 and 0 <= plft - ow <= kp_w - 1
    wstack = jnp.zeros((4, kp_h, kp_w, cin, cout), kernel.dtype)
    for p, ck in enumerate(collapsed):
        wstack = wstack.at[p, :ck.shape[0], :ck.shape[1]].set(ck)

    # batch tile: fp32 temporaries dominate — x-side ~6 words/elem
    # (x, xt, mask, xn, dxn, dxt + halo), y-side ~5 words/elem
    # (y, gy, g32, g, planes + gpad); weights + dCK accumulator are
    # VMEM-resident for the whole sweep.
    fixed = (4 * kp_h * kp_w * cin * cout) * (4 + kernel.dtype.itemsize)
    per_sample = (h * w * cin * 6 + 4 * h * w * cout * 5) * 4
    budget = VMEM_LIMIT - fixed - (4 << 20)
    bt = max(min(int(budget // per_sample), n), 1)
    while n % bt:
        bt -= 1

    alpha = jnp.broadcast_to(in_alpha.reshape(-1), (cin,)) \
        if in_alpha.size == 1 else in_alpha
    gs = jnp.stack([gs1.astype(jnp.float32),
                    gs2.astype(jnp.float32)])[None]    # (1,2,cout)

    outs = pl.pallas_call(
        _fused_block_bwd_kernel(h, w, cin, cout, bt, (kp_h, kp_w),
                                offsets, (pt, pb, plft, prt)),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2 * h, 2 * w, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2 * h, 2 * w, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, kp_h, kp_w, cin, cout),
                         lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, kp_h, kp_w, cin, cout),
                         lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, cin), x.dtype),
            jax.ShapeDtypeStruct((4, kp_h, kp_w, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((3, cin), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, y, gy, gs, wstack, in_scale.reshape(1, cin),
      in_shift.reshape(1, cin), alpha.reshape(1, cin))
    dx, dck, dtr, db = outs

    # chain dCK -> dW through the (linear) collapse: dW = M^T dCK
    dkernel = jnp.zeros((k_h, k_w, cin, cout), jnp.float32)
    pidx = 0
    for d in (0, 1):
        mh, _ = _collapse_matrix(k_h, d)
        for e in (0, 1):
            mw, _ = _collapse_matrix(k_w, e)
            dkernel = dkernel + jnp.einsum(
                "ua,vb,uvio->abio", mh, mw,
                dck[pidx][:mh.shape[0], :mw.shape[0]],
                preferred_element_type=jnp.float32)
            pidx += 1

    dscale, dshift, dalpha = dtr[0], dtr[1], dtr[2]
    return (dx, dscale.astype(in_scale.dtype), dshift.astype(in_shift.dtype),
            dalpha, dkernel.astype(kernel.dtype),
            db[0].astype(jnp.float32))
