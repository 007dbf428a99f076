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
from catgen.kernels.pallas_upsample_conv import _collapsed_weights_and_pads


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
                            g: jax.Array, interpret: bool = False):
    """Returns (dx, dkernel, dbias) for y = upsample2_conv(x, kernel)+bias."""
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
