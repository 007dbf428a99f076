"""Banded-matmul convolution for tiny input-channel counts.

The D models' first conv consumes the C=3 image (models.lua:645-647,
D32_st3's `SpatialConvolution(3, 64, 3, 3)` after the input ST). On TPU,
XLA lowers a cin=3 NHWC conv by relayouting the activation to a
batch-minor tiling ({0,3,2,1}) — measured ~2.2 ms/step of copies + slow
convs for a FLOP-trivial layer (device traces, KERNELS.md §5).

This module reformulates the conv as row-tap matmuls on the
channel-merged image, which needs NO relayout in either direction:

    xm = x.reshape(n, h, w*cin)            # free: merges minor dims
    xp = pad(xm)                           # rows by (kh-1)/2, lanes by
                                           # (kw-1)/2*cin each side
    y[n, i, j*cout+co] = sum_u  xp[n, i+u] @ Wband_u
    Wband_u[(j+v)*cin + c, j*cout + co] = K[u, v, c, co]

i.e. one (n*h, L) x (L, w*cout) MXU matmul per row tap with
L = (w + kw - 1) * cin. The band matrix wastes L / (kw*cin) of the MACs
(~11x for 32x32x3 k3) but the layer is FLOP-trivial — trading FLOPs for
zero layout traffic is the right TPU deal. The output reshape
(n, h, w*cout) -> (n, h, w, cout) is again free.

Backward is the same story transposed: dX via dy @ Wband^T with row
shifts, dK via xp^T dy band-extracted — all standard MXU dots. Exact
custom VJP (tests/test_smallcin_conv.py checks fwd + all grads against
lax.conv_general_dilated to fp32 tolerance).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=16)
def _band_map(w: int, kw: int, cin: int) -> np.ndarray:
    """One-hot B[l, j, v, c] = 1 iff l == (j+v)*cin + c, for building
    Wband = einsum('ljvc,vco->ljo', B, K[u]) and its transpose chain."""
    L = (w + kw - 1) * cin
    b = np.zeros((L, w, kw, cin), np.float32)
    for j in range(w):
        for v in range(kw):
            for c in range(cin):
                b[(j + v) * cin + c, j, v, c] = 1.0
    return b


def _bands(kernel: jax.Array, w: int):
    kh, kw, cin, cout = kernel.shape
    b = jnp.asarray(_band_map(w, kw, cin))
    # (kh, L, w*cout)
    return jnp.einsum("ljvc,uvco->uljo", b, kernel).reshape(
        kh, (w + kw - 1) * cin, w * cout)


def _fwd_impl(x, kernel, bias):
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    bands = _bands(kernel.astype(x.dtype), w)
    xm = x.reshape(n, h, w * cin)
    xp = jnp.pad(xm, ((0, 0), (ph, ph), (pw * cin, pw * cin)))
    y = None
    for u in range(kh):
        rows = lax.slice(xp, (0, u, 0), (n, u + h, xp.shape[2]))
        contrib = jnp.einsum("nil,lo->nio", rows, bands[u])
        y = contrib if y is None else y + contrib
    y = y.reshape(n, h, w, cout)
    return y + bias.astype(y.dtype)


@jax.custom_vjp
def conv_small_cin(x, kernel, bias):
    """'same' stride-1 NHWC conv via banded matmuls (small cin path).

    Odd kernel sizes only: the symmetric (k-1)//2 'same' padding this
    formulation assumes is undefined for even k (the u=kh-1 row-tap slice
    would run past the padded rows)."""
    kh, kw = kernel.shape[:2]
    if kh % 2 != 1 or kw % 2 != 1:
        raise ValueError(
            f"conv_small_cin requires odd kernel sizes, got {kh}x{kw}")
    return _fwd_impl(x, kernel, bias)


def _sc_fwd(x, kernel, bias):
    return _fwd_impl(x, kernel, bias), (x, kernel, bias)


def _sc_bwd(res, gy):
    x, kernel, bias = res
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    L = (w + kw - 1) * cin
    gyf = gy.reshape(n, h, w * cout)
    bands = _bands(kernel.astype(x.dtype), w)          # (kh, L, w*cout)

    # dX: per row tap, dy @ Wband^T lands on padded-x rows [u, u+h)
    dxp = jnp.zeros((n, h + kh - 1, L), jnp.float32)
    for u in range(kh):
        contrib = jnp.einsum("nio,lo->nil", gyf, bands[u],
                             preferred_element_type=jnp.float32)
        dxp = dxp.at[:, u:u + h, :].add(contrib)
    dx = lax.slice(dxp, (0, ph, pw * cin),
                   (n, ph + h, pw * cin + w * cin))
    dx = dx.reshape(n, h, w, cin).astype(x.dtype)

    # dK: big-K dots xp^T gy, then band extraction back to (kh,kw,cin,cout)
    xm = x.reshape(n, h, w * cin)
    xp = jnp.pad(xm, ((0, 0), (ph, ph), (pw * cin, pw * cin)))
    b = jnp.asarray(_band_map(w, kw, cin))              # (L, w, kw, cin)
    dk = None
    for u in range(kh):
        rows = lax.slice(xp, (0, u, 0), (n, u + h, L))
        dband = jnp.einsum("nil,nio->lo", rows, gyf,
                           preferred_element_type=jnp.float32)
        contrib = jnp.einsum("ljvc,ljo->vco", b,
                             dband.reshape(L, w, cout))
        contrib = contrib[None]
        dk = contrib if u == 0 else jnp.concatenate([dk, contrib])
    dkernel = dk.astype(kernel.dtype)
    dbias = jnp.sum(gy.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dkernel, dbias.astype(bias.dtype)


conv_small_cin.defvjp(_sc_fwd, _sc_bwd)
