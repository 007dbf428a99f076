"""Fused nearest-upsample(2x) + same-conv — the hot op of every G decoder.

The reference composes ``nn.SpatialUpSamplingNearest(2)`` with a 3x3/5x5
same-size conv in each G stage (/root/reference/models.lua:114-222). Done
naively, the conv runs on the 2Hx2W upsampled image: ``k*k * 4HW * Cin*Cout``
MACs, plus a 4x-sized intermediate written to HBM.

Because the upsampled image U[q,r] = x[floor(q/2), floor(r/2)] has only H*W
distinct pixels, the conv collapses algebraically: for each output parity
(d,e) in {0,1}^2,

    O[2i+d, 2j+e] = sum_{a,b} W[a,b] * x[i + floor((d+a)/2), j + floor((e+b)/2)]

so taps that map to the same x offset sum into a smaller effective kernel of
size k' = (k+1)//2 + (k-1)//2 - floor((k-1)/2 / 1) ... concretely k=3 -> 2,
k=5 -> 3, k=7 -> 4 per axis and parity. The fused op therefore runs **four
small convs on the original HxW image and interleaves the results**:

    k=3: 4 * 2*2 = 16 HW*Cin*Cout MACs vs 36 naive  (2.25x fewer FLOPs)
    k=5: 4 * 3*3 = 36 vs 100                         (2.78x fewer FLOPs)

and never materializes the upsampled intermediate in HBM. This is an
algebraic rewrite XLA cannot do on its own; it is exactly the
"fused upsample+conv" kernel BASELINE.json names as the north star. The
parity convs are expressed as one grouped XLA conv batch so they still tile
onto the MXU. Parameters are identical to the unfused
UpsampleNearest(2)+Conv pair, so either implementation can consume the same
checkpoint (regression-tested for exact equivalence in
tests/test_upsample_conv.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from catgen.core import initializers
from catgen.core.module import Module, make_variables


def _collapse_matrix(k: int, parity: int) -> Tuple[np.ndarray, int]:
    """Binary matrix M (k' x k) with M[u - u_min, a + p] = 1 where
    u = floor((parity + a)/2), a in [-p, p]; returns (M, u_min)."""
    p = (k - 1) // 2
    offsets = np.arange(-p, p + 1)
    u = np.floor_divide(parity + offsets, 2)
    u_min, u_max = int(u.min()), int(u.max())
    kp = u_max - u_min + 1
    m = np.zeros((kp, k), np.float32)
    for idx, a in enumerate(offsets):
        m[u[idx] - u_min, idx] = 1.0
    return m, u_min


def collapse_weights(kernel: jax.Array, parity_h: int, parity_w: int):
    """Collapses an HWIO kernel (k,k,Cin,Cout) for one output parity.

    Returns (collapsed kernel (k'h, k'w, Cin, Cout), (pad_h, pad_w)) where
    pad = (left, right) explicit conv padding reproducing zero-pad SAME
    semantics of the naive upsample+conv.
    """
    k_h, k_w = kernel.shape[0], kernel.shape[1]
    mh, u_min_h = _collapse_matrix(k_h, parity_h)
    mw, u_min_w = _collapse_matrix(k_w, parity_w)
    ck = jnp.einsum("ua,vb,abio->uvio", mh, mw, kernel,
                    preferred_element_type=jnp.float32).astype(kernel.dtype)
    kp_h, kp_w = mh.shape[0], mw.shape[0]
    pad_h = (-u_min_h, kp_h - 1 + u_min_h)
    pad_w = (-u_min_w, kp_w - 1 + u_min_w)
    return ck, (pad_h, pad_w)


@partial(jax.jit, static_argnames=())
def upsample2_conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Fused nearest-2x-upsample + same-conv (no bias).

    x: (N,H,W,Cin) NHWC; kernel: (k,k,Cin,Cout) HWIO, k odd.
    Returns (N,2H,2W,Cout), bit-equivalent (up to reassociation) to
    conv(upsample_nearest2(x), kernel, pad=(k-1)//2).
    """
    n, h, w, _ = x.shape
    cout = kernel.shape[-1]
    planes = []
    for d in (0, 1):
        for e in (0, 1):
            ck, (ph, pw) = collapse_weights(kernel, d, e)
            y = lax.conv_general_dilated(
                x, ck.astype(x.dtype),
                window_strides=(1, 1),
                padding=[ph, pw],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            planes.append(y)
    y = jnp.stack(planes, axis=-2)            # (N,H,W,4,Cout)
    y = y.reshape(n, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)          # (N,H,2,W,2,Cout)
    return y.reshape(n, 2 * h, 2 * w, cout)


def upsample2_conv_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Unfused reference implementation (upsample then conv) for tests and
    as a fallback. Same parameters."""
    n, h, w, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    up = up.reshape(n, 2 * h, 2 * w, c)
    p = (kernel.shape[0] - 1) // 2
    return lax.conv_general_dilated(
        up, kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class UpsampleConv(Module):
    """Module form: nearest-2x upsample fused with a kxk same conv.

    Drop-in for the reference's {SpatialUpSamplingNearest(2) +
    SpatialConvolution} pair; parameters are the plain conv's HWIO kernel and
    bias, so checkpoints are interchangeable with the unfused path.
    """

    def __init__(self, features: int, kernel_size: Tuple[int, int] = (3, 3),
                 init: str = "heuristic", use_bias: bool = True,
                 fused: bool = True, dtype=jnp.float32):
        assert kernel_size[0] % 2 == 1 and kernel_size[1] % 2 == 1
        self.features = features
        self.kernel_size = tuple(kernel_size)
        self.init_method = init
        self.use_bias = use_bias
        self.fused = fused
        self.dtype = dtype

    def init(self, key, x_shape):
        kh, kw = self.kernel_size
        cin = x_shape[-1]
        fan_in = cin * kh * kw
        fan_out = self.features * kh * kw
        w_init = initializers.uniform_fan(self.init_method)
        params = {"kernel": w_init(key, (kh, kw, cin, self.features),
                                   fan_in, fan_out, self.dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.features,), self.dtype)
        return make_variables(params)

    def apply(self, variables, x, *, train=False, rng=None):
        from catgen.kernels import config as kconfig

        p = variables["params"]
        impl = kconfig.resolve_upsample_impl() if self.fused else "naive"
        if impl == "pallas":
            from catgen.kernels.pallas_upsample_conv import upsample2_conv_bias
            bias = (p["bias"] if self.use_bias
                    else jnp.zeros((self.features,), p["kernel"].dtype))
            y = upsample2_conv_bias(x, p["kernel"].astype(x.dtype),
                                    bias.astype(x.dtype))
            return y, variables["state"]
        fn = upsample2_conv if impl == "collapsed" else upsample2_conv_reference
        y = fn(x, p["kernel"])
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y, variables["state"]

    def out_shape(self, x_shape):
        n, h, w, _ = x_shape
        return (n, 2 * h, 2 * w, self.features)
