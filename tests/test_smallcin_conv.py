"""Banded-matmul small-cin conv (kernels/smallcin_conv.py) vs
lax.conv_general_dilated: forward and all three gradients must agree.
The band formulation is exact (0/1 selection matrices), so tolerances
are fp32 reassociation level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen.kernels.smallcin_conv import conv_small_cin


def _ref(x, kernel, bias):
    kh, kw = kernel.shape[0], kernel.shape[1]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@pytest.mark.parametrize("h,w,cin,cout,ks", [(32, 32, 3, 64, 3),
                                             (16, 16, 1, 8, 5),
                                             (9, 11, 4, 16, 3)])
def test_banded_forward_matches_conv(rng, h, w, cin, cout, ks):
    x = jnp.asarray(rng.randn(4, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(ks, ks, cin, cout).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    np.testing.assert_allclose(np.asarray(conv_small_cin(x, k, b)),
                               np.asarray(_ref(x, k, b)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ks", [3, 5])
def test_banded_grads_match_conv(rng, ks):
    x = jnp.asarray(rng.randn(3, 12, 10, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(ks, ks, 3, 24).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(24).astype(np.float32) * 0.1)
    gy = jnp.asarray(rng.randn(3, 12, 10, 24).astype(np.float32))

    def loss(fn, x, k, b):
        return jnp.sum(fn(x, k, b) * gy)

    g_band = jax.grad(lambda *a: loss(conv_small_cin, *a),
                      argnums=(0, 1, 2))(x, k, b)
    g_ref = jax.grad(lambda *a: loss(_ref, *a), argnums=(0, 1, 2))(x, k, b)
    for nm, a, bb in zip(["dx", "dkernel", "dbias"], g_band, g_ref):
        s = max(float(jnp.max(jnp.abs(bb))), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(bb) / s,
                                   rtol=2e-5, atol=2e-5, err_msg=nm)


def test_conv_module_routes_small_cin(rng, monkeypatch):
    """Conv.apply picks the banded path for cin<=4 when configured, and
    the result matches the XLA path bit-for-tolerance."""
    from catgen.kernels import config as kconfig
    from catgen.nn.layers import Conv
    conv = Conv(16, (3, 3))
    v = conv.init(jax.random.PRNGKey(0), (1, 8, 8, 3))
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    monkeypatch.setattr(kconfig, "smallcin_impl", "banded")
    y_band, _ = conv.apply(v, x)
    monkeypatch.setattr(kconfig, "smallcin_impl", "xla")
    y_xla, _ = conv.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_band), np.asarray(y_xla),
                               rtol=1e-5, atol=1e-5)
