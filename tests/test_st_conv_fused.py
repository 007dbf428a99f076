"""Fused [input-ST -> conv3x3 -> PReLU] kernel (pallas_st_conv) vs the
unfused reference composition (XLA bilinear_sample + conv_general_dilated),
forward and VJP, in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from catgen.kernels.pallas_st_conv import st_conv_prelu
from catgen.nn.spatial_transformer import affine_grid, bilinear_sample


def _reference(img, theta, kernel, bias, alpha):
    grid = affine_grid(theta.astype(jnp.float32), img.shape[1], img.shape[2])
    s = bilinear_sample(img.astype(jnp.float32), grid)
    z = jax.lax.conv_general_dilated(
        s, kernel.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z + bias
    a = alpha if alpha.size == 1 else alpha.reshape(1, 1, 1, -1)
    return jnp.where(z >= 0, z, a * z)


def _setup(rng, n=4, h=16, w=16, c=3, f=8, channelwise=False):
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    ang = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    theta = jnp.stack([
        jnp.stack([jnp.cos(ang), -jnp.sin(ang), 0.05 * jnp.ones(n)], -1),
        jnp.stack([jnp.sin(ang), jnp.cos(ang), -0.03 * jnp.ones(n)], -1),
    ], axis=1).astype(jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    alpha = jnp.asarray(rng.rand(f if channelwise else 1)
                        .astype(np.float32) * 0.5 + 0.05)
    return img, theta, kernel, bias, alpha


@pytest.mark.parametrize("channelwise", [False, True])
def test_forward_matches_reference(rng, channelwise):
    img, theta, kernel, bias, alpha = _setup(rng, channelwise=channelwise)
    got = st_conv_prelu(img, theta, kernel, bias, alpha, True)
    want = _reference(img, theta, kernel, bias, alpha)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)
    # identity transform sanity at tight tolerance on the conv itself
    eye = jnp.tile(jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0]]]), (4, 1, 1))
    got_i = st_conv_prelu(img, eye, kernel, bias, alpha, True)
    want_i = _reference(img, eye, kernel, bias, alpha)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=5e-2, rtol=5e-2)


def test_vjp_matches_reference(rng):
    img, theta, kernel, bias, alpha = _setup(rng, n=2, h=12, w=12, f=4)

    def fused(*a):
        return jnp.sum(st_conv_prelu(*a, True) ** 2)

    def ref(*a):
        return jnp.sum(_reference(*a) ** 2)

    gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(img, theta, kernel,
                                                  bias, alpha)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(img, theta, kernel,
                                                bias, alpha)
    names = ["d_img", "d_theta", "d_kernel", "d_bias", "d_alpha"]
    for name, a, b in zip(names, gf, gr):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-2,
                                   err_msg=name)


def test_fused_module_path_equals_split(rng):
    """The D32_st3 prefix module produces identical results through the
    fused kernel and the split [ST, Conv, PReLU] path (same params)."""
    from catgen.kernels import config as kconfig
    from catgen.models import create_D32_st3

    img_shape = (16, 16, 3)
    d = create_D32_st3(img_shape)
    variables = d.init(jax.random.PRNGKey(0), (1,) + img_shape)
    x = jnp.asarray(rng.rand(4, *img_shape).astype(np.float32))

    old = kconfig.st_conv_impl
    try:
        kconfig.st_conv_impl = "split"
        y_split, _ = d.apply(variables, x, train=False)
        kconfig.st_conv_impl = "fused"
        kconfig.st_conv_interpret = True
        y_fused, _ = d.apply(variables, x, train=False)
    finally:
        kconfig.st_conv_impl = old
        kconfig.st_conv_interpret = False
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_split),
                               atol=5e-2, rtol=5e-2)
