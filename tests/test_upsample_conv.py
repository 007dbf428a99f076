"""The fused upsample+conv must be exactly equivalent (up to float
reassociation) to the unfused nearest-upsample -> same-conv pipeline, for
every kernel size the G decoders use (3x3, 5x5) plus 7x7, including borders,
and in both forward and gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen.kernels.upsample_conv import (UpsampleConv, upsample2_conv,
                                          upsample2_conv_reference)


@pytest.mark.parametrize("k", [1, 3, 5, 7])
@pytest.mark.parametrize("hw", [(4, 4), (5, 7), (8, 8)])
def test_fused_matches_reference_forward(key, rng, k, hw):
    h, w = hw
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    kern = jnp.asarray(rng.randn(k, k, 3, 5).astype(np.float32) * 0.1)
    got = upsample2_conv(x, kern)
    want = upsample2_conv_reference(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_matches_reference_grad(key, rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    kern = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32) * 0.1)

    def f_fused(x, k):
        return jnp.sum(jnp.sin(upsample2_conv(x, k)))

    def f_ref(x, k):
        return jnp.sum(jnp.sin(upsample2_conv_reference(x, k)))

    gx1, gk1 = jax.grad(f_fused, argnums=(0, 1))(x, kern)
    gx2, gk2 = jax.grad(f_ref, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-5)


def test_module_fused_and_unfused_share_params(key, rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    fused = UpsampleConv(6, (5, 5), fused=True)
    unfused = UpsampleConv(6, (5, 5), fused=False)
    variables = fused.init(key, x.shape)
    y1, _ = fused.apply(variables, x)
    y2, _ = unfused.apply(variables, x)
    assert y1.shape == (2, 8, 8, 6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)


def test_check_grads_upsample_conv(rng):
    from jax.test_util import check_grads
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32) * 0.1)
    check_grads(upsample2_conv, (x, k), order=1, modes=("rev",),
                atol=1e-2, rtol=1e-2)
