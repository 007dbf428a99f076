"""Mask-multiply max-pool backward vs the reduce_window/select_and_scatter
formulation (kernels/maxpool.py). Reference op: nn.SpatialMaxPooling(2,2)
in every D/V model (models.lua:287,577,640-711,765-804)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen.kernels.maxpool import max_pool_mask, max_pool_sas


def _tie_free(shape, seed=0):
    """Random input with all-distinct values (no pooling ties)."""
    rng = np.random.RandomState(seed)
    flat = rng.permutation(int(np.prod(shape))).astype(np.float32)
    return jnp.asarray(flat.reshape(shape) / flat.size)


@pytest.mark.parametrize("shape,window", [
    ((2, 8, 8, 3), 2),
    ((3, 16, 16, 5), 2),
    ((2, 9, 9, 4), 2),     # VALID crop: trailing row/col dropped
    ((1, 12, 12, 2), 3),
])
def test_forward_matches_reduce_window(shape, window):
    x = _tie_free(shape)
    np.testing.assert_array_equal(max_pool_mask(x, window),
                                  max_pool_sas(x, window))


@pytest.mark.parametrize("shape,window", [
    ((2, 8, 8, 3), 2),
    ((2, 9, 9, 4), 2),
    ((1, 12, 12, 2), 3),
])
def test_grad_matches_select_and_scatter(shape, window):
    x = _tie_free(shape, seed=3)
    g = jnp.asarray(np.random.RandomState(7).randn(
        *max_pool_sas(x, window).shape).astype(np.float32))

    def loss(fn, x):
        return jnp.sum(fn(x, window) * g)

    d_mask = jax.grad(lambda x: loss(max_pool_mask, x))(x)
    d_sas = jax.grad(lambda x: loss(max_pool_sas, x))(x)
    np.testing.assert_allclose(d_mask, d_sas, rtol=0, atol=0)


def test_ties_split_and_preserve_sum():
    # A block of four equal values: select_and_scatter routes the whole
    # gradient to one; the mask backward splits it evenly. Both preserve
    # the gradient sum.
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)
    d = jax.grad(lambda x: jnp.sum(max_pool_mask(x, 2)))(x)
    np.testing.assert_allclose(np.asarray(d).ravel(), [0.25] * 4)
    assert float(jnp.sum(d)) == 1.0


def test_layer_dispatch_respects_knob(monkeypatch):
    from catgen.kernels import config, maxpool

    x = _tie_free((2, 8, 8, 3))
    monkeypatch.setattr(config, "maxpool_bwd", "mask")
    y_mask = maxpool.max_pool(x, 2)
    monkeypatch.setattr(config, "maxpool_bwd", "sas")
    y_sas = maxpool.max_pool(x, 2)
    np.testing.assert_array_equal(y_mask, y_sas)


def test_overlapping_falls_back_to_sas(monkeypatch):
    from catgen.kernels import config, maxpool

    monkeypatch.setattr(config, "maxpool_bwd", "mask")
    x = _tie_free((1, 8, 8, 2))
    # window 3 stride 1: overlapping -> must use the reduce_window path
    y = maxpool.max_pool(x, 3, 1)
    ref = max_pool_sas(x, 3, 1)
    np.testing.assert_array_equal(y, ref)


def test_bf16_dtype_preserved():
    x = _tie_free((2, 8, 8, 3)).astype(jnp.bfloat16)
    y = max_pool_mask(x, 2)
    assert y.dtype == jnp.bfloat16
    d = jax.grad(lambda x: jnp.sum(max_pool_mask(x, 2).astype(jnp.float32)))(x)
    assert d.dtype == jnp.bfloat16
