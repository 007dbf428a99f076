"""Unit tests for catgen.nn layers against reference math
(SURVEY.md §4(a): per-layer tests vs golden/numpy values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import nn
from catgen.core.module import param_count


def _apply(layer, key, x, **kw):
    variables = layer.init(key, x.shape)
    y, _ = layer.apply(variables, jnp.asarray(x), **kw)
    return variables, np.asarray(y)


def test_dense_shapes_and_bias_zero(key):
    layer = nn.Dense(7)
    x = np.ones((4, 3), np.float32)
    variables, y = _apply(layer, key, x)
    assert y.shape == (4, 7)
    np.testing.assert_array_equal(np.asarray(variables["params"]["bias"]), 0)


def test_dense_init_heuristic_range(key):
    # heuristic: uniform(-s, s), s = sqrt(1/(3*fan_in)) (weight-init.lua:14-16)
    layer = nn.Dense(4096)
    variables = layer.init(key, (1, 300))
    w = np.asarray(variables["params"]["kernel"])
    s = np.sqrt(1.0 / (3.0 * 300))
    assert np.abs(w).max() <= s
    assert w.std() == pytest.approx(s / np.sqrt(3), rel=0.05)


def test_conv_matches_manual(key, rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    layer = nn.Conv(5, (3, 3))
    variables, y = _apply(layer, key, x)
    k = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    # manual same-conv at an interior pixel
    i, j = 4, 5
    patch = x[0, i - 1:i + 2, j - 1:j + 2, :]
    want = np.einsum("hwc,hwcf->f", patch, k) + b
    np.testing.assert_allclose(y[0, i, j], want, rtol=1e-5, atol=1e-5)
    assert y.shape == (2, 8, 8, 5)


def test_leaky_relu_slope():
    layer = nn.LeakyReLU()
    x = jnp.array([-3.0, 0.0, 3.0])
    y = layer.forward(x, train=False, rng=None)
    np.testing.assert_allclose(np.asarray(y), [-1.0, 0.0, 3.0], atol=1e-6)


def test_prelu_shared_param(key):
    layer = nn.PReLU()
    x = jnp.array([[-2.0, 4.0]])
    variables = layer.init(key, (1, 2))
    assert variables["params"]["alpha"].shape == (1,)
    y, _ = layer.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), [[-0.5, 4.0]])


def test_batchnorm_train_normalizes(key, rng):
    x = (rng.randn(16, 4, 4, 3) * 5 + 2).astype(np.float32)
    layer = nn.BatchNorm()
    variables = layer.init(key, x.shape)
    y, state = layer.apply(variables, jnp.asarray(x), train=True)
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1, atol=1e-3)
    # running stats moved toward batch stats with momentum 0.1
    np.testing.assert_allclose(
        np.asarray(state["mean"]), 0.1 * x.mean(axis=(0, 1, 2)), rtol=1e-4)


def test_batchnorm_eval_uses_running_stats(key, rng):
    x = rng.randn(8, 3).astype(np.float32)
    layer = nn.BatchNorm()
    variables = layer.init(key, x.shape)
    y, state = layer.apply(variables, jnp.asarray(x), train=False)
    # fresh stats: mean 0 var 1 -> identity (eps-scaled)
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-5)
    assert state is variables["state"]


def test_dropout_eval_identity_and_train_scaling(key, rng):
    x = np.ones((512, 64), np.float32)
    layer = nn.Dropout(0.5)
    y_eval = layer.forward(jnp.asarray(x), train=False, rng=None)
    np.testing.assert_array_equal(np.asarray(y_eval), x)
    y = np.asarray(layer.forward(jnp.asarray(x), train=True, rng=key))
    assert set(np.unique(y)) <= {0.0, 2.0}
    assert y.mean() == pytest.approx(1.0, abs=0.05)


def test_spatial_dropout_drops_whole_channels(key):
    x = np.ones((4, 8, 8, 64), np.float32)
    layer = nn.SpatialDropout(0.5)
    y = np.asarray(layer.forward(jnp.asarray(x), train=True, rng=key))
    per_channel = y.reshape(4, 64, -1) if False else y.transpose(0, 3, 1, 2).reshape(4, 64, -1)
    # each (sample, channel) plane is constant 0 or 2
    assert np.all((per_channel == 0).all(-1) | (per_channel == 2.0).all(-1))


def test_pooling(key, rng):
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    mp = nn.MaxPool(2)
    ap = nn.AvgPool(2)
    ym = np.asarray(mp.forward(jnp.asarray(x), train=False, rng=None))
    ya = np.asarray(ap.forward(jnp.asarray(x), train=False, rng=None))
    np.testing.assert_array_equal(ym[0, :, :, 0], [[5, 7], [13, 15]])
    np.testing.assert_array_equal(ya[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_upsample_nearest():
    x = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32).reshape(1, 2, 2, 1)
    up = nn.UpsampleNearest(2)
    y = np.asarray(up.forward(jnp.asarray(x), train=False, rng=None))
    want = np.array([[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
                    np.float32)
    np.testing.assert_array_equal(y[0, :, :, 0], want)


def test_unpooling_zero_stuffing():
    x = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32).reshape(1, 2, 2, 1)
    up = nn.UnPooling(2)
    y = np.asarray(up.forward(jnp.asarray(x), train=False, rng=None))
    want = np.array([[1, 0, 2, 0], [0, 0, 0, 0], [3, 0, 4, 0], [0, 0, 0, 0]],
                    np.float32)
    np.testing.assert_array_equal(y[0, :, :, 0], want)


def test_subpixel_conv_matches_upsample_semantics(key, rng):
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    layer = nn.SubPixelConv(5, factor=2)
    variables, y = _apply(layer, key, x)
    assert y.shape == (2, 8, 8, 5)
    assert layer.out_shape(x.shape) == (2, 8, 8, 5)


def test_sequential_and_concat(key, rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    model = nn.Sequential([
        nn.Conv(4), nn.PReLU(), nn.ConcatBranches([
            nn.Sequential([nn.Conv(2)]),
            nn.Sequential([nn.Conv(6)]),
        ]),
        nn.Flatten(), nn.Dense(10),
    ])
    variables = model.init(key, x.shape)
    y, _ = model.apply(variables, jnp.asarray(x))
    assert y.shape == (2, 10)
    assert model.out_shape(x.shape) == (2, 10)
    assert param_count(variables) > 0


def test_gradients_flow(key, rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    model = nn.Sequential([nn.Conv(4), nn.PReLU(), nn.Flatten(), nn.Dense(1),
                           nn.Sigmoid()])
    variables = model.init(key, x.shape)

    def loss(params):
        y, _ = model.apply({"params": params, "state": variables["state"]},
                           jnp.asarray(x))
        return jnp.mean(y)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)
