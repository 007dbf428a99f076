"""Golden parity vs torch (CPU): catgen layers/optimizers implement the
same math as the Torch modules the reference was built from
(SURVEY.md §4(a) 'unit tests per kernel/layer against reference math').
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from catgen import nn, optim  # noqa: E402
from catgen.train.gan import bce  # noqa: E402


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv_matches_torch(key, rng):
    x = rng.randn(2, 3, 8, 8).astype(np.float32)  # NCHW for torch
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    layer = nn.Conv(5, (3, 3))
    variables = layer.init(key, (2, 8, 8, 3))
    # copy torch weights into catgen (OIHW -> HWIO)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    variables["params"]["kernel"] = jnp.asarray(w)
    variables["params"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    want = _nhwc(tconv(torch.from_numpy(x)))
    got, _ = layer.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv5_stride_matches_torch(key, rng):
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 5, stride=2, padding=2)
    layer = nn.Conv(6, (5, 5), strides=(2, 2))
    variables = layer.init(key, (2, 16, 16, 4))
    variables["params"]["kernel"] = jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
    variables["params"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    want = _nhwc(tconv(torch.from_numpy(x)))
    got, _ = layer.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_matches_torch(key, rng):
    x = (rng.randn(8, 3, 4, 4) * 2 + 1).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tbn.train()
    want = _nhwc(tbn(torch.from_numpy(x)))
    layer = nn.BatchNorm()
    variables = layer.init(key, (8, 4, 4, 3))
    got, state = layer.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                             train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    # running stats semantics match torch (momentum 0.1, unbiased var)
    np.testing.assert_allclose(np.asarray(state["mean"]),
                               tbn.running_mean.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               tbn.running_var.detach().numpy(),
                               rtol=1e-3, atol=1e-4)


def test_prelu_matches_torch(key, rng):
    x = rng.randn(4, 7).astype(np.float32)
    tp = torch.nn.PReLU()  # single shared 0.25, like the reference
    want = tp(torch.from_numpy(x)).detach().numpy()
    layer = nn.PReLU()
    variables = layer.init(key, (4, 7))
    got, _ = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_maxpool_avgpool_match_torch(rng):
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    want_max = _nhwc(torch.nn.MaxPool2d(2)(torch.from_numpy(x)))
    want_avg = _nhwc(torch.nn.AvgPool2d(2)(torch.from_numpy(x)))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_max = nn.MaxPool(2).forward(xj, train=False, rng=None)
    got_avg = nn.AvgPool(2).forward(xj, train=False, rng=None)
    np.testing.assert_allclose(np.asarray(got_max), want_max, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_avg), want_avg, rtol=1e-5)


def test_bce_matches_torch(rng):
    p = rng.rand(16).astype(np.float32) * 0.96 + 0.02
    t = (rng.rand(16) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p),
                              torch.from_numpy(t)).item()
    got = float(bce(jnp.asarray(p), jnp.asarray(t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_adam_matches_torch(rng):
    w0 = rng.randn(5).astype(np.float32)
    g0 = rng.randn(5).astype(np.float32)
    g1 = rng.randn(5).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-3, betas=(0.9, 0.999), eps=1e-8)
    for gnp in (g0, g1):
        topt.zero_grad()
        tw.grad = torch.from_numpy(gnp.copy())
        topt.step()

    opt = optim.adam(lr=1e-3)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for gnp in (g0, g1):
        updates, state = opt.update({"w": jnp.asarray(gnp)}, state, params)
        params = optim.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_sgd_momentum_matches_torch(rng):
    w0 = rng.randn(4).astype(np.float32)
    gs = [rng.randn(4).astype(np.float32) for _ in range(3)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.02, momentum=0.9)
    for gnp in gs:
        topt.zero_grad()
        tw.grad = torch.from_numpy(gnp.copy())
        topt.step()

    opt = optim.sgd(lr=0.02, momentum=0.9)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for gnp in gs:
        updates, state = opt.update({"w": jnp.asarray(gnp)}, state, params)
        params = optim.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_bce_impls_agree_with_torch_interior(rng):
    """Both BCE impls equal torch.nn.BCELoss away from saturation; they
    only diverge in the tails (see the saturation tests below)."""
    from catgen.train.gan import bce_clip, bce_torch
    p = rng.rand(16).astype(np.float32) * 0.96 + 0.02
    t = (rng.rand(16) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p),
                              torch.from_numpy(t)).item()
    assert float(bce_clip(jnp.asarray(p), jnp.asarray(t))) == \
        pytest.approx(want, rel=1e-5)
    assert float(bce_torch(jnp.asarray(p), jnp.asarray(t))) == \
        pytest.approx(want, rel=1e-5)


def test_bce_torch_gradient_alive_in_saturation():
    """The corpus-scale mode-B death (QUALITY.md round 5): past
    |logit| ~ 16.1, bce_clip's jnp.clip gives an EXACTLY-zero gradient to
    every upstream parameter, while Torch7's BCECriterion formulation
    (log(p+1e-12), never clipped) keeps dL/dlogit ~ (p - t) — the healthy
    recovery force the reference relies on."""
    from catgen.train.gan import bce_clip, bce_torch

    def loss_of_logit(fn, logit):
        return fn(jax.nn.sigmoid(jnp.asarray([logit], jnp.float32)),
                  jnp.ones((1,), jnp.float32))

    for logit in (-18.0, -25.0):
        g_clip = float(jax.grad(lambda l: loss_of_logit(bce_clip, l))(logit))
        g_torch = float(jax.grad(lambda l: loss_of_logit(bce_torch, l))(logit))
        assert g_clip == 0.0, f"clip grad unexpectedly alive at {logit}"
        # d/dlogit = p - t -> -1 while p >> 1e-12 (p=1.5e-8 at -18)
        assert g_torch == pytest.approx(-1.0, abs=0.4), (logit, g_torch)
    # even far below the eps knee it decays but never hits exact zero
    g_deep = float(jax.grad(lambda l: loss_of_logit(bce_torch, l))(-40.0))
    assert g_deep != 0.0


def test_saturated_sigmoid_recovers_only_with_torch_bce():
    """A saturated 'discriminator' (scalar logit at -18, target 1) under
    adam: bce_torch pulls it back through the dead zone; bce_clip's zero
    gradient leaves it pinned forever — the permanent-collapse mechanism."""
    from catgen.train.gan import bce_clip, bce_torch

    def run(fn, steps=400, lr=0.05):
        w = jnp.float32(-18.0)
        opt = optim.adam(lr=lr)
        state = opt.init({"w": w})
        grad_fn = jax.grad(
            lambda p: fn(jax.nn.sigmoid(p["w"][None]),
                         jnp.ones((1,), jnp.float32)))
        for _ in range(steps):
            updates, state = opt.update(grad_fn({"w": w}), state, {"w": w})
            w = optim.apply_updates({"w": w}, updates)["w"]
        return float(w)

    assert run(bce_clip) == -18.0          # exactly pinned
    assert run(bce_torch) > -2.0           # climbed out of saturation


def test_bce_torch_finite_at_exact_saturation():
    """f32 regression for the epoch-2 NaN (runs/audit5/bcefix s1): once a
    sigmoid saturates to EXACTLY 0.0f or 1.0f (|logit| > ~17 on the high
    side), the loss and the logit-gradient must stay finite for BOTH
    targets. The log1p(eps - p) formulation failed this: eps - p rounds
    to -1.0 in f32 and 0 * log(0) = NaN."""
    from catgen.train.gan import bce_torch
    for p in (0.0, 1.0):
        for t in (0.0, 1.0):
            v = float(bce_torch(jnp.asarray([p], jnp.float32),
                                jnp.asarray([t], jnp.float32)))
            assert np.isfinite(v), (p, t, v)

    def loss_of_logit(logit, t):
        return bce_torch(jax.nn.sigmoid(jnp.asarray([logit], jnp.float32)),
                         jnp.asarray([t], jnp.float32))

    for logit in (25.0, 120.0, -120.0):   # sigmoid == exactly 1.0f / 0.0f
        for t in (0.0, 1.0):
            g = float(jax.grad(loss_of_logit)(logit, t))
            assert np.isfinite(g), (logit, t, g)
