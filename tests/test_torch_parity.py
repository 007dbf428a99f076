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
        # under jit too: the first bce_torch formulations were only safe
        # eagerly (XLA reassociated/folded the eps away; QUALITY.md r5)
        for jit in (False, True):
            gfun_c = jax.grad(lambda l: loss_of_logit(bce_clip, l))
            gfun_t = jax.grad(lambda l: loss_of_logit(bce_torch, l))
            if jit:
                gfun_c, gfun_t = jax.jit(gfun_c), jax.jit(gfun_t)
            g_clip, g_torch = float(gfun_c(logit)), float(gfun_t(logit))
            assert g_clip == 0.0, f"clip grad unexpectedly alive at {logit}"
            # d/dlogit = p - t -> -1 while p > eps (p=1.5e-8 at -18)
            assert g_torch == pytest.approx(-1.0, abs=0.4), (logit, g_torch)
    # past the eps floor (p < 1e-12, logit < ~-27.6) the maximum-floor
    # form goes exactly 0 — where the sigmoid jacobian is ~1e-18 anyway;
    # bce_logits is the impl that stays alive at ANY depth
    from catgen.train.gan import bce_logits
    for jit in (False, True):
        gfun = jax.grad(lambda l: bce_logits(jnp.asarray([l], jnp.float32),
                                             jnp.ones((1,), jnp.float32)))
        if jit:
            gfun = jax.jit(gfun)
        for logit in (-40.0, -120.0, 120.0):
            g = float(gfun(logit))
            expect = (jax.nn.sigmoid(logit) - 1.0)
            assert g == pytest.approx(float(expect), abs=1e-6), (logit, g)


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

    for jit in (False, True):   # the -inf/NaN only appeared UNDER JIT:
        # XLA reassociates 1 - p + eps to (1 + eps) - p and folds the eps
        # away — eager-only tests missed it (QUALITY.md round 5)
        val = jax.jit(loss_of_logit) if jit else loss_of_logit
        gfun = jax.jit(jax.grad(loss_of_logit)) if jit \
            else jax.grad(loss_of_logit)
        for logit in (25.0, 120.0, -120.0):  # sigmoid == exactly 1/0
            for t in (0.0, 1.0):
                v = float(val(logit, t))
                g = float(gfun(logit, t))
                assert np.isfinite(v), (jit, logit, t, v)
                assert np.isfinite(g), (jit, logit, t, g)
