"""Optimizer tests: torch-default semantics, clamp/L1/L2 pipeline,
convergence on a quadratic."""

import jax.numpy as jnp
import numpy as np
import pytest

from catgen import optim


def _params():
    return {"w": jnp.array([1.0, -2.0, 3.0]), "b": jnp.array([0.5])}


@pytest.mark.parametrize("name,kwargs", [
    ("adam", {"lr": 0.05}),
    ("adagrad", {"lr": 0.5}),
    ("sgd", {"lr": 0.1}),
    ("rmsprop", {"lr": 0.05}),
])
def test_optimizers_descend_quadratic(name, kwargs):
    opt = optim.make(name, **kwargs)
    params = {"w": jnp.array([5.0, -5.0])}
    state = opt.init(params)

    def grad(p):
        return {"w": 2.0 * p["w"]}  # d/dw of ||w||^2

    for _ in range(200):
        updates, state = opt.update(grad(params), state, params)
        params = optim.apply_updates(params, updates)
    assert float(jnp.abs(params["w"]).max()) < 1.0


def test_adam_first_step_size():
    # torch adam first step: update ~= -lr * sign(g) for g >> eps
    opt = optim.adam(lr=1e-3)
    params = {"w": jnp.array([0.0])}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.array([10.0])}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-1e-3], rtol=1e-4)


def test_clamp_and_penalize():
    params = {"w": jnp.array([2.0, -3.0])}
    grads = {"w": jnp.array([0.5, 10.0])}
    out = optim.clamp_and_penalize(grads, params, l1=0.1, l2=0.01, clamp=1.0)
    # g + l1*sign(w) + l2*w = [0.5+0.1+0.02, 10-0.1-0.03] then clamp +-1
    np.testing.assert_allclose(np.asarray(out["w"]), [0.62, 1.0], rtol=1e-5)


def test_clamp_disabled_when_zero():
    params = {"w": jnp.array([1.0])}
    grads = {"w": jnp.array([100.0])}
    out = optim.clamp_and_penalize(grads, params, clamp=0.0)
    np.testing.assert_allclose(np.asarray(out["w"]), [100.0])


def test_independent_states():
    # two networks, two states: updating one must not touch the other
    opt = optim.adam()
    p1, p2 = {"w": jnp.zeros(2)}, {"w": jnp.ones(3)}
    s1, s2 = opt.init(p1), opt.init(p2)
    _, s1b = opt.update({"w": jnp.ones(2)}, s1, p1)
    assert int(s1b.step) == 1 and int(s2.step) == 0
