"""Pure-JAX optimizers with the reference's training-dynamics guards.

Reimplements the subset of Torch ``optim`` the reference drives its three
networks with (/root/reference/train.lua:191-207): adam, adagrad, sgd,
rmsprop — with Torch default hyperparameters — plus the reference's gradient
pipeline applied *before* the update (adversarial.lua:92-112, 201-212):

    g <- clip(g + l1 * sign(w) + l2 * w, -clamp, +clamp)     (elementwise)

Each network (G, D, V) carries its own independent optimizer state; both GAN
states live inside the single jitted train step (SURVEY.md §2.2 "two
independent states ... built into the jitted step").

Note: the reference has a bug where G's L1 term uses the L2 coefficient
(adversarial.lua:206); we implement the correct semantics (SURVEY.md
"reference bugs to not replicate").

API shape is optax-like but self-contained:
    opt = adam(lr)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    params = apply_updates(params, updates)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple]  # (grads, state, params) -> (updates, new_state)


def _tree_zeros_like(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def apply_updates(params, updates):
    return jax.tree_util.tree_map(lambda p, u: p + u, params, updates)


def clamp_and_penalize(grads, params, l1: float = 0.0, l2: float = 0.0,
                       clamp: float = 0.0):
    """The reference's grad pipeline: add L1/L2 penalty gradients, then
    elementwise clamp to ±clamp (0 disables clamping)."""

    def one(g, p):
        if l1:
            g = g + l1 * jnp.sign(p)
        if l2:
            g = g + l2 * p
        if clamp:
            g = jnp.clip(g, -clamp, clamp)
        return g

    return jax.tree_util.tree_map(one, grads, params)


# ---------------------------------------------------------------------------
# adam (torch defaults: lr 1e-3, beta1 .9, beta2 .999, eps 1e-8)
# ---------------------------------------------------------------------------


class AdamState(NamedTuple):
    step: jax.Array
    m: Any
    v: Any


def adam(lr: float = 1e-3, beta1: float = 0.9, beta2: float = 0.999,
         eps: float = 1e-8) -> Optimizer:
    def init(params):
        return AdamState(jnp.zeros((), jnp.int32),
                         _tree_zeros_like(params), _tree_zeros_like(params))

    def update(grads, state, params=None):
        del params
        step = state.step + 1
        t = step.astype(jnp.float32)
        bc1 = 1.0 - beta1 ** t
        bc2 = 1.0 - beta2 ** t
        m = jax.tree_util.tree_map(
            lambda mm, g: beta1 * mm + (1 - beta1) * g, state.m, grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: beta2 * vv + (1 - beta2) * jnp.square(g),
            state.v, grads)
        # torch optim.adam form: stepSize = lr * sqrt(bc2)/bc1;
        # update = -stepSize * m / (sqrt(v) + eps)
        step_size = lr * jnp.sqrt(bc2) / bc1
        updates = jax.tree_util.tree_map(
            lambda mm, vv: -step_size * mm / (jnp.sqrt(vv) + eps), m, v)
        return updates, AdamState(step, m, v)

    return Optimizer(init, update)


# ---------------------------------------------------------------------------
# adagrad (torch: update = -lr/(1+step*lrd) * g / (sqrt(sum g^2) + 1e-10))
# ---------------------------------------------------------------------------


class AdagradState(NamedTuple):
    step: jax.Array
    accum: Any


def adagrad(lr: float = 1e-3, lr_decay: float = 0.0) -> Optimizer:
    def init(params):
        return AdagradState(jnp.zeros((), jnp.int32), _tree_zeros_like(params))

    def update(grads, state, params=None):
        del params
        accum = jax.tree_util.tree_map(
            lambda a, g: a + jnp.square(g), state.accum, grads)
        clr = lr / (1.0 + state.step.astype(jnp.float32) * lr_decay)
        updates = jax.tree_util.tree_map(
            lambda g, a: -clr * g / (jnp.sqrt(a) + 1e-10), grads, accum)
        return updates, AdagradState(state.step + 1, accum)

    return Optimizer(init, update)


# ---------------------------------------------------------------------------
# sgd with classic momentum (torch optim.sgd semantics, no nesterov)
# ---------------------------------------------------------------------------


class SgdState(NamedTuple):
    momentum_buf: Any


def sgd(lr: float = 0.02, momentum: float = 0.0) -> Optimizer:
    def init(params):
        return SgdState(_tree_zeros_like(params))

    def update(grads, state, params=None):
        del params
        if momentum:
            buf = jax.tree_util.tree_map(
                lambda b, g: momentum * b + g, state.momentum_buf, grads)
            updates = jax.tree_util.tree_map(lambda b: -lr * b, buf)
            return updates, SgdState(buf)
        updates = jax.tree_util.tree_map(lambda g: -lr * g, grads)
        return updates, state

    return Optimizer(init, update)


# ---------------------------------------------------------------------------
# rmsprop (torch defaults: lr 1e-2, alpha 0.99, eps 1e-8)
# ---------------------------------------------------------------------------


class RmspropState(NamedTuple):
    ms: Any


def rmsprop(lr: float = 1e-2, alpha: float = 0.99, eps: float = 1e-8) -> Optimizer:
    def init(params):
        return RmspropState(_tree_zeros_like(params))

    def update(grads, state, params=None):
        del params
        ms = jax.tree_util.tree_map(
            lambda m, g: alpha * m + (1 - alpha) * jnp.square(g),
            state.ms, grads)
        updates = jax.tree_util.tree_map(
            lambda g, m: -lr * g / (jnp.sqrt(m) + eps), grads, ms)
        return updates, RmspropState(ms)

    return Optimizer(init, update)


# ---------------------------------------------------------------------------
# flat (raveled) pipeline — the reference's getParameters flattening
# ---------------------------------------------------------------------------
#
# train.lua:184-185 flattens each network's parameters into ONE contiguous
# vector and lets optim.* update that. The XLA-native motivation is op
# count, not pointer aliasing: per-leaf tree_map optimizers emit ~3-6 small
# fused ops per leaf (~70 leaves across G+D = hundreds of sub-50us kernels
# in the step's tail), while the same math over one raveled (N,) vector is
# a handful of full-size fusions. Checkpoints keep the per-leaf format —
# callers convert at the save/load boundary with opt_state_to_tree/flat.


def flat_init(opt: Optimizer, params):
    """Optimizer state over the raveled parameter vector."""
    from jax.flatten_util import ravel_pytree
    return opt.init(ravel_pytree(params)[0])


def flat_update(opt: Optimizer, grads, state, params,
                l1: float = 0.0, l2: float = 0.0, clamp: float = 0.0):
    """The whole reference grad pipeline + update + apply on one flat
    vector: returns (new_params_pytree, new_opt_state). Bit-identical to
    the per-leaf path (elementwise math, deterministic ravel order) —
    asserted by tests/test_flat_opt.py."""
    from jax.flatten_util import ravel_pytree
    g, _ = ravel_pytree(grads)
    p, unravel = ravel_pytree(params)
    if l1:
        g = g + l1 * jnp.sign(p)
    if l2:
        g = g + l2 * p
    if clamp:
        g = jnp.clip(g, -clamp, clamp)
    updates, new_state = opt.update(g, state, p)
    return unravel(p + updates), new_state


def opt_state_to_tree(state, params):
    """Flat optimizer state -> the per-leaf checkpoint format. Fields that
    are 1-D arrays of the raveled parameter size unravel to the params
    structure; everything else (step scalars, already-tree fields) passes
    through — so the conversion is format-detecting and idempotent."""
    from jax.flatten_util import ravel_pytree
    flat, unravel = ravel_pytree(params)
    n = flat.size

    def conv(f):
        if isinstance(f, (jnp.ndarray, jax.Array)) and f.ndim == 1 \
                and f.size == n:
            return unravel(f)
        return f

    return type(state)(*[conv(f) for f in state])


def opt_state_to_flat(state):
    """Per-leaf optimizer state -> flat. Fields that are param pytrees
    (anything that isn't a bare array) ravel to one vector; scalars and
    already-flat arrays pass through (idempotent)."""
    import numpy as np
    from jax.flatten_util import ravel_pytree

    def conv(f):
        if isinstance(f, (jnp.ndarray, jax.Array, np.ndarray)):
            return f
        return ravel_pytree(f)[0]

    return type(state)(*[conv(f) for f in state])


_FACTORIES = {"adam": adam, "adagrad": adagrad, "sgd": sgd, "rmsprop": rmsprop}


def make(name: str, **kwargs) -> Optimizer:
    """Factory mirroring the reference's --D_optmethod/--G_optmethod flags
    (train.lua:37-38, 191-207)."""
    try:
        factory = _FACTORIES[name]
    except KeyError:
        raise ValueError(f"unknown optimizer {name!r}; options: {sorted(_FACTORIES)}")
    return factory(**kwargs)
