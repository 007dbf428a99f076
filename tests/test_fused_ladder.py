"""Boundary-fused G decoder ladder (nn/fused.py) vs the plain Sequential
path: forward, BatchNorm state updates, and gradients must agree (the
fused path computes BN statistics from fp32 kernel accumulators, so
tolerances are at bf16-rounding level). The fused run uses the Pallas
kernels in interpret mode on CPU; the plain run uses the mathematically
identical collapsed-XLA path."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import models
from catgen.core.module import Sequential
from catgen.kernels import config as kconfig


@contextlib.contextmanager
def _impl(name, interpret=False):
    orig_impl, orig_int = kconfig.upsample_impl, kconfig.pallas_interpret
    kconfig.upsample_impl = name
    kconfig.pallas_interpret = interpret
    try:
        yield
    finally:
        kconfig.upsample_impl = orig_impl
        kconfig.pallas_interpret = orig_int


def _models(factory=models.create_G_decoder_upsampling32c, img=(32, 32, 3)):
    g = factory(img, 100)
    gv = g.init(jax.random.PRNGKey(0), (1, 100))
    return g, gv


def test_fused_ladder_forward_matches_plain(rng):
    g, gv = _models()
    z = jnp.asarray(rng.randn(4, 100).astype(np.float32))
    with _impl("pallas", interpret=True):
        y_fused, st_fused = g.apply(gv, z, train=True,
                                    rng=jax.random.PRNGKey(1))
    with _impl("collapsed"):
        y_plain, st_plain = Sequential.apply(g, gv, z, train=True,
                                             rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=2e-2, atol=2e-2)
    # BatchNorm running-stat updates agree
    fl = jax.tree_util.tree_leaves(st_fused)
    pl_ = jax.tree_util.tree_leaves(st_plain)
    assert len(fl) == len(pl_)
    for a, b in zip(fl, pl_):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_fused_ladder_eval_matches_plain(rng):
    g, gv = _models()
    z = jnp.asarray(rng.randn(3, 100).astype(np.float32))
    with _impl("pallas", interpret=True):
        y_fused, _ = g.apply(gv, z, train=False)
    with _impl("collapsed"):
        y_plain, _ = Sequential.apply(g, gv, z, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=2e-2, atol=2e-2)


def test_fused_ladder_grads_match_plain(rng):
    g16, gv = _models(models.create_G_decoder_upsampling16, (16, 16, 3))
    z = jnp.asarray(rng.randn(4, 100).astype(np.float32))
    tgt = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))

    def loss(p, fn):
        y, _ = fn({"params": p, "state": gv["state"]}, z, train=True,
                  rng=jax.random.PRNGKey(1))
        return jnp.mean((y - tgt) ** 2)

    with _impl("pallas", interpret=True):
        gf = jax.grad(lambda p: loss(p, g16.apply))(gv["params"])
    with _impl("collapsed"):
        gp = jax.grad(lambda p: loss(
            p, lambda v, x, **kw: Sequential.apply(g16, v, x, **kw)
        ))(gv["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gp)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("ks,cin,cout,alpha_n", [(3, 16, 24, 1),
                                                 (5, 8, 16, 8)])
def test_fused_block_pallas_bwd_matches_xla(rng, ks, cin, cout, alpha_n):
    """The single-pass Pallas backward (fused_block_backward) returns the
    same six cotangents as the XLA collapsed-conv VJP."""
    from catgen.kernels.pallas_upsample_conv import upsample2_conv_block
    n, h, w = 4, 6, 6
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    kern = jnp.asarray(rng.randn(ks, ks, cin, cout).astype(np.float32) * .2)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    scale = jnp.asarray(rng.rand(cin).astype(np.float32) + .5)
    shift = jnp.asarray(rng.randn(cin).astype(np.float32) * .3)
    alpha = jnp.asarray(rng.rand(alpha_n).astype(np.float32) * .5)
    gy = jnp.asarray(rng.randn(n, 2 * h, 2 * w, cout).astype(np.float32))
    gs1 = jnp.asarray(rng.randn(cout).astype(np.float32) * .01)
    gs2 = jnp.asarray(rng.randn(cout).astype(np.float32) * .01)

    def run():
        def loss(x, scale, shift, alpha, kern, bias):
            y, s1, s2 = upsample2_conv_block(x, scale, shift, alpha, kern,
                                             bias, True)
            return (jnp.sum(y * gy) + jnp.sum(s1 * gs1) + jnp.sum(s2 * gs2))
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            x, scale, shift, alpha, kern, bias)

    orig = kconfig.ladder_bwd
    try:
        kconfig.ladder_bwd = "xla_vjp"     # autodiff ground truth
        g_ref = run()
        results = {}
        for backend in ("pallas", "xla"):
            kconfig.ladder_bwd = backend
            results[backend] = run()
    finally:
        kconfig.ladder_bwd = orig
    names = ["dx", "dscale", "dshift", "dalpha", "dkernel", "dbias"]
    for backend, grads in results.items():
        for nm, a, b in zip(names, grads, g_ref):
            s = max(float(jnp.max(jnp.abs(b))), 1e-3)
            np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"{backend}:{nm}")
