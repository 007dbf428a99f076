"""Component-level performance probe with tunnel-honest timing.

On the axon-tunneled TPU two artifacts poison naive timing:
  * ``block_until_ready`` returns before device execution finishes — only
    a device->host fetch truly synchronizes;
  * each dispatched call pays a tunnel round trip (~tens of ms).

So every probe runs K iterations chained through data dependencies INSIDE
one jit (lax.fori_loop), ends with a single scalar fetch, and reports
per-iteration time. (SURVEY.md §5.1: the reference only printed epoch
wall-clock; this is the op/model-level equivalent.)

    python tools/perf_probe.py [g|d|step|sampler|all] [--bs 512] [--k 10]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from catgen import models  # noqa: E402
from catgen.train import gan  # noqa: E402

IMG = (32, 32, 3)


def _fetch(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def time_chain(name, chain_fn, init, k, n=2):
    """chain_fn: jitted fn running k chained iterations on ``init``."""
    t0 = time.perf_counter()
    out = chain_fn(init)
    _fetch(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = chain_fn(init)
        _fetch(out)
    per_iter = (time.perf_counter() - t0) / n / k
    print(f"{name}: {per_iter * 1e3:8.2f} ms/iter  (first call {compile_s:.0f}s)",
          flush=True)
    return per_iter


def probe_g(bs, dtype, k):
    g = models.create_G_decoder_upsampling32c(IMG, 100)
    gv = g.init(jax.random.PRNGKey(0), (1, 100))
    z0 = gan.uniform_noise(jax.random.PRNGKey(0), bs, 100).astype(dtype)

    @jax.jit
    def fwd_chain(z):
        def body(i, z):
            imgs, _ = g.apply(gv, z, train=False)
            return imgs.reshape(bs, -1)[:, :100] * 0.9 + z * 0.1
        return jax.lax.fori_loop(0, k, body, z)

    time_chain(f"G fwd bs={bs}", fwd_chain, z0, k)

    @jax.jit
    def bwd_chain(params):
        def loss(p, z):
            y, _ = g.apply({"params": p, "state": gv["state"]}, z,
                           train=True, rng=jax.random.PRNGKey(3))
            return jnp.sum(y.astype(jnp.float32))

        def body(i, p):
            grads = jax.grad(loss)(p, z0)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, grads)
        return jax.lax.fori_loop(0, k, body, params)

    time_chain(f"G fwd+bwd bs={bs}", bwd_chain, gv["params"], k)


def probe_d(bs, dtype, k, name="d32_st3"):
    r = np.random.RandomState(0)
    imgs = jnp.asarray(r.rand(bs, *IMG).astype(np.float32)).astype(dtype)
    d = models.D_REGISTRY[name](IMG)
    dv = d.init(jax.random.PRNGKey(1), (1,) + IMG)

    @jax.jit
    def fwd_chain(x):
        def body(i, x):
            y, _ = d.apply(dv, x, train=True, rng=jax.random.PRNGKey(2))
            return x * 0.999 + y[:, :1, None, None] * 1e-3
        return jax.lax.fori_loop(0, k, body, x)

    time_chain(f"{name} fwd bs={bs}", fwd_chain, imgs, k)

    @jax.jit
    def bwd_chain(params):
        def loss(p):
            y, _ = d.apply({"params": p, "state": dv["state"]}, imgs,
                           train=True, rng=jax.random.PRNGKey(2))
            return jnp.sum(y.astype(jnp.float32))

        def body(i, p):
            grads = jax.grad(loss)(p)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, grads)
        return jax.lax.fori_loop(0, k, body, params)

    time_chain(f"{name} fwd+bwd bs={bs}", bwd_chain, dv["params"], k)


def probe_step(bs, dtype, k, d_model="d32_st3", g_model="g32up_c"):
    config = gan.GanConfig(batch_size=bs, noise_dim=100, acc_window=20,
                           compute_dtype=dtype)
    g = models.G_REGISTRY[g_model](IMG, 100)
    d = models.D_REGISTRY[d_model](IMG)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
    step = gan.make_train_step(g, d, config)
    reals = jnp.asarray(np.random.RandomState(0).rand(
        bs // 2, *IMG).astype(np.float32))

    @jax.jit
    def chain(state):
        def body(i, st):
            st2, m = step(st, reals, jax.random.PRNGKey(0))
            return st2
        return jax.lax.fori_loop(0, k, body, state)

    dt = time_chain(f"train step ({g_model}+{d_model}) bs={bs}", chain,
                    state, k)
    print(f"  -> {bs / dt:8.0f} img/s/chip", flush=True)


def probe_sampler(bs, dtype, k):
    from catgen.nn.spatial_transformer import affine_grid, bilinear_sample
    from catgen.kernels.pallas_bilinear import bilinear_sample_mxu
    r = np.random.RandomState(0)
    for (h, c) in [(32, 3), (16, 64)]:
        img0 = jnp.asarray(r.rand(bs, h, h, c).astype(np.float32)).astype(dtype)
        theta = jnp.tile(jnp.asarray([[[0.9, 0.05, 0.01],
                                       [-0.05, 0.9, 0.0]]]), (bs, 1, 1))
        grid = affine_grid(theta, h, h).astype(dtype)
        for label, fn in [("XLA", bilinear_sample),
                          ("MXU", lambda i, g: bilinear_sample_mxu(i, g))]:
            @jax.jit
            def chain(img, fn=fn):
                def body(i, x):
                    return fn(x, grid) * 0.999 + 0.001
                return jax.lax.fori_loop(0, k, body, img)

            time_chain(f"sampler {label} {h}x{h}x{c} bs={bs}", chain,
                       img0, k)


def probe_sampler_bwd(bs, dtype, k):
    """fwd+bwd cost of the v3 sampler at the two D32_st3 shapes:
    input ST (32x32x3 -> 32x32) and the fused 3-branch ST
    (16x16x64 -> 48x16)."""
    from catgen.nn.spatial_transformer import affine_grid
    from catgen.kernels import config as kconfig
    bilinear_sample_batched = kconfig.get_mxu_sampler()
    kname = kconfig.sampler_kernel
    r = np.random.RandomState(0)
    for (h, c, n_tails) in [(32, 3, 1), (16, 64, 3)]:
        img0 = jnp.asarray(r.rand(bs, h, h, c).astype(np.float32)).astype(dtype)
        theta = jnp.tile(jnp.asarray([[[0.9, 0.05, 0.01],
                                       [-0.05, 0.9, 0.0]]]), (bs, 1, 1))
        grid = affine_grid(theta, h, h).astype(dtype)
        grid = jnp.concatenate([grid] * n_tails, axis=1)

        @jax.jit
        def fwd_chain(img):
            def body(i, x):
                y = bilinear_sample_batched(x, grid)
                return x * 0.999 + y[:, :h] * 1e-3
            return jax.lax.fori_loop(0, k, body, img)

        time_chain(f"{kname} fwd {h}x{h}x{c} P={n_tails * h * h} bs={bs}",
                   fwd_chain, img0, k)

        @jax.jit
        def bwd_chain(img):
            def loss(x, g_):
                return jnp.sum(bilinear_sample_batched(
                    x, g_).astype(jnp.float32))

            def body(i, x):
                dx, dg = jax.grad(loss, argnums=(0, 1))(x, grid)
                return x * 0.999 + dx.astype(x.dtype) * 1e-6
            return jax.lax.fori_loop(0, k, body, img)

        time_chain(f"{kname} fwd+bwd {h}x{h}x{c} P={n_tails * h * h} bs={bs}",
                   bwd_chain, img0, k)


def probe_gstages(bs, dtype, k):
    """Per-stage fused upsample-conv fwd / fwd+bwd (the G32up-c ladder)."""
    from catgen.kernels.pallas_upsample_conv import upsample2_conv_bias
    r = np.random.RandomState(0)
    stages = [  # (h, w, cin, cout, ksize)  — models.lua:196-228 ladder
        (4, 4, 512, 512, 3),
        (8, 8, 512, 256, 3),
        (16, 16, 256, 128, 5),
    ]
    for (h, w, cin, cout, ks) in stages:
        x0 = jnp.asarray(r.rand(bs, h, w, cin).astype(np.float32)).astype(dtype)
        kern = jnp.asarray(
            r.randn(ks, ks, cin, cout).astype(np.float32) * 0.05).astype(dtype)
        bias = jnp.zeros((cout,), dtype)
        macs = bs * (2 * h) * (2 * w) * cout * cin * ((ks + 1) // 2) ** 2

        @jax.jit
        def fwd_chain(x):
            def body(i, x):
                y = upsample2_conv_bias(x, kern, bias)
                return x * 0.999 + y[:, :h, :w, :cin] * 1e-3
            return jax.lax.fori_loop(0, k, body, x)

        dt = time_chain(f"stage {h}x{h}x{cin}->{cout} k{ks} fwd bs={bs}",
                        fwd_chain, x0, k)
        print(f"    {2 * macs / dt / 1e12:6.1f} TF/s", flush=True)

        @jax.jit
        def bwd_chain(x):
            def loss(x_, k_):
                return jnp.sum(upsample2_conv_bias(
                    x_, k_, bias).astype(jnp.float32))

            def body(i, x):
                dx, dk = jax.grad(loss, argnums=(0, 1))(x, kern)
                return x * 0.999 + dx.astype(x.dtype) * 1e-6
            return jax.lax.fori_loop(0, k, body, x)

        dt = time_chain(f"stage {h}x{h}x{cin}->{cout} k{ks} f+b bs={bs}",
                        bwd_chain, x0, k)
        print(f"    {3 * 2 * macs / dt / 1e12:6.1f} TF/s (f+b counted 3x)",
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("what", nargs="?", default="all")
    p.add_argument("--bs", type=int, default=512)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--dtype", default="bf16")
    p.add_argument("--d", default="d32_st3")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.what in ("g", "all"):
        probe_g(args.bs, dtype, args.k)
    if args.what in ("d", "all"):
        probe_d(args.bs, dtype, args.k, args.d)
    if args.what in ("sampler", "all"):
        probe_sampler(args.bs, dtype, args.k)
    if args.what == "samplerbwd":
        probe_sampler_bwd(args.bs, dtype, args.k)
    if args.what == "gstages":
        probe_gstages(args.bs, dtype, args.k)
    if args.what in ("step", "all"):
        probe_step(args.bs, dtype, args.k, args.d)


if __name__ == "__main__":
    main()
