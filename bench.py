"""Headline benchmark: combined G+D training throughput at 32x32.

Runs the flagship configuration — G32up-c vs D32_st3, color 32x32, the
reference's default models (models.lua:234-240, 268-277) — as the single
jitted two-optimizer train step and measures steady-state throughput.

Accounting ("combined G+D", BASELINE.md): each step trains D on
``batch_size`` images (half real, half generated; adversarial.lua:221-238)
AND trains G on a fresh ``batch_size``-noise batch pushed through D
(adversarial.lua:253-266) — 2*batch_size images consumed by training per
step. images/sec = 2 * batch_size * steps / wall. The per-network numbers
are recoverable by halving.

Timing honesty: on the axon-tunneled TPU, ``block_until_ready`` returns
before device execution completes; only a host fetch synchronizes. The
loop chains steps through the train state and ends with a scalar fetch of
the final state, which bounds the entire chain (see tools/perf_probe.py).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline = value / 20000 (BASELINE.md target).

Env knobs: BENCH_BS (per-chip batch, default 512), BENCH_STEPS (default
20), BENCH_DTYPE (bf16|f32, default bf16), BENCH_MODE (train|infer —
infer measures the sample.lua batch-inference pipeline: generate 1024,
D-rank, NN-search vs a 16k-image corpus, BASELINE.json config #5).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

IMG = (32, 32, 3)
NOISE_DIM = 100
TARGET = 20000.0


def _fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:8]))


def bench_train(batch, steps, dtype, augment):
    """True training loop: an epoch of *fresh* real half-batches is
    pre-staged on device (as GanHarness.run_epoch does) and consumed by
    the scanned epoch program — every step trains on distinct data, with
    on-device augmentation optionally enabled (adversarial.lua epoch
    semantics, not a same-batch dispatch loop)."""
    from catgen import models
    from catgen.train import gan

    config = gan.GanConfig(batch_size=batch, noise_dim=NOISE_DIM,
                           acc_window=20, compute_dtype=dtype,
                           augment=augment)
    g = models.create_G_decoder_upsampling32c(IMG, NOISE_DIM)
    d = models.create_D32_st3(IMG)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
    epoch = jax.jit(gan.make_train_epoch(g, d, config), donate_argnums=(0,))
    reals = jnp.asarray(np.random.RandomState(0).rand(
        steps, batch // 2, *IMG).astype(np.float32))

    state, _ = epoch(state, reals, jax.random.PRNGKey(1))   # compile+warm
    _fetch(state)

    t0 = time.perf_counter()
    state, metrics = epoch(state, reals, jax.random.PRNGKey(2))
    _fetch(state)
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    imgs_per_sec = 2 * batch * steps / dt / n_chips
    return {
        "metric": "combined G+D train images/sec/chip @32x32 "
                  "(G32up-c vs D32_st3, bf16, fresh data"
                  + (", augmented" if augment else "") + ")",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / TARGET, 3),
    }


def bench_infer(steps, dtype):
    """sample.lua pipeline as one jitted program: 1024 generate + D-rank +
    best-16 NN search against a 16k corpus (sample.lua:89-151 rebuilt;
    the NN scan is one matmul, SURVEY.md §3.4)."""
    from catgen import models
    from catgen.sample.sampler import nearest_neighbours
    from catgen.train import gan

    g = models.create_G_decoder_upsampling32c(IMG, NOISE_DIM)
    d = models.create_D32_st3(IMG)
    gv = g.init(jax.random.PRNGKey(0), (1, NOISE_DIM))
    dv = d.init(jax.random.PRNGKey(1), (1,) + IMG)
    corpus = jnp.asarray(np.random.RandomState(0).rand(
        16384, *IMG).astype(np.float32)).astype(dtype)
    count = 1024

    @jax.jit
    def pipeline(rng, carry):
        # `carry` is derived from the previous iteration's OUTPUT (the
        # best-image NN index): folding it into this iteration's rng makes
        # every run data-dependent on the full previous run — the repo's
        # timing-honesty protocol (KERNELS.md), so the final fetch bounds
        # the whole chain instead of measuring dispatch rate.
        rng = jax.random.fold_in(rng, carry)
        noise = gan.uniform_noise(rng, count, NOISE_DIM, dtype)
        imgs, _ = g.apply(gv, noise, train=False)
        scores, _ = d.apply(dv, imgs, train=False)
        order = jnp.argsort(-scores[:, 0])
        best = imgs[order[:16]]
        idx, dist = nearest_neighbours(best, corpus)
        carry = idx[0].astype(jnp.int32)  # binds G fwd, D rank, NN search
        return imgs, scores, idx, dist, carry

    carry = jnp.zeros((), jnp.int32)
    out = pipeline(jax.random.PRNGKey(2), carry)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = pipeline(jax.random.PRNGKey(10 + i), out[-1])
    float(out[-1])   # one final fetch closes the dependency chain
    dt = time.perf_counter() - t0
    sps = count * steps / dt / jax.local_device_count()
    return {
        "metric": "batch inference samples/sec/chip "
                  "(1024-gen + D-rank + NN-search)",
        "value": round(sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / TARGET, 3),
    }


def main():
    batch = int(os.environ.get("BENCH_BS", "640"))  # measured sweet spot
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
             else jnp.float32)
    mode = os.environ.get("BENCH_MODE", "train")
    augment = os.environ.get("BENCH_AUGMENT", "1") == "1"
    if mode == "infer":
        result = bench_infer(max(steps, 5), dtype)
    else:
        result = bench_train(batch, steps, dtype, augment)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
