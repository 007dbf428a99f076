"""Headline benchmark: combined G+D training images/sec/chip at 32x32.

Runs the flagship configuration — G32up-c vs D32_st3, color 32x32, the
reference's default models (models.lua:234-240, 268-277) — as the single
jitted two-optimizer train step and measures steady-state throughput on the
available chip(s). images/sec counts the per-step training batch
(``batch_size`` images through the D update AND a same-sized noise batch
through the G update, the reference's per-example accounting,
adversarial.lua:277-280).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 20000 (BASELINE.md target: >= 20k images/sec/chip).

Env knobs: BENCH_BS (per-chip batch, default 512), BENCH_STEPS (timed
steps, default 30), BENCH_DTYPE (bf16|f32, default bf16).
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


def main():
    from catgen import models
    from catgen.train import gan

    batch = int(os.environ.get("BENCH_BS", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    dtype = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
             else jnp.float32)

    config = gan.GanConfig(batch_size=batch, noise_dim=NOISE_DIM,
                           acc_window=20, compute_dtype=dtype)
    g = models.create_G_decoder_upsampling32c(IMG, NOISE_DIM)
    d = models.create_D32_st3(IMG)

    key = jax.random.PRNGKey(0)
    state = gan.init_state(g, d, config, key, IMG)
    step = jax.jit(gan.make_train_step(g, d, config), donate_argnums=(0,))

    half = batch // 2
    reals = jnp.asarray(
        np.random.RandomState(0).rand(half, *IMG).astype(np.float32))

    # warmup / compile. NOTE: on the axon-tunneled TPU, block_until_ready
    # returns before device execution completes — only a host fetch truly
    # synchronizes. All timing below therefore ends with a scalar fetch
    # from the final chained state (steps form a data-dependency chain, so
    # fetching the last state bounds the whole run).
    for i in range(3):
        state, metrics = step(state, reals, jax.random.PRNGKey(i))
    float(jnp.sum(metrics.loss_d))

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, reals, jax.random.PRNGKey(100 + i))
    _ = float(jnp.sum(state.g_opt.step) + metrics.loss_d)
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    imgs_per_sec = steps * batch / dt / n_chips
    print(json.dumps({
        "metric": "G+D train images/sec/chip @32x32 (G32up-c vs D32_st3)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
