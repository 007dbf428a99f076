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

Prints JSON lines {"metric", "value", "unit", "vs_baseline"};
vs_baseline = value / 20000 (BASELINE.md target). The default mode
(``all``) emits ALL FIVE BASELINE configs as JSONL — infer, V-train,
pretrain, 64px pyramid train, and the 32px train headline LAST (the
driver parses the final line).

Env knobs: BENCH_BS (per-chip batch, default 640; 256 at scale 64),
BENCH_STEPS (default 50), BENCH_DTYPE (bf16|f32, default bf16),
BENCH_SCALE (32|64 — 64 benches the Laplacian-style G64_stack vs D64
pyramid config, README.md:156-188), BENCH_CORPUS (NN corpus size for
infer, default 100000 = the reference's real ~100k-crop workload,
README.md:281), BENCH_MODE:
  all      all five configs as JSONL, headline last (default)
  train    combined G+D train step (the headline, BASELINE config)
  infer    sample.lua batch-inference pipeline: generate 1024, D-rank,
           NN-search vs the corpus (BASELINE.json config #5)
  train_v  V-trainer scanned epoch INCLUDING the on-device synthetic
           generators (train_v.lua:294-528 was the reference's worst
           host hot loop)
  pretrain G-autoencoder MSE warm-up epoch (pretrain_g.lua:138-187)
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


def bench_train(batch, steps, dtype, augment, scale=32):
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
    if scale == 64:
        img = (64, 64, 3)
        g = models.G_REGISTRY["g64_stack"](img, NOISE_DIM)
        d = models.D_REGISTRY["d64"](img)
        pair = "G64_stack vs D64"
    else:
        img = IMG
        g = models.create_G_decoder_upsampling32c(IMG, NOISE_DIM)
        d = models.create_D32_st3(IMG)
        pair = "G32up-c vs D32_st3"
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), img)
    # flat staging: a (steps, B/2, H, W, C=3) epoch tensor is tile-padded
    # 3->128 resident on TPU (42x HBM); flat pads nothing and the epoch
    # reshapes per step (gan.make_train_epoch)
    epoch = jax.jit(gan.make_train_epoch(g, d, config, image_shape=img),
                    donate_argnums=(0,))
    flat = int(np.prod(img))
    reals = jnp.asarray(np.random.RandomState(0).rand(
        steps, batch // 2, flat).astype(np.float32))

    state, _ = epoch(state, reals, jax.random.PRNGKey(1))   # compile+warm
    _fetch(state)

    t0 = time.perf_counter()
    state, metrics = epoch(state, reals, jax.random.PRNGKey(2))
    _fetch(state)
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    imgs_per_sec = 2 * batch * steps / dt / n_chips
    return {
        "metric": f"combined G+D train images/sec/chip @{scale}x{scale} "
                  f"({pair}, bf16, fresh data"
                  + (", augmented" if augment else "") + ")",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        # the 20k target is the 32px flagship's; no baseline exists for
        # the 64px pyramid config
        "vs_baseline": (round(imgs_per_sec / TARGET, 3) if scale == 32
                        else None),
    }


def bench_train_v(batch, steps, dtype):
    """V-trainer scanned epoch: synthetic-fake generation (overlay bank,
    Mix/Warp/Stamp/Random branches + recursive mix) AND the V updates in
    ONE compiled program — the rebuild of the reference's worst host hot
    loop (train_v.lua:294-528, per-pixel Lua generators). Throughput
    counts V-trained images (half real + half synthesized on device)."""
    from catgen import models
    from catgen.train import synthetic, v_trainer

    config = v_trainer.VConfig(batch_size=batch, compute_dtype=dtype)
    v = models.V_REGISTRY["v32"](IMG)
    state = v_trainer.init_state(v, config, jax.random.PRNGKey(0), IMG)
    h, w, c = IMG
    bank = synthetic.build_overlay_bank(h, w, n=1000, n_points=10000,
                                        seed=0)
    epoch = jax.jit(v_trainer.make_train_epoch(v, config, bank, IMG,
                                               flat_xs=True),
                    donate_argnums=(0,))
    half = batch // 2
    rs = np.random.RandomState(0)
    # flat staging — the 5-batches-per-step NHWC stage is tile-padded
    # 3->128 (42x HBM: 33.5 GB at bs=640 x 50 steps, an OOM) on TPU
    flat = int(np.prod(IMG))
    staged = jnp.asarray(rs.rand(steps, 5, half, flat).astype(np.float32))
    reals, gen_reals = staged[:, 0], staged[:, 1:]
    branches = jnp.asarray(rs.randint(0, 4, steps), jnp.int32)
    sub_branches = jnp.asarray(rs.randint(0, 4, steps), jnp.int32)
    submix = jnp.asarray(rs.rand(steps) < 0.33)

    state, _ = epoch(state, reals, gen_reals, branches, sub_branches,
                     submix, jax.random.PRNGKey(1))
    _fetch(state)
    t0 = time.perf_counter()
    state, _ = epoch(state, reals, gen_reals, branches, sub_branches,
                     submix, jax.random.PRNGKey(2))
    _fetch(state)
    dt = time.perf_counter() - t0
    ips = batch * steps / dt / jax.local_device_count()
    return {
        "metric": "V-train images/sec/chip @32x32 (V32, half synthetic "
                  "generated on device, bf16, fresh data)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": None,   # the reference never published V numbers
    }


def bench_pretrain(batch, steps, dtype):
    """G-autoencoder MSE warm-up epoch (pretrain_g.lua:138-187) as one
    scanned program."""
    from catgen import models
    from catgen.train import pretrainer

    config = pretrainer.PretrainConfig(batch_size=batch,
                                       noise_dim=NOISE_DIM)
    ae = models.create_G_autoencoder(IMG, NOISE_DIM)
    state = pretrainer.init_state(ae, config, jax.random.PRNGKey(0), IMG)
    epoch = jax.jit(pretrainer.make_train_epoch(ae, config,
                                                image_shape=IMG),
                    donate_argnums=(0,))
    batches = jnp.asarray(np.random.RandomState(0).rand(
        steps, batch, int(np.prod(IMG))).astype(np.float32)).astype(dtype)

    state, _ = epoch(state, batches, jax.random.PRNGKey(1))
    _fetch(state)
    t0 = time.perf_counter()
    state, _ = epoch(state, batches, jax.random.PRNGKey(2))
    _fetch(state)
    dt = time.perf_counter() - t0
    ips = batch * steps / dt / jax.local_device_count()
    return {
        "metric": "G-autoencoder pretrain images/sec/chip @32x32 "
                  "(MSE, fresh data)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }


def bench_infer(steps, dtype, corpus_n=16384):
    """sample.lua pipeline as one jitted program: 1024 generate + D-rank +
    best-16 NN search against an N-image corpus (sample.lua:89-151
    rebuilt; the NN scan is one matmul, SURVEY.md §3.4). BENCH_CORPUS=
    100000 matches the reference's real ~100k-crop workload
    (README.md:281)."""
    from catgen import models
    from catgen.sample.sampler import nearest_neighbours
    from catgen.train import gan

    g = models.create_G_decoder_upsampling32c(IMG, NOISE_DIM)
    d = models.create_D32_st3(IMG)
    gv = g.init(jax.random.PRNGKey(0), (1, NOISE_DIM))
    dv = d.init(jax.random.PRNGKey(1), (1,) + IMG)
    # the corpus is a jit ARGUMENT, pre-flattened to (N, H*W*C):
    # closing over it would embed 100k images as an HLO constant (the
    # remote-compile request exceeds the tunnel's body limit at N=100k),
    # and an NHWC C=3 argument would be tile-padded 3->128 (42x HBM)
    corpus = jnp.asarray(np.random.RandomState(0).rand(
        corpus_n, int(np.prod(IMG))).astype(np.float32)).astype(dtype)
    count = 1024

    @jax.jit
    def pipeline(rng, carry, corpus):
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
    out = pipeline(jax.random.PRNGKey(2), carry, corpus)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = pipeline(jax.random.PRNGKey(10 + i), out[-1], corpus)
    float(out[-1])   # one final fetch closes the dependency chain
    dt = time.perf_counter() - t0
    sps = count * steps / dt / jax.local_device_count()
    return {
        "metric": f"batch inference samples/sec/chip "
                  f"(1024-gen + D-rank + NN-search vs {corpus_n}-corpus)",
        "value": round(sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / TARGET, 3),
    }


def main():
    scale = int(os.environ.get("BENCH_SCALE", "32"))
    default_bs = "640" if scale == 32 else "256"  # measured sweet spots
    batch = int(os.environ.get("BENCH_BS", default_bs))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
             else jnp.float32)
    mode = os.environ.get("BENCH_MODE", "all")
    augment = os.environ.get("BENCH_AUGMENT", "1") == "1"
    corpus_n = int(os.environ.get("BENCH_CORPUS", "100000"))
    if mode == "infer":
        results = [bench_infer(max(steps, 5), dtype, corpus_n)]
    elif mode == "train_v":
        results = [bench_train_v(batch, steps, dtype)]
    elif mode == "pretrain":
        results = [bench_pretrain(batch, steps, dtype)]
    elif mode == "train":
        results = [bench_train(batch, steps, dtype, augment, scale)]
    else:
        # all five BASELINE configs as JSONL, the 32px train headline
        # LAST so the driver's tail-line parse records it (VERDICT r4 #3)
        results = [
            bench_infer(max(steps, 5), dtype, corpus_n),
            bench_train_v(batch, steps, dtype),
            bench_pretrain(batch, steps, dtype),
            bench_train(256, steps, dtype, augment, scale=64),
            bench_train(batch, steps, dtype, augment, scale=32),
        ]
    for result in results:
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
