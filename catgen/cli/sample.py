"""Sampling CLI — ``th sample.lua`` equivalent (sample.lua:11-25 flags).

Loads the adversarial checkpoint, generates 1024 images, writes
real/random/best/worst grids, and optionally the nearest-neighbour pair
grid (sample.lua:78-125).

    python -m catgen.cli.sample --save logs --runs 1 --neighbours
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from catgen import models
from catgen.cli.common import add_dataset_args, build_dataset
from catgen.data import color as colorlib
from catgen.io import checkpoint as ckpt
from catgen.io.grids import save_grid
from catgen.sample import (interleave_pairs, neighbours_of_best,
                           sample_and_rank)
from catgen.train import gan
from catgen.train.harness import HarnessConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--save", default="logs")
    p.add_argument("--out", default=None,
                   help="output dir (default <save>/samples)")
    p.add_argument("--network", default=None,
                   help="checkpoint path (default <save>/adversarial.ckpt)")
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--count", type=int, default=1024)
    p.add_argument("--neighbours", action="store_true",
                   help="nearest-neighbour search of best 16 vs training set")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--scale", type=int, default=32)
    p.add_argument("--colorSpace", default="rgb",
                   choices=["rgb", "yuv", "hsl", "y"])
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="force the jax platform (the pinned env platform "
                        "otherwise wins; see cli/common.py)")
    return p.parse_args(argv)


def load_gan(path: str):
    """Rebuilds G/D from checkpoint metadata and restores the state."""
    meta = ckpt.load_meta(path)
    hc = HarnessConfig(**meta["config"])
    gcd = meta.get("gan_config", {})
    gc = gan.GanConfig(**{k: v for k, v in gcd.items()
                          if k in gan.GanConfig.__dataclass_fields__})
    g = models.G_REGISTRY[hc.g_model](hc.image_shape, hc.noise_dim)
    d = models.D_REGISTRY[hc.d_model](hc.image_shape)
    template = gan.ckpt_template(g, d, gc, jax.random.PRNGKey(0),
                                 hc.image_shape)
    state, _ = ckpt.load(path, template)
    return g, d, state, hc


def main(argv=None):
    args = parse_args(argv)
    from catgen.cli.common import apply_platform
    apply_platform(args)
    path = args.network or os.path.join(args.save,
                                        ckpt.adversarial_filename())
    g, d, state, hc = load_gan(path)
    args.scale, args.colorSpace = hc.scale, hc.colorspace
    out = args.out or os.path.join(args.save, "samples")
    dataset = build_dataset(args, create_fixture=False)

    def to_rgb(x):
        return np.asarray(colorlib.colorspace_to_rgb(jnp.asarray(x),
                                                     hc.colorspace))

    for run in range(args.runs):
        rng = jax.random.PRNGKey(args.seed + run)
        # 64 real training images (sample.lua:80-86)
        reals = dataset.load_random_images(64)
        save_grid(os.path.join(out, f"run{run}_real64.png"), to_rgb(reals),
                  nrow=8)
        result = sample_and_rank(g, d, state, state, rng,
                                 noise_dim=hc.noise_dim, count=args.count)
        imgs = result["images"]
        save_grid(os.path.join(out, f"run{run}_random256.png"),
                  to_rgb(imgs[:256]), nrow=16)
        save_grid(os.path.join(out, f"run{run}_random{args.count}.png"),
                  to_rgb(imgs), nrow=32)
        save_grid(os.path.join(out, f"run{run}_best64.png"),
                  to_rgb(result["best"]), nrow=8)
        save_grid(os.path.join(out, f"run{run}_worst64.png"),
                  to_rgb(result["worst"]), nrow=8)
        print(f"run {run}: D scores best={float(result['scores'].max()):.4f} "
              f"worst={float(result['scores'].min()):.4f}")
        if args.neighbours:
            # entire training set as the corpus (sample.lua:135)
            corpus = dataset.load_images(0, len(dataset))
            nb = neighbours_of_best(result, corpus, n_best=16)
            pairs = interleave_pairs(nb["queries"], nb["matches"])
            save_grid(os.path.join(out, f"run{run}_neighbours.png"),
                      to_rgb(pairs), nrow=8)
            print(f"run {run}: NN distances "
                  f"mean={float(nb['distances'].mean()):.4f}")
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
