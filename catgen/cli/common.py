"""Shared CLI plumbing: dataset args + the reference's common flags."""

from __future__ import annotations

import argparse
import os

from catgen.data.fixture import write_fixture_dataset
from catgen.data.loader import ImageDataset


def add_dataset_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", nargs="*", default=None,
                   help="directories of 64x64 JPEGs "
                        "(dataset/out_aug_64x64 equivalent; subsumes the "
                        "reference's --aws switch, which only flipped "
                        "between two hardcoded corpus paths, "
                        "train.lua:90-94)")
    p.add_argument("--fixture", type=int, default=0,
                   help="if >0 and no --dataset, generate N synthetic cat "
                        "faces into <save>/fixture and train on those")


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--save", default="logs", help="artifact directory")
    p.add_argument("--scale", type=int, default=32)
    p.add_argument("--colorSpace", default="rgb",
                   choices=["rgb", "yuv", "hsl", "y"])
    p.add_argument("--noiseDim", type=int, default=100)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--batchSize", type=int, default=32)
    p.add_argument("--N_epoch", type=int, default=1000)
    p.add_argument("--devices", type=int, default=1,
                   help="DP mesh size (1 = single chip)")
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="force the jax platform; --platform cpu simulates "
                        "--devices N as N virtual CPU devices (the pinned "
                        "env platform otherwise wins, so a plain env var "
                        "is too late once jax is imported)")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator host:port "
                        "(multi-host DP over DCN)")
    p.add_argument("--numProcesses", type=int, default=None)
    p.add_argument("--processId", type=int, default=None)


def apply_platform(args):
    """Must run before the first jax backend use (jax import alone is fine —
    the sitecustomize hook imports jax but does not initialize a backend).
    Also brings up jax.distributed when a coordinator is given."""
    if getattr(args, "platform", "auto") != "auto":
        import jax
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and getattr(args, "devices", 1) > 1:
            jax.config.update("jax_num_cpu_devices", args.devices)
    if getattr(args, "coordinator", None):
        from catgen import dist
        dist.initialize(args.coordinator, args.numProcesses, args.processId)


def build_dataset(args, create_fixture: bool = True) -> ImageDataset:
    """``create_fixture=False`` (the eval/sample CLIs): refuse to fabricate
    a synthetic corpus when no --dataset is given and no fixture dir
    exists — quality/NN statistics against a toy corpus look valid in the
    JSON but are meaningless for a dataset-trained checkpoint."""
    import jax

    multiproc = jax.process_count() > 1
    dirs = args.dataset
    if not dirs:
        n = args.fixture or 64
        fixture_dir = os.path.join(args.save, "fixture")
        if not os.path.isdir(fixture_dir) or not os.listdir(fixture_dir):
            if not create_fixture:
                raise SystemExit(
                    f"no --dataset given and no fixture corpus at "
                    f"{fixture_dir} — pass --dataset <dirs> (the training "
                    f"corpus path is not recorded in checkpoints); "
                    f"refusing to evaluate against a freshly synthesized "
                    f"toy corpus")
            if jax.process_index() == 0:
                print(f"[data] no --dataset given; writing {n} synthetic "
                      f"cat faces to {fixture_dir}")
                write_fixture_dataset(fixture_dir, n=n)
            if multiproc:  # others wait for process 0's files
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices("fixture_written")
        dirs = [fixture_dir]
    return ImageDataset(dirs, scale=args.scale, colorspace=args.colorSpace,
                        seed=args.seed, shard_by_process=multiproc,
                        normalize=getattr(args, "normalize", False))
