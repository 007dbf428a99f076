"""G autoencoder pretraining CLI — ``th pretrain_g.lua`` equivalent
(pretrain_g.lua:12-29 flags). Exports the decoder-only checkpoint that
catgen.cli.train auto-picks-up by filename.

    python -m catgen.cli.pretrain_g --fixture 256 --epochs 2
"""

from __future__ import annotations

import argparse

from catgen.cli.common import (add_common_args, add_dataset_args,
                                apply_platform, build_dataset)
from catgen.train import pretrainer
from catgen.train.harness import HarnessConfig, PretrainHarness


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_dataset_args(p)
    p.set_defaults(batchSize=16)
    p.add_argument("--saveFreq", type=int, default=1)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--G_clamp", type=float, default=5.0)
    p.add_argument("--G_L1", type=float, default=0.0)
    p.add_argument("--G_L2", type=float, default=0.0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)
    hc = HarnessConfig(save_dir=args.save, n_epoch=args.N_epoch,
                       scale=args.scale, colorspace=args.colorSpace,
                       noise_dim=args.noiseDim, seed=args.seed,
                       n_devices=args.devices)
    pc = pretrainer.PretrainConfig(batch_size=args.batchSize,
                                   g_l1=args.G_L1, g_l2=args.G_L2,
                                   g_clamp=args.G_clamp)
    dataset = build_dataset(args)
    harness = PretrainHarness(hc, pc, dataset)
    harness.train(args.epochs, save_freq=args.saveFreq)


if __name__ == "__main__":
    main()
