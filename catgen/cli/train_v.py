"""V training CLI — ``th train_v.lua`` equivalent (train_v.lua:12-28 flags).
Must run before GAN training, like the reference (train.lua:119-123).

    python -m catgen.cli.train_v --fixture 256 --epochs 3
"""

from __future__ import annotations

import argparse

from catgen.cli.common import (add_common_args, add_dataset_args,
                                apply_platform, build_dataset)
from catgen.train import v_trainer
from catgen.train.harness import HarnessConfig, VHarness


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_dataset_args(p)
    p.add_argument("--saveFreq", type=int, default=10)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--V_clamp", type=float, default=5.0)
    p.add_argument("--V_L1", type=float, default=0.0)
    p.add_argument("--V_L2", type=float, default=0.01)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)
    hc = HarnessConfig(save_dir=args.save, n_epoch=args.N_epoch,
                       scale=args.scale, colorspace=args.colorSpace,
                       seed=args.seed, n_devices=args.devices)
    vc = v_trainer.VConfig(batch_size=args.batchSize, v_l1=args.V_L1,
                           v_l2=args.V_L2, v_clamp=args.V_clamp)
    dataset = build_dataset(args)
    harness = VHarness(hc, vc, dataset)
    harness.train(args.epochs, save_freq=args.saveFreq)


if __name__ == "__main__":
    main()
