"""GAN training CLI — ``th train.lua`` equivalent (train.lua:15-49 flag
set, plus explicit --G/--D model selection per SURVEY.md §5.6).

    python -m catgen.cli.train --fixture 256 --epochs 5
    python -m catgen.cli.train --dataset /data/out_aug_64x64 --devices 8
"""

from __future__ import annotations

import argparse

from catgen.cli.common import (add_common_args, add_dataset_args,
                                apply_platform, build_dataset)
from catgen.models import D_REGISTRY, G_REGISTRY
from catgen.train import gan
from catgen.train.harness import GanHarness, HarnessConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_dataset_args(p)
    p.add_argument("--saveFreq", type=int, default=30)
    p.add_argument("--network", default="",
                   help="checkpoint to resume from")
    p.add_argument("--rebuildOptstate", action="store_true")
    p.add_argument("--epochs", type=int, default=None,
                   help="epochs to run (default: forever, like train.lua)")
    p.add_argument("--G", default="default", choices=sorted(G_REGISTRY))
    p.add_argument("--D", default="default", choices=sorted(D_REGISTRY))
    p.add_argument("--D_optmethod", default="adam",
                   choices=["adam", "adagrad", "sgd", "rmsprop"])
    p.add_argument("--G_optmethod", default="adam",
                   choices=["adam", "adagrad", "sgd", "rmsprop"])
    p.add_argument("--D_sgd_lr", type=float, default=0.02)
    p.add_argument("--G_sgd_lr", type=float, default=0.02)
    p.add_argument("--D_sgd_momentum", type=float, default=0.0)
    p.add_argument("--G_sgd_momentum", type=float, default=0.0)
    p.add_argument("--D_L1", type=float, default=0.0)
    p.add_argument("--D_L2", type=float, default=1e-4)
    p.add_argument("--G_L1", type=float, default=0.0)
    p.add_argument("--G_L2", type=float, default=0.0)
    p.add_argument("--D_iterations", type=int, default=1)
    p.add_argument("--G_iterations", type=int, default=1)
    p.add_argument("--D_maxAcc", type=float, default=1.01)
    p.add_argument("--D_clamp", type=float, default=1.0)
    p.add_argument("--G_clamp", type=float, default=5.0)
    p.add_argument("--no-G_bn_advance", dest="no_G_bn_advance",
                   action="store_true",
                   help="freeze G's BN running stats during the D phase "
                        "(the reference's Torch semantics advance them, "
                        "adversarial.lua:233 — this is an A/B knob for "
                        "the collapse audit, QUALITY.md round 5)")
    p.add_argument("--G_freeze", default="",
                   help="comma list of top-level G children to freeze "
                        "(grads zeroed, params+BN state pinned) — stage-"
                        "wise pyramid training, e.g. --G_freeze "
                        "00_G32up_c with --G g64_stack after "
                        "tools/stack64_warmstart.py")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="activation compute dtype (bf16 = TPU fast path)")
    p.add_argument("--bce", default=None,
                   choices=["logits", "torch", "clip"],
                   help="GAN criterion formulation (default: CATGEN_BCE "
                        "env or 'logits' — exact-gradient logit-space "
                        "BCE; 'torch'/'clip' are the prob-space A/B "
                        "alternates, QUALITY.md round 5)")
    p.add_argument("--weightsVisFreq", type=int, default=0,
                   help="write per-layer D activation grids every N epochs")
    p.add_argument("--visFreq", type=int, default=1,
                   help="write sample grids/probes every N epochs "
                        "(--noplot spirit, train.lua:24)")
    p.add_argument("--collapseDetect", action="store_true",
                   help="stop the run when the GAN-collapse detector fires "
                        "(catgen/eval/collapse.py); exits with code 42 so "
                        "sweep tooling can relaunch with the next seed")
    p.add_argument("--normalize", action="store_true",
                   help="remap inputs [0,1] -> [-1,1]; persists "
                        "normalize_mean/std in the checkpoint "
                        "(train.lua:51,209-227,260 NORMALIZE path)")
    p.add_argument("--augment", action="store_true",
                   help="on-device train-time augmentation of real batches "
                        "(offline ×9 corpus semantics applied live)")
    p.add_argument("--profile", default="",
                   help="capture a jax.profiler device trace of the second "
                        "trained epoch into this directory (the first epoch "
                        "compiles; needs --epochs >= 2; view with "
                        "TensorBoard/Perfetto; SURVEY.md §5.1)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)
    import jax.numpy as jnp
    hc = HarnessConfig(save_dir=args.save, save_freq=args.saveFreq,
                       n_epoch=args.N_epoch, scale=args.scale,
                       colorspace=args.colorSpace, noise_dim=args.noiseDim,
                       seed=args.seed, n_devices=args.devices,
                       g_model=args.G, d_model=args.D, epochs=args.epochs,
                       weights_vis_freq=args.weightsVisFreq,
                       vis_freq=max(args.visFreq, 1),
                       normalize=args.normalize,
                       collapse_detect=args.collapseDetect)
    gc = gan.GanConfig(
        batch_size=args.batchSize,
        d_optimizer=args.D_optmethod, g_optimizer=args.G_optmethod,
        d_sgd_lr=args.D_sgd_lr, g_sgd_lr=args.G_sgd_lr,
        d_sgd_momentum=args.D_sgd_momentum,
        g_sgd_momentum=args.G_sgd_momentum,
        d_l1=args.D_L1, d_l2=args.D_L2, g_l1=args.G_L1, g_l2=args.G_L2,
        d_clamp=args.D_clamp, g_clamp=args.G_clamp,
        d_iterations=args.D_iterations, g_iterations=args.G_iterations,
        d_max_acc=args.D_maxAcc, augment=args.augment,
        normalized_inputs=args.normalize,
        g_bn_advance_in_d=not args.no_G_bn_advance,
        g_frozen_children=tuple(
            s for s in args.G_freeze.split(",") if s),
        bce=args.bce,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    dataset = build_dataset(args)
    harness = GanHarness(hc, gc, dataset)
    if args.network:
        harness.resume(args.network, rebuild_optstate=args.rebuildOptstate)
    status = harness.train(args.epochs, profile_dir=args.profile or None)
    if status == "collapsed":
        import sys
        sys.exit(42)


if __name__ == "__main__":
    main()
