"""Kernel implementation selection.

Hot ops have multiple interchangeable implementations (identical params &
semantics):

  * upsample+conv: 'collapsed' (XLA, algebraic 2.25-2.78x MAC reduction,
    default), 'pallas' (single-pass fused kernel), 'naive' (reference
    semantics, test baseline)
  * ST bilinear sampler: 'xla' (gathers, default), 'mxu' (Pallas one-hot
    matmul)

Selection is process-global (set once before building models) or via env:
    CATGEN_UPSAMPLE_IMPL=collapsed|pallas|naive
    CATGEN_SAMPLER_IMPL=xla|mxu
The bench harness picks the fastest measured combination for the hardware.
"""

from __future__ import annotations

import os

_UPSAMPLE_IMPLS = ("auto", "collapsed", "pallas", "naive")
_SAMPLER_IMPLS = ("auto", "xla", "mxu")
_SAMPLER_KERNELS = ("v1", "v2", "v3", "v4")


def _env_choice(var: str, default: str, allowed) -> str:
    """Env-sourced impl selector with validation: a typo must fail loudly
    at import, not silently fall through an if/else chain to some default
    implementation (which would corrupt perf A/B measurements)."""
    v = os.environ.get(var, default)
    if v not in allowed:
        raise ValueError(
            f"{var}={v!r} is not a valid choice; pick one of {allowed}")
    return v


upsample_impl = _env_choice("CATGEN_UPSAMPLE_IMPL", "auto", _UPSAMPLE_IMPLS)
sampler_impl = _env_choice("CATGEN_SAMPLER_IMPL", "auto", _SAMPLER_IMPLS)
sampler_kernel = _env_choice("CATGEN_SAMPLER_KERNEL", "v4", _SAMPLER_KERNELS)
# run Pallas kernels in interpret mode (CPU correctness tests of
# hardware-only code paths, e.g. the fused decoder ladder)
pallas_interpret = os.environ.get("CATGEN_PALLAS_INTERPRET", "0") == "1"
# boundary-fused G decoder ladder (nn/fused.py) on the Pallas path
fused_ladder = os.environ.get("CATGEN_FUSED_LADDER", "1") == "1"
# backward of the fused ladder block. Measured at bs=512 (device step
# time): "xla_vjp" autodiff through the collapsed formulation 37.8 ms,
# "xla" hand-written parity-conv backward 38.2 ms, "pallas" single-pass
# kernel 83.9 ms (its transpose-contraction dots don't map onto the MXU).
# The parity dX/dW convs run at ~190 TF/s under XLA — the joint VJP is
# already at roofline, so it stays the default.
ladder_bwd = _env_choice("CATGEN_LADDER_BWD", "xla_vjp",
                         ("xla_vjp", "xla", "pallas"))
# tiny-cin convolutions (the D models' first conv on the C=3 image):
# "banded" = row-tap matmuls on the channel-merged image (no batch-minor
# relayout, kernels/smallcin_conv.py), "xla" = plain conv. Measured at
# bs=512: banded 41.7 ms device step vs 35.2 xla — the K=102 band dots
# run at ~17 TF/s (MXU contraction starved), costing more than the
# relayout copies they remove. Default stays xla; the banded path is
# kept as a tested alternative for hardware where gathers/relayouts are
# pricier relative to MXU issue rate.
smallcin_impl = _env_choice("CATGEN_SMALLCIN_IMPL", "auto",
                            ("auto", "banded", "xla"))
# FusedSTBranches localization nets: jointly (one concat conv + one
# grouped conv, ~2 ms/step faster) or per-branch (reference formulation)
joint_loc = os.environ.get("CATGEN_JOINT_LOC", "1") == "1"
# D's [input ST -> conv3x3 -> PReLU] prefix: "fused" = one Pallas pass
# (in-kernel affine grid + sampling + conv epilogue,
# kernels/pallas_st_conv.py), "split" = the reference Sequential
# composition. Measured at bs=512 (full step, tools/perf_probe.py):
# split 35.9-37.2 ms, fused 45.7 (XLA-roll bwd) / 80.5 (p-shift bwd) —
# the fusion LOSES end-to-end despite removing the C=3 layout copies;
# "auto" therefore resolves to split. The kernel stays selectable and
# equality-tested (KERNELS.md §2b for the full account).
st_conv_impl = _env_choice("CATGEN_ST_CONV", "auto",
                           ("auto", "fused", "split"))
st_conv_interpret = False    # tests: run the fused kernel interpreted
# max-pool backward for the non-overlapping (window == stride) pools:
# "mask" = reshape + compare + multiply custom VJP (kernels/maxpool.py),
# "sas" = XLA's select_and_scatter via the reduce_window VJP. Measured
# at bs=512 (full step, tools/perf_probe.py): sas 35.45 ms/iter vs mask
# 35.47 — a tie; the ~0.5 ms select_and_scatter is hidden by XLA
# overlap, so "auto" stays sas (KERNELS.md §2c). Measurement-method
# caveat: these are probe WALL times (k=20, ~±0.3 ms repeatability) —
# a 0.02 ms delta is far inside the noise floor, so this records "no
# measurable difference", not a ranking; device-trace A/Bs are the
# repo's discipline for deltas that matter (CLAUDE.md).
maxpool_bwd = _env_choice("CATGEN_MAXPOOL_BWD", "auto",
                          ("auto", "mask", "sas"))
# GAN optimizer pipeline representation: "flat" = clamp/L1-L2/update/apply
# on ONE raveled vector per network (the reference's getParameters
# flattening, train.lua:184-185), "tree" = per-leaf tree_map. Bit-identical
# updates (tests/test_flat_opt.py); checkpoints stay per-leaf either way.
# Measured at bs=512 (device traces, tools/profile_capture.py): tree
# 33.38 ms/step vs flat 34.28 — the ravel/unravel concatenate+slice
# traffic (~4x48 MB/step) costs more than the per-leaf fusion tail it
# removes (XLA already horizontally fuses the small optimizer ops into
# the step's gaps). Default stays tree; flat kept as the tested
# alternative for models with far more parameter leaves.
flat_opt = _env_choice("CATGEN_FLAT_OPT", "auto",
                       ("auto", "flat", "tree"))


# backward of the fused upsample+conv op (pallas_upsample_conv._ucb_bwd):
# "collapsed" = XLA VJP through the collapsed parity convs (default,
# measured at roofline), "pallas" = single-pass Pallas dX/dW kernel,
# "hybrid" = Pallas dX + XLA dW/db, "naive" = VJP through the unfused
# reference composition (test baseline).
upsample_bwd = _env_choice("CATGEN_UPSAMPLE_BWD", "collapsed",
                           ("collapsed", "pallas", "hybrid", "naive"))


def resolve_maxpool_bwd() -> str:
    if maxpool_bwd != "auto":
        return maxpool_bwd
    return "sas"


def resolve_flat_opt() -> str:
    if flat_opt != "auto":
        return flat_opt
    return "tree"


def resolve_st_conv_impl() -> str:
    if st_conv_impl != "auto":
        return st_conv_impl
    return "split"


def resolve_smallcin_impl() -> str:
    if smallcin_impl != "auto":
        return smallcin_impl
    return "xla"


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def resolve_upsample_impl() -> str:
    """'auto' -> XLA collapsed parity convs everywhere. Re-measured in
    round 2 (device traces, bs=512): in-step the XLA convs run at
    135-190 TF/s vs the Pallas single-pass kernel's 96-150, and the full
    step is 35.2 ms collapsed vs 37.8 Pallas-ladder / 38.0 Pallas-
    per-layer. The round-1 'pallas fastest' finding predates the v4
    sampler + layout fixes that removed the step's other bottlenecks."""
    if upsample_impl != "auto":
        return upsample_impl
    return "collapsed"


def resolve_sampler_impl() -> str:
    """'auto' -> MXU one-hot matmul kernel on TPU (2-5x faster than the
    gather formulation, tools/perf_probe.py), XLA gathers elsewhere."""
    if sampler_impl != "auto":
        return sampler_impl
    return "mxu" if _on_tpu() else "xla"


def set_upsample_impl(name: str) -> None:
    global upsample_impl
    assert name in _UPSAMPLE_IMPLS, name
    upsample_impl = name


def set_sampler_impl(name: str) -> None:
    global sampler_impl
    assert name in _SAMPLER_IMPLS, name
    sampler_impl = name


def set_sampler_kernel(name: str) -> None:
    global sampler_kernel
    assert name in _SAMPLER_KERNELS, name
    sampler_kernel = name


def get_mxu_sampler():
    """The Pallas bilinear sampler generation selected by
    CATGEN_SAMPLER_KERNEL (default v4 — the (batch x pixel)-tiled,
    relayout-free kernel; v1-v3 kept as measured baselines, KERNELS.md)."""
    if sampler_kernel == "v1":
        from catgen.kernels.pallas_bilinear import bilinear_sample_mxu
        return lambda img, crd: bilinear_sample_mxu(img, crd)
    if sampler_kernel == "v2":
        from catgen.kernels.pallas_bilinear_v2 import bilinear_sample_sep
        return lambda img, crd: bilinear_sample_sep(img, crd)
    if sampler_kernel == "v3":
        from catgen.kernels.pallas_bilinear_v3 import bilinear_sample_batched
        return bilinear_sample_batched
    from catgen.kernels.pallas_bilinear_v4 import bilinear_sample_tiled
    return bilinear_sample_tiled
