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

upsample_impl = os.environ.get("CATGEN_UPSAMPLE_IMPL", "auto")
sampler_impl = os.environ.get("CATGEN_SAMPLER_IMPL", "auto")


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def resolve_upsample_impl() -> str:
    """'auto' -> Pallas single-pass kernel on TPU (measured fastest
    end-to-end, tools/perf_probe.py), XLA collapsed elsewhere."""
    if upsample_impl != "auto":
        return upsample_impl
    return "pallas" if _on_tpu() else "collapsed"


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
