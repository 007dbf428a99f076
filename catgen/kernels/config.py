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

_UPSAMPLE_IMPLS = ("collapsed", "pallas", "naive")
_SAMPLER_IMPLS = ("xla", "mxu")

upsample_impl = os.environ.get("CATGEN_UPSAMPLE_IMPL", "collapsed")
sampler_impl = os.environ.get("CATGEN_SAMPLER_IMPL", "xla")


def set_upsample_impl(name: str) -> None:
    global upsample_impl
    assert name in _UPSAMPLE_IMPLS, name
    upsample_impl = name


def set_sampler_impl(name: str) -> None:
    global sampler_impl
    assert name in _SAMPLER_IMPLS, name
    sampler_impl = name
