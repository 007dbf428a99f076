"""Boundary-fused G decoder ladder (SURVEY.md §7 step 8: "fuse
nearest-upsample+conv(+BN+PReLU)").

``FusedDecoderSequential`` is a drop-in ``Sequential``: same children,
same parameter/state tree, same semantics. At apply time on the Pallas
path it recognizes ``[UpsampleConv, BatchNorm, PReLU]`` stage groups and
executes them boundary-fused:

  * each stage's Pallas kernel applies the *previous* stage's BatchNorm
    affine + PReLU to its input block in VMEM (the elementwise pass never
    round-trips HBM), and
  * emits per-channel [sum(y), sum(y^2)] fp32 partials, so this stage's
    BatchNorm statistics need no separate reduction pass over y.

The BatchNorm math (biased batch variance for normalization, unbiased
running variance, pmean-sync under an axis_name, momentum 0.1) follows
``nn.layers.BatchNorm`` exactly — the two paths are interchangeable and
checkpoints are identical. Off the Pallas path (CPU tests, XLA fallback)
``apply`` defers to plain ``Sequential.apply``.

Numerics note: the fused path computes statistics from the kernel's fp32
accumulators while the unfused path reads the bf16-rounded activations
back from HBM — the fused statistics are the *more* accurate of the two;
differences are at bf16 rounding level (tested).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from catgen.core.module import Sequential, _child_rng, child_variables
from catgen.kernels.upsample_conv import UpsampleConv
from catgen.nn.layers import BatchNorm, PReLU


def _is_stage(layers, i) -> bool:
    return (i + 2 < len(layers)
            and isinstance(layers[i], UpsampleConv) and layers[i].fused
            and isinstance(layers[i + 1], BatchNorm)
            and isinstance(layers[i + 2], PReLU))


class FusedDecoderSequential(Sequential):
    """Sequential whose [UpsampleConv, BatchNorm, PReLU] runs execute as
    boundary-fused Pallas stages when the upsample impl is 'pallas'."""

    def apply(self, variables, x, *, train=False, rng=None):
        from catgen.kernels import config as kconfig
        if (not kconfig.fused_ladder
                or kconfig.resolve_upsample_impl() != "pallas"):
            return super().apply(variables, x, train=train, rng=rng)
        interpret = getattr(kconfig, "pallas_interpret", False)
        from catgen.kernels.pallas_upsample_conv import (
            upsample2_conv_block, upsample2_conv_block_fused)

        new_state = {}
        pending = None      # (scale, shift, alpha) of the previous BN+PReLU
        i = 0
        layers = self.layers
        while i < len(layers):
            name = self._child_name(i)
            layer = layers[i]
            if _is_stage(layers, i):
                uc, bn, pr = layer, layers[i + 1], layers[i + 2]
                bn_name = self._child_name(i + 1)
                pr_name = self._child_name(i + 2)
                uc_p = child_variables(variables, name)["params"]
                bn_v = child_variables(variables, bn_name)
                pr_p = child_variables(variables, pr_name)["params"]

                cin = x.shape[-1]
                if pending is None:
                    # identity input transform (slope 1 PReLU)
                    scale = jnp.ones((cin,), x.dtype)
                    shift = jnp.zeros((cin,), x.dtype)
                    alpha = jnp.ones((1,), x.dtype)
                else:
                    scale, shift, alpha = pending
                kern = uc_p["kernel"].astype(x.dtype)
                bias = (uc_p["bias"] if uc.use_bias
                        else jnp.zeros((uc.features,), jnp.float32))
                if train:
                    y, s1, s2 = upsample2_conv_block(
                        x, scale, shift, alpha, kern,
                        bias.astype(x.dtype), interpret)
                    count = math.prod(y.shape[:-1])
                    mean = s1 / count
                    mean_sq = s2 / count
                    n_tot = count
                    if bn.axis_name is not None:
                        mean = lax.pmean(mean, bn.axis_name)
                        mean_sq = lax.pmean(mean_sq, bn.axis_name)
                        n_tot = count * lax.psum(1, bn.axis_name)
                    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
                    unbiased = var * (n_tot / max(n_tot - 1, 1))
                    m = bn.momentum
                    st = bn_v["state"]
                    new_state[bn_name] = {
                        "mean": ((1 - m) * st["mean"]
                                 + m * mean).astype(bn.dtype),
                        "var": ((1 - m) * st["var"]
                                + m * unbiased).astype(bn.dtype),
                    }
                else:
                    y = upsample2_conv_block_fused(
                        x, kern, bias.astype(x.dtype), scale, shift, alpha,
                        with_stats=False, interpret=interpret)
                    mean = bn_v["state"]["mean"]
                    var = bn_v["state"]["var"]
                    new_state[bn_name] = bn_v["state"]
                inv = lax.rsqrt(var.astype(jnp.float32) + bn.eps)
                g = bn_v["params"]["scale"]
                b = bn_v["params"]["bias"]
                bn_scale = (g * inv).astype(y.dtype)
                bn_shift = (b - g * mean * inv).astype(y.dtype)
                pr_alpha = pr_p["alpha"].astype(y.dtype)
                pending = (bn_scale, bn_shift, pr_alpha)
                new_state[name] = child_variables(variables, name)["state"]
                new_state[pr_name] = child_variables(
                    variables, pr_name)["state"]
                x = y
                i += 3
                continue
            if pending is not None:
                scale, shift, alpha = pending
                xt = x * scale + shift
                x = jnp.where(xt >= 0, xt, alpha * xt)
                pending = None
            x, st = layer.apply(child_variables(variables, name), x,
                                train=train, rng=_child_rng(rng, i))
            new_state[name] = st
            i += 1
        if pending is not None:   # ladder ended on a stage group
            scale, shift, alpha = pending
            xt = x * scale + shift
            x = jnp.where(xt >= 0, xt, alpha * xt)
        return x, new_state
