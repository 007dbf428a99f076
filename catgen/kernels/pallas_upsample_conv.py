"""Pallas TPU kernel: fully fused nearest-upsample(2x) + conv (+bias,
+PReLU).

The XLA path (catgen/kernels/upsample_conv.py) already applies the
collapsed-weight rewrite but issues four separate convolutions — the input
is streamed from HBM four times and the parity planes are interleaved by a
separate transpose. This kernel performs all four parity convolutions in
one pass over the input block held in VMEM, accumulates in fp32, applies
the bias/PReLU epilogue in-register, and emits the parity-stacked output
(final depth-to-space interleave is a free relayout fused by XLA):

    HBM traffic:  x read once per cout-tile (vs 4x), no upsampled
                  intermediate ever
    MACs:         identical to the collapsed XLA path (optimal)
    MXU shape:    each tap is a (Bt*H*W, Cin) x (Cin, CoutT) matmul

Grid: (batch tiles, cout tiles), both auto-sized to the 16 MB VMEM budget
(pipeline double-buffering accounted). Input is pre-padded by one cheap XLA
pad so the kernel only slices.

Numerics match the XLA collapsed path (same default MXU precision); exact
equivalence is tested in interpret mode (tests/test_pallas_kernels.py) and
within bf16-accumulation tolerance on hardware.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from catgen.kernels.upsample_conv import _collapse_matrix, upsample2_conv


def _collapsed_weights_and_pads(kernel: jax.Array):
    """Returns (list of 4 collapsed kernels in parity order (d,e), global
    (pad_top, pad_bot, pad_left, pad_right), per-parity slice starts)."""
    k_h, k_w = kernel.shape[0], kernel.shape[1]
    mats = {}
    u_mins = {}
    for d in (0, 1):
        m, u_min = _collapse_matrix(k_h, d)
        mats[("h", d)] = m
        u_mins[("h", d)] = u_min
        m, u_min = _collapse_matrix(k_w, d)
        mats[("w", d)] = m
        u_mins[("w", d)] = u_min
    pad_top = max(-u_mins[("h", 0)], -u_mins[("h", 1)], 0)
    pad_left = max(-u_mins[("w", 0)], -u_mins[("w", 1)], 0)
    collapsed = []
    offsets = []
    for d in (0, 1):
        for e in (0, 1):
            mh, mw = mats[("h", d)], mats[("w", e)]
            ck = jnp.einsum("ua,vb,abio->uvio", mh, mw, kernel,
                            preferred_element_type=jnp.float32
                            ).astype(kernel.dtype)
            collapsed.append(ck)
            offsets.append((pad_top + u_mins[("h", d)],
                            pad_left + u_mins[("w", e)]))
    pad_bot = max(u_mins[("h", d)] + mats[("h", d)].shape[0] - 1
                  for d in (0, 1))
    pad_right = max(u_mins[("w", e)] + mats[("w", e)].shape[0] - 1
                    for e in (0, 1))
    return collapsed, (pad_top, pad_bot, pad_left, pad_right), offsets


def _make_kernel(h: int, w: int, cin: int, cout_t: int, bt: int,
                 tap_hw: Tuple[int, int], offsets, use_bias: bool,
                 use_prelu: bool, alpha_channelwise: bool,
                 pads: Tuple[int, int, int, int] = (0, 0, 0, 0),
                 in_transform: bool = False, with_stats: bool = False):
    kp_h, kp_w = tap_hw
    pt, pb, plft, prt = pads

    def kernel_fn(*refs):
        i = 0
        xp_ref = refs[i]; i += 1         # (bt, h, w, cin) — padded in VMEM
        w_ref = refs[i]; i += 1          # (4, kp_h, kp_w, cin, cout_t)
        b_ref = None
        a_ref = None
        t_scale = t_shift = t_alpha = None
        if use_bias:
            b_ref = refs[i]; i += 1      # (1, cout_t)
        if use_prelu:
            a_ref = refs[i]; i += 1      # (1, cout_t) or (1, 1)
        if in_transform:
            t_scale = refs[i]; i += 1    # (1, cin)
            t_shift = refs[i]; i += 1    # (1, cin)
            t_alpha = refs[i]; i += 1    # (1, cin) or (1, 1)
        out_ref = refs[i]; i += 1        # (bt, 2h, 2w, cout_t)
        stats_ref = refs[i] if with_stats else None  # (1, 2, cout_t)

        x = xp_ref[:]
        if in_transform:
            # previous stage's BN + PReLU applied to the VMEM block —
            # BEFORE padding, so the conv's implicit zero padding keeps
            # the unfused BN->PReLU->upsample->conv(zero-pad) semantics
            xt = (x.astype(jnp.float32) * t_scale[0, :].astype(jnp.float32)
                  + t_shift[0, :].astype(jnp.float32))
            al = t_alpha[0, :].astype(jnp.float32)
            x = jnp.where(xt >= 0, xt, al * xt).astype(x.dtype)
        # halo pad in VMEM (cheap) instead of materializing a padded copy
        # of the activation in HBM outside the kernel
        x = jnp.pad(x, ((0, 0), (pt, pb + kp_h - 1),
                        (plft, prt + kp_w - 1), (0, 0)))
        accs = []
        s1 = s2 = None
        for p in range(4):
            off_h, off_w = offsets[p]
            acc = jnp.zeros((bt * h * w, cout_t), jnp.float32)
            for u in range(kp_h):
                for v in range(kp_w):
                    xs = jax.lax.slice(
                        x, (0, off_h + u, off_w + v, 0),
                        (bt, off_h + u + h, off_w + v + w, cin))
                    xs2 = xs.reshape(bt * h * w, cin)
                    acc = acc + jnp.dot(
                        xs2, w_ref[p, u, v],
                        preferred_element_type=jnp.float32)
            if use_bias:
                acc = acc + b_ref[0, :].astype(jnp.float32)
            if use_prelu:
                alpha = a_ref[0, :].astype(jnp.float32)
                acc = jnp.where(acc >= 0, acc, alpha * acc)
            if with_stats:
                ps1 = jnp.sum(acc, axis=0)               # (cout_t,)
                ps2 = jnp.sum(acc * acc, axis=0)
                s1 = ps1 if s1 is None else s1 + ps1
                s2 = ps2 if s2 is None else s2 + ps2
            accs.append(acc.reshape(bt, h, w, cout_t).astype(out_ref.dtype))
        if with_stats:
            stats_ref[0, 0] = s1
            stats_ref[0, 1] = s2
        # in-kernel depth-to-space: parity order is (d, e) row-major, so
        # out[2y+d, 2x+e] = acc_de[y, x]. Interleaving only touches
        # major/sublane dims (lanes stay cout_t), which Mosaic handles —
        # and it saves the 16 MB HBM round-trip transpose XLA would emit.
        row0 = jnp.stack([accs[0], accs[1]], axis=3)     # (bt,h,w,2,ct)
        row1 = jnp.stack([accs[2], accs[3]], axis=3)
        rows = jnp.stack([row0.reshape(bt, h, 2 * w, cout_t),
                          row1.reshape(bt, h, 2 * w, cout_t)], axis=2)
        out_ref[:] = rows.reshape(bt, 2 * h, 2 * w, cout_t)

    return kernel_fn


# Mosaic's default scoped-VMEM ceiling is 16 MB; v5e has 128 MB. A higher
# limit lets batch tiles grow, dividing the grid-step count.
VMEM_LIMIT = 64 * 1024 * 1024


def _auto_tiles(n, h, w, cin, cout, kp_h, kp_w, itemsize=4,
                budget_bytes=40 * 1024 * 1024) -> Tuple[int, int]:
    """(batch_tile, cout_tile) fitting the VMEM budget. Pipeline blocks
    (input, weights, output) are double-buffered by Mosaic (x2)."""
    def divisor_leq(total, cap):
        d = min(cap, total)
        while total % d:
            d -= 1
        return d

    ct = divisor_leq(cout, 256)
    while ct > 128:
        if 2 * 4 * kp_h * kp_w * cin * ct * 4 <= budget_bytes // 4:
            break
        ct = divisor_leq(cout, ct - 1)
    weights = 2 * 4 * kp_h * kp_w * cin * ct * 4
    per_sample = (2 * (h + kp_h) * (w + kp_w) * cin
                  + 2 * h * w * 4 * ct      # interleaved out block (x2 dbuf)
                  + 2 * h * w * 4 * ct      # 4 staged parity accs (bf16)
                  + 2 * h * w * ct
                  + h * w * cin) * 4
    avail = max(budget_bytes - weights, per_sample)
    bt = max(int(avail // per_sample), 1)
    if h * w <= 16:
        # tiny spatial stages (the 4x4 G seed) are dispatch-bound: larger
        # tiles measure fastest (tools/perf_probe.py sweep) — but only up
        # to what the in/out pipeline blocks can afford in VMEM
        io_per_sample = 2 * ((h + kp_h) * (w + kp_w) * cin
                             + h * w * 4 * ct) * itemsize
        bt = max(bt, min(64, int(6 * 1024 * 1024 // max(io_per_sample, 1))))
    return min(bt, n), ct


@functools.partial(jax.jit,
                   static_argnames=("batch_tile", "cout_tile", "interpret"))
def upsample2_conv_fused(x: jax.Array, kernel: jax.Array,
                         bias: Optional[jax.Array] = None,
                         prelu_alpha: Optional[jax.Array] = None,
                         batch_tile: Optional[int] = None,
                         cout_tile: Optional[int] = None,
                         interpret: Optional[bool] = None) -> jax.Array:
    """Fused upsample2+conv(+bias)(+PReLU) via one Pallas kernel.

    x (N,H,W,Cin), kernel (k,k,Cin,Cout) HWIO odd k. Returns
    (N,2H,2W,Cout). ``interpret=None`` resolves to
    ``config.pallas_interpret`` (CATGEN_PALLAS_INTERPRET), so the
    per-layer Pallas path is CPU-testable like the fused ladder.
    """
    if interpret is None:
        from catgen.kernels import config as _kc
        interpret = _kc.pallas_interpret
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    collapsed, (pt, pb, plft, prt), offsets = _collapsed_weights_and_pads(kernel)
    kp_h = max(c.shape[0] for c in collapsed)
    kp_w = max(c.shape[1] for c in collapsed)
    wstack = jnp.zeros((4, kp_h, kp_w, cin, cout), kernel.dtype)
    for p, ck in enumerate(collapsed):
        wstack = wstack.at[p, :ck.shape[0], :ck.shape[1]].set(ck)

    abt, act = _auto_tiles(n, h, w, cin, cout, kp_h, kp_w,
                           itemsize=x.dtype.itemsize)
    bt = batch_tile if batch_tile is not None else abt
    ct = cout_tile if cout_tile is not None else act
    bt = min(bt, n)
    while n % bt:
        bt -= 1
    while cout % ct:
        ct -= 1

    use_bias = bias is not None
    use_prelu = prelu_alpha is not None
    alpha = None
    alpha_channelwise = False
    if use_prelu:
        alpha = jnp.broadcast_to(prelu_alpha, (1,)) \
            if prelu_alpha.ndim == 0 else prelu_alpha
        alpha_channelwise = alpha.shape[0] == cout and cout > 1

    kernel_fn = _make_kernel(h, w, cin, ct, bt, (kp_h, kp_w), offsets,
                             use_bias, use_prelu, alpha_channelwise,
                             pads=(pt, pb, plft, prt))

    in_specs = [
        pl.BlockSpec((bt, h, w, cin), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, kp_h, kp_w, cin, ct),
                     lambda i, j: (0, 0, 0, 0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, wstack]
    if use_bias:
        in_specs.append(pl.BlockSpec((1, ct), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, cout))
    if use_prelu:
        if alpha_channelwise:
            in_specs.append(pl.BlockSpec((1, ct), lambda i, j: (0, j),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM))
        args.append(alpha.reshape(1, -1))

    return pl.pallas_call(
        kernel_fn,
        grid=(n // bt, cout // ct),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, 2 * h, 2 * w, ct),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# differentiable wrapper (training path)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def upsample2_conv_bias(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array) -> jax.Array:
    """Differentiable fused upsample2+conv+bias: Pallas forward, backward
    through the mathematically identical XLA collapsed path."""
    return upsample2_conv_fused(x, kernel, bias)


def _ucb_fwd(x, kernel, bias):
    return upsample2_conv_fused(x, kernel, bias), (x, kernel, bias)


def _ucb_bwd(res, g):
    x, kernel, bias = res
    from catgen.kernels import config
    impl = config.upsample_bwd   # validated at config import
    if impl == "pallas":
        from catgen.kernels.pallas_upsample_conv_bwd import \
            upsample2_conv_backward
        return upsample2_conv_backward(x, kernel, g)
    if impl == "hybrid":
        # Pallas dX (transposed parity convs in one pass) + XLA dW/db
        from catgen.kernels.pallas_upsample_conv_bwd import \
            upsample2_conv_backward as _pb
        import jax.numpy as _jnp
        dx = _pb(x, kernel, g)[0]
        _, vjp_k = jax.vjp(lambda k_: upsample2_conv(x, k_), kernel)
        (dk,) = vjp_k(g)
        db = _jnp.sum(g.astype(_jnp.float32),
                      axis=(0, 1, 2)).astype(kernel.dtype)
        return dx, dk, db
    if impl == "collapsed":
        fn = lambda x_, k_, b_: upsample2_conv(x_, k_) + b_
    else:
        from catgen.kernels.upsample_conv import upsample2_conv_reference
        fn = lambda x_, k_, b_: upsample2_conv_reference(x_, k_) + b_
    _, vjp = jax.vjp(fn, x, kernel, bias)
    return vjp(g)


upsample2_conv_bias.defvjp(_ucb_fwd, _ucb_bwd)


# ---------------------------------------------------------------------------
# boundary-fused block: [prev-stage BN + PReLU] -> upsample2+conv(+bias)
# with in-kernel batch statistics for THIS stage's BN (SURVEY.md §7 step 8:
# "fuse nearest-upsample+conv(+BN+PReLU)")
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("with_stats", "interpret"))
def upsample2_conv_block_fused(x, kernel, bias, in_scale, in_shift, in_alpha,
                               with_stats: bool = True,
                               interpret: bool = False):
    """prelu(x*in_scale + in_shift, in_alpha) -> upsample2 -> conv -> +bias,
    one Pallas pass; optionally also emits per-channel [sum(y), sum(y^2)]
    over (N, 2H, 2W) as fp32 partials (one row per batch tile, reduced by
    the caller) so the following BatchNorm needs no pass over y.

    in_scale/in_shift: (Cin,); in_alpha: (Cin,) or (1,) PReLU slope of the
    previous stage. Returns y (N,2H,2W,Cout)[, s1 (Cout,), s2 (Cout,)].
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    collapsed, (pt, pb, plft, prt), offsets = \
        _collapsed_weights_and_pads(kernel)
    kp_h = max(c.shape[0] for c in collapsed)
    kp_w = max(c.shape[1] for c in collapsed)
    wstack = jnp.zeros((4, kp_h, kp_w, cin, cout), kernel.dtype)
    for p, ck in enumerate(collapsed):
        wstack = wstack.at[p, :ck.shape[0], :ck.shape[1]].set(ck)

    bt, ct = _auto_tiles(n, h, w, cin, cout, kp_h, kp_w,
                         itemsize=x.dtype.itemsize)
    bt = min(bt, n)
    while n % bt:
        bt -= 1
    while cout % ct:
        ct -= 1

    kernel_fn = _make_kernel(h, w, cin, ct, bt, (kp_h, kp_w), offsets,
                             use_bias=True, use_prelu=False,
                             alpha_channelwise=False,
                             pads=(pt, pb, plft, prt),
                             in_transform=True, with_stats=with_stats)

    # Mosaic can't broadcast a 1-element vector across both sublanes and
    # lanes — widen a scalar alpha to full Cin so the in-kernel broadcast
    # is lane-aligned like scale/shift.
    alpha = jnp.broadcast_to(in_alpha.reshape(-1), (cin,)) \
        if in_alpha.size == 1 else in_alpha
    in_specs = [
        pl.BlockSpec((bt, h, w, cin), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, kp_h, kp_w, cin, ct),
                     lambda i, j: (0, 0, 0, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, alpha.shape[0]), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, wstack, bias.reshape(1, cout), in_scale.reshape(1, cin),
            in_shift.reshape(1, cin), alpha.reshape(1, -1)]
    nb = n // bt
    out_specs = [pl.BlockSpec((bt, 2 * h, 2 * w, ct),
                              lambda i, j: (i, 0, 0, j),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n, 2 * h, 2 * w, cout), x.dtype)]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, 2, ct), lambda i, j: (i, 0, j),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nb, 2, cout), jnp.float32))
    outs = pl.pallas_call(
        kernel_fn,
        grid=(nb, cout // ct),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if with_stats else out_specs[0],
        out_shape=tuple(out_shape) if with_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    if not with_stats:
        return outs
    y, partials = outs
    s = jnp.sum(partials, axis=0)                        # (2, cout) f32
    return y, s[0], s[1]


def _block_ref(x, in_scale, in_shift, in_alpha, kernel, bias):
    """XLA reference semantics of the fused block (backward path + tests):
    BN-affine -> PReLU -> upsample2 -> conv -> +bias."""
    xt = (x.astype(jnp.float32) * in_scale.astype(jnp.float32)
          + in_shift.astype(jnp.float32))
    al = in_alpha.astype(jnp.float32)
    xn = jnp.where(xt >= 0, xt, al * xt).astype(x.dtype)
    return upsample2_conv(xn, kernel) + bias.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def upsample2_conv_block(x, in_scale, in_shift, in_alpha, kernel, bias,
                         interpret: bool = False):
    """Differentiable boundary-fused block (Pallas forward + stats;
    backward through the mathematically identical XLA collapsed path —
    the saved forward output feeds the stats cotangent chain, so no
    convolution is recomputed)."""
    return upsample2_conv_block_fused(x, kernel, bias, in_scale, in_shift,
                                      in_alpha, with_stats=True,
                                      interpret=interpret)


def _ucblock_fwd(x, in_scale, in_shift, in_alpha, kernel, bias, interpret):
    y, s1, s2 = upsample2_conv_block_fused(
        x, kernel, bias, in_scale, in_shift, in_alpha, with_stats=True,
        interpret=interpret)
    return (y, s1, s2), (x, in_scale, in_shift, in_alpha, kernel, bias, y)


def _block_bwd_surgical(x, in_scale, in_shift, in_alpha, kernel, bias,
                        g_tot):
    """Hand-written XLA backward of the fused block. vs jax.vjp of
    ``_block_ref`` this kills the per-parity kernel transposes (~2.7 ms/
    step measured: XLA first builds CK then relayouts it {1,0,3,2}) by
    einsum-building the *flipped, io-swapped* collapsed kernels directly
    from the tiny kxk weights and feeding them to the parity convs with
    HWOI dimension numbers, and replaces the parity-plane transpose with
    reshape+slice extraction."""
    f32 = jnp.float32
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k_h, k_w = kernel.shape[0], kernel.shape[1]
    collapsed, (pt, pb, plft, prt), offsets = \
        _collapsed_weights_and_pads(kernel)
    kp_h = max(c.shape[0] for c in collapsed)
    kp_w = max(c.shape[1] for c in collapsed)

    # recompute the transformed input (elementwise; cheaper than saving it)
    sc = in_scale.astype(f32)
    al32 = in_alpha.astype(f32)
    xt = x.astype(f32) * sc + in_shift.astype(f32)
    mask = xt >= 0
    xn = jnp.where(mask, xt, al32 * xt).astype(x.dtype)

    g = g_tot.astype(x.dtype)
    # parity planes by reshape+slice (no 6-D transpose copy)
    g5 = g.reshape(n, h, 2, 2 * w, cout)
    planes = []
    for d in (0, 1):
        row = lax.slice(g5, (0, 0, d, 0, 0), (n, h, d + 1, 2 * w, cout))
        row = row.reshape(n, h, w, 2, cout)
        for e in (0, 1):
            planes.append(lax.slice(
                row, (0, 0, 0, e, 0), (n, h, w, e + 1, cout)
            ).reshape(n, h, w, cout))

    # dX: four parity correlations; flipped io-swapped collapsed kernels
    # built straight from the kxk weights (einsum output IS the conv
    # operand — no transposes)
    dxn32 = None
    for p, (oh, ow) in enumerate(offsets):
        d, e = divmod(p, 2)
        mh, _ = _collapse_matrix(k_h, d)
        mw, _ = _collapse_matrix(k_w, e)
        kp_p_h, kp_p_w = mh.shape[0], mw.shape[0]
        ckt = jnp.einsum("ua,vb,abio->uvoi", mh[::-1], mw[::-1], kernel,
                         preferred_element_type=f32).astype(kernel.dtype)
        # gpad index math proven in fused_block_backward (tested): for the
        # parity's own tap count kp_p, pads are (kp_p-1-pt+oh, pt-oh)
        contrib = lax.conv_general_dilated(
            planes[p], ckt,
            window_strides=(1, 1),
            padding=[(kp_p_h - 1 - pt + oh, pt - oh),
                     (kp_p_w - 1 - plft + ow, plft - ow)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        dxn32 = contrib.astype(f32) if dxn32 is None \
            else dxn32 + contrib.astype(f32)

    # input-transform backward (elementwise + per-channel reductions)
    dxt = dxn32 * jnp.where(mask, 1.0, al32)
    dx = (dxt * sc).astype(x.dtype)
    dscale = jnp.sum(dxt * x.astype(f32), axis=(0, 1, 2))
    dshift = jnp.sum(dxt, axis=(0, 1, 2))
    dalpha = jnp.sum(dxn32 * jnp.where(mask, 0.0, xt), axis=(0, 1, 2))
    if in_alpha.size == 1:
        dalpha = jnp.sum(dalpha, keepdims=True)
    else:
        dalpha = dalpha.astype(in_alpha.dtype)

    # dW: per-parity native conv_grad_rhs against the SAME parity planes,
    # then dck -> dkernel through a flattened 0/1-matrix dot (kp^2 -> k^2)
    # — no einsum-VJP transpose chain (measured 2 ms of {1,0,3,2}
    # relayouts when autodiff differentiates through collapse_weights)
    import numpy as np
    dkernel_flat = None
    for p, ck in enumerate(collapsed):
        d, e = divmod(p, 2)
        mh, _ = _collapse_matrix(k_h, d)
        mw, _ = _collapse_matrix(k_w, e)
        kp_p_h, kp_p_w = mh.shape[0], mw.shape[0]
        oh, ow = offsets[p]
        # forward parity conv on the *unpadded* xn with explicit pads
        # equal to the kernel's xpad slice window
        pad_h = (pt - oh, oh + kp_p_h - 1 - pt)
        pad_w = (plft - ow, ow + kp_p_w - 1 - plft)
        _, vjp_ck = jax.vjp(
            lambda ck_, ph=pad_h, pw=pad_w: lax.conv_general_dilated(
                xn, ck_, window_strides=(1, 1), padding=[ph, pw],
                dimension_numbers=("NHWC", "HWIO", "NHWC")), ck)
        dck, = vjp_ck(planes[p])
        m2 = jnp.asarray(np.einsum("ua,vb->uvab", np.asarray(mh),
                                   np.asarray(mw)).reshape(
                                       kp_p_h * kp_p_w, k_h * k_w))
        contrib = jax.lax.dot_general(
            m2, dck.astype(f32).reshape(kp_p_h * kp_p_w, cin * cout),
            dimension_numbers=(((0,), (0,)), ((), ())))   # (k^2, cin*cout)
        dkernel_flat = contrib if dkernel_flat is None \
            else dkernel_flat + contrib
    dkernel = dkernel_flat.reshape(k_h, k_w, cin, cout).astype(kernel.dtype)
    dbias = jnp.sum(g_tot, axis=(0, 1, 2)).astype(bias.dtype)

    return (dx, dscale.astype(in_scale.dtype), dshift.astype(in_shift.dtype),
            dalpha.astype(in_alpha.dtype), dkernel, dbias)


def _ucblock_bwd(interpret, res, cots):
    x, in_scale, in_shift, in_alpha, kernel, bias, y = res
    gy, gs1, gs2 = cots
    from catgen.kernels import config as kconfig
    if kconfig.ladder_bwd == "pallas":
        from catgen.kernels.pallas_upsample_conv_bwd import \
            fused_block_backward
        dx, dsc, dsh, dal, dk, db = fused_block_backward(
            x, in_scale, in_shift, in_alpha, kernel, y, gy, gs1, gs2,
            interpret=interpret)
        if in_alpha.size == 1:   # shared-slope PReLU: reduce over channels
            dal = jnp.sum(dal, keepdims=True)
        return (dx, dsc, dsh, dal.astype(in_alpha.dtype), dk,
                db.astype(bias.dtype))
    # d(sum y)/dy = 1, d(sum y^2)/dy = 2y — fold the stats cotangents into
    # the output cotangent (fp32 so the tiny per-element stat terms are
    # not lost before the elementwise sum)
    g_tot = (gy.astype(jnp.float32) + gs1.astype(jnp.float32)
             + 2.0 * y.astype(jnp.float32) * gs2.astype(jnp.float32))
    if kconfig.ladder_bwd == "xla":
        return _block_bwd_surgical(x, in_scale, in_shift, in_alpha,
                                   kernel, bias, g_tot)
    # "xla_vjp": autodiff through the reference formulation
    _, vjp = jax.vjp(_block_ref, x, in_scale, in_shift, in_alpha,
                     kernel, bias)
    return vjp(g_tot.astype(y.dtype))


upsample2_conv_block.defvjp(_ucblock_fwd, _ucblock_bwd)
