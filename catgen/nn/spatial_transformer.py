"""Spatial transformer: affine parameter head -> grid -> bilinear sampling.

TPU-native rebuild of the reference's STN stack
(/root/reference/models.lua:814-906), which composed
``nn.AffineTransformMatrixGenerator`` + ``nn.AffineGridGeneratorBHWD`` +
``nn.BilinearSamplerBHWD`` from the CUDA ``stn`` package — and pinned the
sampler to the **CPU** because the GPU path was non-deterministic
(models.lua:888-896). Here the whole stack is pure XLA (vectorized gathers +
lerp), deterministic on TPU by construction, and differentiable w.r.t. both
image and grid. A Pallas one-hot-matmul variant of the sampler lives in
``catgen.kernels.pallas_bilinear`` (v1; v2-v4 siblings, v4 the default —
kernels/config.py) for the MXU-friendly path.

Conventions (matching torch-stn semantics):
  * normalized coords in [-1, 1], align-corners (−1 ↔ pixel 0, +1 ↔ pixel
    N−1), (y, x) order;
  * the affine matrix maps *output* normalized coords to *input* sampling
    coords (inverse warping);
  * restricted parameterizations, in order: [angle] if rotation,
    [scale] if scaling, [tx, ty] if translation (models.lua:822-839);
    identity bias init = rotation 0, scale 1, translation 0
    (models.lua:858-860: zero classifier weights, identity bias).
  * sampling uses border clamping (out-of-range coords read edge pixels),
    which keeps gradients stable near the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from catgen.core.module import (Module, Sequential, _child_rng,
                                child_variables, make_variables,
                                merge_variables)
from catgen.nn.layers import AvgPool, Conv, Dense, Flatten, LeakyReLU


# ---------------------------------------------------------------------------
# functional pieces
# ---------------------------------------------------------------------------


def affine_matrix(params: jax.Array, allow_rotation: bool,
                  allow_scaling: bool, allow_translation: bool) -> jax.Array:
    """Builds (B, 2, 3) affine matrices from restricted parameters (B, P).

    Parameter order matches models.lua:822-834. If no component is allowed,
    params are the full 6-dof matrix row-major (models.lua:835-839).
    """
    b = params.shape[0]
    if not (allow_rotation or allow_scaling or allow_translation):
        return params.reshape(b, 2, 3)
    i = 0
    if allow_rotation:
        angle = params[:, i]
        i += 1
    else:
        angle = jnp.zeros((b,), params.dtype)
    if allow_scaling:
        scale = params[:, i]
        i += 1
    else:
        scale = jnp.ones((b,), params.dtype)
    if allow_translation:
        tx = params[:, i]
        ty = params[:, i + 1]
    else:
        tx = jnp.zeros((b,), params.dtype)
        ty = jnp.zeros((b,), params.dtype)
    cos = jnp.cos(angle) * scale
    sin = jnp.sin(angle) * scale
    row0 = jnp.stack([cos, -sin, tx], axis=-1)
    row1 = jnp.stack([sin, cos, ty], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def affine_grid(theta: jax.Array, height: int, width: int) -> jax.Array:
    """(B,2,3) affine matrices -> (B,H,W,2) normalized sample coords (y,x)."""
    ys = jnp.linspace(-1.0, 1.0, height, dtype=theta.dtype)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=theta.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gy, gx, jnp.ones_like(gy)], axis=-1)   # (H,W,3)
    # (B,2,3) @ (H,W,3) -> (B,H,W,2)
    return jnp.einsum("bij,hwj->bhwi", theta, base)


def affine_grid_rows(theta: jax.Array, height: int, width: int) -> jax.Array:
    """(B,2,3) affine matrices -> (B, 2, H*W) normalized (y; x) coord rows.

    Same grid as ``affine_grid`` but emitted in the lane-wide layout the
    v4 Pallas sampler consumes directly (lanes = pixels) — no relayout
    between the grid generator and the sampler."""
    ys = jnp.linspace(-1.0, 1.0, height, dtype=theta.dtype)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=theta.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gy.reshape(-1), gx.reshape(-1),
                      jnp.ones((height * width,), theta.dtype)], axis=0)
    return jnp.einsum("bij,jp->bip", theta, base)        # (B, 2, P)


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Samples NHWC ``img`` at normalized (y, x) ``coords`` (B,Ho,Wo,2).

    Border-clamped bilinear interpolation; differentiable w.r.t. both
    arguments. Pure gathers + lerp — deterministic on TPU (unlike the
    reference's GPU sampler, models.lua:888-896).
    """
    n, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    fy = (coords[..., 0] + 1.0) * 0.5 * (h - 1)
    fx = (coords[..., 1] + 1.0) * 0.5 * (w - 1)
    fy = jnp.clip(fy, 0.0, h - 1)
    fx = jnp.clip(fx, 0.0, w - 1)
    y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32) if h > 1 else jnp.zeros_like(fy, jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32) if w > 1 else jnp.zeros_like(fx, jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (fy - y0.astype(fy.dtype))[..., None]
    wx = (fx - x0.astype(fx.dtype))[..., None]

    flat = img.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, ho * wo)
        out = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        return out.reshape(n, ho, wo, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def warp_flow(img: jax.Array, flow: jax.Array) -> jax.Array:
    """``image.warp``-style warping: ``flow`` (B,H,W,2) holds per-output-pixel
    source *offsets* in pixels (dy, dx); used by the V subsystem's synthetic
    warp generator (train_v.lua:450-484 equivalent)."""
    n, h, w, _ = img.shape
    gy = jnp.arange(h, dtype=img.dtype)[None, :, None]
    gx = jnp.arange(w, dtype=img.dtype)[None, None, :]
    sy = gy + flow[..., 0]
    sx = gx + flow[..., 1]
    ny = 2.0 * sy / jnp.maximum(h - 1, 1) - 1.0
    nx = 2.0 * sx / jnp.maximum(w - 1, 1) - 1.0
    return bilinear_sample(img, jnp.stack([ny, nx], axis=-1))


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class AffineParamHead(Module):
    """Final localization layer: zero-initialized weights, identity bias
    (models.lua:858-860, per STN paper A.3)."""

    def __init__(self, allow_rotation: bool, allow_scaling: bool,
                 allow_translation: bool, dtype=jnp.float32):
        self.flags = (allow_rotation, allow_scaling, allow_translation)
        self.dtype = dtype
        n = 0
        bias = []
        if allow_rotation:
            n += 1
            bias.append(0.0)
        if allow_scaling:
            n += 1
            bias.append(1.0)
        if allow_translation:
            n += 2
            bias.extend([0.0, 0.0])
        if n == 0:
            n = 6
            bias = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0]
        self.n_params = n
        self.init_bias = bias

    def init(self, key, x_shape):
        del key
        in_features = x_shape[-1]
        return make_variables({
            "kernel": jnp.zeros((in_features, self.n_params), self.dtype),
            "bias": jnp.asarray(self.init_bias, self.dtype),
        })

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables["params"]
        y = jnp.dot(x, p["kernel"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        return y + p["bias"].astype(x.dtype), variables["state"]

    def out_shape(self, x_shape):
        return x_shape[:-1] + (self.n_params,)


def _localization_net(channels_hint: int) -> Sequential:
    """Localization convnet (models.lua:842-855): avgpool2 -> conv16 ->
    LeakyReLU -> conv16 -> LeakyReLU -> avgpool2 -> flatten -> dense64 ->
    LeakyReLU."""
    del channels_hint
    return Sequential([
        AvgPool(2),
        Conv(16, (3, 3)),
        LeakyReLU(),
        Conv(16, (3, 3)),
        LeakyReLU(),
        AvgPool(2),
        Flatten(),
        Dense(64),
        LeakyReLU(),
    ], name="loc")


class SpatialTransformer(Module):
    """Full ST block: localization net -> affine params -> grid -> bilinear
    resample of the input (models.lua:814-906). Output spatial size equals
    input spatial size."""

    def __init__(self, allow_rotation: bool, allow_scaling: bool,
                 allow_translation: bool):
        self.flags = (allow_rotation, allow_scaling, allow_translation)
        self.loc = _localization_net(0)
        self.head = AffineParamHead(*self.flags)

    def init(self, key, x_shape):
        k1, k2 = jax.random.split(key)
        loc_vars = self.loc.init(k1, x_shape)
        head_vars = self.head.init(k2, self.loc.out_shape(x_shape))
        return merge_variables({"loc": loc_vars, "head": head_vars})

    def apply(self, variables, x, *, train=False, rng=None):
        feats, loc_state = self.loc.apply(
            child_variables(variables, "loc"), x, train=train, rng=rng)
        params, head_state = self.head.apply(
            child_variables(variables, "head"), feats, train=train, rng=rng)
        theta = affine_matrix(params.astype(jnp.float32), *self.flags)
        h, w = x.shape[1], x.shape[2]
        from catgen.kernels import config as kconfig
        if kconfig.resolve_sampler_impl() == "mxu":
            # kernel generation picked by CATGEN_SAMPLER_KERNEL (default
            # v4, the lane-wide relayout-free kernel — measured fastest
            # end-to-end; v1-v3 kept as baselines, KERNELS.md §2)
            if kconfig.sampler_kernel == "v4":
                from catgen.kernels.pallas_bilinear_v4 import \
                    bilinear_sample_rows
                rows = affine_grid_rows(theta, h, w).astype(x.dtype)
                y = bilinear_sample_rows(x, rows, (h, w))
            else:
                grid = affine_grid(theta, h, w)
                y = kconfig.get_mxu_sampler()(x, grid.astype(x.dtype))
        else:
            grid = affine_grid(theta, h, w)
            y = bilinear_sample(x, grid.astype(x.dtype))
        return y, {"loc": loc_state, "head": head_state}

    def out_shape(self, x_shape):
        return x_shape


class FusedSTBranches(Module):
    """The D*_st3 4-way branch block with the three spatial-transformer
    branches' sampling fused into ONE kernel call.

    All three ST branches sample the same feature map
    (models.lua:653-678); their grids are concatenated along the row axis
    so the bilinear kernel runs once with 3x the matmul rows (better MXU
    utilization, one launch instead of three), then the result is split
    and each branch tail (convs) runs as usual. The plain conv branch and
    the channel concat match nn.Concat(2) semantics (models.lua:688-693).
    """

    def __init__(self, tails, plain, flags=(True, True, True)):
        assert len(tails) >= 1
        self.tails = list(tails)
        self.plain = plain
        self.flags = tuple(flags)
        self.locs = [_localization_net(0) for _ in tails]
        self.heads = [AffineParamHead(*self.flags) for _ in tails]

    def init(self, key, x_shape):
        children = {}
        for i in range(len(self.tails)):
            k = jax.random.fold_in(key, i)
            k1, k2, k3 = jax.random.split(k, 3)
            children[f"loc{i}"] = self.locs[i].init(k1, x_shape)
            children[f"head{i}"] = self.heads[i].init(
                k2, self.locs[i].out_shape(x_shape))
            children[f"tail{i}"] = self.tails[i].init(k3, x_shape)
        children["plain"] = self.plain.init(
            jax.random.fold_in(key, 99), x_shape)
        return merge_variables(children)

    def _loc_layout(self):
        """Derive the joint fast path's structure from the actual
        localization Sequential instead of hard-coding child names — a
        reordering or edit of ``_localization_net`` fails loudly here
        rather than silently diverging from the per-branch path."""
        seq = self.locs[0]
        expected = (AvgPool, Conv, LeakyReLU, Conv, LeakyReLU, AvgPool,
                    Flatten, Dense, LeakyReLU)
        classes = tuple(type(l) for l in seq.layers)
        if classes != expected:
            raise NotImplementedError(
                f"joint localization fast path expects the layer pattern "
                f"{[c.__name__ for c in expected]} (models.lua:842-855), "
                f"got {[c.__name__ for c in classes]}; set "
                f"CATGEN_JOINT_LOC=0 or update _joint_loc_features")
        pool1, conv1, act1, conv2, act2, pool2_l = seq.layers[:6]
        dense = seq.layers[7]
        if not (pool1.window == pool1.stride == 2
                and pool2_l.window == pool2_l.stride == 2):
            raise NotImplementedError("joint loc path assumes 2x2/2 pools")
        if act1.negative_slope != act2.negative_slope or \
                act2.negative_slope != seq.layers[8].negative_slope:
            raise NotImplementedError("joint loc path assumes one slope")
        if conv1.strides != (1, 1) or conv2.strides != (1, 1) or \
                conv1.padding != (1, 1) or conv2.padding != (1, 1):
            raise NotImplementedError("joint loc path assumes same-conv 3x3")
        if not (conv1.use_bias and conv2.use_bias and dense.use_bias):
            raise NotImplementedError(
                "joint loc path reads 'bias' params; set CATGEN_JOINT_LOC=0 "
                "for bias-free localization nets")
        names = {k: seq._child_name(i)
                 for k, i in (("conv1", 1), ("conv2", 3), ("dense", 7))}
        return names, act1.negative_slope

    def _joint_loc_features(self, variables, x):
        """All branch localization nets in one pass (models.lua:842-855,
        x n_tails): they share the input, so their first convs concatenate
        into one conv, the second run as one grouped conv, and the pools/
        activations execute once at n_tails x channels. Exactly equivalent
        to applying each net separately — parameters stay per-branch and
        gradients flow back through the concat/slice — but collapses
        ~3x4 small-channel conv ops per phase into 4 (measured ~2 ms/step
        on the D32_st3 train step, KERNELS.md §4). Structure (child names,
        slope, pools) is derived from the Sequential via ``_loc_layout``."""
        nb = len(self.tails)
        ps = [child_variables(variables, f"loc{i}")["params"]
              for i in range(nb)]
        names, neg_slope = self._loc_layout()
        slope = jnp.asarray(neg_slope, x.dtype)

        def pool2(v):
            s = jax.lax.reduce_window(v, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID")
            return s * 0.25

        def leaky(v):
            return jnp.where(v >= 0, v, slope * v)

        def conv(v, k, groups=1):
            return jax.lax.conv_general_dilated(
                v, k.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)

        hp = pool2(x)
        k1 = jnp.concatenate([p[names["conv1"]]["kernel"] for p in ps],
                             axis=3)
        b1 = jnp.concatenate([p[names["conv1"]]["bias"] for p in ps])
        hc = leaky(conv(hp, k1) + b1.astype(x.dtype))
        k2 = jnp.concatenate([p[names["conv2"]]["kernel"] for p in ps],
                             axis=3)
        b2 = jnp.concatenate([p[names["conv2"]]["bias"] for p in ps])
        hc = leaky(conv(hc, k2, groups=nb) + b2.astype(x.dtype))
        hc = pool2(hc)                                   # (n, h/4, w/4, nb*c)
        c_per = hc.shape[-1] // nb
        feats = []
        for i in range(nb):
            fl = hc[..., i * c_per:(i + 1) * c_per].reshape(x.shape[0], -1)
            d = ps[i][names["dense"]]
            feats.append(leaky(jnp.dot(fl, d["kernel"].astype(x.dtype))
                               + d["bias"].astype(x.dtype)))
        return feats

    def apply(self, variables, x, *, train=False, rng=None):
        from catgen.kernels import config as kconfig

        n, h, w, _ = x.shape
        new_state = {}
        use_v4 = (kconfig.resolve_sampler_impl() == "mxu"
                  and kconfig.sampler_kernel == "v4")
        if kconfig.joint_loc:
            loc_feats = self._joint_loc_features(variables, x)
        else:     # per-branch reference path (A/B + debugging)
            loc_feats = []
            for i in range(len(self.tails)):
                f, _ = self.locs[i].apply(
                    child_variables(variables, f"loc{i}"), x,
                    train=train, rng=None)
                loc_feats.append(f)
        grids = []
        for i in range(len(self.tails)):
            params, st_h = self.heads[i].apply(
                child_variables(variables, f"head{i}"), loc_feats[i],
                train=train, rng=None)
            theta = affine_matrix(params.astype(jnp.float32), *self.flags)
            grids.append(affine_grid_rows(theta, h, w) if use_v4
                         else affine_grid(theta, h, w))
            new_state[f"loc{i}"] = child_variables(
                variables, f"loc{i}")["state"]
            new_state[f"head{i}"] = st_h
        if use_v4:
            from catgen.kernels.pallas_bilinear_v4 import \
                bilinear_sample_rows
            stacked = jnp.concatenate(grids, axis=2)     # (N, 2, n_tails*P)
            sampled = bilinear_sample_rows(
                x, stacked.astype(x.dtype), (len(self.tails) * h, w))
        elif kconfig.resolve_sampler_impl() == "mxu":
            stacked = jnp.concatenate(grids, axis=1)  # (N, n_tails*H, W, 2)
            sampled = kconfig.get_mxu_sampler()(x, stacked.astype(x.dtype))
        else:
            stacked = jnp.concatenate(grids, axis=1)
            sampled = bilinear_sample(x, stacked.astype(x.dtype))
        outs = []
        for i in range(len(self.tails)):
            piece = sampled[:, i * h:(i + 1) * h]
            y, st_t = self.tails[i].apply(
                child_variables(variables, f"tail{i}"), piece, train=train,
                rng=_child_rng(rng, i))
            outs.append(y)
            new_state[f"tail{i}"] = st_t
        y, st_p = self.plain.apply(child_variables(variables, "plain"), x,
                                   train=train, rng=_child_rng(rng, 99))
        outs.append(y)
        new_state["plain"] = st_p
        return jnp.concatenate(outs, axis=-1), new_state

    def out_shape(self, x_shape):
        shapes = [t.out_shape(x_shape) for t in self.tails]
        shapes.append(self.plain.out_shape(x_shape))
        total_c = sum(s[-1] for s in shapes)
        return shapes[0][:-1] + (total_c,)

    @property
    def name(self):
        return "FusedSTBranches"


class FusedSTConvPReLU(Module):
    """D's input prefix [SpatialTransformer -> Conv(3x3 same) -> PReLU]
    (models.lua:643-652) with a single-pass Pallas implementation.

    The C=3 input conv is pathological for XLA on TPU (lane-padding layout
    copies, KERNELS.md §5); the fused kernel (kernels/pallas_st_conv.py)
    samples and convolves in one pass with the affine grid generated
    in-kernel. Parameters and semantics are identical to the split
    Sequential composition — selection is CATGEN_ST_CONV=fused|split|auto
    and an equality test pins the two paths together
    (tests/test_st_conv_fused.py)."""

    def __init__(self, st: SpatialTransformer, conv, act):
        self.st, self.conv, self.act = st, conv, act

    def init(self, key, x_shape):
        k1, k2, k3 = jax.random.split(key, 3)
        st_vars = self.st.init(k1, x_shape)
        conv_vars = self.conv.init(k2, self.st.out_shape(x_shape))
        act_vars = self.act.init(
            k3, self.conv.out_shape(self.st.out_shape(x_shape)))
        return merge_variables({"st": st_vars, "conv": conv_vars,
                                "act": act_vars})

    def _can_fuse(self, x) -> bool:
        return (self.conv.kernel_size == (3, 3)
                and self.conv.strides == (1, 1)
                and self.conv.padding == (1, 1)
                and self.conv.use_bias      # fused epilogue reads "bias"
                and x.shape[1] > 2 and x.shape[2] > 2)

    def apply(self, variables, x, *, train=False, rng=None):
        from catgen.kernels import config as kconfig

        st_vars = child_variables(variables, "st")
        if kconfig.resolve_st_conv_impl() == "fused" and self._can_fuse(x):
            feats, loc_state = self.st.loc.apply(
                child_variables(st_vars, "loc"), x, train=train, rng=rng)
            params, head_state = self.st.head.apply(
                child_variables(st_vars, "head"), feats, train=train,
                rng=rng)
            theta = affine_matrix(params.astype(jnp.float32),
                                  *self.st.flags)
            conv_p = child_variables(variables, "conv")["params"]
            act_p = child_variables(variables, "act")["params"]
            from catgen.kernels.pallas_st_conv import st_conv_prelu
            y = st_conv_prelu(x, theta, conv_p["kernel"], conv_p["bias"],
                              act_p["alpha"], kconfig.st_conv_interpret)
            state = {"st": {"loc": loc_state, "head": head_state},
                     "conv": child_variables(variables, "conv")["state"],
                     "act": child_variables(variables, "act")["state"]}
            return y, state
        y, st_state = self.st.apply(st_vars, x, train=train, rng=rng)
        y, conv_state = self.conv.apply(
            child_variables(variables, "conv"), y, train=train, rng=rng)
        y, act_state = self.act.apply(
            child_variables(variables, "act"), y, train=train, rng=rng)
        return y, {"st": st_state, "conv": conv_state, "act": act_state}

    def out_shape(self, x_shape):
        return self.conv.out_shape(self.st.out_shape(x_shape))

    @property
    def name(self):
        return "FusedSTConvPReLU"
