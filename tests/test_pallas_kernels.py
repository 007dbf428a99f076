"""Pallas kernel tests (interpret mode on the CPU mesh; hardware numerics
are validated separately on-chip by the bench harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen.kernels.pallas_upsample_conv import (_auto_tiles,
                                                 upsample2_conv_fused)
from catgen.kernels.upsample_conv import upsample2_conv_reference


@pytest.mark.parametrize("k", [3, 5, 7])
def test_fused_matches_reference(key, rng, k):
    x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 16, 32).astype(np.float32) * 0.1)
    got = upsample2_conv_fused(x, w, interpret=True)
    want = upsample2_conv_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_bias_and_prelu(key, rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    a = jnp.asarray([0.25], np.float32)
    got = upsample2_conv_fused(x, w, b, a, interpret=True)
    want = upsample2_conv_reference(x, w) + b
    want = jnp.where(want >= 0, want, 0.25 * want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_channelwise_prelu(key, rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    a = jnp.asarray(rng.rand(16).astype(np.float32))
    got = upsample2_conv_fused(x, w, prelu_alpha=a, interpret=True)
    want = upsample2_conv_reference(x, w)
    want = jnp.where(want >= 0, want, a * want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tiling_choices_divide():
    for (n, h, w, cin, cout, kp) in [(1024, 4, 4, 512, 512, 2),
                                     (256, 16, 16, 256, 128, 3),
                                     (7, 8, 8, 24, 40, 2)]:
        bt, ct = _auto_tiles(n, h, w, cin, cout, kp, kp)
        assert 1 <= bt <= n
        assert cout % ct == 0
        # VMEM sanity: weight stack tile * 2 under 8 MB
        assert 2 * 4 * kp * kp * cin * ct * 4 <= 12 * 1024 * 1024


def test_uneven_batch_tile(key, rng):
    # n not divisible by the default tile -> wrapper shrinks it
    x = jnp.asarray(rng.randn(6, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    got = upsample2_conv_fused(x, w, batch_tile=4, interpret=True)
    want = upsample2_conv_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# separable MXU sampler (v2)
# ---------------------------------------------------------------------------

from catgen.kernels.pallas_bilinear import bilinear_sample_mxu  # noqa: E402
from catgen.kernels.pallas_bilinear_v2 import bilinear_sample_sep  # noqa: E402
from catgen.nn.spatial_transformer import bilinear_sample  # noqa: E402


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_mxu_samplers_match_xla(key, rng, impl):
    img = jnp.asarray(rng.rand(4, 8, 6, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (4, 8, 6, 2)).astype(np.float32))
    fn = bilinear_sample_mxu if impl == "v1" else bilinear_sample_sep
    got = fn(img, coords, 2, True)
    want = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_mxu_sampler_vjp_matches_xla(key, rng, impl):
    img = jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 8, 8, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    fn = bilinear_sample_mxu if impl == "v1" else bilinear_sample_sep
    _, vjp_mxu = jax.vjp(lambda i, c: fn(i, c, 2, True), img, coords)
    _, vjp_ref = jax.vjp(bilinear_sample, img, coords)
    for a, b in zip(vjp_ref(g), vjp_mxu(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_upsample_conv_pallas_backward_matches_vjp(key, rng):
    from catgen.kernels.pallas_upsample_conv_bwd import \
        upsample2_conv_backward
    from catgen.kernels.upsample_conv import upsample2_conv
    for k in (3, 5):
        x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, 16, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32))
        g = jnp.asarray(rng.randn(4, 16, 16, 8).astype(np.float32))
        _, vjp = jax.vjp(lambda x_, k_, b_: upsample2_conv(x_, k_) + b_,
                         x, w, b)
        want = vjp(g)
        got = upsample2_conv_backward(x, w, g, interpret=True)
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)


def test_upsample_conv_bwd_impl_options(key, rng, monkeypatch):
    # verify the backward dispatcher directly (the pallas *forward* cannot
    # compile on the CPU backend, so we call _ucb_bwd with residuals)
    from catgen.kernels.pallas_upsample_conv import _ucb_bwd
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    grads = {}
    for impl in ("collapsed", "naive"):
        monkeypatch.setenv("CATGEN_UPSAMPLE_BWD", impl)
        grads[impl] = _ucb_bwd((x, w, b), g)
    for a, b_ in zip(grads["collapsed"], grads["naive"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# tiled relayout-free sampler (v4)
# ---------------------------------------------------------------------------

from catgen.kernels.pallas_bilinear_v4 import bilinear_sample_tiled  # noqa: E402


@pytest.mark.parametrize("shape", [(4, 8, 6, 3, 8, 6),
                                   (2, 16, 16, 64, 48, 16),
                                   (3, 32, 32, 3, 32, 32)])
def test_v4_sampler_matches_xla(rng, shape):
    n, h, w, c, ho, wo = shape
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.2, 1.2, (n, ho, wo, 2)).astype(np.float32))
    got = bilinear_sample_tiled(img, coords, True)
    want = bilinear_sample(img, coords)
    # kernel computes with bf16 operands (fp32 accumulation): ~0.4% rel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=1e-2)


@pytest.mark.parametrize("shape", [(4, 8, 6, 3, 8, 6),
                                   (2, 16, 16, 64, 48, 16)])
def test_v4_sampler_vjp_matches_xla(rng, shape):
    n, h, w, c, ho, wo = shape
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(n, ho, wo, c).astype(np.float32))
    _, vjp_v4 = jax.vjp(lambda i, cd: bilinear_sample_tiled(i, cd, True),
                        img, coords)
    _, vjp_ref = jax.vjp(bilinear_sample, img, coords)
    for a, b in zip(vjp_v4(g), vjp_ref(g)):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-2, atol=6e-3)


def test_sampler_kernel_selection(monkeypatch):
    # CATGEN_SAMPLER_KERNEL picks the Pallas generation; all four resolve
    from catgen.kernels import config as kconfig
    orig = kconfig.sampler_kernel
    try:
        for name in ("v1", "v2", "v3", "v4"):
            kconfig.set_sampler_kernel(name)
            assert callable(kconfig.get_mxu_sampler())
        import pytest
        with pytest.raises(AssertionError):
            kconfig.set_sampler_kernel("v99")
    finally:
        kconfig.set_sampler_kernel(orig)


def test_v4_dense_mask_mxu_matches_vpu(rng, monkeypatch):
    """CATGEN_V4_DENSE_MASK=mxu (one-hot expander matmuls) must reproduce
    the vpu iota-compare dense path, fwd + VJP (dense path: h*w <= 256)."""
    from catgen.kernels import pallas_bilinear_v4 as v4

    n, h, w, c, ho, wo = 2, 16, 16, 8, 24, 16
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(n, ho, wo, c).astype(np.float32))

    def run():
        out, vjp = jax.vjp(lambda i, cd: bilinear_sample_tiled(i, cd, True),
                           img, coords)
        return out, vjp(g)

    monkeypatch.setattr(v4, "_DENSE_MASK_IMPL", "vpu")
    out_v, (di_v, dc_v) = run()
    monkeypatch.setattr(v4, "_DENSE_MASK_IMPL", "mxu")
    out_m, (di_m, dc_m) = run()
    # the mxu path quantizes the per-axis weights to bf16 before the
    # expander matmuls (the vpu path keeps f32 until the final dot) —
    # both are equally close to ground truth, ~1e-2 apart from each other
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_v),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(di_m), np.asarray(di_v),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dc_m), np.asarray(dc_v),
                               rtol=3e-2, atol=6e-2)


def test_v4_split_bwd_matches_monolithic(rng, monkeypatch):
    """CATGEN_V4_SPLIT_BWD=1 computes d_img and d_coords in two separate
    pallas_calls (so a dead d_img — the D-phase input ST samples the data
    batch — is DCE'd); must reproduce the monolithic separable backward
    exactly (same ops, same order, per output)."""
    from catgen.kernels import pallas_bilinear_v4 as v4

    n, h, w, c, ho, wo = 2, 32, 32, 3, 32, 32   # h*w > dense threshold
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(n, ho, wo, c).astype(np.float32))

    def run():
        _, vjp = jax.vjp(lambda i, cd: bilinear_sample_tiled(i, cd, True),
                         img, coords)
        return vjp(g)

    monkeypatch.setattr(v4, "_SPLIT_BWD", False)
    di_m, dc_m = run()
    monkeypatch.setattr(v4, "_SPLIT_BWD", True)
    di_s, dc_s = run()
    np.testing.assert_array_equal(np.asarray(di_s), np.asarray(di_m))
    np.testing.assert_array_equal(np.asarray(dc_s), np.asarray(dc_m))


def test_v4_split_bwd_dense_matches_monolithic(rng, monkeypatch):
    """Split backward on the DENSE path (h*w <= 256, mxu masks): the two
    single-output pallas_calls must reproduce the monolithic dense
    backward exactly."""
    from catgen.kernels import pallas_bilinear_v4 as v4

    n, h, w, c, ho, wo = 2, 16, 16, 8, 24, 16   # dense path
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(n, ho, wo, c).astype(np.float32))

    def run():
        _, vjp = jax.vjp(lambda i, cd: bilinear_sample_tiled(i, cd, True),
                         img, coords)
        return vjp(g)

    monkeypatch.setattr(v4, "_DENSE_MASK_IMPL", "mxu")
    monkeypatch.setattr(v4, "_SPLIT_BWD", False)
    di_m, dc_m = run()
    monkeypatch.setattr(v4, "_SPLIT_BWD", True)
    di_s, dc_s = run()
    np.testing.assert_array_equal(np.asarray(di_s), np.asarray(di_m))
    np.testing.assert_array_equal(np.asarray(dc_s), np.asarray(dc_m))


@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 24, 16),   # dense path
                                   (2, 32, 32, 3, 32, 32)])  # separable
def test_v4_dcrd_eyt_matches_mask(rng, monkeypatch, shape):
    """CATGEN_V4_DCRD=eyt (transposed-expander contraction, no wide
    derivative masks) must reproduce the 'mask' d_coords formulation on
    both the dense and the separable path, fwd + VJP."""
    from catgen.kernels import pallas_bilinear_v4 as v4

    n, h, w, c, ho, wo = shape
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(n, ho, wo, c).astype(np.float32))

    def run():
        out, vjp = jax.vjp(lambda i, cd: bilinear_sample_tiled(i, cd, True),
                           img, coords)
        return out, vjp(g)

    monkeypatch.setattr(v4, "_DCRD_IMPL", "mask")
    out_m, (di_m, dc_m) = run()
    monkeypatch.setattr(v4, "_DCRD_IMPL", "eyt")
    out_e, (di_e, dc_e) = run()
    # out and d_img are computed identically in both modes
    np.testing.assert_array_equal(np.asarray(out_e), np.asarray(out_m))
    np.testing.assert_array_equal(np.asarray(di_e), np.asarray(di_m))
    # d_coords: same products, different contraction order (f32 matmul
    # accumulation vs VPU lane reduction) -> tiny reassociation noise
    np.testing.assert_allclose(np.asarray(dc_e), np.asarray(dc_m),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 24, 16),   # dense path
                                   (2, 32, 32, 3, 32, 32)])  # separable
@pytest.mark.parametrize("dcrd", ["mask", "eyt"])
def test_v4_residual_bwd_matches_recompute(rng, monkeypatch, shape, dcrd):
    """CATGEN_V4_RESIDUAL=1: the forward saves its bilinear weight
    products (dense M / separable A,B) and the backward replays them.
    d_img must match the recompute backward bit-for-bit (same mask
    values, same contraction); d_coords is rebuilt from coords and must
    match exactly too."""
    from catgen.kernels import pallas_bilinear_v4 as v4

    n, h, w, c, ho, wo = shape
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(n, ho, wo, c).astype(np.float32))

    def run():
        out, vjp = jax.vjp(lambda i, cd: bilinear_sample_tiled(i, cd, True),
                           img, coords)
        return out, vjp(g)

    monkeypatch.setattr(v4, "_DCRD_IMPL", dcrd)
    monkeypatch.setattr(v4, "_RESIDUAL", False)
    out_r, (di_r, dc_r) = run()
    monkeypatch.setattr(v4, "_RESIDUAL", True)
    out_s, (di_s, dc_s) = run()
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(di_s), np.asarray(di_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dc_s), np.asarray(dc_r))


def test_v4_residual_fwd_matches_plain(rng, monkeypatch):
    """The residual-emitting forward's primary output must equal the
    plain forward (same math, extra outputs only) on both paths."""
    from catgen.kernels import pallas_bilinear_v4 as v4

    for (n, h, w, c, ho, wo) in [(2, 16, 16, 8, 24, 16),
                                 (2, 32, 32, 3, 32, 32)]:
        img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(-1.1, 1.1, (n, ho, wo, 2)).astype(np.float32))
        rows = coords.reshape(n, ho * wo, 2).transpose(0, 2, 1)
        plain = v4._forward(img, rows, (ho, wo), True)
        res, _saved = v4._forward(img, rows, (ho, wo), True, want_res=True)
        np.testing.assert_allclose(np.asarray(res), np.asarray(plain),
                                   rtol=1e-5, atol=1e-6)
