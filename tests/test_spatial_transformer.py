"""Spatial-transformer stack tests: identity init, golden bilinear values,
gradient flow (SURVEY.md §4(a)-(b))."""

import jax
import jax.numpy as jnp
import numpy as np

from catgen.nn.spatial_transformer import (SpatialTransformer, affine_grid,
                                           affine_matrix, bilinear_sample,
                                           warp_flow)


def test_affine_matrix_identity():
    # rotation-only, angle 0 -> identity
    theta = affine_matrix(jnp.zeros((2, 1)), True, False, False)
    want = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    np.testing.assert_allclose(np.asarray(theta), want, atol=1e-7)
    # rot+scale+trans with identity bias [0,1,0,0]
    p = jnp.tile(jnp.array([[0.0, 1.0, 0.0, 0.0]]), (3, 1))
    theta = affine_matrix(p, True, True, True)
    want = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (3, 1, 1))
    np.testing.assert_allclose(np.asarray(theta), want, atol=1e-7)


def test_affine_matrix_rotation():
    ang = np.pi / 2
    theta = np.asarray(affine_matrix(jnp.array([[ang]]), True, False, False))
    np.testing.assert_allclose(
        theta[0], [[0, -1, 0], [1, 0, 0]], atol=1e-6)


def test_identity_grid_sampling_roundtrip(rng):
    img = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    theta = jnp.tile(jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]]), (2, 1, 1))
    grid = affine_grid(theta, 8, 8)
    out = bilinear_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-5, atol=1e-5)


def test_bilinear_golden_midpoint():
    # 2x2 image, sample the exact center: mean of 4 pixels
    img = jnp.array([[[[1.0], [2.0]], [[3.0], [4.0]]]])
    coords = jnp.zeros((1, 1, 1, 2))
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 2.5, atol=1e-6)


def test_bilinear_border_clamp():
    img = jnp.array([[[[1.0], [2.0]], [[3.0], [4.0]]]])
    coords = jnp.array([[[[-5.0, -5.0]]]])  # far out of range -> corner pixel
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 1.0, atol=1e-6)


def test_translation_shifts_content():
    # translation in normalized units: tx=+2/(W-1)*2? use half-image shift and
    # check the sampled center equals the shifted source pixel
    img = jnp.zeros((1, 5, 5, 1)).at[0, 2, 3, 0].set(1.0)
    # shift sampling coords by +0.5 in x: output(y,x) = input(y, x+1)
    theta = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.5]]])
    grid = affine_grid(theta, 5, 5)
    out = np.asarray(bilinear_sample(img, grid))
    assert out[0, 2, 2, 0] == 1.0  # peak moved left by one pixel


def test_warp_flow_identity_and_shift(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 3).astype(np.float32))
    flow0 = jnp.zeros((1, 6, 6, 2))
    np.testing.assert_allclose(np.asarray(warp_flow(img, flow0)),
                               np.asarray(img), rtol=1e-5, atol=1e-5)
    # constant flow (0, +1): out(y, x) = img(y, x+1)
    flow = jnp.zeros((1, 6, 6, 2)).at[..., 1].set(1.0)
    out = np.asarray(warp_flow(img, flow))
    np.testing.assert_allclose(out[0, :, :5], np.asarray(img)[0, :, 1:],
                               rtol=1e-5, atol=1e-5)


def test_st_module_identity_at_init(key, rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    st = SpatialTransformer(True, True, True)
    variables = st.init(key, x.shape)
    y, _ = st.apply(variables, x)
    # zero-init head + identity bias -> exact identity transform
    np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_st_gradients_reach_localization(key, rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    st = SpatialTransformer(True, False, False)
    variables = st.init(key, x.shape)

    def loss(params):
        y, _ = st.apply({"params": params, "state": variables["state"]}, x)
        return jnp.sum(jnp.square(y - jnp.roll(x, 1, axis=2)))

    grads = jax.grad(loss)(variables["params"])
    # at init the head kernel is zero (STN paper A.3), so gradients into the
    # localization body are exactly zero by the chain rule — the learning
    # signal enters through the head itself
    assert float(jnp.abs(grads["head"]["kernel"]).sum()) > 0
    # after one head perturbation, the loc body receives gradient too
    perturbed = jax.tree_util.tree_map(lambda x: x, variables["params"])
    perturbed["head"]["kernel"] = jnp.ones_like(
        perturbed["head"]["kernel"]) * 0.01
    grads2 = jax.grad(loss)(perturbed)
    loc_grads = jax.tree_util.tree_leaves(grads2["loc"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in loc_grads)


def test_bilinear_grad_wrt_coords(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.float32))
    coords = jnp.zeros((1, 2, 2, 2)) + 0.1

    def f(c):
        return jnp.sum(bilinear_sample(img, c))

    g = jax.grad(f)(coords)
    assert np.isfinite(np.asarray(g)).all()


def test_check_grads_bilinear_interior(rng):
    # numerical gradient check away from the integer-lattice kinks
    from jax.test_util import check_grads
    img = jnp.asarray(rng.rand(2, 6, 6, 2).astype(np.float32))
    coords = jnp.asarray(
        (rng.rand(2, 3, 3, 2) * 1.4 - 0.7 + 0.013).astype(np.float32))

    check_grads(lambda i: bilinear_sample(i, coords), (img,),
                order=1, modes=("rev",), atol=1e-2, rtol=1e-2)
    check_grads(lambda c: bilinear_sample(img, c), (coords,),
                order=1, modes=("rev",), atol=1e-2, rtol=1e-2)


def test_joint_loc_features_match_per_branch():
    # FusedSTBranches runs its 3 localization nets jointly (one concat
    # conv + one grouped conv); must equal applying each net separately
    import numpy as np
    from catgen.core.module import child_variables
    from catgen.models.zoo import _st_branch_tail
    from catgen.nn.layers import Conv, PReLU, MaxPool, SpatialDropout
    from catgen.core.module import Sequential
    from catgen.nn.spatial_transformer import FusedSTBranches

    plain = Sequential([Conv(8, (3, 3)), PReLU()], name="plain")
    blk = FusedSTBranches([_st_branch_tail(), _st_branch_tail(),
                           _st_branch_tail()], plain)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16, 16, 64).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), (4, 16, 16, 64))
    got = blk._joint_loc_features(variables, x)
    for i in range(3):
        want, _ = blk.locs[i].apply(
            child_variables(variables, f"loc{i}"), x, train=False, rng=None)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
