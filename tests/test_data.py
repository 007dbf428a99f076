"""Data layer tests: color conversions (golden values), resize, on-device
augmentation, fixture + loader round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from catgen.data import (AugmentConfig, ImageDataset, augment_batch, color,
                         downscale2, make_fixture_images, resize_bilinear,
                         write_fixture_dataset)


def test_rgb_to_y_weights():
    # the reference's custom 0.21/0.72/0.07 mix (nn_utils.lua:269-271)
    img = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(1.0)
    np.testing.assert_allclose(np.asarray(color.rgb_to_y(img)), 0.21, atol=1e-6)
    img = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(1.0)
    np.testing.assert_allclose(np.asarray(color.rgb_to_y(img)), 0.72, atol=1e-6)


def test_yuv_roundtrip(rng):
    img = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
    back = color.yuv_to_rgb(color.rgb_to_yuv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)


def test_hsl_roundtrip(rng):
    img = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
    back = color.hsl_to_rgb(color.rgb_to_hsl(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)


def test_hsl_known_values():
    # pure red -> h=0, s=1, l=0.5
    red = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(1.0)
    hsl = np.asarray(color.rgb_to_hsl(red))[0, 0, 0]
    np.testing.assert_allclose(hsl, [0.0, 1.0, 0.5], atol=1e-6)


def test_normalize_range():
    img = jnp.array([[[[0.0, 0.5, 1.0]]]])
    out = np.asarray(color.normalize(img))
    np.testing.assert_allclose(out, [[[[-1.0, 0.0, 1.0]]]], atol=1e-6)
    back = np.asarray(color.denormalize(color.normalize(img)))
    np.testing.assert_allclose(back, np.asarray(img), atol=1e-6)


def test_downscale2_area_average():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    out = np.asarray(downscale2(img))
    np.testing.assert_allclose(out[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_resize_bilinear_identity(rng):
    img = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    out = resize_bilinear(img, (8, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-5, atol=1e-5)


def test_resize_bilinear_matches_gather_sampler(rng):
    """The matmul formulation == the gather sampler at identity theta
    (KERNELS.md §6: the matmul path replaced the gather path, which VJPs
    to sort+scatter and dominated the 64px step)."""
    from catgen.nn.spatial_transformer import affine_grid, bilinear_sample

    for (h, w, oh, ow) in [(8, 8, 16, 16), (16, 16, 8, 8), (16, 12, 7, 19),
                           (1, 5, 4, 4), (7, 1, 3, 9), (5, 5, 1, 1)]:
        img = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
        theta = jnp.tile(jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]),
                         (2, 1, 1))
        ref = bilinear_sample(img, affine_grid(theta, oh, ow))
        got = resize_bilinear(img, (oh, ow))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_resize_bilinear_grad_no_gather(rng):
    """The resize VJP must stay matmul-shaped: grads flow and match the
    gather formulation's numerically."""
    from catgen.nn.spatial_transformer import affine_grid, bilinear_sample

    img = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    theta = jnp.tile(jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]),
                     (2, 1, 1))
    g1 = jax.grad(lambda x: jnp.sum(resize_bilinear(x, (16, 16)) ** 2))(img)
    g2 = jax.grad(lambda x: jnp.sum(
        bilinear_sample(x, affine_grid(theta, 16, 16)) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_augment_batch_shapes_and_range(key, rng):
    imgs = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
    out = augment_batch(key, imgs)
    assert out.shape == imgs.shape
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()
    # augmentations actually change the images
    assert np.abs(o - np.asarray(imgs)).max() > 0.01


def test_augment_identity_config(key, rng):
    imgs = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    cfg = AugmentConfig(hflip=False, scale_min=1.0, scale_max=1.0,
                        rotation_deg=0.0, translation_px=0.0,
                        brightness=0.0, noise_std=0.0)
    out = augment_batch(key, imgs, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                               rtol=1e-4, atol=1e-4)


def test_augment_brightness_is_multiplicative(key):
    """Brightness must scale pixel values (reference ImageAugmenter /
    offline-pipeline semantics), not shift them: a black image stays black
    under brightness-only augmentation."""
    cfg = AugmentConfig(hflip=False, scale_min=1.0, scale_max=1.0,
                        rotation_deg=0.0, translation_px=0.0,
                        brightness=0.15, noise_std=0.0)
    black = jnp.zeros((4, 16, 16, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(augment_batch(key, black, cfg)),
                               0.0, atol=1e-7)
    gray = jnp.full((64, 16, 16, 3), 0.5, jnp.float32)
    out = np.asarray(augment_batch(key, gray, cfg))
    ratios = out / 0.5
    assert ratios.min() >= 0.85 - 1e-4 and ratios.max() <= 1.15 + 1e-4
    assert ratios.std() > 0.01  # actually varies per image


def test_fixture_images_deterministic():
    a = make_fixture_images(3, 64, seed=7)
    b = make_fixture_images(3, 64, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 64, 64, 3) and a.dtype == np.uint8
    # faces differ from each other
    assert (a[0] != a[1]).any()


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cats")
    write_fixture_dataset(str(d), n=12, size=64, seed=3)
    return str(d)


def test_loader_roundtrip(fixture_dir):
    ds = ImageDataset([fixture_dir], scale=32, colorspace="rgb")
    assert len(ds) == 12
    imgs = ds.load_random_images(5)
    assert imgs.shape == (5, 32, 32, 3)
    arr = np.asarray(imgs)
    assert (arr >= 0).all() and (arr <= 1).all()
    seq = ds.load_images(0, 4)
    assert seq.shape == (4, 32, 32, 3)


def test_loader_grayscale(fixture_dir):
    ds = ImageDataset([fixture_dir], scale=16, colorspace="y")
    imgs = ds.load_random_images(3)
    assert imgs.shape == (3, 16, 16, 1)
    assert ds.image_shape() == (16, 16, 1)


def test_loader_epoch_batches(fixture_dir):
    ds = ImageDataset([fixture_dir], scale=32, colorspace="rgb")
    batches = ds.epoch_batches(n_examples=64, half_batch=16)
    assert batches.shape == (4, 16, 32, 32, 3)


def test_loader_paths_sorted(fixture_dir):
    ds = ImageDataset([fixture_dir])
    assert ds.paths == sorted(ds.paths)


def test_hsl_matches_colorsys():
    import colorsys
    vals = [(0.8, 0.2, 0.4), (0.1, 0.9, 0.5), (0.3, 0.3, 0.3),
            (1.0, 0.0, 0.0), (0.2, 0.6, 0.9)]
    img = jnp.asarray(np.array(vals, np.float32).reshape(1, 1, len(vals), 3))
    got = np.asarray(color.rgb_to_hsl(img))[0, 0]
    for i, (r, g, b) in enumerate(vals):
        h, l, s = colorsys.rgb_to_hls(r, g, b)  # note HLS order
        np.testing.assert_allclose(got[i], [h, s, l], atol=1e-5)


def test_family_ids_and_family_aware_self_nn(tmp_path):
    """Round-4 false-positive fix: on an offline-augmented corpus
    ({img_idx}_{aug_idx}.jpg) the self-NN normalizer must exclude
    same-family (warp-variant) pairs, or far_from_data fires on healthy
    runs (QUALITY.md round 4)."""
    import jax.numpy as jnp
    from PIL import Image

    from catgen.data.loader import ImageDataset
    from catgen.sample.sampler import self_nn_mean

    d = tmp_path / "aug"
    d.mkdir()
    rng = np.random.RandomState(0)
    base = rng.rand(2, 64, 64, 3)
    for i in range(2):
        for a in range(3):   # aug variants are tiny perturbations
            arr = np.clip(base[i] + rng.normal(0, 0.01, base[i].shape),
                          0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                str(d / f"{i:06d}_{a:03d}.jpg"), quality=95)
    ds = ImageDataset([str(d)], scale=32)
    fams = ds.family_ids(0, 6)
    assert sorted(set(fams.tolist())) == [0, 1]

    imgs = ds.load_images(0, 6)
    plain = float(self_nn_mean(imgs))
    excl = float(self_nn_mean(imgs, fams))
    # intra-family NN distances are near zero; cross-family are not
    assert excl > 2 * plain

    # non-offline naming (cat_00001.jpg) -> unique family per file,
    # reducing to the plain leave-one-out statistic
    d2 = tmp_path / "plain"
    d2.mkdir()
    for i in range(3):
        Image.fromarray((base[0] * 255).astype(np.uint8)).save(
            str(d2 / f"cat_{i:05d}.jpg"), quality=95)
    ds2 = ImageDataset([str(d2)], scale=32)
    fams2 = ds2.family_ids(0, 3)
    assert len(set(fams2.tolist())) == 3
    imgs2 = ds2.load_images(0, 3)
    np.testing.assert_allclose(float(self_nn_mean(imgs2, fams2)),
                               float(self_nn_mean(imgs2)), rtol=1e-6)
