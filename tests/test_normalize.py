"""--normalize wiring (train.lua:51,209-227,260 NORMALIZE path): the
[0,1] -> [-1,1] remap applied in the loader, the normalize_mean/std
checkpoint fields, and display denormalization."""

import os

import numpy as np

from catgen.data import color as colorlib
from catgen.data.fixture import write_fixture_dataset
from catgen.data.loader import ImageDataset
from catgen.io import checkpoint as ckpt


def _dataset(tmp_path, normalize):
    d = os.path.join(str(tmp_path), "fixture")
    if not os.path.isdir(d):
        write_fixture_dataset(d, n=8)
    return ImageDataset([d], scale=16, normalize=normalize)


def test_loader_normalize_range(tmp_path):
    plain = _dataset(tmp_path, normalize=False)
    norm = _dataset(tmp_path, normalize=True)
    a = np.asarray(plain.load_random_images(4))
    b = np.asarray(norm.load_random_images(4))
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert b.min() < 0.0  # remapped into [-1,1]
    assert b.min() >= -1.0 and b.max() <= 1.0
    # the remap is exactly 2x-1 of the unnormalized postprocess
    x = plain.load_images(0, 4)
    y = norm.load_images(0, 4)
    np.testing.assert_allclose(np.asarray(y),
                               np.clip(2 * np.asarray(x) - 1, -1, 1),
                               atol=1e-6)


def test_normalize_roundtrip():
    x = np.random.RandomState(0).rand(2, 4, 4, 3).astype(np.float32)
    back = np.asarray(colorlib.denormalize(colorlib.normalize(x)))
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_checkpoint_carries_normalize_fields(tmp_path):
    """GanHarness.save persists normalize_mean/std like the reference's
    saveAs (train.lua:260); the active reference normalize returns the
    0.5/0.5 dummy pair (nn_utils.lua:410-411)."""
    from catgen.train import gan
    from catgen.train.harness import GanHarness, HarnessConfig

    save = os.path.join(str(tmp_path), "logs")
    hc = HarnessConfig(save_dir=save, scale=16, n_epoch=16, epochs=1,
                       g_model="g16up", d_model="d16b", normalize=True)
    gc = gan.GanConfig(batch_size=8)
    ds = _dataset(tmp_path, normalize=True)
    h = GanHarness(hc, gc, ds)
    h.train(1)
    _, meta = ckpt.load(os.path.join(save, "adversarial.ckpt"), h.state)
    assert meta["normalize_mean"] == 0.5
    assert meta["normalize_std"] == 0.5

    hc2 = HarnessConfig(save_dir=save + "2", scale=16, n_epoch=16, epochs=1,
                        g_model="g16up", d_model="d16b")
    h2 = GanHarness(hc2, gc, _dataset(tmp_path, normalize=False))
    h2.save()
    _, meta2 = ckpt.load(os.path.join(save + "2", "adversarial.ckpt"),
                         h2.state)
    assert meta2["normalize_mean"] is None


def test_augment_respects_normalized_inputs():
    """--normalize + --augment: augment_batch assumes [0,1] inputs and
    clips to [0,1]; the step must unmap/remap normalized reals around it
    or every pixel below mid-gray is destroyed (round-3 review fix)."""
    import jax
    import jax.numpy as jnp
    from catgen.data.ops import augment_batch
    from catgen.train import gan

    rng = jax.random.PRNGKey(0)
    raw = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    normed = colorlib.normalize(raw)

    cfg = gan.GanConfig(batch_size=8, augment=True, normalized_inputs=True)
    out = np.asarray(gan.augment_reals(cfg, rng, normed))
    # output stays in the normalized range and keeps its dark half
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert out.min() < -0.2, "dark pixels were clipped away"
    # exactly normalize(augment(denormalize(x)))
    want = colorlib.normalize(augment_batch(rng, colorlib.denormalize(
        jnp.asarray(normed))))
    np.testing.assert_allclose(out, np.asarray(want), rtol=0, atol=0)

    # without normalized_inputs the helper is augment_batch verbatim
    cfg2 = gan.GanConfig(batch_size=8, augment=True)
    out2 = np.asarray(gan.augment_reals(cfg2, rng, raw))
    np.testing.assert_array_equal(
        out2, np.asarray(augment_batch(rng, raw)))
