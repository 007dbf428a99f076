"""Model-zoo tests: every variant builds, runs, has the expected output
shape, and the flagship parameter counts match the reference's derived sizes
(SURVEY.md §6: G32up-c ~5.2M, D32_st3 ~6.7M, V32 ~6.3M)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import models
from catgen.core.module import param_count

IMG32 = (32, 32, 3)
IMG16 = (16, 16, 3)
NOISE = 100


def _run(model, key, x_shape, train=False):
    variables = model.init(key, x_shape)
    x = jnp.zeros(x_shape, jnp.float32)
    rng = jax.random.PRNGKey(1)
    y, _ = model.apply(variables, x, train=train, rng=rng)
    return variables, y


def _g_image_shape(name):
    if "16" in name and "64" not in name:
        return IMG16
    if "64" in name:
        return (64, 64, 3)
    return IMG32


@pytest.mark.parametrize("name,factory", sorted(models.G_REGISTRY.items()))
def test_generators_output_images(key, name, factory):
    if name == "refine64":
        return  # image-to-image stage, covered in test_refine_stage
    img = _g_image_shape(name)
    model = factory(img, NOISE)
    variables, y = _run(model, key, (2, NOISE))
    assert y.shape == (2,) + img
    y = np.asarray(y)
    assert (y >= 0).all() and (y <= 1).all()  # sigmoid/clip output


def test_refine_stage(key, rng):
    refine = models.create_G_refine64((64, 64, 3))
    variables = refine.init(key, (1, 32, 32, 3))
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    y, _ = refine.apply(variables, x)
    assert y.shape == (2, 64, 64, 3)
    arr = np.asarray(y)
    assert (arr >= 0).all() and (arr <= 1).all()
    # residual form: output stays near the bilinear upsample at init
    from catgen.data.ops import resize_bilinear
    base = np.asarray(resize_bilinear(x, (64, 64)))
    assert np.abs(arr - base).max() < 0.5


@pytest.mark.parametrize("name,factory", sorted(models.D_REGISTRY.items()))
def test_discriminators_output_probs(key, name, factory):
    img = IMG16 if name.startswith("d16") else IMG32
    model = factory(img)
    variables, y = _run(model, key, (2,) + img)
    assert y.shape == (2, 1)
    y = np.asarray(y)
    assert (y >= 0).all() and (y <= 1).all()


@pytest.mark.parametrize("name,factory", sorted(models.V_REGISTRY.items()))
def test_validators_output_softmax(key, name, factory):
    img = IMG16 if name == "v16" else IMG32
    model = factory(img)
    variables, y = _run(model, key, (2,) + img)
    assert y.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)


def test_autoencoder_roundtrip_shape(key):
    model = models.create_G_autoencoder(IMG32, NOISE)
    variables, y = _run(model, key, (2,) + IMG32)
    assert y.shape == (2,) + IMG32


def test_flagship_param_counts(key):
    # SURVEY.md §6 derived sizes (models.lua:196-228, 640-711, 765-804)
    g = models.create_G_decoder_upsampling32c(IMG32, NOISE)
    n_g = param_count(g.init(key, (1, NOISE)))
    assert 4.5e6 < n_g < 6.0e6, n_g

    d = models.create_D32_st3(IMG32)
    n_d = param_count(d.init(key, (1,) + IMG32))
    assert 6.0e6 < n_d < 7.5e6, n_d

    v = models.create_V32(IMG32)
    n_v = param_count(v.init(key, (1,) + IMG32))
    assert 5.5e6 < n_v < 7.0e6, n_v


def test_train_mode_runs_with_dropout(key):
    model = models.create_D32_st3(IMG32)
    _run(model, key, (2,) + IMG32, train=True)


def test_g_then_d_composition(key):
    g = models.create_G(IMG32, NOISE)
    d = models.create_D(IMG32)
    gv = g.init(key, (1, NOISE))
    dv = d.init(jax.random.fold_in(key, 1), (1,) + IMG32)
    z = jax.random.uniform(key, (2, NOISE), minval=-1.0, maxval=1.0)
    imgs, _ = g.apply(gv, z)
    scores, _ = d.apply(dv, imgs)
    assert scores.shape == (2, 1)


def test_grayscale_models(key):
    # --colorSpace=y configs train on 1-channel images (train.lua:52-54)
    img = (32, 32, 1)
    g = models.create_G(img, NOISE)
    d = models.create_D(img)
    gv = g.init(key, (1, NOISE))
    dv = d.init(jax.random.fold_in(key, 1), (1,) + img)
    z = jax.random.uniform(key, (2, NOISE), minval=-1.0, maxval=1.0)
    imgs, _ = g.apply(gv, z)
    assert imgs.shape == (2,) + img
    scores, _ = d.apply(dv, imgs)
    assert scores.shape == (2, 1)
