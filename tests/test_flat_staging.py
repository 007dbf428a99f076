"""Flat epoch staging == image-shaped staging, bit-for-bit.

TPU tiled layouts pad the trailing (8, 128) tile, so a staged NHWC epoch
tensor with C=3 is resident at 128/3 ~ 42x its logical bytes (the V
trainer's 5-batches-per-step stage OOMs outright at bench scale). The
epoch builders therefore accept FLAT images — (nb, B, H*W*C) — and
reshape per step inside the scan body. These tests pin that the flat
path is numerically identical to the image-shaped one for all three
trainers (GAN / V / AE-pretrain)."""

import numpy as np

import jax
import jax.numpy as jnp

from catgen import models, nn
from catgen.train import gan, pretrainer, synthetic, v_trainer

IMG = (16, 16, 3)
FLAT = int(np.prod(IMG))
NOISE = 20


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gan_epoch_flat_matches_shaped():
    g = models.create_G_decoder(IMG, NOISE)
    d = models.create_D16(IMG)
    config = gan.GanConfig(batch_size=8, noise_dim=NOISE)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
    nb = 3
    reals = jnp.asarray(np.random.RandomState(1).rand(
        nb, 4, *IMG).astype(np.float32))
    rng = jax.random.PRNGKey(7)

    shaped = jax.jit(gan.make_train_epoch(g, d, config))
    flat = jax.jit(gan.make_train_epoch(g, d, config, image_shape=IMG))
    s1, m1 = shaped(state, reals, rng)
    s2, m2 = flat(state, reals.reshape(nb, 4, FLAT), rng)
    _tree_equal(s1.g_params, s2.g_params)
    _tree_equal(s1.d_params, s2.d_params)
    np.testing.assert_array_equal(np.asarray(m1.loss_d),
                                  np.asarray(m2.loss_d))


def test_v_epoch_flat_matches_shaped():
    bank = synthetic.build_overlay_bank(IMG[0], IMG[1], n=8, n_points=64,
                                        seed=0)
    v = nn.Sequential([nn.Flatten(), nn.Dense(8), nn.LeakyReLU(),
                       nn.Dense(2), nn.Softmax()], name="v")
    cfg = v_trainer.VConfig(batch_size=8)
    state = v_trainer.init_state(v, cfg, jax.random.PRNGKey(0), IMG)
    r = np.random.RandomState(3)
    nb, half = 3, 4
    reals = jnp.asarray(r.rand(nb, half, *IMG).astype(np.float32))
    gen_reals = jnp.asarray(r.rand(nb, 4, half, *IMG).astype(np.float32))
    branches = jnp.asarray([0, 2, 3], jnp.int32)
    sub_branches = jnp.asarray([1, 0, 2], jnp.int32)
    submix = jnp.asarray([False, True, False])
    key = jax.random.PRNGKey(5)

    shaped = jax.jit(v_trainer.make_train_epoch(v, cfg, bank, IMG))
    flat = jax.jit(v_trainer.make_train_epoch(v, cfg, bank, IMG,
                                              flat_xs=True))
    s1, m1 = shaped(state, reals, gen_reals, branches, sub_branches,
                    submix, key)
    s2, m2 = flat(state, reals.reshape(nb, half, FLAT),
                  gen_reals.reshape(nb, 4, half, FLAT), branches,
                  sub_branches, submix, key)
    _tree_equal(s1.params, s2.params)
    np.testing.assert_array_equal(np.asarray(m1.loss),
                                  np.asarray(m2.loss))


def test_pretrain_epoch_flat_matches_shaped():
    ae = models.create_G_autoencoder(IMG, NOISE)
    cfg = pretrainer.PretrainConfig(batch_size=8, noise_dim=NOISE)
    state = pretrainer.init_state(ae, cfg, jax.random.PRNGKey(0), IMG)
    nb = 3
    batches = jnp.asarray(np.random.RandomState(2).rand(
        nb, 8, *IMG).astype(np.float32))
    rng = jax.random.PRNGKey(11)

    shaped = jax.jit(pretrainer.make_train_epoch(ae, cfg))
    flat = jax.jit(pretrainer.make_train_epoch(ae, cfg, image_shape=IMG))
    s1, l1 = shaped(state, batches, rng)
    s2, l2 = flat(state, batches.reshape(nb, 8, FLAT), rng)
    _tree_equal(s1.params, s2.params)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
