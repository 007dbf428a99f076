"""V subsystem tests: overlay machinery, the four synthetic-fake
generators, dispatcher, V train step, V rating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import nn
from catgen.train import synthetic, v_trainer

H = W = 16
IMG = (H, W, 3)


@pytest.fixture(scope="module")
def bank():
    return synthetic.build_overlay_bank(H, W, n=8, n_points=500, seed=0)


@pytest.fixture(scope="module")
def reals():
    r = np.random.RandomState(0)
    return jnp.asarray(r.rand(6, *IMG).astype(np.float32) * 0.8 + 0.1)


def test_overlay_bank_properties(bank):
    b = np.asarray(bank)
    assert b.shape == (8, H, W)
    assert b.min() >= 0 and b.max() <= 1.0
    assert all(abs(b[i].max() - 1.0) < 1e-6 for i in range(8))
    # random walk clusters: masks are sparse-ish, nonuniform
    assert (b > 0).mean() < 0.9


def test_gaussian_kernel_matches_torch_shape():
    k = np.asarray(synthetic.gaussian_kernel(5))
    assert k.shape == (5, 5)
    assert k.max() == pytest.approx(1.0)
    assert k[0, 0] < k[2, 2]


def test_gaussian_overlays(bank, key):
    ov = synthetic.gaussian_overlays(key, bank, 4, blur_size=4)
    o = np.asarray(ov)
    assert o.shape == (4, H, W)
    assert o.min() >= 0 and o.max() <= 1.0 + 1e-5


def test_pixelwise_overlays(key):
    ov = synthetic.pixelwise_overlays(key, 3, H, W)
    o = np.asarray(ov)
    assert o.shape == (3, H, W)
    assert o.min() >= 0 and o.max() <= 1.0
    # mixture of zeros and positive values (thresholded field)
    assert (o == 0).any() and (o > 0).any()


def test_mix_generator(bank, reals, key):
    out = synthetic.synthetic_mix(key, reals, jnp.roll(reals, 1, 0), bank)
    o = np.asarray(out)
    assert o.shape == reals.shape
    assert o.min() >= 0 and o.max() <= 1.0 + 1e-5
    # per-image max-normalized
    np.testing.assert_allclose(o.max(axis=(1, 2, 3)), 1.0, atol=1e-5)


def test_stamp_generator(bank, reals, key):
    out = synthetic.synthetic_stamp(key, reals, bank)
    o = np.asarray(out)
    assert o.shape == reals.shape
    assert np.isfinite(o).all()
    assert (o != np.asarray(reals)).any()


def test_warp_generator(bank, reals, key):
    out = synthetic.synthetic_warp(key, reals, bank)
    o = np.asarray(out)
    assert o.shape == reals.shape
    assert np.isfinite(o).all()


def test_random_generator(bank, key):
    out = synthetic.synthetic_random(key, bank, 5, H, W, 3)
    o = np.asarray(out)
    assert o.shape == (5, H, W, 3)
    assert o.min() >= -1e-6 and o.max() <= 1.0 + 1e-5
    # colored clouds: channels differ
    assert np.abs(o[..., 0] - o[..., 1]).max() > 1e-3


def test_factory_dispatch(bank, reals):
    factory = synthetic.SyntheticImageFactory(bank, IMG, seed=0)
    r = np.random.RandomState(1)

    def sample_reals(n):
        idx = r.choice(reals.shape[0], n)
        return reals[idx]

    for _ in range(8):
        out = factory(4, sample_reals)
        o = np.asarray(out)
        assert o.shape == (4, *IMG)
        assert np.isfinite(o).all()


def tiny_v():
    return nn.Sequential([
        nn.Flatten(), nn.Dense(16), nn.LeakyReLU(), nn.Dense(2),
        nn.Softmax(),
    ], name="tinyV")


def test_v_train_step_learns(bank, reals, key):
    v = tiny_v()
    config = v_trainer.VConfig(batch_size=8)
    state = v_trainer.init_state(v, config, key, IMG)
    step = jax.jit(v_trainer.make_train_step(v, config))
    r = np.random.RandomState(2)
    # fakes = noise images; reals = our fixture batch
    accs = []
    for i in range(30):
        fakes = jnp.asarray(r.rand(4, *IMG).astype(np.float32))
        idx = r.choice(reals.shape[0], 4)
        state, m = step(state, reals[idx], fakes, jax.random.PRNGKey(i))
        accs.append(float(m.acc))
    assert int(state.step) == 30
    assert np.mean(accs[-5:]) > 0.7  # separable -> V learns
    total = sum(int(x) for x in (m.tp_real, m.tn_fake, m.fp, m.fn))
    assert total == config.batch_size


def test_rate_with_v(bank, reals, key):
    v = tiny_v()
    config = v_trainer.VConfig(batch_size=8)
    state = v_trainer.init_state(v, config, key, IMG)
    rating = v_trainer.rate_with_v(v, state, reals)
    assert 0.0 <= float(rating) <= 1.0
    scores = v_trainer.v_scores(v, state, reals)
    assert scores.shape == (reals.shape[0],)


def test_batch_generator_branches_match_direct_calls(bank, reals, key):
    """The traced lax.switch dispatcher must produce exactly what the
    direct generator calls produce, branch by branch."""
    gen = synthetic.make_batch_generator(bank, IMG)
    reals4 = jnp.stack([reals, jnp.roll(reals, 1, 0),
                        jnp.roll(reals, 2, 0), jnp.roll(reals, 3, 0)])
    k1, k2, k3 = jax.random.split(key, 3)
    n = reals.shape[0]
    expected = [
        synthetic.synthetic_mix(k1, reals4[0], reals4[1], bank),
        synthetic.synthetic_warp(k1, reals4[0], bank),
        synthetic.synthetic_stamp(k1, reals4[0], bank),
        synthetic.synthetic_random(k1, bank, n, H, W, 3),
    ]
    for br in range(4):
        out = gen(key, jnp.int32(br), jnp.int32(0), jnp.asarray(False),
                  reals4)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(expected[br]),
                                   rtol=1e-5, atol=1e-5)
    # submix path: primary mixed with the sub-generator's batch through one
    # shared overlay (mixImageLists)
    sub = gen(key, jnp.int32(1), jnp.int32(3), jnp.asarray(True), reals4)
    other = synthetic.synthetic_random(k2, bank, n, H, W, 3)
    ov = synthetic._batch_overlay(k3, bank, H, W)
    np.testing.assert_allclose(
        np.asarray(sub),
        np.asarray(synthetic.mix_images(expected[1], other, ov)),
        rtol=1e-5, atol=1e-5)


def test_v_epoch_scan_matches_step_loop(bank, key):
    """Scanned V epoch == manual generate+step loop with the same
    randomness (same contract as the GAN epoch scan test)."""
    r = np.random.RandomState(3)
    v = nn.Sequential([nn.Flatten(), nn.Dense(8), nn.LeakyReLU(),
                       nn.Dense(2), nn.Softmax()], name="v")
    cfg = v_trainer.VConfig(batch_size=8)
    state = v_trainer.init_state(v, cfg, jax.random.PRNGKey(0), IMG)
    nb, half = 3, 4
    reals = jnp.asarray(r.rand(nb, half, *IMG).astype(np.float32))
    gen_reals = jnp.asarray(r.rand(nb, 4, half, *IMG).astype(np.float32))
    branches = jnp.asarray([0, 2, 3], jnp.int32)
    sub_branches = jnp.asarray([1, 0, 2], jnp.int32)
    submix = jnp.asarray([False, True, False])
    epoch = jax.jit(v_trainer.make_train_epoch(v, cfg, bank, IMG))
    s_scan, m = epoch(state, reals, gen_reals, branches, sub_branches,
                      submix, key)

    gen = synthetic.make_batch_generator(bank, IMG)
    step = v_trainer.make_train_step(v, cfg)
    s_loop = state
    for i in range(nb):
        k = jax.random.fold_in(key, i)
        fakes = gen(jax.random.fold_in(k, 0x7FFFFFFF), branches[i],
                    sub_branches[i], submix[i], gen_reals[i])
        s_loop, _ = step(s_loop, reals[i], fakes, k)
    assert int(s_scan.step) == int(s_loop.step) == nb
    assert int(s_scan.epoch) == 2
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                    jax.tree_util.tree_leaves(s_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert m.loss.shape == (nb,)
