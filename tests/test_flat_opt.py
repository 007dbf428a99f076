"""Flat (raveled) optimizer pipeline vs the per-leaf path
(optim.flat_update / CATGEN_FLAT_OPT): bit-identical updates, checkpoint
format invariance. The flattening is the reference's getParameters
semantics (train.lua:184-185) reconstructed as an XLA op-count
optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import nn, optim
from catgen.kernels import config as kconfig
from catgen.train import gan
from tests.test_gan_step import IMG, NOISE, _reals, tiny_d, tiny_g


def _run_steps(monkeypatch, mode, n=3, cfg=None):
    monkeypatch.setattr(kconfig, "flat_opt", mode)
    g, d = tiny_g(), tiny_d()
    config = cfg or gan.GanConfig(batch_size=16, noise_dim=NOISE,
                                  acc_window=4, d_l2=1e-4, g_l2=1e-3,
                                  g_l1=1e-4)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
    step = jax.jit(gan.make_train_step(g, d, config))
    rng = np.random.RandomState(0)
    for i in range(n):
        reals = _reals(rng, config.batch_size // 2)
        state, metrics = step(state, reals, jax.random.PRNGKey(10 + i))
    return state, metrics


@pytest.mark.parametrize("opt", ["adam", "adagrad", "rmsprop", "sgd"])
def test_flat_matches_tree_bitwise(monkeypatch, opt):
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        d_optimizer=opt, g_optimizer=opt,
                        d_l2=1e-4, g_l1=1e-4, d_sgd_momentum=0.5)
    s_tree, m_tree = _run_steps(monkeypatch, "tree", cfg=cfg)
    s_flat, m_flat = _run_steps(monkeypatch, "flat", cfg=cfg)
    for a, b in zip(jax.tree_util.tree_leaves(s_tree.g_params),
                    jax.tree_util.tree_leaves(s_flat.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_tree.d_params),
                    jax.tree_util.tree_leaves(s_flat.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(m_tree.loss_d),
                                  np.asarray(m_flat.loss_d))


def test_state_conversions_roundtrip():
    g = tiny_g()
    params = g.init(jax.random.PRNGKey(0), (1, NOISE))["params"]
    opt = optim.adam()
    flat_state = optim.flat_init(opt, params)
    assert isinstance(flat_state.m, jax.Array) and flat_state.m.ndim == 1
    tree_state = optim.opt_state_to_tree(flat_state, params)
    assert jax.tree_util.tree_structure(tree_state.m) == \
        jax.tree_util.tree_structure(params)
    back = optim.opt_state_to_flat(tree_state)
    np.testing.assert_array_equal(np.asarray(back.m),
                                  np.asarray(flat_state.m))
    # conversions are idempotent / format-detecting
    again = optim.opt_state_to_tree(tree_state, params)
    for a, b in zip(jax.tree_util.tree_leaves(again.m),
                    jax.tree_util.tree_leaves(tree_state.m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(optim.opt_state_to_flat(flat_state).m),
        np.asarray(flat_state.m))


def test_checkpoint_interchangeable_across_knob(monkeypatch, tmp_path):
    """A checkpoint written under flat mode resumes under tree mode and
    vice versa — the on-disk format is always per-leaf."""
    from catgen.data.fixture import write_fixture_dataset
    from catgen.data.loader import ImageDataset
    from catgen.train.harness import GanHarness, HarnessConfig

    dset_dir = tmp_path / "cats"
    write_fixture_dataset(str(dset_dir), n=16, size=64, seed=11)
    dataset = ImageDataset([str(dset_dir)], scale=16, colorspace="rgb")

    def make_harness(mode, save_dir):
        monkeypatch.setattr(kconfig, "flat_opt", mode)
        hc = HarnessConfig(save_dir=str(save_dir), n_epoch=32, scale=16,
                           seed=3, g_model="g16up", d_model="d16b",
                           save_freq=100, vis_freq=100)
        return GanHarness(hc, gan.GanConfig(batch_size=8, acc_window=4),
                          dataset)

    h1 = make_harness("flat", tmp_path)
    h1.train(1)
    h1.save()
    # resume under the opposite representation
    h2 = make_harness("tree", tmp_path)
    h2.resume()
    assert isinstance(h2.state.d_opt.m, dict)
    h3 = make_harness("flat", tmp_path)
    h3.resume()
    assert isinstance(h3.state.d_opt.m, jax.Array)
    # same values independent of representation
    np.testing.assert_array_equal(
        np.asarray(optim.opt_state_to_flat(h2.state.d_opt).m),
        np.asarray(h3.state.d_opt.m))
    # and rebuildOptstate still reinitializes in the active format
    h4 = make_harness("flat", tmp_path)
    h4.resume(rebuild_optstate=True)
    assert isinstance(h4.state.d_opt.m, jax.Array)
    assert float(jnp.abs(h4.state.d_opt.m).max()) == 0.0
