"""Distributed (simulated 8-device CPU mesh) tests — SURVEY.md §4(e):
DP step equivalence vs single-device on the concatenated batch, sharding
placement, per-device RNG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import dist, nn
from catgen.train import gan

IMG = (8, 8, 1)
NOISE = 8


def tiny_g(axis_name=None):
    return nn.Sequential([
        nn.Dense(16), nn.BatchNorm(axis_name=axis_name), nn.PReLU(),
        nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(), nn.Reshape(IMG),
    ], name="tinyG")


def tiny_d():
    return nn.Sequential([
        nn.Flatten(), nn.Dense(16), nn.PReLU(), nn.Dense(1), nn.Sigmoid(),
    ], name="tinyD")


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_mesh_and_sharding():
    mesh = dist.make_mesh(8)
    x = jnp.zeros((16, 8, 8, 1))
    xs = dist.shard_batch(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None, None, None)


def test_dp_step_runs_and_keeps_state_replicated(rng):
    mesh = dist.make_mesh(8)
    config = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                           axis_name="data")
    g, d = tiny_g("data"), tiny_d()
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
    state = dist.replicate(state, mesh)
    step = dist.make_dp_train_step(g, d, config, mesh)
    reals = dist.shard_batch(
        jnp.asarray(rng.rand(8 * 4, *IMG).astype(np.float32)), mesh)
    new_state, metrics = step(state, reals, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics.loss_d))
    # confusion counts over the GLOBAL batch (8 devices x 8)
    total = sum(int(x) for x in (metrics.tp_real, metrics.tn_fake,
                                 metrics.fp, metrics.fn))
    assert total == 8 * config.batch_size
    # run a second step to be sure replicated state stays consistent
    step(new_state, reals, jax.random.PRNGKey(2))


def test_dp_grads_match_global_batch_semantics(rng):
    """DP mean-of-per-device-grads == single-device grad on the concat
    batch, when noise/dropout are fixed. We verify via a deterministic,
    dropout-free pair of models and one D update with the gate disabled."""
    mesh = dist.make_mesh(8)
    # G fixed (we only check D's update); no dropout anywhere; sgd for exact
    # linear-in-gradient updates
    config = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                           d_optimizer="sgd", g_optimizer="sgd",
                           d_lr=0.1, g_lr=0.0,
                           d_clamp=0.0, d_l2=0.0, g_clamp=0.0,
                           axis_name="data")
    g, d = tiny_g("data"), tiny_d()
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)

    reals_global = jnp.asarray(rng.rand(8 * 4, *IMG).astype(np.float32))

    # single-device run on the concatenated batch (same param structure,
    # no mesh axis in BN)
    g1 = tiny_g(None)
    cfg1 = gan.GanConfig(batch_size=8 * 8, noise_dim=NOISE, acc_window=4,
                         d_optimizer="sgd", g_optimizer="sgd",
                         d_lr=0.1, g_lr=0.0, d_clamp=0.0, d_l2=0.0,
                         g_clamp=0.0)
    step1 = jax.jit(gan.make_train_step(g1, d, cfg1))

    # The two runs draw different noise, so compare D grads on reals only:
    # set G's output to a constant by zeroing its params -> fakes identical
    # regardless of noise.
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.g_params)
    state = state._replace(g_params=zero_g)

    stepN = dist.make_dp_train_step(g, d, config, mesh)
    stateN = dist.replicate(state, mesh)
    reals_sharded = dist.shard_batch(reals_global, mesh)

    s1, _ = step1(state, reals_global, jax.random.PRNGKey(5))
    sN, _ = stepN(stateN, reals_sharded, jax.random.PRNGKey(5))

    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(sN.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dp_epoch_scan(rng):
    mesh = dist.make_mesh(8)
    config = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                           axis_name="data")
    g, d = tiny_g("data"), tiny_d()
    state = dist.replicate(
        gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG), mesh)
    epoch = dist.make_dp_train_epoch(g, d, config, mesh)
    batches = jnp.asarray(rng.rand(3, 8 * 4, *IMG).astype(np.float32))
    new_state, metrics = epoch(state, batches, jax.random.PRNGKey(1))
    assert int(new_state.step) == 3
    assert metrics.loss_g.shape == (3,)


def test_per_device_rng_differs():
    mesh = dist.make_mesh(8)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def f(rng):
        local = dist.fold_in_axis_index(rng, "data")
        return jax.random.uniform(local, (1, 4))

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(),),
                            out_specs=P("data"), check_vma=False))(
        jax.random.PRNGKey(0))
    rows = np.asarray(out)
    assert len({tuple(np.round(r, 6)) for r in rows}) == 8


def test_dp_step_with_augmentation(rng):
    """--augment path under DP: the step compiles and runs over the mesh
    with on-device per-device-RNG augmentation of the real half-batches,
    and the replicated state stays consistent across a second step."""
    mesh = dist.make_mesh(8)
    config = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                           axis_name="data", augment=True)
    g, d = tiny_g("data"), tiny_d()
    state = dist.replicate(
        gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG), mesh)
    step = dist.make_dp_train_step(g, d, config, mesh)
    reals = dist.shard_batch(
        jnp.asarray(rng.rand(8 * 4, *IMG).astype(np.float32)), mesh)
    new_state, metrics = step(state, reals, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss_d))
    step(new_state, reals, jax.random.PRNGKey(2))

    # the augmented step trains on different inputs than the plain step
    cfg_plain = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                              axis_name="data")
    plain = dist.make_dp_train_step(g, d, cfg_plain, mesh)
    s_plain, _ = plain(state, reals, jax.random.PRNGKey(1))
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree_util.tree_leaves(new_state.d_params),
                 jax.tree_util.tree_leaves(s_plain.d_params))]
    assert max(diffs) > 0


def test_dp_v_step(rng):
    from catgen.train import v_trainer
    mesh = dist.make_mesh(8)
    config = v_trainer.VConfig(batch_size=8, axis_name="data")
    v = nn.Sequential([nn.Flatten(), nn.Dense(8), nn.LeakyReLU(),
                       nn.Dense(2), nn.Softmax()], name="v")
    state = dist.replicate(
        v_trainer.init_state(v, config, jax.random.PRNGKey(0), IMG), mesh)
    step = dist.make_dp_v_step(v, config, mesh)
    reals = dist.shard_batch(
        jnp.asarray(rng.rand(8 * 4, *IMG).astype(np.float32)), mesh)
    fakes = dist.shard_batch(
        jnp.asarray(rng.rand(8 * 4, *IMG).astype(np.float32)), mesh)
    new_state, m = step(state, reals, fakes, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    total = sum(int(x) for x in (m.tp_real, m.tn_fake, m.fp, m.fn))
    assert total == 8 * config.batch_size


def test_dp_v_epoch(rng):
    from catgen.train import synthetic, v_trainer
    mesh = dist.make_mesh(8)
    config = v_trainer.VConfig(batch_size=8, axis_name="data")
    v = nn.Sequential([nn.Flatten(), nn.Dense(8), nn.LeakyReLU(),
                       nn.Dense(2), nn.Softmax()], name="v")
    state = dist.replicate(
        v_trainer.init_state(v, config, jax.random.PRNGKey(0), IMG), mesh)
    bank = synthetic.build_overlay_bank(IMG[0], IMG[1], n=4, n_points=100,
                                        seed=0)
    epoch = dist.make_dp_v_epoch(v, config, mesh, bank, IMG)
    nb, half = 2, 8 * 4
    reals = jnp.asarray(rng.rand(nb, half, *IMG).astype(np.float32))
    gen_reals = jnp.asarray(rng.rand(nb, 4, half, *IMG).astype(np.float32))
    branches = jnp.asarray([0, 3], jnp.int32)
    sub_branches = jnp.asarray([2, 1], jnp.int32)
    submix = jnp.asarray([True, False])
    new_state, m = epoch(state, reals, gen_reals, branches, sub_branches,
                         submix, jax.random.PRNGKey(1))
    assert int(new_state.step) == nb
    assert m.loss.shape == (nb,)
    total = sum(int(jnp.sum(x)) for x in (m.tp_real, m.tn_fake, m.fp, m.fn))
    assert total == nb * 8 * config.batch_size


def test_dp_ae_epoch(rng):
    from catgen.core.module import Sequential
    from catgen.train import pretrainer
    mesh = dist.make_mesh(8)
    config = pretrainer.PretrainConfig(batch_size=4, axis_name="data")
    enc = Sequential([nn.Flatten(), nn.Dense(4)], name="enc")
    dec = Sequential([nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(),
                      nn.Reshape(IMG)], name="dec")
    ae = Sequential([enc, dec], name="ae")
    state = dist.replicate(
        pretrainer.init_state(ae, config, jax.random.PRNGKey(0), IMG), mesh)
    epoch = dist.make_dp_ae_epoch(ae, config, mesh)
    batches = jnp.asarray(rng.rand(3, 8 * 4, *IMG).astype(np.float32))
    new_state, losses = epoch(state, batches, jax.random.PRNGKey(1))
    assert int(new_state.step) == 3
    assert losses.shape == (3,)
    assert np.isfinite(np.asarray(losses)).all()


def test_dp_step_default_config_pmeans(rng):
    """A config with axis_name=None must not silently skip the grad/acc
    pmeans: the dp builders rebind axis_name onto the config before
    building the inner step (round-3 review fix — previously only the
    shard_map axis was defaulted, and per-device params diverged while
    being stamped replicated)."""
    mesh = dist.make_mesh(8)
    g, d = tiny_g(), tiny_d()
    reals = dist.shard_batch(
        jnp.asarray(rng.rand(8 * 4, *IMG).astype(np.float32)), mesh)

    def run(cfg):
        state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
        state = dist.replicate(state, mesh)
        step = dist.make_dp_train_step(g, d, cfg, mesh)
        s2, _ = step(state, reals, jax.random.PRNGKey(1))
        return s2

    s_default = run(gan.GanConfig(batch_size=8, noise_dim=NOISE,
                                  acc_window=4))
    s_axis = run(gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                               axis_name="data"))
    for a, b in zip(jax.tree_util.tree_leaves(s_default.g_params),
                    jax.tree_util.tree_leaves(s_axis.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the default-config run's params are truly replicated
    for leaf in jax.tree_util.tree_leaves(s_default.d_params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


def test_dp_epoch_flat_matches_shaped(rng):
    """DP flat staging (round 5): the sharded epoch over FLAT
    (nb, ndev*B', H*W*C) batches is bit-identical to the shaped one —
    each DP shard of a resident NHWC C=3 epoch tensor pays the same
    3->128 tile padding as single-device staging (KERNELS.md §4c), so
    the harness stages flat for the mesh path too."""
    mesh = dist.make_mesh(8)
    config = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                           axis_name="data")
    g, d = tiny_g("data"), tiny_d()
    state = dist.replicate(
        gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG), mesh)
    shaped = dist.make_dp_train_epoch(g, d, config, mesh)
    flat = dist.make_dp_train_epoch(g, d, config, mesh, image_shape=IMG)
    batches = rng.rand(3, 8 * 4, *IMG).astype(np.float32)
    s_shaped, m_shaped = shaped(state, jnp.asarray(batches),
                                jax.random.PRNGKey(1))
    s_flat, m_flat = flat(state,
                          jnp.asarray(batches.reshape(3, 8 * 4, -1)),
                          jax.random.PRNGKey(1))
    for a, b in zip(jax.tree_util.tree_leaves(s_shaped.g_params),
                    jax.tree_util.tree_leaves(s_flat.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_shaped.d_params),
                    jax.tree_util.tree_leaves(s_flat.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(m_shaped.loss_g),
                                  np.asarray(m_flat.loss_g))
