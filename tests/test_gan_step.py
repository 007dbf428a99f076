"""GAN train-step tests (SURVEY.md §4(d)): tiny models, jitted step —
loss decreases, gate semantics, determinism, epoch scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgen import nn
from catgen.train import gan

IMG = (8, 8, 1)
NOISE = 8


def tiny_g():
    return nn.Sequential([
        nn.Dense(32), nn.PReLU(),
        nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(),
        nn.Reshape(IMG),
    ], name="tinyG")


def tiny_d():
    return nn.Sequential([
        nn.Flatten(), nn.Dense(32), nn.PReLU(), nn.Dense(1), nn.Sigmoid(),
    ], name="tinyD")


def _reals(rng, n):
    # "real" data: vertical gradient images
    base = np.linspace(0.2, 0.8, IMG[0], dtype=np.float32)
    x = np.tile(base[:, None, None], (n, 1, IMG[1], IMG[2])).reshape((n,) + IMG)
    x += rng.randn(*x.shape).astype(np.float32) * 0.02
    return jnp.asarray(np.clip(x, 0, 1))


def _setup(cfg=None):
    g, d = tiny_g(), tiny_d()
    config = cfg or gan.GanConfig(batch_size=16, noise_dim=NOISE,
                                  acc_window=4)
    key = jax.random.PRNGKey(0)
    state = gan.init_state(g, d, config, key, IMG)
    step = jax.jit(gan.make_train_step(g, d, config))
    return g, d, config, state, step


def test_step_runs_and_updates_both_networks(rng):
    g, d, config, state, step = _setup()
    reals = _reals(rng, config.batch_size // 2)
    new_state, metrics = step(state, reals, jax.random.PRNGKey(1))
    # both parameter sets moved
    moved_g = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.g_params,
        new_state.g_params)
    moved_d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.d_params,
        new_state.d_params)
    assert max(jax.tree_util.tree_leaves(moved_g)) > 0
    assert max(jax.tree_util.tree_leaves(moved_d)) > 0
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics.loss_d))
    assert np.isfinite(float(metrics.loss_g))
    # confusion counts sum to the batch size
    total = sum(int(x) for x in (metrics.tp_real, metrics.tn_fake,
                                 metrics.fp, metrics.fn))
    assert total == config.batch_size


def test_gate_blocks_d_when_max_acc_zero(rng):
    # d_max_acc = 0 -> rolling accuracy >= 0 always -> never train D
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        d_max_acc=0.0)
    g, d, config, state, step = _setup(cfg)
    reals = _reals(rng, config.batch_size // 2)
    new_state, metrics = step(state, reals, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                    jax.tree_util.tree_leaves(new_state.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state frozen too (reference: optimizer not invoked)
    assert int(new_state.d_opt.step) == 0
    assert float(metrics.d_trained) == 0.0
    # G still trained
    assert int(new_state.g_opt.step) == 1


def test_gate_rolling_window_carried(rng):
    g, d, config, state, step = _setup()
    reals = _reals(rng, config.batch_size // 2)
    s = state
    for i in range(6):
        s, m = step(s, reals, jax.random.PRNGKey(i))
    assert int(s.acc_count) == config.acc_window  # saturated
    assert 0.0 <= float(m.acc_avg) <= 1.0


def test_determinism_same_seed_same_result(rng):
    g, d, config, state, step = _setup()
    reals = _reals(rng, config.batch_size // 2)
    s1, m1 = step(state, reals, jax.random.PRNGKey(42))
    s2, m2 = step(state, reals, jax.random.PRNGKey(42))
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1.loss_g) == float(m2.loss_g)


def test_training_improves_d_on_fixed_g(rng):
    # several steps: D should learn to separate reals from (initially bad)
    # fakes -> rolling accuracy rises
    g, d, config, state, step = _setup()
    s = state
    accs = []
    for i in range(20):
        reals = _reals(rng, config.batch_size // 2)
        s, m = step(s, reals, jax.random.PRNGKey(i))
        accs.append(float(m.acc_d))
    assert np.mean(accs[-5:]) > np.mean(accs[:5]) - 0.05
    assert np.mean(accs[-5:]) > 0.6


def test_epoch_scan_matches_step_loop(rng):
    g, d, config, state, step = _setup()
    epoch = jax.jit(gan.make_train_epoch(g, d, config))
    nb = 3
    batches = jnp.stack([_reals(rng, config.batch_size // 2)
                         for _ in range(nb)])
    base_rng = jax.random.PRNGKey(9)
    s_scan, metrics = epoch(state, batches, base_rng)
    s_loop = state
    for i in range(nb):
        s_loop, _ = step(s_loop, batches[i], jax.random.fold_in(base_rng, i))
    assert int(s_scan.step) == int(s_loop.step) == nb
    assert int(s_scan.epoch) == 2
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.g_params),
                    jax.tree_util.tree_leaves(s_loop.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert metrics.loss_d.shape == (nb,)


def test_d_iterations_static_unroll(rng):
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        d_iterations=2)
    g, d, config, state, step = _setup(cfg)
    # the step consumes d_iterations fresh half-batches (adversarial.lua:221)
    reals = _reals(rng, 2 * (config.batch_size // 2))
    new_state, metrics = step(state, reals, jax.random.PRNGKey(1))
    assert int(new_state.d_opt.step) == 2  # two D updates per step
    # gate window advanced twice
    assert int(new_state.acc_count) == 2
    # confusion counts accumulate over BOTH iterations
    # (adversarial.lua:101-106 adds every batch to CONFUSION)
    total = sum(int(x) for x in (metrics.tp_real, metrics.tn_fake,
                                 metrics.fp, metrics.fn))
    assert total == config.d_iterations * config.batch_size


def test_d_iterations_fresh_reals_parity(rng):
    """Iteration k must see half-batch k: the unrolled step equals two
    manual d_phase applications on the respective fresh half-batches
    (adversarial.lua:221-238 refills `inputs` every k), and swapping the
    second half-batch changes the result (i.e. it is actually consumed)."""
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        d_iterations=2)
    g, d = tiny_g(), tiny_d()
    state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
    step = gan.make_train_step(g, d, cfg)
    half = cfg.batch_size // 2
    r_a, r_b = _reals(rng, half), _reals(rng, half)
    assert float(jnp.abs(r_a - r_b).max()) > 0
    new_state, _ = step(state, jnp.concatenate([r_a, r_b]),
                        jax.random.PRNGKey(1))

    # manual composition: d_phase(A, it=0) then d_phase(B, it=1), then G
    folded = jax.random.fold_in(jax.random.PRNGKey(1), state.step)
    s = state
    s, _ = step.d_phase(s, r_a, folded, 0)
    s, _ = step.d_phase(s, r_b, folded, 1)
    for it in range(cfg.g_iterations):
        s, _ = step.g_phase(s, folded, it)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.d_params),
                    jax.tree_util.tree_leaves(s.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # reusing half-batch A in iteration 2 gives a different D
    alt_state, _ = step(state, jnp.concatenate([r_a, r_a]),
                        jax.random.PRNGKey(1))
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree_util.tree_leaves(new_state.d_params),
                 jax.tree_util.tree_leaves(alt_state.d_params))]
    assert max(diffs) > 0


def test_generate_and_discriminate_helpers(rng):
    g, d, config, state, step = _setup()
    noise = gan.uniform_noise(jax.random.PRNGKey(0), 4, NOISE)
    imgs = gan.generate(g, state, noise)
    assert imgs.shape == (4,) + IMG
    scores = gan.discriminate(d, state, imgs)
    assert scores.shape == (4,)


def test_remat_step_matches_plain(rng):
    cfg_plain = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4)
    cfg_remat = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                              remat=True)
    g, d = tiny_g(), tiny_d()
    key = jax.random.PRNGKey(0)
    state = gan.init_state(g, d, cfg_plain, key, IMG)
    reals = _reals(rng, 8)
    s1, m1 = jax.jit(gan.make_train_step(g, d, cfg_plain))(
        state, reals, jax.random.PRNGKey(1))
    s2, m2 = jax.jit(gan.make_train_step(g, d, cfg_remat))(
        state, reals, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert abs(float(m1.loss_g) - float(m2.loss_g)) < 1e-5


def test_alternative_optimizers_step(rng):
    # --D_optmethod/--G_optmethod parity: every optimizer choice must
    # produce a runnable jitted step (train.lua:191-207)
    for method in ("adagrad", "sgd", "rmsprop"):
        cfg = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4,
                            d_optimizer=method, g_optimizer=method)
        g, d = tiny_g(), tiny_d()
        state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
        step = jax.jit(gan.make_train_step(g, d, cfg))
        new_state, m = step(state, _reals(rng, 4), jax.random.PRNGKey(1))
        assert np.isfinite(float(m.loss_d)) and np.isfinite(float(m.loss_g))


def test_restored_state_generates_identical_samples(rng, tmp_path):
    # checkpoint round-trip preserves sampling exactly (determinism that
    # the reference could not achieve on GPU, SURVEY.md §5.2)
    from catgen.io import checkpoint as ckpt

    g, d, config, state, step = _setup()
    state, _ = step(state, _reals(rng, 8), jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.ckpt")
    ckpt.save(path, state)
    restored, _ = ckpt.load(path, state)
    noise = gan.uniform_noise(jax.random.PRNGKey(7), 4, NOISE)
    a = gan.generate(g, state, noise)
    b = gan.generate(g, restored, noise)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_g_freeze_pins_children(rng):
    """Stage-wise pyramid training (--G_freeze): frozen G children are
    bit-identical after steps (params, BN state, adam moments) while the
    rest of G still trains."""
    g, d = tiny_g(), tiny_d()
    first = sorted(g.init(jax.random.PRNGKey(0),
                          (1, NOISE))["params"])[0]
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        g_frozen_children=(first,))
    state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
    step = jax.jit(gan.make_train_step(g, d, cfg))
    s = state
    for i in range(3):
        s, _ = step(s, _reals(rng, 8), jax.random.PRNGKey(i))
    for group in ("g_params", "g_state"):
        old = getattr(state, group).get(first, {})
        new = getattr(s, group).get(first, {})
        for a, b in zip(jax.tree_util.tree_leaves(old),
                        jax.tree_util.tree_leaves(new)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        {k: v for k, v in state.g_params.items() if k != first},
        {k: v for k, v in s.g_params.items() if k != first})
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # zeroed grads leave the frozen child's adam moments exactly zero
    opt_tree = gan.optim.opt_state_to_tree(s.g_opt, s.g_params)
    for leaf in jax.tree_util.tree_leaves(
            [m.get(first, {}) for m in opt_tree if isinstance(m, dict)]):
        assert float(jnp.abs(leaf).max()) == 0.0


@pytest.mark.parametrize("flat_mode", ["tree", "flat"])
def test_g_freeze_pins_opt_moments_under_l2(rng, monkeypatch, flat_mode):
    """Round-4 advisor: with --G_L1/--G_L2 > 0 the penalty re-adds
    params-dependent grad terms AFTER the frozen-grad zeroing, so without
    opt-state pinning the frozen child's adam moments accumulate pure
    weight-decay gradients — polluting the checkpointed g_opt a later
    whole-stack unfreeze would resume from. Frozen moments must stay
    exactly zero even with l1/l2 on, in both flat and per-leaf modes."""
    from catgen.kernels import config as kconfig
    monkeypatch.setattr(kconfig, "flat_opt", flat_mode)
    g, d = tiny_g(), tiny_d()
    first = sorted(g.init(jax.random.PRNGKey(0), (1, NOISE))["params"])[0]
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE,
                        acc_window=4, g_l1=1e-3, g_l2=1e-2,
                        g_frozen_children=(first,))
    state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
    step = jax.jit(gan.make_train_step(g, d, cfg))
    s = state
    for i in range(3):
        s, _ = step(s, _reals(rng, 8), jax.random.PRNGKey(i))
    opt_tree = gan.optim.opt_state_to_tree(s.g_opt, s.g_params)
    for leaf in jax.tree_util.tree_leaves(
            [m.get(first, {}) for m in opt_tree if isinstance(m, dict)]):
        assert float(jnp.abs(leaf).max()) == 0.0, flat_mode
    # and the params are still pinned despite the penalties
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params[first]),
                    jax.tree_util.tree_leaves(s.g_params[first])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # unfrozen children still accumulate nonzero moments
    moved = [float(jnp.abs(l).max()) for m in opt_tree
             if isinstance(m, dict)
             for k, v in m.items() if k != first
             for l in jax.tree_util.tree_leaves(v)]
    assert max(moved) > 0


def test_g_freeze_unknown_child_raises(rng):
    g, d = tiny_g(), tiny_d()
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        g_frozen_children=("99_Nope",))
    state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
    step = gan.make_train_step(g, d, cfg)
    import pytest
    with pytest.raises(KeyError, match="99_Nope"):
        step(state, _reals(rng, 8), jax.random.PRNGKey(0))


def test_g_bn_advance_in_d_knob(rng):
    """A/B knob for the corpus-scale collapse audit (QUALITY.md round 5):
    with g_bn_advance_in_d=False the D phase must leave G's BN running
    stats untouched (default True matches Torch semantics — G stays in
    training mode through createImages, adversarial.lua:233, so its
    running estimates advance there too). Needs a BN-bearing G (tiny_g
    carries no state)."""
    g = nn.Sequential([
        nn.Dense(32), nn.BatchNorm(), nn.PReLU(),
        nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(), nn.Reshape(IMG),
    ], name="tinyGbn")
    d = tiny_d()
    cfg_off = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                            g_bn_advance_in_d=False)
    state = gan.init_state(g, d, cfg_off, jax.random.PRNGKey(0), IMG)
    step_off = gan.make_train_step(g, d, cfg_off)
    reals = _reals(rng, 8)
    # D phase only: g_state must be bit-identical to the input state
    s_after, _ = jax.jit(step_off.d_phase)(state, reals,
                                           jax.random.PRNGKey(1), 0)
    for a, b in zip(jax.tree_util.tree_leaves(state.g_state),
                    jax.tree_util.tree_leaves(s_after.g_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # default semantics: the same D phase DOES advance the BN stats
    cfg_on = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4)
    step_on = gan.make_train_step(g, d, cfg_on)
    s_adv, _ = jax.jit(step_on.d_phase)(state, reals,
                                        jax.random.PRNGKey(1), 0)
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree_util.tree_leaves(state.g_state),
                 jax.tree_util.tree_leaves(s_adv.g_state))]
    assert max(diffs) > 0


@pytest.mark.parametrize("bce_impl", ["logits", "torch", "clip"])
def test_step_finite_at_d_saturation(rng, bce_impl):
    """Regression for the corpus NaNs (QUALITY.md round 5): with D's
    output sigmoid saturated to exactly 0.0f/1.0f, the JITTED step must
    stay finite for every BCE impl. The first two bce_torch formulations
    passed eager unit tests and NaN'd only under jit (XLA folded the eps
    away), poisoning every parameter within one step."""
    cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                        bce=bce_impl)
    g, d, config, state, step = _setup(cfg)
    reals = _reals(rng, config.batch_size // 2)
    keys = [k for k in state.d_params if "Dense" in k]
    for bias in (25.0, -25.0, 90.0, -90.0):
        dp = dict(state.d_params)
        dp[keys[-1]] = dict(dp[keys[-1]],
                            bias=jnp.full_like(dp[keys[-1]]["bias"], bias))
        st = state._replace(d_params=dp)
        for it in range(2):
            st, m = step(st, reals, jax.random.PRNGKey(it + 1))
        assert np.isfinite(float(m.loss_d)), (bce_impl, bias)
        assert np.isfinite(float(m.loss_g)), (bce_impl, bias)
        for leaf in (jax.tree_util.tree_leaves(st.d_params)
                     + jax.tree_util.tree_leaves(st.g_params)):
            assert np.isfinite(np.asarray(leaf)).all(), (bce_impl, bias)


def test_logits_step_matches_prob_space_in_healthy_regime(rng):
    """CATGEN_BCE=logits peels D's final Sigmoid and trains in logit
    space — away from saturation this must be the SAME training step as
    the prob-space Torch formulation (identical losses/params to f32
    noise)."""
    reals = _reals(rng, 8)
    results = {}
    for impl in ("logits", "torch"):
        cfg = gan.GanConfig(batch_size=16, noise_dim=NOISE, acc_window=4,
                            bce=impl)
        g, d, config, state, step = _setup(cfg)
        st = state
        for it in range(3):
            st, m = step(st, reals, jax.random.PRNGKey(it + 1))
        results[impl] = (float(m.loss_d), float(m.loss_g),
                         jax.tree_util.tree_leaves(st.d_params))
    np.testing.assert_allclose(results["logits"][0], results["torch"][0],
                               rtol=2e-4)
    np.testing.assert_allclose(results["logits"][1], results["torch"][1],
                               rtol=2e-4)
    for a, b in zip(results["logits"][2], results["torch"][2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
