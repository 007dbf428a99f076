"""Quality-evaluation tests: report structure, statistics sanity,
memorization/collapse alarms, CLI round-trip (SURVEY.md §4 + BASELINE.md
'D-score distribution and NN 2-norm stats')."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from catgen import nn
from catgen.eval.quality import _pairwise_mean_l2, quality_report, summarize
from catgen.train import gan

IMG = (8, 8, 1)
NOISE = 8


def tiny_g():
    return nn.Sequential([nn.Dense(16), nn.PReLU(),
                          nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(),
                          nn.Reshape(IMG)], name="g")


def tiny_d():
    return nn.Sequential([nn.Flatten(), nn.Dense(16), nn.PReLU(),
                          nn.Dense(1), nn.Sigmoid()], name="d")


def _setup(rng):
    g, d = tiny_g(), tiny_d()
    cfg = gan.GanConfig(batch_size=8, noise_dim=NOISE, acc_window=4)
    state = gan.init_state(g, d, cfg, jax.random.PRNGKey(0), IMG)
    g_vars = {"params": state.g_params, "state": state.g_state}
    d_vars = {"params": state.d_params, "state": state.d_state}
    corpus = jnp.asarray(rng.rand(32, *IMG).astype(np.float32))
    return g, d, g_vars, d_vars, corpus


def test_report_structure_and_sanity(rng):
    g, d, g_vars, d_vars, corpus = _setup(rng)
    rep = quality_report(g, d, g_vars, d_vars, corpus, noise_dim=NOISE,
                         n_samples=64, diversity_subset=32)
    assert rep["n_samples"] == 64 and rep["corpus_size"] == 32
    for key in ("d_scores_generated", "d_scores_real"):
        s = rep[key]
        assert 0.0 <= s["mean"] <= 1.0
        assert sum(s["histogram"]["counts"]) == s["n"]
        assert s["percentiles"]["5"] <= s["percentiles"]["95"]
    assert 0.0 <= rep["d_fooled_fraction"] <= 1.0
    assert rep["nn_l2"]["n"] == 64 and rep["nn_l2"]["mean"] >= 0
    assert 0.0 <= rep["nn_copy_fraction"] <= 1.0
    assert rep["diversity"]["mean_pairwise_l2"] >= 0
    assert rep["finite"] is True
    json.dumps(rep)  # fully JSON-serializable
    assert "D(generated)" in summarize(rep)


def test_copy_fraction_detects_memorization(rng):
    """A 'G' that replays corpus images must show copy-fraction 1 and
    NN distance ~0 (the alarm sample.lua's NN grid exists to raise)."""
    g, d, g_vars, d_vars, corpus = _setup(rng)
    rep = quality_report(g, d, g_vars, d_vars, corpus, noise_dim=NOISE,
                         n_samples=16, diversity_subset=8)
    # genuine random G: far from the corpus
    assert rep["nn_copy_fraction"] < 0.5

    class Replay:
        def apply(self, variables, x, train=False, rng=None):
            idx = jnp.arange(x.shape[0]) % corpus.shape[0]
            return corpus[idx], variables.get("state", {})

    rep2 = quality_report(Replay(), d, g_vars, d_vars, corpus,
                          noise_dim=NOISE, n_samples=16, diversity_subset=8)
    assert rep2["nn_copy_fraction"] == 1.0
    assert rep2["nn_l2"]["mean"] < 1e-3


def test_collapse_shows_zero_diversity(rng):
    """Mode collapse: constant G output -> pairwise L2 and per-pixel std 0."""
    g, d, g_vars, d_vars, corpus = _setup(rng)

    class Collapsed:
        def apply(self, variables, x, train=False, rng=None):
            return jnp.full((x.shape[0],) + IMG, 0.5), {}

    rep = quality_report(Collapsed(), d, g_vars, d_vars, corpus,
                         noise_dim=NOISE, n_samples=32, diversity_subset=16)
    assert rep["diversity"]["mean_pairwise_l2"] < 1e-5
    assert rep["diversity"]["mean_per_pixel_std"] < 1e-5


def test_pairwise_mean_l2_exact():
    x = jnp.asarray([[0.0, 0.0], [3.0, 4.0]])  # single pair, distance 5
    assert abs(float(_pairwise_mean_l2(x)) - 5.0) < 1e-5


def test_cli_eval_quality(tmp_path, rng):
    """End-to-end: train 1 epoch on the fixture via the harness, then the
    eval CLI reconstructs the models from checkpoint metadata."""
    from catgen.cli import eval_quality, train as train_cli

    save = str(tmp_path / "logs")
    train_cli.main(["--fixture", "16", "--epochs", "1", "--batchSize", "8",
                    "--N_epoch", "32", "--save", save])
    rep = eval_quality.main(["--save", save, "--samples", "32"])
    assert rep["epoch"] >= 1
    assert (tmp_path / "logs" / "quality_report.json").exists()
    loaded = json.load(open(tmp_path / "logs" / "quality_report.json"))
    assert loaded["n_samples"] == 32
