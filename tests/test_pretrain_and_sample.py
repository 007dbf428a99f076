"""Pretrainer (AE) + sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from catgen import nn
from catgen.core.module import Sequential
from catgen.sample import (interleave_pairs, nearest_neighbours,
                           neighbours_of_best, rank_by_d, sample_and_rank)
from catgen.train import gan, pretrainer

IMG = (8, 8, 1)
NOISE = 6


def tiny_autoencoder():
    enc = Sequential([nn.Flatten(), nn.Dense(NOISE)], name="enc")
    dec = Sequential([nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(),
                      nn.Reshape(IMG)], name="dec")
    return Sequential([enc, dec], name="ae")


def test_pretrain_loss_decreases(key, rng):
    ae = tiny_autoencoder()
    config = pretrainer.PretrainConfig(batch_size=8, noise_dim=NOISE)
    state = pretrainer.init_state(ae, config, key, IMG)
    step = jax.jit(pretrainer.make_train_step(ae, config))
    data = jnp.asarray(rng.rand(8, *IMG).astype(np.float32))
    losses = []
    for i in range(60):
        state, loss = step(state, data, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    recon = pretrainer.reconstruct(ae, state, data)
    assert recon.shape == data.shape


def test_pretrain_epoch_scan_matches_step_loop(key, rng):
    ae = tiny_autoencoder()
    config = pretrainer.PretrainConfig(batch_size=8, noise_dim=NOISE)
    state = pretrainer.init_state(ae, config, key, IMG)
    nb = 3
    batches = jnp.asarray(rng.rand(nb, 8, *IMG).astype(np.float32))
    epoch = jax.jit(pretrainer.make_train_epoch(ae, config))
    base = jax.random.PRNGKey(7)
    s_scan, losses = epoch(state, batches, base)
    step = jax.jit(pretrainer.make_train_step(ae, config))
    s_loop = state
    for i in range(nb):
        s_loop, _ = step(s_loop, batches[i], jax.random.fold_in(base, i))
    assert int(s_scan.step) == int(s_loop.step) == nb
    assert int(s_scan.epoch) == 2
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                    jax.tree_util.tree_leaves(s_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert losses.shape == (nb,)


def test_decoder_extract_insert_roundtrip(key):
    ae = tiny_autoencoder()
    config = pretrainer.PretrainConfig(batch_size=8, noise_dim=NOISE)
    state = pretrainer.init_state(ae, config, key, IMG)
    dec_vars = pretrainer.extract_decoder(ae, state)
    # decoder applies standalone on noise
    dec = ae.layers[1]
    out, _ = dec.apply(dec_vars, jnp.zeros((2, NOISE)))
    assert out.shape == (2,) + IMG
    state2 = pretrainer.insert_decoder(ae, state, dec_vars)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _gan_pair(key):
    g = Sequential([nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(),
                    nn.Reshape(IMG)], name="g")
    d = Sequential([nn.Flatten(), nn.Dense(1), nn.Sigmoid()], name="d")
    gv = g.init(key, (1, NOISE))
    dv = d.init(jax.random.fold_in(key, 1), (1,) + IMG)
    return g, d, gv, dv


def test_sample_and_rank(key):
    g, d, gv, dv = _gan_pair(key)
    result = sample_and_rank(g, d, gv, dv, jax.random.PRNGKey(0),
                             noise_dim=NOISE, count=64, top=8)
    assert result["images"].shape == (64,) + IMG
    assert result["best"].shape == (8,) + IMG
    assert result["worst"].shape == (8,) + IMG
    assert result["random"].shape == (8,) + IMG
    s = np.asarray(result["scores"])
    o = np.asarray(result["order"])
    # best-first ordering
    assert s[o[0]] >= s[o[-1]]
    best_scores = s[o[:8]]
    assert (np.diff(best_scores) <= 1e-7).all()


def test_nearest_neighbours_exact(rng):
    corpus = jnp.asarray(rng.rand(50, *IMG).astype(np.float32))
    # queries = corpus entries + tiny noise -> NN must find the source
    src = np.array([3, 17, 42])
    queries = corpus[src] + 0.001
    idx, dist = nearest_neighbours(queries, corpus)
    np.testing.assert_array_equal(np.asarray(idx), src)
    assert np.asarray(dist).max() < 0.05
    # distances match brute force (the matmul form loses some precision to
    # cancellation for near-identical vectors; ranking is what matters)
    bf = np.linalg.norm(
        (np.asarray(queries[0]).ravel() - np.asarray(corpus[3]).ravel()))
    np.testing.assert_allclose(float(dist[0]), bf, rtol=0.05, atol=1e-3)
    # and match exactly on well-separated vectors
    far = nearest_neighbours(corpus[:2] + 0.5, corpus[10:20])
    bf_far = np.linalg.norm(
        np.asarray(corpus[0] + 0.5 - corpus[10 + int(far[0][0])]).ravel())
    np.testing.assert_allclose(float(far[1][0]), bf_far, rtol=1e-3)


def test_interleave_pairs(rng):
    q = jnp.asarray(rng.rand(4, *IMG).astype(np.float32))
    m = jnp.asarray(rng.rand(4, *IMG).astype(np.float32))
    out = np.asarray(interleave_pairs(q, m))
    assert out.shape == (8,) + IMG
    np.testing.assert_array_equal(out[0], np.asarray(q[0]))
    np.testing.assert_array_equal(out[1], np.asarray(m[0]))
    np.testing.assert_array_equal(out[2], np.asarray(q[1]))


def test_neighbours_of_best(key, rng):
    g, d, gv, dv = _gan_pair(key)
    result = sample_and_rank(g, d, gv, dv, jax.random.PRNGKey(0),
                             noise_dim=NOISE, count=32, top=8)
    corpus = jnp.asarray(rng.rand(40, *IMG).astype(np.float32))
    nb = neighbours_of_best(result, corpus, n_best=4)
    assert nb["queries"].shape == (4,) + IMG
    assert nb["matches"].shape == (4,) + IMG
    assert nb["distances"].shape == (4,)
