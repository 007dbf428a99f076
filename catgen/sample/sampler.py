"""Sampler: batch generation, D-ranking, grids, nearest-neighbour search.

Rebuilds sample.lua as one on-device pipeline:
  * generate 1024 images through G (sample.lua:89; batched G fwd,
    nn_utils.lua:45-77)
  * rank them with D, keep best-64 / worst-64 / random grids
    (sample.lua:99-112, sortImagesByPrediction nn_utils.lua:89-117)
  * nearest-neighbour check of the best 16 against the whole training set
    by 2-norm. The reference scans ``torch.dist`` per pair on the host
    (sample.lua:133-151, O(16*N) full-image loops); here it is one
    (16,D) x (D,N) matmul + argmin on the MXU — the exact rewrite
    SURVEY.md §3.4 calls for.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from catgen.core.module import Module
from catgen.train import gan


def generate_batched(g: Module, g_vars, noise: jax.Array,
                     batch_size: int = 256) -> jax.Array:
    """G forward in chunks (nn_utils.lua:45-69 runs G in slices of
    batchSize to bound memory)."""
    outs = []
    for i in range(0, noise.shape[0], batch_size):
        outs.append(gan.generate(g, g_vars, noise[i:i + batch_size]))
    return jnp.concatenate(outs, axis=0)


def rank_by_d(d: Module, d_vars, images: jax.Array,
              batch_size: int = 256) -> Tuple[jax.Array, jax.Array]:
    """Returns (order, scores): ``order`` indexes images best-first
    (highest D score = most real, sortImagesByPrediction)."""
    scores = []
    for i in range(0, images.shape[0], batch_size):
        scores.append(gan.discriminate(d, d_vars, images[i:i + batch_size]))
    scores = jnp.concatenate(scores)
    order = jnp.argsort(-scores)
    return order, scores


def dist2_matrix(queries: jax.Array, corpus: jax.Array) -> jax.Array:
    """Squared-L2 distance matrix between two image batches as ONE matmul:
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b (f32 accumulation, clamped at 0).
    The single shared implementation behind every NN signal in the repo —
    the sampler CLI, eval/quality, and the harness blob-collapse probe."""
    q = queries.reshape(queries.shape[0], -1).astype(jnp.float32)
    c = corpus.reshape(corpus.shape[0], -1).astype(jnp.float32)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    d2 = q2 + c2 - 2.0 * jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d2, 0.0)


@jax.jit
def nearest_neighbours(queries: jax.Array,
                       corpus: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """For each query image, the index + L2 distance of its closest corpus
    image (sample.lua:133-151's host scan as one matmul)."""
    d2 = dist2_matrix(queries, corpus)
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0])
    return idx, dist


def nn_l2_mean(queries: jax.Array, corpus: jax.Array) -> jax.Array:
    """Mean NN L2 distance of each query to the corpus (jit-inlineable)."""
    return jnp.sqrt(dist2_matrix(queries, corpus).min(1)).mean()


def self_nn_mean(images: jax.Array, families=None) -> jax.Array:
    """Mean leave-one-out NN distance of a set to itself (the normalizer
    for the blob-collapse nn_l2_ratio signal, eval/collapse.py).

    ``families`` (optional int array (N,)): exclude same-family pairs from
    the NN search, not just the self-pair. On an offline-augmented corpus
    (``{img_idx}_{aug_idx}.jpg``) every crop's nearest neighbour is one of
    its own 9 warp variants, which deflates the normalizer ~arbitrarily
    and makes nn_l2_ratio fire ``far_from_data`` on healthy runs (round-4
    false positive on the 4.5k keypoint corpus, QUALITY.md)."""
    d2 = dist2_matrix(images, images)
    if families is not None:
        fam = jnp.asarray(families)
        same = fam[:, None] == fam[None, :]
    else:
        same = jnp.eye(images.shape[0], dtype=bool)
    d2 = jnp.where(same, jnp.inf, d2)
    return jnp.sqrt(d2.min(1)).mean()


def sample_and_rank(g: Module, d: Module, g_vars, d_vars, rng: jax.Array,
                    noise_dim: int = 100, count: int = 1024,
                    top: int = 64) -> dict:
    """The full sample.lua run: returns dict with 'images', 'scores',
    'order', 'best', 'worst', 'random'."""
    noise = gan.uniform_noise(rng, count, noise_dim)
    images = generate_batched(g, g_vars, noise)
    order, scores = rank_by_d(d, d_vars, images)
    best = images[order[:top]]
    worst = images[order[-top:]]
    rand_idx = jax.random.permutation(
        jax.random.fold_in(rng, 1), count)[:top]
    return {
        "images": images, "scores": scores, "order": order,
        "best": best, "worst": worst, "random": images[rand_idx],
    }


def neighbours_of_best(result: dict, corpus: jax.Array,
                       n_best: int = 16) -> dict:
    """NN search of the best n images vs the training corpus
    (sample.lua:115-122, 133-151). Returns pairs for the grid writer."""
    queries = result["best"][:n_best]
    idx, dist = nearest_neighbours(queries, corpus)
    return {"queries": queries, "matches": corpus[idx],
            "indices": idx, "distances": dist}


def interleave_pairs(queries: jax.Array, matches: jax.Array) -> jax.Array:
    """(N,H,W,C)+(N,H,W,C) -> (2N,H,W,C) query/match alternating, for the
    toNeighboursGrid artifact (sample.lua:176-188)."""
    n = queries.shape[0]
    out = jnp.stack([queries, matches], axis=1)
    return out.reshape((2 * n,) + queries.shape[1:])
