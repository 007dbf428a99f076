"""Quality-parity evaluation: the measurable side of the reference's
showcase results.

The reference demonstrates quality with curated grids after 690/750 epochs
(/root/reference/README.md:32-60) and the sampler's D-ranked best/worst +
nearest-neighbour artifacts (sample.lua:78-151). BASELINE.md turns that
into two comparable statistics — the D-score distribution over a large
generated batch and the nearest-neighbour 2-norm distribution against the
training corpus — plus diversity (the NN check exists to prove G is not
memorizing, sample.lua:133-151).

``quality_report`` computes them all on device in one pass:

  * D-score stats/histogram of ``n_samples`` generated images, and the same
    for a real sample (a converged D separates them; at equilibrium the
    generated-score distribution shifts toward the real one)
  * NN 2-norm of every generated image to its closest corpus image (one
    (N,D)x(D,M) matmul on the MXU, reusing sample.py's kernel), with a
    copy-fraction at a small threshold (memorization alarm)
  * diversity: mean pairwise L2 between generated images and mean per-pixel
    std across the batch (mode-collapse alarm — collapsed G -> both ~0)
  * V-rating (nn_utils.rateWithV) of all / D-best / D-worst samples when a
    V checkpoint is available — the reference's pseudo-validation score

Everything is plain floats/lists -> JSON-serializable; the CLI wrapper
(catgen.cli.eval_quality) writes ``quality_report.json`` next to the
checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from catgen.core.module import Module
from catgen.sample.sampler import generate_batched, nearest_neighbours, rank_by_d
from catgen.train import gan, v_trainer

PCTS = (5, 25, 50, 75, 95)


def _dist_stats(x: np.ndarray, hist_range=None, bins: int = 20) -> Dict[str, Any]:
    """mean/std/min/max/percentiles + histogram of a 1-D sample."""
    x = np.asarray(x, np.float64)
    lo, hi = hist_range if hist_range else (float(x.min()), float(x.max()))
    counts, edges = np.histogram(x, bins=bins, range=(lo, hi))
    return {
        "n": int(x.size),
        "mean": float(x.mean()), "std": float(x.std()),
        "min": float(x.min()), "max": float(x.max()),
        "percentiles": {str(p): float(np.percentile(x, p)) for p in PCTS},
        "histogram": {"counts": counts.tolist(),
                      "edges": [float(e) for e in edges]},
    }


@jax.jit
def _pairwise_mean_l2(x: jax.Array) -> jax.Array:
    """Mean pairwise L2 distance over a (n, ...) batch (diagonal excluded)."""
    from catgen.sample.sampler import dist2_matrix
    d2 = dist2_matrix(x, x)
    n = x.shape[0]
    return jnp.sum(jnp.sqrt(d2)) / (n * (n - 1))


def quality_report(g: Module, d: Module, g_vars, d_vars,
                   corpus: jax.Array, *,
                   noise_dim: int = 100, n_samples: int = 1024,
                   seed: int = 42,
                   v: Optional[Module] = None, v_vars=None,
                   copy_threshold: float = 1.0,
                   diversity_subset: int = 256,
                   normalized_inputs: bool = False) -> Dict[str, Any]:
    """Computes the BASELINE.md quality statistics for a trained G/D pair.

    ``corpus``: (M, H, W, C) training images in the train colorspace/[0,1]
    (the NN reference set, like sample.lua's TRAIN_DATA) — ALWAYS [0,1],
    even for --normalize runs: G samples are sigmoid [0,1], so the
    NN/copy-fraction stats need both sides in that range.
    ``normalized_inputs``: the D was trained on [-1,1] reals
    (--normalize); the corpus is remapped ONLY for the D real-score pass
    (the range D saw real images in during training).
    """
    rng = jax.random.PRNGKey(seed)
    noise = gan.uniform_noise(rng, n_samples, noise_dim)
    images = generate_batched(g, g_vars, noise)
    order, scores = rank_by_d(d, d_vars, images)
    scores_np = np.asarray(scores, np.float64)

    # D on a real sample of the same size (with replacement if small corpus)
    ridx = jax.random.randint(jax.random.fold_in(rng, 1),
                              (min(n_samples, corpus.shape[0]),),
                              0, corpus.shape[0])
    d_reals = corpus[ridx]
    if normalized_inputs:
        from catgen.data import color as colorlib
        d_reals = colorlib.normalize(d_reals)
    real_scores = np.asarray(rank_by_d(d, d_vars, d_reals)[1], np.float64)

    # NN 2-norm of every sample against the full corpus (sample.lua:133-151
    # does this for the best 16 with host loops; one matmul here covers all)
    _, nn_dist = nearest_neighbours(images, corpus)
    nn_np = np.asarray(nn_dist, np.float64)

    # diversity over a random subset (pairwise) + the full batch (per-pixel)
    sub = images[jax.random.permutation(
        jax.random.fold_in(rng, 2), n_samples)[:diversity_subset]]
    pairwise = float(_pairwise_mean_l2(sub))
    per_pixel_std = float(jnp.mean(jnp.std(images.astype(jnp.float32),
                                           axis=0)))

    report: Dict[str, Any] = {
        "n_samples": int(n_samples),
        "corpus_size": int(corpus.shape[0]),
        "image_shape": [int(s) for s in images.shape[1:]],
        "d_scores_generated": _dist_stats(scores_np, hist_range=(0.0, 1.0)),
        "d_scores_real": _dist_stats(real_scores, hist_range=(0.0, 1.0)),
        "d_fooled_fraction": float((scores_np > 0.5).mean()),
        "nn_l2": _dist_stats(nn_np),
        "nn_copy_fraction": float((nn_np < copy_threshold).mean()),
        "diversity": {
            "mean_pairwise_l2": pairwise,
            "mean_per_pixel_std": per_pixel_std,
        },
        "finite": bool(np.isfinite(np.asarray(images)).all()),
    }

    if v is not None and v_vars is not None:
        top = min(50, n_samples)
        report["v_rating"] = {
            "all": float(v_trainer.rate_with_v(v, v_vars, images)),
            "best50_by_d": float(v_trainer.rate_with_v(
                v, v_vars, images[order[:top]])),
            "worst50_by_d": float(v_trainer.rate_with_v(
                v, v_vars, images[order[-top:]])),
        }
    return report


def summarize(report: Dict[str, Any]) -> str:
    """One-screen human summary of a quality report."""
    dg, dr = report["d_scores_generated"], report["d_scores_real"]
    nn = report["nn_l2"]
    div = report["diversity"]
    lines = [
        f"samples: {report['n_samples']}  corpus: {report['corpus_size']}",
        f"D(generated): mean {dg['mean']:.4f}  std {dg['std']:.4f}  "
        f"p50 {dg['percentiles']['50']:.4f}",
        f"D(real):      mean {dr['mean']:.4f}  std {dr['std']:.4f}  "
        f"p50 {dr['percentiles']['50']:.4f}",
        f"D fooled fraction (score>0.5): {report['d_fooled_fraction']:.3f}",
        f"NN 2-norm: mean {nn['mean']:.3f}  p5 {nn['percentiles']['5']:.3f}  "
        f"p95 {nn['percentiles']['95']:.3f}  "
        f"copy-fraction {report['nn_copy_fraction']:.4f}",
        f"diversity: pairwise L2 {div['mean_pairwise_l2']:.3f}  "
        f"per-pixel std {div['mean_per_pixel_std']:.4f}",
    ]
    if "v_rating" in report:
        v = report["v_rating"]
        lines.append(f"V rating: all {v['all']:.4f}  "
                     f"best50 {v['best50_by_d']:.4f}  "
                     f"worst50 {v['worst50_by_d']:.4f}")
    return "\n".join(lines)
