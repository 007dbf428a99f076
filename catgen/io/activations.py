"""Layer-activation visualizer.

Rebuilds the reference's ``adversarial.visualizeNetwork`` debug harness
(adversarial.lua:307-355: per-layer activity windows behind
--weightsVisFreq, train.lua:46) as PNG artifacts: for each conv/dense
layer of a Sequential model, a grid of feature-map tiles (first sample,
up to 64 channels) written under <dir>/<NN>_<layer>.png.
"""

from __future__ import annotations

import os

import numpy as np

from catgen.core.module import Sequential, apply_with_intermediates
from catgen.io.grids import save_grid


def _normalize01(a: np.ndarray) -> np.ndarray:
    lo, hi = float(a.min()), float(a.max())
    return (a - lo) / (hi - lo + 1e-8)


def save_activation_grids(model: Sequential, variables, x, out_dir: str,
                          max_channels: int = 64) -> list:
    """Returns the list of files written."""
    _, _, inters = apply_with_intermediates(model, variables, x)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for idx, (name, act) in enumerate(inters):
        a = np.asarray(act[:1], np.float32)  # first sample
        if a.ndim == 4:                      # (1, H, W, C) -> channel tiles
            c = min(a.shape[-1], max_channels)
            tiles = np.transpose(a[0, :, :, :c], (2, 0, 1))[..., None]
        elif a.ndim == 2:                    # (1, F) -> one bar image
            f = a[0]
            side = int(np.ceil(np.sqrt(f.size)))
            pad = np.zeros(side * side, np.float32)
            pad[:f.size] = f
            tiles = pad.reshape(1, side, side, 1)
        else:
            continue
        path = os.path.join(out_dir, f"{idx:02d}_{name}.png")
        save_grid(path, _normalize01(tiles))
        written.append(path)
    return written
