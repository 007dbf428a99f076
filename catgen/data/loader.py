"""Train-time dataset loader.

Rebuilds /root/reference/dataset.lua with a TPU-grade ingestion policy:
the reference re-decodes 1000 JPEGs from disk *every epoch* on the host
(dataset.lua:123-150) — fine at 1k images/epoch, fatal at 20k images/s/chip
(SURVEY.md §7 "input pipeline throughput"). Here each image is decoded
**once** into a pinned uint8 host cache (~1.2 GB for the full 100k corpus),
and per-epoch sampling is an O(batch) numpy gather followed by a single
host->device transfer; downscale to train resolution and color-space
conversion run on device (catgen.data.ops / catgen.data.color).

Decoding is pluggable: the multithreaded C++ decoder (native/fastimage) is
used when built, with a PIL fallback.

Path scanning matches the reference's reproducibility contract — sorted
file lists (dataset.lua:73-74) — without its per-dir re-sort quirk.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from catgen.data import color as colorlib
from catgen.data import ops


def scan_paths(dirs: Sequence[str], ext: str = "jpg") -> List[str]:
    """All files with ``ext`` under ``dirs``, one stable global sort
    (dataset.lua:57-83 semantics)."""
    paths: List[str] = []
    for d in dirs:
        if not os.path.isdir(d):
            raise FileNotFoundError(f"dataset dir not found: {d}")
        for name in os.listdir(d):
            if name.lower().endswith("." + ext.lower()):
                paths.append(os.path.join(d, name))
    if not paths:
        raise FileNotFoundError(f"no *.{ext} files under {list(dirs)}")
    return sorted(paths)


def _decode_pil(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, np.uint8)


class ImageDataset:
    """uint8 RAM-cached image corpus with device-side postprocessing.

    Mirrors the reference API surface: ``load_images(start, count)``
    (sequential, dataset.lua:89-117) and ``load_random_images(count)``
    (random sample, dataset.lua:123-150), both returning float NHWC arrays
    in [0,1] at the train scale/colorspace.
    """

    def __init__(self, dirs: Sequence[str], ext: str = "jpg",
                 scale: int = 32, colorspace: str = "rgb",
                 source_size: int = 64, seed: int = 1,
                 decoder: Optional[str] = None,
                 shard_by_process: bool = False,
                 normalize: bool = False):
        self.paths = scan_paths(dirs, ext)
        if shard_by_process:
            # multi-host DP: each process decodes + caches only its slice
            # of the (globally sorted) corpus, so host RAM and decode time
            # scale down with the process count (SURVEY.md §2.3 DCN mapping)
            import jax
            pi, pc = jax.process_index(), jax.process_count()
            self.paths = self.paths[pi::pc]
            # offset the sampling stream so processes draw different reals
            seed = seed + 7919 * pi
        self.scale = scale
        self.colorspace = colorspace
        self.source_size = source_size
        # --normalize: remap [0,1] -> [-1,1] after colorspace conversion
        # (train.lua:51,209-227 NORMALIZE path; the active nn_utils.normalize
        # branch, nn_utils.lua:396-408)
        self.normalize = normalize
        self._rng = np.random.RandomState(seed)
        self._cache: Optional[np.ndarray] = None
        self._decoder = decoder

    def __len__(self) -> int:
        return len(self.paths)

    def family_ids(self, start: int, count: int) -> np.ndarray:
        """Source-image family id per file in [start, start+count): files
        named ``{img_idx}_{aug_idx}.jpg`` (the offline pipeline's contract,
        generate_dataset.py:76-91) share a family iff their img_idx
        matches; any other naming gets a unique id per file. Used to
        exclude augmentation near-duplicates from the self-NN normalizer
        (sample.self_nn_mean)."""
        import re

        ids = []
        for i, p in enumerate(self.paths[start:start + count]):
            stem = os.path.splitext(os.path.basename(p))[0]
            m = re.fullmatch(r"(\d+)_(\d+)", stem)
            ids.append(int(m.group(1)) if m else -(i + 1))
        return np.asarray(ids, np.int64)

    @property
    def channels(self) -> int:
        return colorlib.channels(self.colorspace)

    def image_shape(self) -> Tuple[int, int, int]:
        return (self.scale, self.scale, self.channels)

    # -- host side -----------------------------------------------------

    def _ensure_cache(self) -> np.ndarray:
        if self._cache is None:
            self._cache = self._decode_all()
        return self._cache

    def _decode_all(self) -> np.ndarray:
        s = self.source_size
        if self._decoder != "pil":
            try:
                from catgen.data import native_decode
                out, ok = native_decode.decode_batch_checked(self.paths, s)
            except (ImportError, OSError):
                pass
            else:
                if not ok.all():
                    # the native pool zero-fills failed slots — raising
                    # here matches the PIL path (which raises on the same
                    # file) instead of silently training on black images
                    bad = [self.paths[i] for i in np.flatnonzero(ok == 0)]
                    raise ValueError(
                        f"{len(bad)} image(s) failed to decode, e.g. "
                        f"{bad[:3]} — fix or remove them (the zero-filled "
                        f"slots would otherwise enter training as "
                        f"all-black reals)")
                return out
        out = np.empty((len(self.paths), s, s, 3), np.uint8)
        for i, p in enumerate(self.paths):
            out[i] = _decode_pil(p, s)
        return out

    def sample_uint8(self, count: int,
                     rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        """(count, src, src, 3) uint8 random sample (with replacement when
        count > corpus, like the reference's per-image randperm reuse)."""
        cache = self._ensure_cache()
        r = rng or self._rng
        replace = count > len(cache)
        idx = r.choice(len(cache), size=count, replace=replace)
        return cache[idx]

    def slice_uint8(self, start: int, count: int) -> np.ndarray:
        cache = self._ensure_cache()
        return cache[start:start + count]

    # -- device side ---------------------------------------------------

    def postprocess(self, raw_uint8: np.ndarray) -> jax.Array:
        """uint8 (N,S,S,3) -> float (N,scale,scale,C) in [0,1], on device."""
        x = jnp.asarray(raw_uint8).astype(jnp.float32) / 255.0
        if self.scale != x.shape[1]:
            if x.shape[1] == 2 * self.scale:
                x = ops.downscale2(x)
            else:
                x = ops.resize_bilinear(x, (self.scale, self.scale))
        x = colorlib.rgb_to_colorspace(x, self.colorspace)
        if self.normalize:
            x = colorlib.normalize(x)
        return x

    def load_random_images(self, count: int) -> jax.Array:
        return self.postprocess(self.sample_uint8(count))

    def load_images(self, start: int, count: int) -> jax.Array:
        return self.postprocess(self.slice_uint8(start, count))

    def epoch_batches(self, n_examples: int, half_batch: int,
                      d_iterations: int = 1) -> jax.Array:
        """Pre-batched reals for one scanned epoch:
        (n_examples // half_batch, d_iterations * half_batch, H, W, C).

        The batch count follows the examples-per-epoch budget while each
        step draws ``d_iterations`` fresh half-batches — matching the
        reference, whose D_iterations loop refills reals per iteration
        without advancing the epoch counter (adversarial.lua:221-238)."""
        nb = max(n_examples // half_batch, 1)
        per_step = d_iterations * half_batch
        raw = self.sample_uint8(nb * per_step)
        x = self.postprocess(raw)
        return x.reshape((nb, per_step) + x.shape[1:])
