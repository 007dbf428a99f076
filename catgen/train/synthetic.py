"""Synthetic-fake image generators for the V validator.

Rebuilds train_v.lua's corrupted-image factory (train_v.lua:294-528): V is
trained to tell real photos from synthetically corrupted ones, and then
serves as a GAN pseudo-validation score. The reference generates these with
per-pixel Lua loops on the host; here every generator is a batched on-device
XLA op, with only the overlay *bank* precomputed once on the host (the
reference also caches 1000 random-walk masks, train_v.lua:536-541).

Generators (dispatcher picks one per batch with p=1/4 each, then with
p=0.33 mixes with a second synthetic batch — train_v.lua:294-316):

  * Mix    — alpha-blend two random training images through a mask
             (train_v.lua:327-344, 371-382)
  * Stamp  — blend an image with a circularly shifted copy of itself
             through a mask (train_v.lua:388-422)
  * Warp   — ``image.warp`` with a flow field built from two masks
             (train_v.lua:450-484); reuses the shared bilinear sampler
  * Random — colored cloud noise from mask products with per-channel
             circular offsets (train_v.lua:490-528)

Masks come in two flavors: random-walk "gaussian" overlays combined 4-at-a-
time and blurred (train_v.lua:543-560, 573-637) and scan-line correlated
"pixelwise" overlays (train_v.lua:645-668, exact scan semantics via
lax.scan).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from catgen.nn.spatial_transformer import warp_flow


# ---------------------------------------------------------------------------
# overlay bank (host, built once)
# ---------------------------------------------------------------------------


def build_overlay_bank(height: int, width: int, n: int = 1000,
                       n_points: int = 10000, seed: int = 0) -> jnp.ndarray:
    """(n, H, W) random-walk point-accumulation masks, normalized to max 1
    (createGaussianOverlay with blur 0, train_v.lua:536-541, 573-637).

    The walk: with p=.02 jump somewhere new, with p=.10 step back to the
    previous position, otherwise move to a random in-bounds 8-neighbour.
    """
    rng = np.random.RandomState(seed)
    bank = np.zeros((n, height, width), np.float32)
    dirs = np.array([(-1, 0), (-1, 1), (0, 1), (1, 1),
                     (1, 0), (1, -1), (0, -1), (-1, -1)])
    for i in range(n):
        ov = bank[i]
        cy, cx = rng.randint(height), rng.randint(width)
        ly, lx = rng.randint(height), rng.randint(width)
        for _ in range(n_points):
            p = rng.rand()
            if p < 0.02:
                ly, lx = cy, cx
                cy, cx = rng.randint(height), rng.randint(width)
            elif rng.rand() < 0.10:
                cy, cx = ly, lx
            else:
                ly, lx = cy, cx
                while True:
                    dy, dx = dirs[rng.randint(8)]
                    ny, nx = ly + dy, lx + dx
                    if 0 <= ny < height and 0 <= nx < width:
                        cy, cx = ny, nx
                        break
            ov[cy, cx] += 1.0
        m = ov.max()
        if m > 0:
            ov /= m
    return jnp.asarray(bank)


def gaussian_kernel(size: int, sigma: float = None) -> jnp.ndarray:
    """torch ``image.gaussian(size)`` equivalent: normalized-amplitude 2-D
    gaussian, default sigma 0.25 (relative) -> 0.25*size pixels."""
    if sigma is None:
        sigma = 0.25 * size
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g1 = jnp.exp(-0.5 * jnp.square(ax / sigma))
    k = jnp.outer(g1, g1)
    return k / k.max()


def blur(masks: jnp.ndarray, blur_size: int) -> jnp.ndarray:
    """Same-size 2-D convolution with the gaussian kernel, then /max —
    ``image.convolve(o, image.gaussian(b), 'same'); o:div(max)``."""
    if blur_size <= 0:
        return masks
    k = gaussian_kernel(blur_size)
    x = masks[..., None]
    p = (blur_size - 1) // 2
    y = lax.conv_general_dilated(
        x, k[:, :, None, None],
        window_strides=(1, 1),
        padding=[(p, blur_size - 1 - p), (p, blur_size - 1 - p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    mx = jnp.max(y, axis=(1, 2), keepdims=True)
    return y / jnp.maximum(mx, 1e-8)


def gaussian_overlays(rng: jax.Array, bank: jnp.ndarray, n: int,
                      blur_size: int = 4) -> jnp.ndarray:
    """n fresh masks: clamp(2*o1 - o2) + 2*clamp(o3*o4), clamped, blurred
    (getGaussianOverlay, train_v.lua:543-560)."""
    idx = jax.random.randint(rng, (4, n), 0, bank.shape[0])
    o1, o2, o3, o4 = (bank[idx[i]] for i in range(4))
    out = jnp.clip(2.0 * o1 - o2, 0.0, 1.0)
    out = jnp.clip(out + 2.0 * o3 * o4, 0.0, 1.0)
    return blur(out, blur_size)


def pixelwise_overlays(rng: jax.Array, n: int, height: int,
                       width: int) -> jnp.ndarray:
    """Scan-line correlated threshold noise (createPixelwiseOverlay,
    train_v.lua:645-668), exact sequential semantics via lax.scan,
    vectorized over the batch."""
    k0, k1, kv, kt, kw = jax.random.split(rng, 5)
    p0 = jax.random.uniform(k0, (n,))
    p_change = jax.random.uniform(k1, (n,)) / 10.0
    total = height * width
    vals = jnp.minimum(2.0 * jax.random.uniform(kv, (total, n)), 1.0)
    thresh = jax.random.uniform(kt, (total, n))
    walk = jax.random.bernoulli(kw, 0.5, (total, n))

    def body(p, inputs):
        v, t, w = inputs
        pix = jnp.where(t > p, v, 0.0)
        p = jnp.clip(jnp.where(w, p - p_change, p + p_change), 0.0, 1.0)
        return p, pix

    _, pixels = lax.scan(body, p0, (vals, thresh, walk))
    return pixels.T.reshape(n, height, width)


# ---------------------------------------------------------------------------
# generators (batched, on device)
# ---------------------------------------------------------------------------


def _div_by_max(imgs: jnp.ndarray) -> jnp.ndarray:
    mx = jnp.max(imgs, axis=(1, 2, 3), keepdims=True)
    return imgs / jnp.maximum(mx, 1e-8)


def _batch_overlay(rng: jax.Array, bank: jnp.ndarray,
                   height: int, width: int) -> jnp.ndarray:
    """ONE (H, W) mask shared by the whole batch — mixImageLists draws a
    single overlay (50/50 gaussian or pixelwise) and applies it to every
    pair in the list (train_v.lua:349-366). The choice is per batch, via
    lax.cond on one random bit."""
    k_choice, k_a, k_b = jax.random.split(rng, 3)
    use_gauss = jax.random.bernoulli(k_choice)
    return lax.cond(
        use_gauss,
        lambda: gaussian_overlays(k_a, bank, 1, 4)[0],
        lambda: pixelwise_overlays(k_b, 1, height, width)[0])


def mix_images(img1: jnp.ndarray, img2: jnp.ndarray,
               overlay: jnp.ndarray) -> jnp.ndarray:
    """overlay*img1 + (1-overlay)*img2, then per-image /max
    (train_v.lua:327-344). ``overlay`` is (H, W) shared across the batch or
    (N, H, W) per-image — both broadcast."""
    ov = overlay[..., None]
    return _div_by_max(ov * img1 + (1.0 - ov) * img2)


@partial(jax.jit, static_argnames=())
def synthetic_mix(rng: jax.Array, img1: jnp.ndarray, img2: jnp.ndarray,
                  bank: jnp.ndarray) -> jnp.ndarray:
    """Mix generator: blend two random training images through ONE shared
    overlay (createSyntheticImagesMix -> mixImageLists, train_v.lua:371-382,
    349-366)."""
    _, h, w, _ = img1.shape
    return mix_images(img1, img2, _batch_overlay(rng, bank, h, w))


def _roll2(img: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Circular shift of one (H,W,C) image by traced (dy, dx)."""
    h, w, _ = img.shape
    ys = (jnp.arange(h) + dy) % h
    xs = (jnp.arange(w) + dx) % w
    return img[ys][:, xs]


@partial(jax.jit, static_argnames=())
def synthetic_stamp(rng: jax.Array, imgs: jnp.ndarray,
                    bank: jnp.ndarray) -> jnp.ndarray:
    """Stamp generator: blend an image with a wrapped-shifted copy of
    itself through one shared gaussian mask (train_v.lua:388-422;
    withinImageCoords wraps circularly, :430-447)."""
    n, h, w, _ = imgs.shape
    k_ov, k_dy, k_dx = jax.random.split(rng, 3)
    ov = gaussian_overlays(k_ov, bank, 1, 4)[0][None, :, :, None]
    dy = jax.random.randint(k_dy, (n,), 1, 11)
    dx = jax.random.randint(k_dx, (n,), 1, 11)
    shifted = jax.vmap(_roll2)(imgs, dy, dx)
    return _div_by_max((1.0 - ov) * imgs + ov * shifted)


@partial(jax.jit, static_argnames=())
def synthetic_warp(rng: jax.Array, imgs: jnp.ndarray,
                   bank: jnp.ndarray) -> jnp.ndarray:
    """Warp generator: flow field from two masks scaled to [-1,1] * length,
    length ~ 1 + U{1..4} per image (train_v.lua:450-484)."""
    n, h, w, _ = imgs.shape
    k1, k2, kl = jax.random.split(rng, 3)
    o1 = gaussian_overlays(k1, bank, 1, 4)[0] * 2.0 - 1.0
    o2 = gaussian_overlays(k2, bank, 1, 4)[0] * 2.0 - 1.0
    length = (1.0 + jax.random.randint(kl, (n,), 1, 5).astype(jnp.float32))
    flow = jnp.stack([
        jnp.broadcast_to(o1, (n, h, w)) * length[:, None, None],
        jnp.broadcast_to(o2, (n, h, w)) * length[:, None, None],
    ], axis=-1)
    return _div_by_max(warp_flow(imgs, flow))


@partial(jax.jit, static_argnames=("n", "height", "width", "channels"))
def synthetic_random(rng: jax.Array, bank: jnp.ndarray, n: int = 16,
                     height: int = 32, width: int = 32,
                     channels: int = 3) -> jnp.ndarray:
    """Random generator: base color + o1 * shifted(o2) - shifted(o3) with
    per-channel circular offsets c*(dy,dx), min-shifted and max-normalized
    (train_v.lua:490-528)."""
    k1, k2, k3, ko, kb = jax.random.split(rng, 5)
    o1 = gaussian_overlays(k1, bank, 1, 10)[0]
    o2 = gaussian_overlays(k2, bank, 1, 10)[0]
    o3 = gaussian_overlays(k3, bank, n, 4)
    off = jax.random.randint(ko, (n, 2), 1, 11) - 5  # math.random(10)-5
    base = jax.random.uniform(kb, (n, 1, 1, channels))

    def per_image(o3_i, off_i):
        chans = []
        for c in range(channels):
            dy, dx = (c + 1) * off_i[0], (c + 1) * off_i[1]
            o2s = _roll2(o2[:, :, None], dy, dx)[:, :, 0]
            o3s = _roll2(o3_i[:, :, None], dy, dx)[:, :, 0]
            chans.append(o1 * o2s - o3s)
        return jnp.stack(chans, axis=-1)

    img = jax.vmap(per_image)(o3, off) + base
    mn = jnp.min(img, axis=(1, 2, 3), keepdims=True)
    img = img + jnp.abs(mn)
    return _div_by_max(img)


# ---------------------------------------------------------------------------
# traced dispatcher (lax.switch — the whole batch generation is ONE XLA
# program, scannable inside the V training epoch)
# ---------------------------------------------------------------------------


def make_batch_generator(bank: jnp.ndarray, image_shape: Tuple[int, int, int]):
    """Returns ``generate(rng, branch, sub_branch, submix, reals4) -> imgs``,
    fully traced: ``branch``/``sub_branch`` in {0:Mix, 1:Warp, 2:Stamp,
    3:Random} select the generator via ``lax.switch`` and ``submix`` applies
    the p=0.33 recursive mix via ``lax.cond`` (createSyntheticImages,
    train_v.lua:294-316). ``reals4`` is (4, n, H, W, C) fresh random real
    batches: [0]/[1] feed the primary generator, [2]/[3] the sub-generator
    (each Lua generator draws its own fresh TRAIN_DATA samples). Branch
    randomness (which generator, submix) stays host-side so the reference's
    sequential math.random semantics are preserved; everything pixel-shaped
    runs on device."""
    h, w, c = image_shape

    def gen_one(rng, idx, r1, r2):
        n = r1.shape[0]
        return lax.switch(idx, [
            lambda: synthetic_mix(rng, r1, r2, bank),
            lambda: synthetic_warp(rng, r1, bank),
            lambda: synthetic_stamp(rng, r1, bank),
            lambda: synthetic_random(rng, bank, n, h, w, c),
        ])

    def generate(rng, branch, sub_branch, submix, reals4):
        k1, k2, k3 = jax.random.split(rng, 3)
        imgs = gen_one(k1, branch, reals4[0], reals4[1])

        def mixed():
            other = gen_one(k2, sub_branch, reals4[2], reals4[3])
            ov = _batch_overlay(k3, bank, h, w)
            return mix_images(imgs, other, ov)

        return lax.cond(submix, mixed, lambda: imgs)

    return generate


# ---------------------------------------------------------------------------
# dispatcher (host chooses the branch; device does the work)
# ---------------------------------------------------------------------------


class SyntheticImageFactory:
    """Stateful host-side dispatcher matching createSyntheticImages
    (train_v.lua:294-316): picks Mix/Warp/Stamp/Random with p=1/4, then with
    p=0.33 alpha-mixes with a second (non-recursive) synthetic batch."""

    def __init__(self, bank: jnp.ndarray, image_shape: Tuple[int, int, int],
                 seed: int = 0):
        self.bank = bank
        self.image_shape = tuple(image_shape)
        self._np = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _one_batch(self, n: int, sample_reals) -> jnp.ndarray:
        h, w, c = self.image_shape
        p = self._np.rand()
        rng = self._next_key()
        if p < 0.25:
            return synthetic_mix(rng, sample_reals(n), sample_reals(n),
                                 self.bank)
        if p < 0.5:
            return synthetic_warp(rng, sample_reals(n), self.bank)
        if p < 0.75:
            return synthetic_stamp(rng, sample_reals(n), self.bank)
        return synthetic_random(rng, self.bank, n, h, w, c)

    def __call__(self, n: int, sample_reals) -> jnp.ndarray:
        """sample_reals: callable(n) -> (n,H,W,C) random training images."""
        imgs = self._one_batch(n, sample_reals)
        if self._np.rand() < 0.33:
            other = self._one_batch(n, sample_reals)
            h, w, _ = self.image_shape
            # one overlay for the whole recursive-mix batch
            # (mixImageLists, train_v.lua:349-366)
            overlay = _batch_overlay(self._next_key(), self.bank, h, w)
            imgs = mix_images(imgs, other, overlay)
        return imgs
