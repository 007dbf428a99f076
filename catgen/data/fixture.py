"""Synthetic cat-face fixture generator.

The real corpus is the keypoint-annotated 10k-cats dataset, which is not
shipped. To keep every stage runnable and testable end-to-end (SURVEY.md §7
step 2: "ship a tiny synthetic-cat fixture"), this module procedurally draws
deterministic 64x64 cat-ish faces (head ellipse, triangle ears, eyes, nose)
with pose/color jitter — enough structure for D/V/G to have something
non-trivial to learn in smoke tests and demos.
"""

from __future__ import annotations

import os

import numpy as np


def _face_keypoints(size, cy, cx, ry, rx) -> np.ndarray:
    """The 9 analytic keypoints of a drawn face, (y, x) order matching
    catgen.data.offline's indices (dataset.py:382-405): eyes, mouth,
    3 left-ear points (outer base, apex, inner base), 3 right-ear points
    (inner base, apex, outer base) — the mirror ordering the reference's
    fliplr swaps (dataset.py:564-578) assume."""
    ear_off = rx * 0.62
    ear_h = size * 0.22
    half_w = size * 0.10
    apex_y = cy - ry - ear_h * 0.45
    base_y = apex_y + ear_h
    pts = [
        (cy - ry * 0.15, cx - rx * 0.42),        # LEFT_EYE
        (cy - ry * 0.15, cx + rx * 0.42),        # RIGHT_EYE
        (cy + ry * 0.43, cx),                    # MOUTH
        (base_y, cx - ear_off - half_w),         # LEFT_EAR_1 (outer base)
        (apex_y, cx - ear_off),                  # LEFT_EAR_2 (apex)
        (base_y, cx - ear_off + half_w),         # LEFT_EAR_3 (inner base)
        (base_y, cx + ear_off - half_w),         # RIGHT_EAR_1 (inner base)
        (apex_y, cx + ear_off),                  # RIGHT_EAR_2 (apex)
        (base_y, cx + ear_off + half_w),         # RIGHT_EAR_3 (outer base)
    ]
    kp = np.rint(np.asarray(pts)).astype(np.int64)
    return np.clip(kp, 0, size - 1)


def _draw_face(rng: np.random.RandomState, size: int = 64):
    """Returns (img float32 [0,1], (cy, cx, ry, rx) head geometry)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy, cx = size / 2 + rng.uniform(-3, 3), size / 2 + rng.uniform(-3, 3)
    img = np.empty((size, size, 3), np.float32)
    # background
    bg = rng.uniform(0.1, 0.9, size=3).astype(np.float32)
    img[:] = bg + rng.normal(0, 0.03, (size, size, 3))

    fur = np.array([rng.uniform(0.45, 0.85), rng.uniform(0.35, 0.65),
                    rng.uniform(0.2, 0.45)], np.float32)
    dark = fur * 0.55

    # head ellipse
    ry, rx = size * 0.34 * rng.uniform(0.9, 1.1), size * 0.38 * rng.uniform(0.9, 1.1)
    head = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0

    # ears: two triangles above the head
    def triangle(apex_y, apex_x, half_w, height):
        rel_y = yy - apex_y
        in_h = (rel_y >= 0) & (rel_y <= height)
        spread = (rel_y / max(height, 1)) * half_w
        return in_h & (np.abs(xx - apex_x) <= spread)

    ear_off = rx * 0.62
    ear_h = size * 0.22
    e1 = triangle(cy - ry - ear_h * 0.45, cx - ear_off, size * 0.10, ear_h)
    e2 = triangle(cy - ry - ear_h * 0.45, cx + ear_off, size * 0.10, ear_h)

    img[head | e1 | e2] = fur

    # eyes
    eye_c = np.array([rng.uniform(0.5, 0.9), rng.uniform(0.6, 0.9),
                      rng.uniform(0.1, 0.4)], np.float32)
    for sx in (-1, 1):
        ex = cx + sx * rx * 0.42
        ey = cy - ry * 0.15
        eye = (((yy - ey) / (size * 0.055)) ** 2 +
               ((xx - ex) / (size * 0.075)) ** 2) <= 1.0
        pupil = (((yy - ey) / (size * 0.05)) ** 2 +
                 ((xx - ex) / (size * 0.018)) ** 2) <= 1.0
        img[eye] = eye_c
        img[pupil] = np.array([0.05, 0.05, 0.05], np.float32)

    # nose + mouth line
    nose = triangle(cy + ry * 0.25, cx, size * 0.045, size * 0.07)
    img[nose] = np.array([0.75, 0.4, 0.45], np.float32)
    mouth = (np.abs(xx - cx) < size * 0.012) & \
            (yy > cy + ry * 0.32) & (yy < cy + ry * 0.55)
    img[mouth] = dark

    return np.clip(img, 0.0, 1.0), (cy, cx, ry, rx)


def make_fixture_images(n: int, size: int = 64, seed: int = 0) -> np.ndarray:
    """Returns (n, size, size, 3) uint8."""
    rng = np.random.RandomState(seed)
    out = np.stack([_draw_face(rng, size)[0] for _ in range(n)])
    return (out * 255).astype(np.uint8)


def write_keypoint_corpus(root: str, n: int, size: int = 128,
                          seed: int = 0, rot_deg: float = 12.0) -> str:
    """Synthetic RAW corpus in the 10k-cats on-disk format: rotated fixture
    faces as ``CAT_00/img_XXXXX.jpg`` with sibling ``.cat`` keypoint files
    ("<count> x1 y1 ..." — dataset.py:71-92), so the FULL offline pipeline
    (eyeline derotation, rect extraction, 9x augmentation) runs on it.
    Rotation jitter is applied here and the analytic keypoints are
    transformed with it, giving the derotation stage real work. Scales the
    quality fixture to 4k-16k crops without the real dataset."""
    from PIL import Image

    from catgen.data import offline

    sub = os.path.join(root, "CAT_00")
    os.makedirs(sub, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        img, (cy, cx, ry, rx) = _draw_face(rng, size)
        arr = (img * 255).astype(np.uint8)
        kp = _face_keypoints(size, cy, cx, ry, rx)
        ang = np.radians(rng.uniform(-rot_deg, rot_deg))
        c, s = np.cos(ang), np.sin(ang)
        to_tl = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], float)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], float)
        to_c = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], float)
        forward = to_c @ rot @ to_tl
        arr = offline._affine_warp(arr, forward)
        kp = offline._transform_points(kp, forward, size, size)
        p = os.path.join(sub, f"img_{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        toks = [str(len(kp))]
        for y, x in kp:
            toks.extend([str(int(x)), str(int(y))])
        with open(p + ".cat", "w") as f:
            f.write(" ".join(toks) + "\n")
    return root


def write_fixture_dataset(directory: str, n: int = 64, size: int = 64,
                          seed: int = 0) -> str:
    """Writes n JPEG faces into ``directory`` (the file-system contract the
    train-time loader consumes, dataset.lua:93)."""
    from PIL import Image

    os.makedirs(directory, exist_ok=True)
    imgs = make_fixture_images(n, size, seed)
    for i, arr in enumerate(imgs):
        Image.fromarray(arr).save(
            os.path.join(directory, f"cat_{i:05d}.jpg"), quality=92)
    return directory
