"""Offline -> train-time integration: the L7 -> L6 -> L3 filesystem seam.

The reference's contract is purely file-based — generate_dataset.py writes
64x64 JPEGs into ``out_aug_64x64/`` (generate_dataset.py:76-91) and
dataset.lua points its dir list at that folder (dataset.lua:93 /
train.lua:93). Both ends are unit-tested elsewhere; this test runs the
WHOLE chain: synthetic keypoint corpus -> offline pipeline -> ImageDataset
-> two GAN epochs through the real CLI on the produced directory.
"""

import json
import os

import numpy as np
from PIL import Image

from catgen.data import offline
from catgen.data.fixture import make_fixture_images


def _write_corpus(root, n=3):
    sub = os.path.join(root, "CAT_00")
    os.makedirs(sub)
    imgs = make_fixture_images(n, 128, seed=9)
    pts = [(60, 44), (60, 84), (84, 64),
           (34, 30), (16, 40), (30, 50),
           (30, 78), (16, 88), (34, 98)]
    for i, arr in enumerate(imgs):
        p = os.path.join(sub, f"img_{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        toks = [str(len(pts))]
        for y, x in pts:
            toks.extend([str(x), str(y)])
        with open(p + ".cat", "w") as f:
            f.write(" ".join(toks) + "\n")


def test_generate_dataset_then_train(tmp_path):
    corpus = str(tmp_path / "cats")
    os.makedirs(corpus)
    _write_corpus(corpus, n=3)
    out = str(tmp_path / "data")

    # L7: the offline CLI (generate_dataset.py semantics)
    from catgen.cli import generate_dataset
    generate_dataset.main(["--path", corpus, "--out", out,
                           "--padding", "20", "--augmentations", "3",
                           "--scale", "64"])
    aug_dir = os.path.join(out, "out_aug_64x64")
    files = os.listdir(aug_dir)
    assert len(files) == 3 * 4  # 1 unaug + 3 aug per image

    # L6 -> L3: train the GAN CLI directly on the produced directory
    # (dataset.lua:93 / train.lua:93 contract)
    from catgen.cli import train
    logs = str(tmp_path / "logs")
    train.main(["--dataset", aug_dir, "--save", logs, "--scale", "16",
                "--batchSize", "4", "--N_epoch", "8", "--epochs", "2",
                "--saveFreq", "1", "--G", "g16up", "--D", "d16b"])
    assert os.path.exists(os.path.join(logs, "adversarial.ckpt"))
    lines = [json.loads(l) for l in
             open(os.path.join(logs, "train_metrics.jsonl"))]
    epochs = [l for l in lines if l["event"] == "epoch"]
    assert len(epochs) == 2
    assert all(np.isfinite(e["loss_d"]) and np.isfinite(e["loss_g"])
               for e in epochs)
    # grids rendered from the trained G
    assert os.listdir(os.path.join(logs, "images"))


def test_keypoint_corpus_through_offline(tmp_path):
    """The 4k-scale quality fixture path (round-4): synthetic keypoint
    corpus (rotated fixture faces + analytic .cat files) -> offline
    pipeline -> aligned 64px crops an ImageDataset can train on."""
    from catgen.data.fixture import write_keypoint_corpus
    from catgen.data.loader import ImageDataset

    raw = str(tmp_path / "raw")
    write_keypoint_corpus(raw, 4, seed=3)
    cats = os.listdir(os.path.join(raw, "CAT_00"))
    assert len(cats) == 8  # 4 jpgs + 4 .cat files

    # keypoints parse and the derotation actually levels the eyeline
    paths = offline.scan_corpus(raw)
    face = offline.load_face_image(paths[0])
    angle_before = abs(offline.eyeline_angle_deg(face.keypoints))
    face.remove_rotation()
    angle_after = abs(offline.eyeline_angle_deg(face.keypoints))
    assert angle_after <= max(angle_before, 2.0)

    out = str(tmp_path / "data")
    n_img, n_files = offline.generate_dataset(raw, out, augmentations=3)
    assert (n_img, n_files) == (4, 4 * 5)  # 4 unaug + 4*(1+3) aug
    ds = ImageDataset([os.path.join(out, "out_aug_64x64")], scale=32)
    batch = np.asarray(ds.load_random_images(8))
    assert batch.shape == (8, 32, 32, 3)
