"""Native C++ decoder tests (skipped when the toolchain can't build it)."""

import os

import numpy as np
import pytest

from catgen.data.fixture import write_fixture_dataset

native_decode = pytest.importorskip("catgen.data.native_decode")

try:
    native_decode._load()
except ImportError:
    pytest.skip("libfastimage.so unavailable (no compiler/libjpeg)",
                allow_module_level=True)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_jpegs")
    write_fixture_dataset(str(d), n=16, size=96, seed=2)
    return sorted(os.path.join(str(d), f) for f in os.listdir(str(d)))


def test_decode_batch_matches_pil(jpegs):
    from PIL import Image

    out, ok = native_decode.decode_batch_checked(jpegs, 64)
    assert out.shape == (16, 64, 64, 3) and out.dtype == np.uint8
    assert ok.all()
    ref = np.asarray(Image.open(jpegs[0]).convert("RGB")
                     .resize((64, 64), Image.BILINEAR))
    diff = np.abs(out[0].astype(int) - ref.astype(int)).mean()
    assert diff < 4.0  # same decode, slightly different resamplers


def test_decode_failures_flagged(jpegs, tmp_path):
    bad = str(tmp_path / "not_a.jpg")
    with open(bad, "wb") as f:
        f.write(b"definitely not a jpeg")
    out, ok = native_decode.decode_batch_checked(
        [jpegs[0], bad, "/nonexistent/x.jpg"], 32)
    assert list(ok) == [True, False, False]
    assert (out[1] == 0).all() and (out[2] == 0).all()


def test_loader_uses_native_path(jpegs):
    from catgen.data.loader import ImageDataset

    ds = ImageDataset([os.path.dirname(jpegs[0])], scale=32)
    imgs = ds.load_random_images(4)
    assert imgs.shape == (4, 32, 32, 3)


def test_loader_raises_on_corrupt_file(tmp_path):
    """The loader's native cache fill must fail loudly on undecodable
    files (round-3 review fix: decode_batch zero-fills failed slots,
    which previously entered training as all-black reals), matching the
    PIL path's behavior."""
    from catgen.data.loader import ImageDataset

    d = str(tmp_path / "corpus")
    write_fixture_dataset(d, n=4, size=96, seed=3)
    with open(os.path.join(d, "broken.jpg"), "wb") as f:
        f.write(b"\xff\xd8\xff\xe0 not a real jpeg")
    ds = ImageDataset([d], scale=32)
    with pytest.raises(ValueError, match="failed to decode"):
        ds.load_random_images(2)
