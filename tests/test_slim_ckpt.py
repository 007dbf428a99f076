"""tools/slim_ckpt.py — optimizer-stripped archive checkpoints for the
committed quality-evidence artifact sets (QUALITY.md); the reference's
analogous size-reduction pass is prepareNetworkForSave
(nn_utils.lua:415-451)."""

import importlib.util
import os
from typing import Any, NamedTuple

import numpy as np

from catgen.io import checkpoint as ckpt

_spec = importlib.util.spec_from_file_location(
    "slim_ckpt", os.path.join(os.path.dirname(__file__), "..", "tools",
                              "slim_ckpt.py"))
slim_ckpt = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(slim_ckpt)


class _State(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    epoch: Any


def _state(seed=0):
    rng = np.random.RandomState(seed)
    return _State(
        g_params={"w": rng.rand(4, 4).astype(np.float32)},
        d_params={"w": rng.rand(3, 3).astype(np.float32)},
        g_opt={"mu": {"w": rng.rand(4, 4).astype(np.float32)},
               "nu": {"w": rng.rand(4, 4).astype(np.float32)}},
        d_opt={"mu": {"w": rng.rand(3, 3).astype(np.float32)}},
        epoch=np.int32(750),
    )


def test_slim_drops_only_opt_state(tmp_path):
    full = str(tmp_path / "adversarial.ckpt")
    slim = str(tmp_path / "adversarial_slim.ckpt")
    ckpt.save(full, _state(), meta={"epoch": 750})
    r = slim_ckpt.slim(full, slim)
    assert r["dropped"] == 3 and r["kept"] == 3
    assert os.path.getsize(slim) < os.path.getsize(full)
    with np.load(slim) as z:
        keys = set(z.files) - {"__meta__"}
    assert all(not k.startswith((".g_opt", ".d_opt")) for k in keys)
    assert any(".g_params" in k for k in keys)
    meta = ckpt.load_meta(slim)
    assert meta["slim"] is True and meta["epoch"] == 750


def test_slim_loads_with_lenient_opt(tmp_path):
    """The harness's --rebuildOptstate path (lenient g_opt/d_opt) restores
    model leaves exactly and re-inits the stripped optimizer leaves."""
    full = str(tmp_path / "a.ckpt")
    slim = str(tmp_path / "a_slim.ckpt")
    saved = _state(seed=1)
    ckpt.save(full, saved, meta={})
    slim_ckpt.slim(full, slim)
    template = _state(seed=2)  # different values; structure/shape match
    with np.testing.suppress_warnings() as sup:
        sup.filter(UserWarning)
        restored, _ = ckpt.load(slim, template, lenient=("g_opt", "d_opt"))
    np.testing.assert_array_equal(restored.g_params["w"],
                                  saved.g_params["w"])
    np.testing.assert_array_equal(restored.d_params["w"],
                                  saved.d_params["w"])
    assert int(restored.epoch) == 750
    # stripped leaves fall back to the template (re-init), not garbage
    np.testing.assert_array_equal(restored.g_opt["mu"]["w"],
                                  template.g_opt["mu"]["w"])
