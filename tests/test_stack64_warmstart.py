"""Stage-wise 64px warm start (tools/stack64_warmstart.py).

The G64 stack's base subtree must receive a trained 32px G's leaves
bit-for-bit, the refiner must keep its fresh init, and the written file
must load through the harness's pretrained pickup template."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "stack64_warmstart",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "stack64_warmstart.py"))
ws = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ws)


@pytest.fixture(scope="module")
def trees():
    from catgen import models

    noise_dim = 8
    g32 = models.G_REGISTRY["default"]((32, 32, 3), noise_dim)
    g32_vars = g32.init(jax.random.PRNGKey(7), (1, noise_dim))
    g64 = models.G_REGISTRY["g64_stack"]((64, 64, 3), noise_dim)
    g64_vars = g64.init(jax.random.PRNGKey(1), (1, noise_dim))
    # spell the 32px G as checkpoint.save spells a harness TrainState
    adv = {}
    for group, prefix in (("params", ".g_params"), ("state", ".g_state")):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                g32_vars[group])[0]:
            adv[prefix + jax.tree_util.keystr(path)] = np.asarray(leaf)
    return g32_vars, g64_vars, adv, g64, noise_dim


def test_graft_replaces_base_and_keeps_refiner(trees):
    g32_vars, g64_vars, adv, g64, noise_dim = trees
    grafted = ws.graft_base(g64_vars, adv)
    # base leaves == the 32px run's leaves, bit for bit
    src = jax.tree_util.tree_leaves(g32_vars["params"])
    dst = jax.tree_util.tree_leaves(grafted["params"]["00_G32up_c"])
    assert all(np.array_equal(a, b) for a, b in zip(src, dst))
    # refiner untouched
    a = jax.tree_util.tree_leaves(g64_vars["params"]["01_RefineStage"])
    b = jax.tree_util.tree_leaves(grafted["params"]["01_RefineStage"])
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # grafted stack emits the base's image, bilinearly refined: the
    # whole tree must still apply cleanly at 64px
    noise = jax.random.uniform(jax.random.PRNGKey(0), (2, noise_dim),
                               minval=-1.0, maxval=1.0)
    img, _ = g64.apply(grafted, noise, train=False)
    assert img.shape == (2, 64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_graft_rejects_wrong_architecture(trees):
    _, g64_vars, adv, _, _ = trees
    missing = {k: v for k, v in adv.items() if "12_Conv" not in k}
    with pytest.raises(KeyError):
        ws.graft_base(g64_vars, missing)
    bad = dict(adv)
    k = ".g_params['00_Dense']['kernel']"
    bad[k] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError):
        ws.graft_base(g64_vars, bad)


def test_written_file_loads_through_pretrained_pickup(tmp_path, trees):
    """checkpoint.load with the harness's pickup template must restore
    the grafted tree exactly (the auto-load seam of train.lua:152-162)."""
    from catgen.io import checkpoint as ckpt

    _, g64_vars, adv, g64, noise_dim = trees
    grafted = ws.graft_base(g64_vars, adv)
    path = str(tmp_path / ckpt.g_pretrained_filename(3, 64, 64, noise_dim))
    ckpt.save(path, grafted, {"epoch": 5})
    template = {"params": g64_vars["params"], "state": g64_vars["state"]}
    loaded, meta = ckpt.load(path, template)
    assert meta["epoch"] == 5
    for a, b in zip(jax.tree_util.tree_leaves(grafted),
                    jax.tree_util.tree_leaves(loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
