"""io tests: checkpoint round-trip (incl. .old rotation and filename
conventions), grid writer with epoch stamp, metrics JSONL."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from catgen import nn
from catgen.io import checkpoint, save_grid, sanity_probe_images, to_grid
from catgen.io.metrics import MetricsLogger, confusion_summary
from catgen.train import gan


def _tiny_state():
    img = (8, 8, 1)
    g = nn.Sequential([nn.Dense(8), nn.Dense(64), nn.Sigmoid(),
                       nn.Reshape(img)], name="g")
    d = nn.Sequential([nn.Flatten(), nn.Dense(1), nn.Sigmoid()], name="d")
    config = gan.GanConfig(batch_size=8, noise_dim=4, acc_window=4)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), img)
    return state


def test_checkpoint_roundtrip(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "adversarial.ckpt")
    checkpoint.save(path, state, meta={"epoch": 5, "config": {"bs": 8}})
    template = _tiny_state()
    restored, meta = checkpoint.load(path, template)
    assert meta["epoch"] == 5
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_old_rotation(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "adversarial.ckpt")
    checkpoint.save(path, state, meta={"epoch": 1})
    checkpoint.save(path, state, meta={"epoch": 2})
    assert os.path.exists(path + ".old")
    assert checkpoint.load_meta(path)["epoch"] == 2
    assert checkpoint.load_meta(path + ".old")["epoch"] == 1


def test_checkpoint_shape_mismatch_raises(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "x.ckpt")
    checkpoint.save(path, {"w": jnp.zeros((3,))})
    try:
        checkpoint.load(path, {"w": jnp.zeros((4,))})
        assert False, "should raise"
    except ValueError:
        pass


def test_checkpoint_version_field(tmp_path):
    path = str(tmp_path / "x.ckpt")
    checkpoint.save(path, {"w": jnp.zeros((3,))})
    assert checkpoint.load_meta(path)["format_version"] == \
        checkpoint.FORMAT_VERSION


def test_checkpoint_lenient_load_reinits(tmp_path):
    # shape drift on a lenient leaf falls back to the template; a missing
    # lenient leaf does too; non-lenient drift still raises
    path = str(tmp_path / "x.ckpt")
    checkpoint.save(path, {"w": jnp.ones((3,)), "acc_buffer": jnp.ones((4,))})
    template = {"w": jnp.zeros((3,)), "acc_buffer": jnp.zeros((9,)),
                "acc_count": jnp.zeros((), jnp.int32)}
    restored, meta = checkpoint.load(path, template,
                                     lenient=("acc_buffer", "acc_count"))
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((3,)))
    np.testing.assert_array_equal(np.asarray(restored["acc_buffer"]),
                                  np.zeros((9,)))
    assert len(meta["_reinitialized"]) == 2
    try:
        checkpoint.load(path, template)  # not lenient -> error
        assert False, "should raise"
    except (KeyError, ValueError):
        pass


def test_resume_across_acc_window_change(tmp_path):
    """train.lua --rebuildOptstate spirit: a checkpoint written with one
    gate-window size resumes under another (the window re-inits, params
    survive bit-exactly)."""
    img = (8, 8, 1)
    g = nn.Sequential([nn.Dense(8), nn.Dense(64), nn.Sigmoid(),
                       nn.Reshape(img)], name="g")
    d = nn.Sequential([nn.Flatten(), nn.Dense(1), nn.Sigmoid()], name="d")
    cfg_a = gan.GanConfig(batch_size=8, noise_dim=4, acc_window=4)
    cfg_b = gan.GanConfig(batch_size=8, noise_dim=4, acc_window=16)
    state_a = gan.init_state(g, d, cfg_a, jax.random.PRNGKey(0), img)
    path = str(tmp_path / "adversarial.ckpt")
    checkpoint.save(path, state_a, meta={"epoch": 3})
    template_b = gan.init_state(g, d, cfg_b, jax.random.PRNGKey(1), img)
    restored, meta = checkpoint.load(
        path, template_b, lenient=("acc_buffer", "acc_count", "acc_index"))
    assert restored.acc_buffer.shape == (16,)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_filenames():
    assert checkpoint.v_filename(3, 32, 32) == "v_3x32x32.ckpt"
    assert checkpoint.g_pretrained_filename(3, 32, 32, 100) == \
        "g_pretrained_3x32x32_nd100.ckpt"


def test_grid_writer(tmp_path, rng):
    imgs = rng.rand(10, 16, 16, 3).astype(np.float32)
    grid = to_grid(imgs, epoch=123)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    p = save_grid(str(tmp_path / "g.png"), imgs, epoch=7)
    assert os.path.getsize(p) > 0
    # grayscale input
    g1 = to_grid(rng.rand(4, 8, 8, 1).astype(np.float32))
    assert g1.shape[-1] == 3


def test_epoch_stamp_changes_pixels(rng):
    imgs = np.ones((4, 16, 16, 3), np.float32) * 0.5
    a = to_grid(imgs, epoch=1)
    b = to_grid(imgs, epoch=888)
    assert (a != b).any()


def test_sanity_probes(rng):
    real = rng.rand(16, 16, 3).astype(np.float32)
    probes = sanity_probe_images(real)
    assert probes.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(probes[1], real)
    assert set(np.unique(probes[0])) == {0.0, 1.0}


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path, echo=False)
    log.log("epoch", epoch=1, loss_d=0.5)
    log.log("epoch", epoch=2, loss_d=0.4)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2 and lines[1]["epoch"] == 2


def test_confusion_summary_format():
    s = confusion_summary(10, 12, 3, 7)
    assert "accuracy" in s and "22/32" in s


def test_activation_grids(tmp_path, key, rng):
    from catgen import nn
    from catgen.io.activations import save_activation_grids
    from catgen.core.module import apply_with_intermediates
    import jax.numpy as jnp

    model = nn.Sequential([nn.Conv(8), nn.PReLU(), nn.MaxPool(2),
                           nn.Flatten(), nn.Dense(4)])
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    variables = model.init(key, x.shape)
    y, _, inters = apply_with_intermediates(model, variables, x)
    assert len(inters) == 5
    assert inters[0][1].shape == (2, 8, 8, 8)
    assert y.shape == (2, 4)
    files = save_activation_grids(model, variables, x, str(tmp_path / "act"))
    assert len(files) >= 4
    assert all(os.path.getsize(f) > 0 for f in files)


def test_legacy_std_checkpoint_migration(tmp_path):
    """Checkpoints written before the round-3 ST-D input-prefix restructure
    (flat 00_SpatialTransformer/01_Conv/02_PReLU, later indices +2) load
    transparently into the FusedSTConvPReLU tree (io/checkpoint.py
    _legacy_key)."""
    from catgen import models

    img = (32, 32, 3)
    g = models.create_G_decoder_upsampling32c(img, 8)
    d = models.create_D32_st3(img)
    config = gan.GanConfig(batch_size=4, noise_dim=8, acc_window=4)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(3), img)
    path = str(tmp_path / "adversarial.ckpt")
    checkpoint.save(path, state, meta={"epoch": 7})

    # rewrite the archive under the pre-round-3 key spellings: only the D
    # trees were renamed (the G tree never changed), so the legacy map is
    # applied to .d_* keys only
    with np.load(path) as z:
        legacy = {}
        for k in z.files:
            old = (checkpoint._legacy_key(k)
                   if k.startswith(".d_") else None)
            legacy[old if old is not None else k] = z[k]
    assert any("00_SpatialTransformer" in k for k in legacy), \
        "test setup: legacy rewrite produced no old-format signature"
    with open(path, "wb") as f:   # np.savez(str) would append ".npz"
        np.savez(f, **legacy)

    template = gan.init_state(g, d, config, jax.random.PRNGKey(9), img)
    restored, meta = checkpoint.load(path, template)
    assert meta.get("_migrated"), "expected migrated leaves"
    assert not meta.get("_reinitialized")
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a current-format archive must load without triggering migration
    checkpoint.save(path, state, meta={"epoch": 8})
    _, meta2 = checkpoint.load(path, template)
    assert "_migrated" not in meta2
