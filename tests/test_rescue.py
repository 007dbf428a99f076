"""tools/rescue.py: resume a collapsed run from its last healthy
checkpoint under a perturbed seed (the restart automation around the
collapse detector; reference workflow was manual re-runs,
/root/reference/README.md:32-60)."""

import importlib.util
import json
import os
import shutil
import subprocess
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "rescue", os.path.join(os.path.dirname(__file__), "..",
                           "tools", "rescue.py"))
rescue = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rescue)

REPO = os.path.join(os.path.dirname(__file__), "..")


def _tiny_run(tmp_path, epochs=2):
    """Real tiny GAN run with per-epoch checkpoints."""
    from catgen.data.fixture import write_fixture_dataset
    from catgen.data.loader import ImageDataset
    from catgen.train import gan
    from catgen.train.harness import GanHarness, HarnessConfig

    save = str(tmp_path / "run")
    fx = os.path.join(save, "fixture")
    write_fixture_dataset(fx, n=8)
    hc = HarnessConfig(save_dir=save, scale=16, n_epoch=16, epochs=epochs,
                       save_freq=1, vis_freq=10,
                       g_model="g16up", d_model="d16b")
    h = GanHarness(hc, gan.GanConfig(batch_size=8),
                   ImageDataset([fx], scale=16))
    h.train()
    return save


def test_pick_source_prefers_rotation_over_collapsed(tmp_path):
    save = _tiny_run(tmp_path)
    ck = os.path.join(save, "adversarial.ckpt")
    # abort-style artifacts: degenerate state in its own file
    shutil.copy(ck, os.path.join(save, "adversarial_collapsed.ckpt"))
    with open(os.path.join(save, "collapse.json"), "w") as f:
        json.dump({"collapsed": True, "reason": "saturated",
                   "fired_epoch": 4}, f)
    src, meta = rescue.pick_source(save)
    assert src == ck
    assert meta["epoch"] == 3  # next-epoch pointer: 2 epochs completed


def test_pick_source_legacy_falls_back_to_old(tmp_path):
    """Runs from before the split abort save: adversarial.ckpt itself was
    overwritten at the fired epoch; .old (earlier epoch) is the rescue
    point — and if even .old post-dates the firing, refuse."""
    save = _tiny_run(tmp_path)  # ckpt meta ep3 (2 done), .old meta ep2
    with open(os.path.join(save, "collapse.json"), "w") as f:
        json.dump({"collapsed": True, "reason": "probe_pinned",
                   "fired_epoch": 3}, f)
    src, meta = rescue.pick_source(save)
    assert src.endswith(".old") and meta["epoch"] == 2

    with open(os.path.join(save, "collapse.json"), "w") as f:
        json.dump({"collapsed": True, "reason": "probe_pinned",
                   "fired_epoch": 2}, f)
    with pytest.raises(SystemExit):
        rescue.pick_source(save)


def test_train_cmd_reconstructs_run_config():
    meta = {"epoch": 650,
            "config": {"save_freq": 50, "vis_freq": 5, "scale": 32,
                       "colorspace": "rgb", "noise_dim": 100,
                       "n_epoch": 1000, "g_model": "default",
                       "d_model": "default", "seed": 1,
                       "normalize": False},
            "gan_config": {"batch_size": 32, "d_max_acc": 0.95,
                           "d_iterations": 1, "g_iterations": 1,
                           "augment": True}}
    ns = type("A", (), {"save_freq": 25, "platform": "cpu"})()
    cmd = rescue.train_cmd(meta, "/tmp/rdir", "/tmp/src.ckpt", 1001, 100, ns)
    s = " ".join(cmd)
    assert "--D_maxAcc 0.95" in s and "--augment" in s
    # the optimizer pipeline is reconstructed from gan_config meta
    # (round-3 review fix: a rescue must not reset hypers to defaults)
    assert "--D_optmethod adam" in s and "--D_L2 0.0001" in s
    assert "--dtype f32" in s
    assert "--seed 1001" in s and "--epochs 100" in s
    assert "--network /tmp/src.ckpt" in s and "--saveFreq 25" in s


def test_rescue_end_to_end(tmp_path):
    """Collapsed tiny run -> rescue resumes from the healthy rotation
    save and completes the remaining epochs in a rescue dir."""
    save = _tiny_run(tmp_path)
    ck = os.path.join(save, "adversarial.ckpt")
    shutil.copy(ck, os.path.join(save, "adversarial_collapsed.ckpt"))
    with open(os.path.join(save, "collapse.json"), "w") as f:
        json.dump({"collapsed": True, "reason": "saturated",
                   "fired_epoch": 3}, f)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rescue.py"), save,
         "--to-epoch", "4", "--attempts", "1", "--platform", "cpu"],
        capture_output=True, text=True, timeout=600)
    assert rc.returncode == 0, rc.stdout + rc.stderr
    res = json.load(open(os.path.join(save, "rescue_result.json")))
    assert res["attempts"][0]["outcome"] == "completed"
    rdir = [d for d in os.listdir(save) if d.startswith("rescue_s")][0]
    rck = os.path.join(save, rdir, "adversarial.ckpt")
    from catgen.io import checkpoint as ckpt
    # source had 2 done (meta ep3); --to-epoch 4 -> 2 more -> meta ep5
    assert ckpt.load_meta(rck)["epoch"] == 5
    # fresh continuation: rescue seed = original + 1000
    assert ckpt.load_meta(rck)["config"]["seed"] == 1001


def _write_metrics(path, rows):
    with open(path, "w") as f:
        for ep, ld, lg, acc in rows:
            f.write(json.dumps({"event": "epoch", "epoch": ep,
                                "loss_d": ld, "loss_g": lg,
                                "acc_d": acc}) + "\n")


def test_death_onset_finds_divergence_before_detector(tmp_path):
    """The 4k-sweep signature: one-step divergence long before the
    detector's min_epoch — onset is the first epoch of the degenerate
    suffix, not the fired epoch."""
    run = tmp_path / "run"
    run.mkdir()
    rows = [(e, 0.5, 2.0, 0.8) for e in range(1, 29)]
    rows += [(e, 8.0, 15.0, 0.5) for e in range(29, 71)]
    _write_metrics(str(run / "train_metrics.jsonl"), rows)
    assert rescue.death_onset(str(run)) == 29


def test_death_onset_healthy_tail_and_noise(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    # healthy throughout -> None
    _write_metrics(str(run / "train_metrics.jsonl"),
                   [(e, 0.5, 2.0, 0.8) for e in range(1, 50)])
    assert rescue.death_onset(str(run)) is None
    # one noisy final epoch (shorter than min_tail) -> still None
    _write_metrics(str(run / "train_metrics.jsonl"),
                   [(e, 0.5, 2.0, 0.8) for e in range(1, 49)]
                   + [(49, 9.0, 15.0, 0.5)])
    assert rescue.death_onset(str(run)) is None
    # no metrics file at all -> None
    assert rescue.death_onset(str(tmp_path)) is None


def test_death_onset_viz_level_far_from_data(tmp_path):
    """4k-sweep seed 2's death mode has NO epoch-level signature (loss_d
    0.70, acc_d 0.51-0.57): only the viz events' nn_l2_ratio climbs
    through the threshold. The onset must come from the viz stream."""
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "train_metrics.jsonl", "w") as f:
        for e in range(1, 146):
            f.write(json.dumps({"event": "epoch", "epoch": e,
                                "loss_d": 0.70, "loss_g": 0.7,
                                "acc_d": 0.55}) + "\n")
            if e % 5 == 0:
                nn = 1.25 if e < 135 else 1.55
                f.write(json.dumps({"event": "viz", "epoch": e,
                                    "d_probe_pattern": 0.46,
                                    "d_probe_real": 0.50,
                                    "sample_sat": 0.04,
                                    "sample_std": 0.12,
                                    "nn_l2_ratio": nn}) + "\n")
    # first degenerate viz is logged at pointer 135, which is the state a
    # meta-epoch-135 checkpoint holds -> largest safe meta epoch is 134
    assert rescue.death_onset(str(run)) == 134
    # a single bad final viz (shorter than min_viz_tail) -> None
    with open(run / "train_metrics.jsonl", "w") as f:
        for e in range(1, 100):
            f.write(json.dumps({"event": "epoch", "epoch": e,
                                "loss_d": 0.70, "loss_g": 0.7,
                                "acc_d": 0.55}) + "\n")
            if e % 5 == 0:
                f.write(json.dumps({"event": "viz", "epoch": e,
                                    "d_probe_pattern": 0.46,
                                    "d_probe_real": 0.50,
                                    "sample_sat": 0.04,
                                    "sample_std": 0.12,
                                    "nn_l2_ratio":
                                        1.55 if e == 95 else 1.25})
                        + "\n")
    assert rescue.death_onset(str(run)) is None


def test_pick_source_applies_death_onset_cutoff(tmp_path):
    """A cadence save that predates the FIRING but postdates the DEATH
    must be rejected (resuming it replays the collapse)."""
    save = _tiny_run(tmp_path)  # ckpt meta ep3 (2 done), .old meta ep2
    with open(os.path.join(save, "collapse.json"), "w") as f:
        json.dump({"collapsed": True, "reason": "probe_pinned",
                   "fired_epoch": 70}, f)
    # metrics say the run died at epoch 2: only .old (meta ep2 = 1 done)
    # strictly predates the death
    rows = [(1, 0.5, 2.0, 0.8)] + [(e, 8.0, 15.0, 0.5) for e in (2, 3, 4)]
    _write_metrics(os.path.join(save, "train_metrics.jsonl"), rows)
    src, meta = rescue.pick_source(save)
    assert src.endswith(".old") and meta["epoch"] == 2


def test_pick_source_rejects_save_on_viz_onset_epoch(tmp_path):
    """Round-4 advisor finding: a viz record at epoch O is logged at the
    PRE-epoch pointer, so a cadence save with meta epoch == O holds the
    degenerate state the viz observed. save_freq and vis_freq share
    multiples, so this coincidence is the common case — the save must be
    rejected, falling back to .old."""
    save = _tiny_run(tmp_path)  # ckpt meta ep3 (2 done), .old meta ep2
    with open(os.path.join(save, "collapse.json"), "w") as f:
        json.dump({"collapsed": True, "reason": "far_from_data",
                   "fired_epoch": 70}, f)
    # healthy epoch stream; viz stream dies at pointer 3 == ckpt meta ep
    with open(os.path.join(save, "train_metrics.jsonl"), "w") as f:
        for e in range(1, 5):
            f.write(json.dumps({"event": "epoch", "epoch": e,
                                "loss_d": 0.7, "loss_g": 0.7,
                                "acc_d": 0.55}) + "\n")
            f.write(json.dumps({"event": "viz", "epoch": e,
                                "d_probe_pattern": 0.46,
                                "d_probe_real": 0.50,
                                "sample_sat": 0.04, "sample_std": 0.12,
                                "nn_l2_ratio": 1.25 if e < 3 else 1.9})
                    + "\n")
    assert rescue.death_onset(save) == 2  # largest safe meta epoch
    src, meta = rescue.pick_source(save)
    assert src.endswith(".old") and meta["epoch"] == 2
