"""Collapse-detector tests (catgen/eval/collapse.py), driven by synthetic
event streams shaped like the round-2 trails: the healthy 500-epoch run
(acc_d 0.75-0.86, probes 0.23/1.0, sat ~0.005) and the collapsed runs
(acc_d -> 1.0 + loss_g pinned ~16, both probes pinned, sat ~0.48)."""

import json
import os

import numpy as np

from catgen.eval import collapse


def _feed_healthy(det, epochs=500, vis_freq=5):
    rng = np.random.RandomState(0)
    for e in range(1, epochs + 1):
        det.observe_epoch(e, 0.75 + 0.11 * rng.rand(), 0.8 + 3 * rng.rand())
        if e % vis_freq == 0:
            det.observe_viz(e, 0.23, 1.0, 0.005, 0.16)


def test_healthy_run_not_flagged():
    det = collapse.CollapseDetector()
    _feed_healthy(det)
    assert det.verdict is None


def test_healthy_transient_spike_not_flagged():
    # seed7 showed loss_g transients to ~4.2 with recovery; even a short
    # excursion above the thresholds must not fire without persistence
    det = collapse.CollapseDetector()
    for e in range(1, 200):
        if 100 <= e < 110:  # 10 < k_epochs=15 consecutive hits
            det.observe_epoch(e, 1.0, 14.0)
        else:
            det.observe_epoch(e, 0.8, 1.5)
    assert det.verdict is None


def test_d_runaway_fires():
    # the abA signature: acc_d 1.0, loss_g pinned at -log(eps) ~ 16
    det = collapse.CollapseDetector()
    for e in range(1, 120):
        acc, lg = (1.0, 16.1) if e >= 80 else (0.8, 1.2)
        det.observe_epoch(e, acc, lg)
    assert det.verdict == "d_runaway"
    assert det.fired_epoch == 80 + det.cfg.k_epochs - 1


def test_early_epochs_ignored():
    # epoch-1 degeneracy (identical samples, 0.5/0.5 probes) is normal
    det = collapse.CollapseDetector()
    for e in range(1, det.cfg.min_epoch):
        det.observe_epoch(e, 1.0, 16.1)
        det.observe_viz(e, 0.99, 0.99, 0.5, 0.001)
    assert det.verdict is None


def test_probe_pinned_fires_both_extremes():
    # pinned LOW fires on probes alone (unambiguous: D rates reals fake)
    det = collapse.CollapseDetector()
    for e in range(60, 90, 5):
        det.observe_viz(e, 0.0, 0.0, 0.01, 0.15)
    assert det.verdict == "probe_pinned"
    # pinned HIGH fires only with degenerate epoch-level acc_d (the
    # seed-4 death signature: D classifies everything as real)
    det = collapse.CollapseDetector()
    for e in range(60, 90, 5):
        det.observe_epoch(e, 0.50, 0.01)
        det.observe_viz(e, 1.0, 1.0, 0.01, 0.15)
    assert det.verdict == "probe_pinned"
    # pattern low / real high (the healthy direction) never fires
    det = collapse.CollapseDetector()
    for e in range(60, 200, 5):
        det.observe_viz(e, 0.01, 0.99, 0.01, 0.15)
    assert det.verdict is None


def test_probe_pinned_high_with_healthy_acc_not_flagged():
    """Round-4 4k-corpus seeds 2/3: probes pinned HIGH for many viz
    intervals while acc_d stayed 0.84-0.95 and nn/std were healthy — D
    rated the off-manifold sanity pattern as real but still separated
    reals from fakes. Must NOT fire (these were false-positive kills)."""
    det = collapse.CollapseDetector()
    for e in range(60, 400):
        det.observe_epoch(e, 0.89, 3.5)
        if e % 5 == 0:
            det.observe_viz(e, 1.0, 1.0, 0.025, 0.07, nn_ratio=1.25)
    assert det.verdict is None
    # without any epoch observations (no acc evidence), HIGH alone stays
    # conservative and does not fire either
    det2 = collapse.CollapseDetector()
    for e in range(60, 200, 5):
        det2.observe_viz(e, 1.0, 1.0, 0.025, 0.07)
    assert det2.verdict is None


def test_probe_pinned_mixed_direction_seed4_signature():
    """Round-4 seed 4: two HIGH hits WITH acc_d ~0.50/loss_g ~0 (D dead,
    everything rated real) then a LOW hit — all three corroborated, so the
    mixed-direction streak still fires."""
    det = collapse.CollapseDetector()
    for e in range(60, 175):
        det.observe_epoch(e, 0.93, 3.5)
        if e % 5 == 0:
            det.observe_viz(e, 0.2, 1.0, 0.02, 0.06, nn_ratio=1.2)
    for e, (pp, pr, acc, lg) in zip(
            (175, 180, 185),
            [(1.0, 1.0, 0.500, 0.0), (1.0, 1.0, 0.501, 0.01),
             (0.0, 0.0, 0.500, 0.0)]):
        det.observe_epoch(e, acc, lg)
        det.observe_viz(e, pp, pr, 0.03, 0.06, nn_ratio=1.2)
    assert det.verdict == "probe_pinned"
    assert det.fired_epoch == 185


def test_saturation_and_flat_fire():
    det = collapse.CollapseDetector()
    for e in range(60, 90, 5):
        det.observe_viz(e, 0.2, 0.9, 0.48, 0.3)   # blob collapse
    assert det.verdict == "saturated"
    det = collapse.CollapseDetector()
    for e in range(60, 90, 5):
        det.observe_viz(e, 0.2, 0.9, 0.0, 0.001)  # black/flat collapse
    assert det.verdict == "flat"


def test_stat_helpers():
    imgs = np.zeros((8, 4, 4, 3), np.float32)
    assert collapse.sat_fraction(imgs) == 1.0
    assert collapse.per_pixel_std(imgs) == 0.0
    imgs = np.random.RandomState(0).rand(64, 4, 4, 3).astype(np.float32) \
        * 0.8 + 0.1
    assert collapse.sat_fraction(imgs) == 0.0
    assert 0.15 < collapse.per_pixel_std(imgs) < 0.35


def test_scan_metrics_offline(tmp_path):
    p = str(tmp_path / "train_metrics.jsonl")
    with open(p, "w") as f:
        for e in range(1, 200):
            acc, lg = (1.0, 16.1) if e >= 100 else (0.8, 1.0)
            f.write(json.dumps({"event": "epoch", "epoch": e,
                                "acc_d": acc, "loss_g": lg}) + "\n")
    rep = collapse.scan_metrics(p)
    assert rep["collapsed"] and rep["reason"] == "d_runaway"

    q = str(tmp_path / "healthy.jsonl")
    with open(q, "w") as f:
        for e in range(1, 200):
            f.write(json.dumps({"event": "epoch", "epoch": e,
                                "acc_d": 0.8, "loss_g": 1.0}) + "\n")
            f.write(json.dumps({"event": "viz", "epoch": e,
                                "d_probe_pattern": 0.2,
                                "d_probe_real": 1.0,
                                "sample_sat": 0.01,
                                "sample_std": 0.16}) + "\n")
    rep = collapse.scan_metrics(q)
    assert not rep["collapsed"]


def test_harness_aborts_on_collapse(tmp_path):
    """End-to-end: a GanHarness with collapse_detect stops and writes
    collapse.json when the detector fires (fed synthetically here — real
    collapse needs hundreds of epochs)."""
    from catgen.data.fixture import write_fixture_dataset
    from catgen.data.loader import ImageDataset
    from catgen.train import gan
    from catgen.train.harness import GanHarness, HarnessConfig

    save = str(tmp_path / "logs")
    fx = str(tmp_path / "fixture")
    write_fixture_dataset(fx, n=8)
    hc = HarnessConfig(save_dir=save, scale=16, n_epoch=16, epochs=5,
                       g_model="g16up", d_model="d16b",
                       collapse_detect=True)
    h = GanHarness(hc, gan.GanConfig(batch_size=8),
                   ImageDataset([fx], scale=16))
    # pre-poison the detector as if a collapsed history had been observed
    for e in range(60, 60 + h.collapse.cfg.k_epochs):
        h.collapse.observe_epoch(e, 1.0, 16.1)
    status = h.train()
    assert status == "collapsed"
    rep = json.load(open(os.path.join(save, "collapse.json")))
    assert rep["reason"] == "d_runaway"
    # the degenerate state goes to its own file so the adversarial.ckpt
    # rotation chain keeps the last healthy snapshot for tools/rescue.py
    assert os.path.exists(os.path.join(save, "adversarial_collapsed.ckpt"))
    assert not os.path.exists(os.path.join(save, "adversarial.ckpt"))


def test_far_from_data_fires_on_blob_regime():
    """Round-3 sweep: blob collapse keeps probes/sat/std in-range for
    100+ epochs but nn_l2_ratio sits at 1.6+ (healthy: 1.18-1.25)."""
    det = collapse.CollapseDetector()
    for e in range(5, 400, 5):
        det.observe_viz(e, 0.3, 0.9, 0.02, 0.10, nn_ratio=1.7)
        if det.verdict:
            break
    assert det.verdict == "far_from_data"
    # warmup + persistence: earliest possible = nn_min_epoch + 2 hits
    assert det.fired_epoch == det.cfg.nn_min_epoch + 2 * 5


def test_far_from_data_healthy_and_warmup():
    det = collapse.CollapseDetector()
    # far during warmup only (early training is legitimately far)
    for e in range(5, 120, 5):
        det.observe_viz(e, 0.3, 0.9, 0.02, 0.16, nn_ratio=2.5)
    # then healthy ratios forever
    for e in range(120, 800, 5):
        det.observe_viz(e, 0.3, 0.9, 0.02, 0.16, nn_ratio=1.22)
    assert det.verdict is None
    # omitted ratio (old trails) is a no-op for this rule
    det2 = collapse.CollapseDetector()
    for e in range(5, 800, 5):
        det2.observe_viz(e, 0.3, 0.9, 0.02, 0.16, nn_ratio=None)
    assert det2.verdict is None


def test_scan_metrics_reads_nn_ratio(tmp_path):
    p = str(tmp_path / "blob.jsonl")
    with open(p, "w") as f:
        for e in range(1, 300):
            f.write(json.dumps({"event": "epoch", "epoch": e,
                                "acc_d": 0.8, "loss_g": 1.0}) + "\n")
            if e % 5 == 0:
                f.write(json.dumps({"event": "viz", "epoch": e,
                                    "d_probe_pattern": 0.3,
                                    "d_probe_real": 0.9,
                                    "sample_sat": 0.02,
                                    "sample_std": 0.10,
                                    "nn_l2_ratio": 1.8}) + "\n")
    rep = collapse.scan_metrics(p)
    assert rep["collapsed"] and rep["reason"] == "far_from_data"


def test_harness_acts_on_final_epoch_firing(tmp_path):
    """A detector firing during the FINAL epoch must still abort: the
    while loop's top-of-iteration verdict check never runs again, so
    train() re-checks after the loop before the final save (round-3
    review fix — previously the degenerate state was saved to
    adversarial.ckpt and the run reported 'completed')."""
    from catgen.data.fixture import write_fixture_dataset
    from catgen.data.loader import ImageDataset
    from catgen.train import gan
    from catgen.train.harness import GanHarness, HarnessConfig

    save = str(tmp_path / "logs")
    fx = str(tmp_path / "fixture")
    write_fixture_dataset(fx, n=8)
    hc = HarnessConfig(save_dir=save, scale=16, n_epoch=16, epochs=1,
                       g_model="g16up", d_model="d16b",
                       collapse_detect=True)
    h = GanHarness(hc, gan.GanConfig(batch_size=8),
                   ImageDataset([fx], scale=16))
    orig = h.run_epoch

    def run_and_fire():
        orig()
        # as if observe_epoch had fired inside this (last) epoch
        h.collapse.verdict = "d_runaway"
        h.collapse.fired_epoch = int(h.state.epoch)

    h.run_epoch = run_and_fire
    status = h.train()
    assert status == "collapsed"
    rep = json.load(open(os.path.join(save, "collapse.json")))
    assert rep["reason"] == "d_runaway"
    assert os.path.exists(os.path.join(save, "adversarial_collapsed.ckpt"))
    assert not os.path.exists(os.path.join(save, "adversarial.ckpt"))


# ---------------------------------------------------------------------------
# Trajectory regression suite (round-4 verdict #4): replay COMMITTED real
# run trajectories (gzipped train_metrics.jsonl under
# tests/data/trajectories/) through the detector. Healthy trails must never
# fire (precision); genuine deaths must fire with the recorded reason/epoch
# (recall). These pin the calibration: any threshold change that would have
# mis-killed a known-healthy run — like round 4's direction-blind
# probe_pinned rule that false-positive-killed corpus4k seeds 2/3 — fails
# here before it reaches a sweep.
# ---------------------------------------------------------------------------

TRAJ = os.path.join(os.path.dirname(__file__), "data", "trajectories")


def _scan(name):
    return collapse.scan_metrics(os.path.join(TRAJ, name))


def test_trajectory_healthy_longrun64b_never_fires():
    """400-epoch healthy 64px stage-wise run (runs/longrun64b, --G_freeze;
    QUALITY.md pyramid section) — zero firings."""
    rep = _scan("longrun64b_healthy400.jsonl.gz")
    assert not rep["collapsed"], rep


def test_trajectory_healthy_corpus4k_s3_never_fires():
    """Round-4 corpus4k seed 3: the old direction-blind probe_pinned rule
    false-positive-killed it at ep70 (runs/sweep4k/resume_queue.sh); after
    resume it trained to ep819 with healthy face grids
    (artifacts/sweep4k/s3_epochs). The full 819-epoch trail must produce
    zero firings — its probes pin HIGH while acc_d stays 0.65-0.95."""
    rep = _scan("corpus4k_s3_healthy819.jsonl.gz")
    assert not rep["collapsed"], rep


def test_trajectory_corpus4k_s2_fires_true_death_not_falsepos():
    """Round-4 corpus4k seed 2: false-positive-killed (probe_pinned HIGH,
    healthy acc_d) at ep95; resumed, then GENUINELY died — blob regime,
    nn_l2_ratio divergence — at ep145
    (artifacts/sweep4k/s2_falsepos/epoch_000145_true_far_from_data.png).
    The detector must stay silent through ep95 and fire far_from_data at
    the real death."""
    rep = _scan("corpus4k_s2_dies145.jsonl.gz")
    assert rep["collapsed"]
    assert rep["reason"] == "far_from_data"
    assert rep["fired_epoch"] == 145


def test_trajectory_corpus4k_s4_probe_pinned_true_positive():
    """Round-4 corpus4k seed 4 genuinely died ~ep175 (probes HIGH + acc_d
    at coin-flip — D classifying everything as real). The direction-aware
    probe_pinned rule must still catch THIS one (recall guard for the
    round-4 precision fix)."""
    rep = _scan("corpus4k_s4_dies185.jsonl.gz")
    assert rep["collapsed"]
    assert rep["reason"] == "probe_pinned"
    assert rep["fired_epoch"] == 185


def test_trajectory_longrun64_nofreeze_fires():
    """64px pyramid stage trained WITHOUT --G_freeze wrecks the pretrained
    32px core and diverges from the data manifold (QUALITY.md; the wrecked
    grids are committed in artifacts/longrun64/epochs/nofreeze_*). Must
    fire far_from_data."""
    rep = _scan("longrun64_nofreeze_dies220.jsonl.gz")
    assert rep["collapsed"]
    assert rep["reason"] == "far_from_data"
    assert rep["fired_epoch"] == 220


def test_trajectory_bcefix_s1_nan_fires_immediately():
    """The log1p(eps-p) BCE NaN'd at epoch 2 (runs/audit5/bcefix s1) and
    streamed 360+ NaN epochs with NO rule firing — every NaN comparison is
    False. The nan rule must fire on the first non-finite loss, before
    min_epoch."""
    rep = collapse.scan_metrics(
        os.path.join(TRAJ, "bcefix_s1_nan_ep2.jsonl.gz"))
    assert rep["collapsed"] and rep["reason"] == "nan"
    assert rep["fired_epoch"] == 2


def test_trajectory_rep750_s1_far_from_data_fires():
    """Round-5 replication attempt (runs/rep750/ma1.01_s1): the corpus4k
    seed-1 recipe that trained 750/750 healthy before the machine reset
    collapsed at ep165 on the post-reset recompile — same seed, same
    corpus, different XLA rounding — confirming trajectory divergence
    across compiles and the lottery surviving the logits criterion
    (QUALITY.md round 5). Grids show blob regime vs the healthy run's
    proto-faces at the same epoch; nn_l2_ratio 1.6-1.9 over three
    consecutive viz records while std/sat/probes stay in-band, so
    far_from_data is the ONLY rule that can catch it."""
    rep = _scan("rep750_s1_far165.jsonl.gz")
    assert rep["collapsed"]
    assert rep["reason"] == "far_from_data"
    assert rep["fired_epoch"] == 165
