"""tools/report.py — the one-command run report (display-server plot
parity, nn_utils.lua:168-182): renders a run dir's JSONL into one
self-contained HTML with charts, collapse banner, and grids."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

_spec = importlib.util.spec_from_file_location(
    "report", os.path.join(os.path.dirname(__file__), "..", "tools",
                           "report.py"))
report = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(report)


def _write_run(d, collapsed=False, epochs=200):
    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    rng = np.random.RandomState(0)
    with open(os.path.join(d, "train_metrics.jsonl"), "w") as f:
        f.write(json.dumps({"event": "setup", "g_params": 5191687,
                            "d_params": 6664777}) + "\n")
        for e in range(1, epochs + 1):
            bad = collapsed and e >= 100
            f.write(json.dumps({
                "event": "epoch", "epoch": e,
                "loss_d": 0.0 if bad else 0.5 + 0.1 * rng.rand(),
                "loss_g": 16.1 if bad else 1.0 + rng.rand(),
                "acc_d": 1.0 if bad else 0.8,
                "d_trained_frac": 1.0,
                "imgs_per_sec": 1500.0}) + "\n")
            if e % 5 == 0:
                f.write(json.dumps({
                    "event": "viz", "epoch": e,
                    "d_probe_pattern": 1.0 if bad else 0.2,
                    "d_probe_real": 1.0,
                    "sample_sat": 0.48 if bad else 0.01,
                    "sample_std": 0.16,
                    "v_rating_all": 0.9, "v_rating_good": 0.95,
                    "v_rating_bad": 0.85}) + "\n")
    for e in (5, 100, epochs):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(d, "images", f"epoch_{e:06d}.png"))


@pytest.mark.parametrize("collapsed", [False, True])
def test_report_renders(tmp_path, collapsed):
    d = str(tmp_path / ("bad" if collapsed else "good"))
    _write_run(d, collapsed=collapsed)
    out = str(tmp_path / "report.html")
    report.main([d, "-o", out])
    html = open(out).read()
    assert html.count('class="chart"') >= 5
    assert "<polyline" in html and "data:image/png;base64," in html
    assert "V rating" in html
    if collapsed:
        # saturated fires first in this stream (viz at ep 100/105/110 vs
        # d_runaway's 15-epoch persistence). The probes here pin HIGH
        # (1.0/1.0) with acc_d=1.0, which the direction-aware probe_pinned
        # rule deliberately ignores — pinned-HIGH only counts with
        # degenerate acc_d (round-4 false-positive fix, commit 33c5220).
        assert "collapse detected: saturated at epoch 110" in html
    else:
        assert "no collapse signature" in html


def test_report_quality_table(tmp_path):
    d = str(tmp_path / "q")
    _write_run(d)
    q = {"d_scores_generated": {"mean": 0.3,
                                "percentiles": {"50": 0.29}},
         "d_scores_real": {"mean": 0.7, "percentiles": {"50": 0.75}},
         "d_fooled_fraction": 0.16,
         "nn_l2": {"mean": 5.5, "percentiles": {"5": 4.0, "95": 7.4}},
         "nn_copy_fraction": 0.0,
         "diversity": {"mean_pairwise_l2": 12.8,
                       "mean_per_pixel_std": 0.162},
         "v_rating": {"all": 0.99, "best50_by_d": 1.0}}
    with open(os.path.join(d, "quality_report.json"), "w") as f:
        json.dump(q, f)
    html = report.build_report(d)
    assert "Quality report" in html
    assert "NN copy fraction" in html


def test_sweep_table_markdown():
    _spec2 = importlib.util.spec_from_file_location(
        "seed_sweep", os.path.join(os.path.dirname(__file__), "..",
                                   "tools", "seed_sweep.py"))
    sweep = importlib.util.module_from_spec(_spec2)
    _spec2.loader.exec_module(sweep)
    rows = sweep.table([
        {"name": "ma0.9_s1", "maxacc": "0.9", "seed": 1,
         "outcome": "collapsed", "reason": "d_runaway",
         "fired_epoch": 120, "train_sec": 200.0},
        {"name": "ma0.9_s2", "maxacc": "0.9", "seed": 2,
         "outcome": "completed", "train_sec": 900.0,
         "quality": {"per_pixel_std": 0.16, "d_gen_mean": 0.33}},
        {"name": "ma0.8_s1", "maxacc": "0.8", "seed": 1,
         "outcome": "error", "stage": "train", "rc": 1},
    ])
    assert "d_runaway @ep120" in rows
    assert "std=0.160" in rows
    assert "train rc=1" in rows


def test_sweep_stage_timeout_recorded(tmp_path):
    """A stage exceeding the timeout is killed and reported as the
    TIMEOUT_RC sentinel instead of raising out of the sweep (round-3
    review fix)."""
    import sys

    _spec2 = importlib.util.spec_from_file_location(
        "seed_sweep", os.path.join(os.path.dirname(__file__), "..",
                                   "tools", "seed_sweep.py"))
    sweep = importlib.util.module_from_spec(_spec2)
    _spec2.loader.exec_module(sweep)
    log = str(tmp_path / "log.txt")
    rc = sweep.run_cmd([sys.executable, "-c",
                        "import time; time.sleep(30)"], log, timeout=1)
    assert rc == sweep.TIMEOUT_RC
    assert "timed out" in open(log).read()
    # a fast command is unaffected
    assert sweep.run_cmd([sys.executable, "-c", "print('ok')"],
                         log, timeout=30) == 0


def test_report_watch_rerenders_on_change(tmp_path):
    """--watch (live-dashboard mode, nn_utils.lua:168-182 parity): the
    first poll renders, an unchanged run does NOT re-render, and a new
    metrics line triggers a re-render; the emitted HTML carries the
    <meta refresh> tag so a browser tab follows along."""
    d = str(tmp_path / "run")
    _write_run(d, epochs=10)
    out = str(tmp_path / "live.html")

    # interval=0 -> no sleeping between polls; bound with max_renders
    n = report.watch(d, out, interval=0, max_renders=1)
    assert n == 1
    html = open(out).read()
    assert "http-equiv='refresh'" in html

    # unchanged run: signature identical -> watch would spin without
    # rendering; assert via the signature primitive directly
    assert report._run_signature(d) == report._run_signature(d)

    # append an epoch line -> signature changes -> next poll re-renders
    sig0 = report._run_signature(d)
    with open(os.path.join(d, "train_metrics.jsonl"), "a") as f:
        f.write(json.dumps({"event": "epoch", "epoch": 11, "loss_d": 0.5,
                            "loss_g": 1.0, "acc_d": 0.8,
                            "d_trained_frac": 1.0,
                            "imgs_per_sec": 1500.0}) + "\n")
    assert report._run_signature(d) != sig0
    n = report.watch(d, out, interval=0, max_renders=1)
    assert n == 1
    assert "epoch" in open(out).read()
