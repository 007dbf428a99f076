"""Resume a collapsed GAN run from its last healthy checkpoint.

Round-2/3 finding (QUALITY.md): long adversarial runs on the fixture
corpus collapse stochastically — but a collapse is an *event* on the
trajectory, not a property of the seed: the run was typically healthy 50
epochs earlier (the detector's epoch-500 grids show diverse cat faces for
runs that die at 650). This tool operationalizes restarts around that:

1. pick the last checkpoint saved BEFORE the collapse detector fired
   (``adversarial.ckpt`` — the abort path writes its degenerate state to
   ``adversarial_collapsed.ckpt`` so the rotation chain stays healthy);
2. resume it under a perturbed seed — the harness derives each epoch's
   randomness as ``fold_in(PRNGKey(seed), epoch)`` (train/harness.py), so
   a new seed is an entirely fresh noise/data continuation from the
   restored parameters and optimizer state;
3. train the remaining epochs with the detector live; on another
   collapse, retry with the next seed FROM THE FURTHEST healthy
   checkpoint reached by any attempt (a monotone ratchet toward the
   target epoch).

This is the automation the reference's workflow lacked — its showcase
grids were hand-picked survivors of many manual runs
(/root/reference/README.md:32-60).

    python tools/rescue.py runs/sweep3/ma0.95_s1 --to-epoch 750
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_meta(path):
    from catgen.io import checkpoint as ckpt
    return ckpt.load_meta(path)


def _terminal_suffix_start(flags, min_tail):
    """First epoch of the unbroken degenerate suffix of ``flags``
    ([(epoch, bad)]), or None if the suffix is shorter than ``min_tail``
    (a single noisy final observation must not disqualify a healthy
    checkpoint)."""
    if not flags:
        return None
    tail = 0
    for _, bad in reversed(flags):
        if not bad:
            break
        tail += 1
    if tail < min_tail:
        return None
    return flags[len(flags) - tail][0]


def death_onset(run_dir, min_tail=3, min_viz_tail=2):
    """First epoch of the terminal degenerate stretch in
    train_metrics.jsonl, or None if the recorded tail looks healthy.

    The collapse detector's ``fired_epoch`` LAGS the actual divergence:
    it ignores everything before ``min_epoch`` (60) and needs k
    consecutive hits, so a cadence checkpoint can predate the *firing*
    yet postdate the *death* — resuming it just replays the collapse.
    Observed on the 4k-corpus sweep: one-step divergence at epoch 29
    (loss_d 0.59 -> 5.9), detector fires at 70, the only pre-fire save
    (epoch 50) is already dead. This scans the metrics for the
    divergence itself, at both granularities:

    * epoch level: loss_g >= loss_g_hi (collapsed runs pin at 14-16;
      healthy transients peak ~4) or loss_d >= 2 with acc_d <= 0.6
      (D blown up / pinned at coin-flip);
    * viz level (the far_from_data/saturated/flat death modes have NO
      epoch-level signature — 4k-sweep seed 2 died with loss_d 0.70,
      acc_d 0.51-0.57 while nn_l2_ratio climbed through the threshold):
      nn_l2_ratio >= nn_ratio_hi, sample_sat > sat_threshold,
      sample_std < std_floor, or both probes pinned low.

    Returns the largest checkpoint meta epoch that is still safe to
    resume (viz-stream onsets are shifted by one to the epoch-record
    convention — see the inline note), or None if the recorded tail
    looks healthy. Thresholds come from CollapseConfig so the detector
    and this scan stay in lockstep."""
    from catgen.eval.collapse import CollapseConfig
    cfg = CollapseConfig()
    path = os.path.join(run_dir, "train_metrics.jsonl")
    if not os.path.exists(path):
        return None
    epochs, vizzes = [], []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("event") == "epoch" and "loss_d" in rec:
                bad = (rec.get("loss_g", 0.0) >= cfg.loss_g_hi
                       or (rec.get("loss_d", 0.0) >= 2.0
                           and rec.get("acc_d", 1.0) <= 0.6))
                epochs.append((rec["epoch"], bad))
            elif rec.get("event") == "viz":
                nn = rec.get("nn_l2_ratio")
                lo = 1 - cfg.probe_pin
                bad = ((nn is not None and nn >= cfg.nn_ratio_hi)
                       or rec.get("sample_sat", 0.0) > cfg.sat_threshold
                       or rec.get("sample_std", 1.0) < cfg.std_floor
                       or (rec.get("d_probe_pattern", 0.5) < lo
                           and rec.get("d_probe_real", 0.5) < lo))
                vizzes.append((rec["epoch"], bad))
    viz_onset = _terminal_suffix_start(vizzes, min_viz_tail)
    if viz_onset is not None:
        # Viz records are logged at the PRE-epoch pointer (harness logs
        # viz at int(state.epoch)), so a viz-level onset O describes
        # exactly the state a checkpoint with meta epoch O holds —
        # whereas an epoch record O describes the O-th *completed* epoch
        # (logged post-increment as int(state.epoch)-1). Normalize both
        # streams to "largest safe checkpoint meta epoch == onset" by
        # shifting viz onsets down one, so pick_source's single
        # ``ep > onset`` test is exact for either provenance. (Round-4
        # advisor finding: save_freq and vis_freq share multiples, so a
        # cadence save regularly lands ON the viz onset epoch and held
        # the already-degenerate state.)
        viz_onset -= 1
    onsets = [o for o in (_terminal_suffix_start(epochs, min_tail),
                          viz_onset)
              if o is not None]
    return min(onsets) if onsets else None


def pick_source(run_dir, explicit=None):
    """Newest checkpoint that strictly predates the collapse.

    The abort path saves the degenerate state to its own file
    (adversarial_collapsed.ckpt), so adversarial.ckpt/.old are ordinary
    cadence saves — but the newest cadence save can still postdate the
    collapse *onset*, so both are epoch-checked against the earlier of
    collapse.json's fired_epoch and the metrics-level ``death_onset``
    (the detector fires tens of epochs after the actual divergence).
    Legacy runs whose abort overwrote the rotation fail the same check
    and fall through to .old naturally."""
    if explicit:
        return explicit, load_meta(explicit)
    ck = os.path.join(run_dir, "adversarial.ckpt")
    fired = None
    cj = os.path.join(run_dir, "collapse.json")
    if os.path.exists(cj):
        fired = json.load(open(cj)).get("fired_epoch")
    onset = death_onset(run_dir)
    for cand in (ck, ck + ".old"):
        if os.path.exists(cand):
            meta = load_meta(cand)
            ep = meta.get("epoch", 0)  # next-epoch pointer: ep-1 done
            # fired_epoch check stays conservative (>=): the detector's
            # k-consecutive-hit window began before it fired. The onset
            # check is exact: onset IS the first degenerate epoch, so a
            # state with ep-1 < onset completed only healthy epochs.
            if fired is not None and ep >= fired:
                continue  # saved at/after the collapse — degenerate
            if onset is not None and ep > onset:
                continue  # postdates the metrics-level divergence
            return cand, meta
    raise SystemExit(
        f"[rescue] no pre-collapse checkpoint in {run_dir} "
        f"(detector fired at {fired}, metrics-level death onset at "
        f"{onset}; every snapshot post-dates the collapse). "
        f"Re-run with --saveFreq below the onset, or pass "
        f"--from explicitly.")


def train_cmd(meta, rescue_dir, network, seed, epochs_left, args):
    hc = meta.get("config", {})
    gc = meta.get("gan_config", {})
    cmd = [sys.executable, "-m", "catgen.cli.train",
           "--save", rescue_dir, "--network", network,
           "--seed", str(seed), "--epochs", str(epochs_left),
           "--collapseDetect",
           "--saveFreq", str(args.save_freq or hc.get("save_freq", 50)),
           "--visFreq", str(hc.get("vis_freq", 5)),
           "--scale", str(hc.get("scale", 32)),
           "--colorSpace", hc.get("colorspace", "rgb"),
           "--noiseDim", str(hc.get("noise_dim", 100)),
           "--N_epoch", str(hc.get("n_epoch", 1000)),
           "--G", hc.get("g_model", "default"),
           "--D", hc.get("d_model", "default"),
           "--batchSize", str(gc.get("batch_size", 32)),
           "--D_maxAcc", str(gc.get("d_max_acc", 1.01)),
           "--D_iterations", str(gc.get("d_iterations", 1)),
           "--G_iterations", str(gc.get("g_iterations", 1)),
           # the optimizer pipeline must continue exactly as trained —
           # gan_config meta carries every knob except compute_dtype
           # (deliberately not persisted; pass --dtype)
           "--D_optmethod", gc.get("d_optimizer", "adam"),
           "--G_optmethod", gc.get("g_optimizer", "adam"),
           "--D_sgd_lr", str(gc.get("d_sgd_lr", 0.02)),
           "--G_sgd_lr", str(gc.get("g_sgd_lr", 0.02)),
           "--D_sgd_momentum", str(gc.get("d_sgd_momentum", 0.0)),
           "--G_sgd_momentum", str(gc.get("g_sgd_momentum", 0.0)),
           "--D_L1", str(gc.get("d_l1", 0.0)),
           "--D_L2", str(gc.get("d_l2", 1e-4)),
           "--G_L1", str(gc.get("g_l1", 0.0)),
           "--G_L2", str(gc.get("g_l2", 0.0)),
           "--D_clamp", str(gc.get("d_clamp", 1.0)),
           "--G_clamp", str(gc.get("g_clamp", 5.0)),
           "--dtype", getattr(args, "dtype", "f32"),
           "--devices", str(hc.get("n_devices", 1)),
           "--platform", args.platform]
    if getattr(args, "dataset", None):
        cmd += ["--dataset"] + list(args.dataset)
    if gc.get("augment"):
        cmd.append("--augment")
    if gc.get("g_frozen_children"):
        cmd += ["--G_freeze", ",".join(gc["g_frozen_children"])]
    if hc.get("normalize"):
        cmd.append("--normalize")
    return cmd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--to-epoch", type=int, default=750,
                   help="target total epoch count (BASELINE operating "
                        "point, reference README.md:58-60)")
    p.add_argument("--attempts", type=int, default=3,
                   help="max restart attempts (next seed each time)")
    p.add_argument("--seed-base", type=int, default=0,
                   help="first rescue seed = original + 1000 + this")
    p.add_argument("--from", dest="from_ckpt", default="",
                   help="explicit checkpoint to resume from")
    p.add_argument("--save-freq", type=int, default=25,
                   help="checkpoint cadence during rescue (denser than "
                        "the sweep's 50 so the ratchet loses less on a "
                        "re-collapse)")
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"])
    p.add_argument("--dataset", nargs="*", default=None,
                   help="image dirs for the rescue run (REQUIRED when the "
                        "original run trained on --dataset rather than a "
                        "fixture dir — the corpus path is not recorded in "
                        "the checkpoint)")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="compute dtype for the rescue run (not persisted "
                        "in checkpoints; must match the original run — "
                        "f32 is cli.train's and the sweep's default)")
    args = p.parse_args(argv)

    run_dir = args.run_dir.rstrip("/")
    if not args.dataset and not os.path.isdir(
            os.path.join(run_dir, "fixture")):
        raise SystemExit(
            "[rescue] the original run has no fixture/ dir and no "
            "--dataset was given — refusing to rescue against a freshly "
            "synthesized toy corpus; pass --dataset <dirs> (the corpus "
            "path is not recorded in checkpoints)")
    src, meta = pick_source(run_dir, args.from_ckpt or None)
    base_seed = meta.get("config", {}).get("seed", 1)
    attempts_log = []

    for i in range(args.attempts):
        # checkpoint meta "epoch" is the harness's next-epoch pointer:
        # epoch E in the file means E-1 epochs completed
        completed = meta.get("epoch", 1) - 1
        left = args.to_epoch - completed
        if left <= 0:
            print(f"[rescue] source already has {completed} epochs >= "
                  f"{args.to_epoch}; nothing to do")
            break
        seed = base_seed + 1000 + args.seed_base + i
        rdir = os.path.join(run_dir, f"rescue_s{seed}")
        os.makedirs(rdir, exist_ok=True)
        # reuse the original corpus + V rater in the rescue dir
        fdst = os.path.join(rdir, "fixture")
        fsrc = os.path.join(run_dir, "fixture")
        if not os.path.isdir(fdst) and os.path.isdir(fsrc):
            try:
                os.symlink(os.path.abspath(fsrc), fdst)
            except OSError:
                shutil.copytree(fsrc, fdst)
        for f in os.listdir(run_dir):
            if f.startswith("v_") and f.endswith(".ckpt"):
                dst = os.path.join(rdir, f)
                if not os.path.exists(dst):
                    shutil.copy(os.path.join(run_dir, f), dst)

        cmd = train_cmd(meta, rdir, src, seed, left, args)
        print(f"[rescue] attempt {i + 1}/{args.attempts}: epoch {completed} "
              f"-> {args.to_epoch}, seed {seed}\n  {' '.join(cmd)}",
              flush=True)
        t0 = time.time()
        with open(os.path.join(rdir, "rescue.log"), "a") as log:
            rc = subprocess.run(cmd, stdout=log,
                                stderr=subprocess.STDOUT).returncode
        entry = {"attempt": i + 1, "seed": seed, "from_epoch": completed,
                 "source": src, "rc": rc,
                 "sec": round(time.time() - t0, 1)}
        if rc == 42:
            cj = json.load(open(os.path.join(rdir, "collapse.json")))
            entry.update(outcome="collapsed",
                         fired_epoch=cj.get("fired_epoch"),
                         reason=cj.get("reason"))
            # ratchet: continue from this attempt's newest PRE-COLLAPSE
            # rotation save if it got further than the current source.
            # pick_source applies the fired_epoch filter — a cadence save
            # written in the epoch the detector fired is degenerate and
            # must not be adopted (same guard as the initial source pick).
            try:
                src2, m2 = pick_source(rdir)
            except SystemExit:
                src2 = None
            if src2 is not None and \
                    m2.get("epoch", 0) > meta.get("epoch", 0):
                src, meta = src2, m2
                print(f"[rescue] ratchet: next attempt resumes from "
                      f"epoch {m2['epoch']}")
        elif rc == 0:
            entry["outcome"] = "completed"
        else:
            entry["outcome"] = f"error rc={rc}"
        attempts_log.append(entry)
        with open(os.path.join(run_dir, "rescue_result.json"), "w") as f:
            json.dump({"to_epoch": args.to_epoch,
                       "attempts": attempts_log}, f, indent=1)
        print(f"[rescue] attempt {i + 1}: {entry['outcome']}", flush=True)
        if rc == 0:
            report = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "report.py")
            subprocess.run([sys.executable, report, rdir])
            print(f"[rescue] SUCCESS: healthy epoch-{args.to_epoch} run in "
                  f"{rdir}")
            return 0
        if rc not in (0, 42):
            break
    print("[rescue] no attempt reached the target epoch "
          f"(details: {os.path.join(run_dir, 'rescue_result.json')})")
    return 1


if __name__ == "__main__":
    sys.exit(main())
