"""Seed-sweep harness for long-run quality evidence.

Round-2 finding (QUALITY.md): adversarial training on the fixture corpus
is a seed lottery — a large fraction of runs collapse with no code bug,
exactly the GAN-era instability the reference's README describes (its
showcase grids are picks from many runs, /root/reference/README.md:32-60).
This tool operationalizes that: it sweeps (seed x D_maxAcc x fixture)
configurations through the full reference recipe (train_v -> pretrain_g ->
train -> eval_quality), with the automated collapse detector
(catgen/eval/collapse.py, --collapseDetect) killing degenerate runs early,
and writes a convergence table.

The ``--D_maxAcc`` axis A/Bs the reference's own stabilizer for this
failure mode — the rolling-accuracy D gate (adversarial.lua:144-166),
which defaults to disabled (1.01) and was never exercised below that in
the round-2 sweep.

    python tools/seed_sweep.py --out runs/sweep3 --epochs 750 \
        --maxacc 1.01,0.95,0.9,0.8 --seeds 1,2,3 --fixture 1024

Results: <out>/sweep_results.json + a printed markdown table. Re-running
skips configurations that already have a recorded result (resumable).
V is trained once per fixture size and shared across runs (it does not
depend on the GAN seed); pretrain_g runs per-seed (it initializes G).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

# repo-root import bootstrap (python tools/x.py puts tools/ on
# sys.path, not the repo root; every in-process catgen import
# needs this — the bcefix3 sweep crashed post-run without it)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


TIMEOUT_RC = -1000  # sentinel: stage exceeded --stage-timeout


def run_cmd(args, log_path, timeout=None):
    timeout = timeout or run_cmd.default_timeout
    with open(log_path, "a") as log:
        log.write("\n+ " + " ".join(args) + "\n")
        log.flush()
        try:
            p = subprocess.run(args, stdout=log, stderr=subprocess.STDOUT,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            # subprocess.run kills the child before raising; record the
            # outcome instead of aborting the remaining sweep configs
            log.write(f"\n[sweep] stage timed out after {timeout}s\n")
            return TIMEOUT_RC
    return p.returncode


run_cmd.default_timeout = 7200


def module_cmd(mod, *args):
    return [sys.executable, "-m", mod] + [str(a) for a in args]


def data_args(args):
    """Corpus selector forwarded to every stage: --dataset <dirs> (a real
    or offline-generated JPEG corpus — the 4k+ quality fixture) wins over
    --fixture N (procedurally drawn toy corpus)."""
    if getattr(args, "dataset", None):
        return ["--dataset"] + list(args.dataset)
    return ["--fixture", str(args.fixture)]


def ensure_v(out_root, args, v_epochs, log, platform="auto"):
    """Shared V checkpoint per corpus (train_v.lua is a separate
    prerequisite stage in the reference too, README.md:101-127)."""
    tag = ("ds" if getattr(args, "dataset", None) else f"f{args.fixture}")
    vdir = os.path.join(out_root, f"_shared_v_{tag}")
    ck = os.path.join(vdir, "v_3x32x32.ckpt")
    if not os.path.exists(ck):
        os.makedirs(vdir, exist_ok=True)
        rc = run_cmd(module_cmd("catgen.cli.train_v", *data_args(args),
                                "--epochs", v_epochs, "--save", vdir,
                                "--platform", platform), log)
        if rc != 0:
            raise RuntimeError(f"shared V training failed (rc={rc}), "
                               f"see {log}")
    return vdir, ck


def run_config(out_root, cfg, shared_vdir, v_ckpt, args):
    name = f"ma{cfg['maxacc']}_s{cfg['seed']}"
    rdir = os.path.join(out_root, name)
    os.makedirs(rdir, exist_ok=True)
    log = os.path.join(rdir, "run.log")
    result = {"name": name, **cfg,
              "corpus": (args.dataset if getattr(args, "dataset", None)
                         else f"fixture:{args.fixture}")}
    if getattr(args, "train_extra", ""):
        result["train_extra"] = args.train_extra

    # same corpus for every run: reuse the shared dir's fixture images
    # (--dataset mode points every stage at the same external dirs)
    fdir = os.path.join(rdir, "fixture")
    shared_fix = os.path.join(shared_vdir, "fixture")
    if not getattr(args, "dataset", None) and not os.path.isdir(fdir) \
            and os.path.isdir(shared_fix):
        shutil.copytree(shared_fix, fdir)
    shutil.copy(v_ckpt, os.path.join(rdir, os.path.basename(v_ckpt)))

    t0 = time.time()
    rc = run_cmd(module_cmd("catgen.cli.pretrain_g", *data_args(args),
                            "--epochs", args.pretrain_epochs,
                            "--seed", cfg["seed"], "--save", rdir,
                            "--platform", args.platform), log)
    if rc != 0:
        result.update(outcome="error", stage="pretrain_g", rc=rc)
        return result

    train_args = [*data_args(args), "--epochs", args.epochs,
                  "--seed", cfg["seed"], "--D_maxAcc", cfg["maxacc"],
                  "--saveFreq", args.save_freq, "--visFreq", args.vis_freq,
                  "--collapseDetect", "--save", rdir,
                  "--platform", args.platform]
    if args.augment:
        train_args.append("--augment")
    train_args += (args.train_extra or "").split()
    rc = run_cmd(module_cmd("catgen.cli.train", *train_args), log)
    result["train_sec"] = round(time.time() - t0, 1)
    # one-command run report beside every outcome (tools/report.py)
    report = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "report.py")
    run_cmd([sys.executable, report, rdir], log)

    if rc == 42:
        rep = json.load(open(os.path.join(rdir, "collapse.json")))
        result.update(outcome="collapsed", reason=rep["reason"],
                      fired_epoch=rep["fired_epoch"])
        return result
    if rc != 0:
        result.update(outcome="error", stage="train", rc=rc)
        return result

    # survived the full schedule: retro-scan (detector false-negative
    # check) + quality report
    from catgen.eval.collapse import scan_metrics
    retro = scan_metrics(os.path.join(rdir, "train_metrics.jsonl"))
    result["retro_scan"] = {k: retro[k] for k in ("collapsed", "reason")}
    rc = run_cmd(module_cmd("catgen.cli.eval_quality", *data_args(args),
                            "--save", rdir,
                            "--platform", args.platform), log)
    if rc == 0:
        q = json.load(open(os.path.join(rdir, "quality_report.json")))
        result["quality"] = {
            "d_gen_mean": q["d_scores_generated"]["mean"],
            "d_real_mean": q["d_scores_real"]["mean"],
            "nn_l2_mean": q["nn_l2"]["mean"],
            "copy_fraction": q["nn_copy_fraction"],
            "per_pixel_std": q["diversity"]["mean_per_pixel_std"],
            "v_all": q.get("v_rating", {}).get("all"),
        }
    result["outcome"] = ("survived-but-degenerate"
                         if retro["collapsed"] else "completed")
    return result


def table(results):
    rows = ["| run | D_maxAcc | seed | outcome | detail | train s |",
            "|---|---|---|---|---|---|"]
    for r in results:
        if r["outcome"] == "collapsed":
            detail = f"{r['reason']} @ep{r['fired_epoch']}"
            if r.get("rescued"):
                detail += " → rescued"
        elif r["outcome"] == "error":
            detail = f"{r['stage']} rc={r['rc']}"
        else:
            q = r.get("quality", {})
            detail = (f"std={q.get('per_pixel_std', 0):.3f} "
                      f"Dg={q.get('d_gen_mean', 0):.2f}")
        rows.append(f"| {r['name']} | {r['maxacc']} | {r['seed']} | "
                    f"{r['outcome']} | {detail} | "
                    f"{r.get('train_sec', '-')} |")
    return "\n".join(rows)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/sweep")
    p.add_argument("--epochs", type=int, default=750)
    p.add_argument("--maxacc", default="1.01,0.95,0.9,0.8")
    p.add_argument("--seeds", default="1,2,3")
    p.add_argument("--fixture", type=int, default=1024)
    p.add_argument("--dataset", nargs="*", default=None,
                   help="JPEG corpus dirs (e.g. the offline pipeline's "
                        "out_aug_64x64 on a synthetic keypoint corpus); "
                        "overrides --fixture in every stage")
    p.add_argument("--v_epochs", type=int, default=30)
    p.add_argument("--pretrain_epochs", type=int, default=10)
    p.add_argument("--save_freq", type=int, default=50)
    p.add_argument("--vis_freq", type=int, default=5)
    # Default OFF to match the reference recipe exactly: train.lua has NO
    # train-time augmentation (its flag block, train.lua:15-49) — the 9x
    # augmentation is offline-only (generate_dataset.py:68-73). Round 4
    # defaulted this to True, double-augmenting the already-augmented
    # corpus in every corpus4k run (VERDICT r4 "missing #2").
    p.add_argument("--augment", action="store_true", default=False)
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="forwarded to every stage (cpu = smoke-test the "
                        "sweep machinery without a TPU)")
    p.add_argument("--train-extra", default="",
                   help="extra flags appended (whitespace-split) to every "
                        "train stage — A/B audit arms, e.g. "
                        "--train-extra='--no-G_bn_advance'; kernel-impl "
                        "arms set CATGEN_* env vars on the sweep process "
                        "instead")
    p.add_argument("--rescue", type=int, default=0,
                   help="after the sweep, give each collapsed config up "
                        "to N restart attempts from its last healthy "
                        "checkpoint (tools/rescue.py)")
    p.add_argument("--stage-timeout", type=int, default=7200,
                   help="per-stage wall-clock limit in seconds; a stage "
                        "that exceeds it is killed and recorded as "
                        "outcome=error rc=-1000 instead of aborting the "
                        "whole sweep (raise when the box is shared — "
                        "contention can 2x every stage)")
    args = p.parse_args(argv)
    run_cmd.default_timeout = args.stage_timeout

    os.makedirs(args.out, exist_ok=True)
    results_path = os.path.join(args.out, "sweep_results.json")
    results = (json.load(open(results_path))
               if os.path.exists(results_path) else [])
    # a stage timeout is transient (shared-box contention), not a final
    # outcome: drop those rows so a re-run with a larger --stage-timeout
    # actually retries them instead of skipping
    retry = {r["name"] for r in results
             if r.get("outcome") == "error" and r.get("rc") == TIMEOUT_RC}
    if retry:
        print(f"[sweep] retrying previously timed-out configs: "
              f"{sorted(retry)}")
        results = [r for r in results if r["name"] not in retry]
    done = {r["name"] for r in results}

    log = os.path.join(args.out, "sweep.log")
    vdir, v_ckpt = ensure_v(args.out, args, args.v_epochs, log,
                            args.platform)

    configs = [{"maxacc": ma, "seed": int(s)}
               for ma in args.maxacc.split(",")
               for s in args.seeds.split(",")]
    for cfg in configs:
        name = f"ma{cfg['maxacc']}_s{cfg['seed']}"
        if name in done:
            print(f"[sweep] {name}: already recorded, skipping")
            continue
        print(f"[sweep] {name}: running...", flush=True)
        r = run_config(args.out, cfg, vdir, v_ckpt, args)
        results.append(r)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[sweep] {name}: {r['outcome']} "
              f"({r.get('reason', '')} {r.get('train_sec', '')}s)",
              flush=True)

    # --rescue N: collapsed configs get up to N restart attempts from
    # their last healthy checkpoint under perturbed seeds (tools/rescue.py)
    if args.rescue > 0:
        rescue_tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "rescue.py")
        for r in results:
            if r["outcome"] != "collapsed" or "rescue" in r:
                continue
            rdir = os.path.join(args.out, r["name"])
            print(f"[sweep] rescuing {r['name']}...", flush=True)
            rescue_cmd = [sys.executable, rescue_tool, rdir,
                          "--to-epoch", str(args.epochs),
                          "--attempts", str(args.rescue),
                          "--platform", args.platform]
            if getattr(args, "dataset", None):
                # rescue.py refuses to run without the corpus when the
                # original run trained on --dataset (the path is not
                # recorded in checkpoints)
                rescue_cmd += ["--dataset"] + list(args.dataset)
            rc = run_cmd(rescue_cmd, log)
            rres = os.path.join(rdir, "rescue_result.json")
            r["rescue"] = (json.load(open(rres)) if os.path.exists(rres)
                           else {"rc": rc})
            r["rescued"] = rc == 0
            with open(results_path, "w") as f:
                json.dump(results, f, indent=1)
            print(f"[sweep] {r['name']}: rescue "
                  f"{'succeeded' if rc == 0 else 'failed'}", flush=True)

    print("\n" + table(results))
    n_ok = sum(r["outcome"] == "completed" for r in results)
    n_rescued = sum(r.get("rescued", False) for r in results)
    print(f"\n{n_ok}/{len(results)} runs completed healthy"
          + (f" (+{n_rescued} rescued to target)" if n_rescued else "")
          + f"; table + details in {results_path}")


if __name__ == "__main__":
    main()
