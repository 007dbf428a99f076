"""Compile the corpus-scale collapse A/B audit into one markdown table.

Reads sweep_results.json from each audit arm (runs/audit5/*) plus the two
main sweeps (runs/sweep4k = train-time augment ON, rescanned through the
FIXED detector; runs/sweep5 = the reference's exact no-augment recipe),
and prints collapse epochs per (arm x seed) with survivors marked — the
deliverable VERDICT r4 #2 asks for ("a table in QUALITY.md naming which
delta (if any) moves collapse onset").

    python tools/audit_table.py            # default arms
    python tools/audit_table.py dir1 dir2  # explicit sweep dirs
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def row_from_results(path):
    """-> {seed: 'ep NNN (reason)' | 'healthy @N' | '...'} from a
    seed_sweep results file."""
    out = {}
    if not os.path.exists(path):
        return out
    for r in json.load(open(path)):
        seed = r.get("seed")
        if r["outcome"] == "collapsed":
            cell = f"{r['fired_epoch']} ({r['reason'][:9]})"
            if r.get("rescued"):
                cell += " →rescued"
        elif r["outcome"] in ("completed", "survived-but-degenerate"):
            cell = ("**healthy 750**" if r["outcome"] == "completed"
                    else "degenerate@750")
        else:
            cell = f"err:{r.get('stage', '?')}"
        out[seed] = cell
    return out


def row_from_rescan(run_root, seeds):
    """Rescan raw trajectories through the CURRENT detector (for sweeps
    recorded under an older calibration, e.g. runs/sweep4k)."""
    from catgen.eval.collapse import scan_metrics
    out = {}
    for s in seeds:
        p = os.path.join(run_root, f"ma1.01_s{s}", "train_metrics.jsonl")
        if not os.path.exists(p):
            continue
        rep = scan_metrics(p)
        n = sum(1 for line in open(p) if '"event": "epoch"' in line)
        out[s] = (f"{rep['fired_epoch']} ({rep['reason'][:9]})"
                  if rep["collapsed"] else f"no fire thru {n}")
    return out


def main():
    arms = [
        ("augment ON (r4 recipe)", "rescan", "runs/sweep4k"),
        ("no augment (ref recipe)", "results",
         "runs/sweep5/sweep_results.json"),
        ("+ D gate 0.95", "results",
         "runs/audit5/gate095/sweep_results.json"),
        ("+ UpsampleConv=naive", "results",
         "runs/audit5/upnaive/sweep_results.json"),
        ("+ no G-BN advance in D", "results",
         "runs/audit5/nobnadv/sweep_results.json"),
        ("+ bf16 compute", "results",
         "runs/audit5/bf16/sweep_results.json"),
        # the reference's own documented stabilizer, README.md:122
        # ("You might have to add --D_iterations=2 to get good results")
        ("+ D_iterations=2", "results",
         "runs/audit5/d_iter2/sweep_results.json"),
        # Torch7's exact unclipped BCE (CATGEN_BCE=torch): the clip impl's
        # zero-gradient dead zone past |logit|>16.1 is the mode-B killer
        # (gan.py bce_torch/bce_clip docstrings, QUALITY.md round 5).
        # bcefix (v1) NaN'd at epoch 2 from the log1p(eps-p) f32 rounding
        # bug — kept in runs/ as the record; bcefix2 is the corrected
        # Torch operation order.
        ("+ BCE=torch (unclipped)", "results",
         "runs/audit5/bcefix2/sweep_results.json"),
        ("+ BCE=torch + D_iter=2", "results",
         "runs/audit5/bcefix_di2/sweep_results.json"),
    ]
    if len(sys.argv) > 1:
        arms = [(os.path.basename(d), "results",
                 os.path.join(d, "sweep_results.json"))
                for d in sys.argv[1:]]
    seeds = list(range(1, 7))
    print("| arm | " + " | ".join(f"seed {s}" for s in seeds) + " |")
    print("|---|" + "---|" * len(seeds))
    for label, kind, path in arms:
        cells = (row_from_rescan(path, seeds) if kind == "rescan"
                 else row_from_results(path))
        if not cells:
            continue
        print(f"| {label} | "
              + " | ".join(str(cells.get(s, "—")) for s in seeds) + " |")


if __name__ == "__main__":
    main()
