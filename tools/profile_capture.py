"""jax.profiler trace capture around a train step (SURVEY.md §5.1: the
reference only prints epoch wall-clock; this is the op-level tracer).

    python tools/profile_capture.py --bs 256 --steps 5 --out /tmp/catgen_trace
    python tools/profile_capture.py --parse /tmp/catgen_trace   # per-op ms

View with TensorBoard or Perfetto (trace.json.gz inside the output dir),
or use --parse to aggregate the device lanes into per-op-group ms/step —
the honest per-component numbers (device-side tracing works through the
axon tunnel; wall-clock probes pay ~RTT/k per iteration, KERNELS.md).
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

IMG = (32, 32, 3)


def _find_trace(out_dir):
    cands = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not cands:
        raise FileNotFoundError(f"no *.trace.json.gz under {out_dir}")
    return cands[-1]


def _group(name: str) -> str:
    """Fold XLA op names into readable groups (fusion.1234 -> fusion)."""
    n = name.split("/")[-1]
    n = re.sub(r"[.\d]+$", "", n)
    return n or name


def parse_trace(out_dir: str, steps: int = 1, top: int = 40):
    """Aggregate device-lane op durations from the newest trace file.

    Returns {op_group: total_ms / steps} and prints a table. Device lanes
    are the processes whose thread name is 'XLA Ops' (TensorCore ops)."""
    path = _find_trace(out_dir)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map (pid, tid) -> thread name, pid -> process name
    tnames, pnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
            elif e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
    device_threads = {k for k, v in tnames.items() if "XLA Ops" in v}
    totals = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in device_threads:
            g = _group(e["name"])
            totals[g] += e.get("dur", 0) / 1000.0  # us -> ms
            count[g] += 1
    per_step = {k: v / steps for k, v in totals.items()}
    total = sum(per_step.values())
    print(f"trace: {path}")
    print(f"device op time: {total:.2f} ms/step over {steps} step(s)\n")
    print(f"{'op group':<46} {'ms/step':>9} {'count':>7}")
    for k in sorted(per_step, key=per_step.get, reverse=True)[:top]:
        print(f"{k:<46} {per_step[k]:>9.3f} {count[k] // steps:>7}")
    return per_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--scale", type=int, default=32, choices=(32, 64),
                   help="64 traces the Laplacian-style G64_stack vs D64 "
                        "step (BASELINE config #4)")
    p.add_argument("--out", default="/tmp/catgen_trace")
    p.add_argument("--parse", default=None, metavar="DIR",
                   help="skip capture; parse an existing trace dir")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    if args.parse:
        parse_trace(args.parse, steps=args.steps, top=args.top)
        return

    import jax
    import jax.numpy as jnp
    from catgen import models
    from catgen.train import gan

    config = gan.GanConfig(batch_size=args.bs, noise_dim=100,
                           acc_window=20, compute_dtype=jnp.bfloat16)
    if args.scale == 64:
        img = (64, 64, 3)
        g = models.G_REGISTRY["g64_stack"](img, 100)
        d = models.D_REGISTRY["d64"](img)
    else:
        img = IMG
        g = models.create_G_decoder_upsampling32c(IMG, 100)
        d = models.create_D32_st3(IMG)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), img)
    step = jax.jit(gan.make_train_step(g, d, config))
    reals = jnp.asarray(np.random.RandomState(0).rand(
        args.bs // 2, *img).astype(np.float32))

    # warm up / compile outside the trace
    state, m = step(state, reals, jax.random.PRNGKey(0))
    float(m.loss_d)

    try:
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                state, m = step(state, reals, jax.random.PRNGKey(1 + i))
            float(m.loss_d)  # fetch-sync inside the trace window
        print(f"trace written to {args.out}")
        parse_trace(args.out, steps=args.steps, top=args.top)
    except Exception as e:  # tunnel may not support device tracing
        print(f"profiler capture unavailable here: {e}")


if __name__ == "__main__":
    main()
