"""Slim-checkpoint export for committed quality-evidence artifacts.

The full adversarial.ckpt carries both Adam moment sets (~3x the
parameter bytes). For the committed artifact trail (QUALITY.md) only the
model itself matters — samples, D-ranking, eval_quality and a
``--rebuildOptstate`` resume all work from params+state alone — so this
tool strips the optimizer subtrees (``.g_opt`` / ``.d_opt``) and writes
a checkpoint a third the size. The reference has the same concept:
``prepareNetworkForSave`` zeroes transient buffers before torch.save
(nn_utils.lua:415-451).

    python tools/slim_ckpt.py runs/rep750/ma1.01_s1/adversarial.ckpt \
        artifacts/corpus750/adversarial_slim.ckpt

Loading a slim checkpoint requires lenient opt-state handling, which the
harness's ``--rebuildOptstate`` path already provides.
"""

import io
import json
import os
import sys

import numpy as np

# repo-root bootstrap (python tools/x.py puts tools/ on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIP_PREFIXES = (".g_opt", ".d_opt", ".opt")


def slim(src: str, dst: str) -> dict:
    with np.load(src) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        keep = {k: z[k] for k in z.files
                if k != "__meta__" and not k.startswith(STRIP_PREFIXES)}
        dropped = len(z.files) - 1 - len(keep)
    meta["slim"] = True
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **keep)
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    with open(dst, "wb") as f:
        f.write(buf.getvalue())
    return {"kept": len(keep), "dropped": dropped,
            "bytes": os.path.getsize(dst)}


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    r = slim(src, dst)
    print(f"[slim_ckpt] {src} -> {dst}: kept {r['kept']} leaves, "
          f"dropped {r['dropped']} optimizer leaves, "
          f"{r['bytes'] / 1e6:.1f} MB")
