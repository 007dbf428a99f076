"""Stage-wise warm start for the 64px Laplacian stack.

``create_G64_stack`` (catgen/models/refine.py) composes
noise -> G32up-c -> RefineStage into one 64px generator. Training it
end-to-end from scratch replays the 32px GAN seed lottery at a harder
operating point (QUALITY.md; the first 4k-corpus 64px run died of
d_runaway at epoch 94) — but the pyramid framing the reference's README
uses (README.md:156-188, LAPGAN-style) trains stages SEPARATELY: the
coarse generator is already trained, and the refiner only has to learn a
bounded residual sharpening on top of its upsampled output.

This tool operationalizes that: it grafts a trained 32px G (from a run's
``adversarial.ckpt``) into the base subtree of a freshly initialized
G64_stack and writes the result through the pretrained-G pickup
mechanism (``g_pretrained_3x64x64_nd<N>.ckpt`` — the same filename-keyed
auto-load as train.lua:152-162, harness._maybe_pickup_pretrained_g), so

    python tools/stack64_warmstart.py --ckpt runs/X/adversarial.ckpt \
        --save runs/longrun64
    python -m catgen.cli.train --scale 64 --G g64_stack --D d64 \
        --save runs/longrun64 --dataset ... --collapseDetect

starts the 64px adversarial run from a generator that already draws
32px faces. The RefineStage head starts near-identity by construction
(out = clip(upsample(base) + 0.5*tanh(residual))), so the stack's epoch-0
samples are bilinear upsamples of the trained base's samples.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def graft_base(g64_vars, adv_npz, base_child="00_G32up_c"):
    """Replace the stack's base subtree with the 32px run's trained G.

    ``adv_npz``: mapping of flattened checkpoint keys -> arrays, as
    written by catgen.io.checkpoint.save on the harness TrainState
    (G leaves spelled ``.g_params[...]`` / ``.g_state[...]``).
    Asserts every base leaf is found at the matching shape."""
    import jax
    import numpy as np

    out = {"params": dict(g64_vars["params"]),
           "state": dict(g64_vars["state"])}
    for group, prefix in (("params", ".g_params"), ("state", ".g_state")):
        sub = g64_vars[group][base_child]
        leaves_with_path, treedef = \
            jax.tree_util.tree_flatten_with_path(sub)
        leaves = []
        for path, leaf in leaves_with_path:
            key = prefix + jax.tree_util.keystr(path)
            if key not in adv_npz:
                raise KeyError(
                    f"32px checkpoint is missing {key} — is its G the "
                    f"default 32px decoder (G32up-c)?")
            arr = np.asarray(adv_npz[key])
            if arr.shape != np.shape(leaf):
                raise ValueError(
                    f"{key}: checkpoint shape {arr.shape} != stack "
                    f"template {np.shape(leaf)}")
            leaves.append(arr.astype(np.asarray(leaf).dtype))
        out[group][base_child] = jax.tree_util.tree_unflatten(treedef,
                                                              leaves)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="32px adversarial.ckpt holding the trained base G")
    p.add_argument("--save", required=True,
                   help="64px run dir; the warm start is written there "
                        "under the pretrained-pickup filename")
    p.add_argument("--seed", type=int, default=1,
                   help="init seed for the RefineStage weights")
    args = p.parse_args(argv)

    # the tool only builds tiny init tensors — keep it off the TPU
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from catgen import models
    from catgen.io import checkpoint as ckpt

    meta = ckpt.load_meta(args.ckpt)
    cfg = meta.get("config", {})
    if cfg.get("scale", 32) != 32:
        raise SystemExit(f"[warmstart] source must be a 32px run "
                         f"(got scale={cfg.get('scale')})")
    noise_dim = cfg.get("noise_dim", 100)
    channels = 1 if cfg.get("colorspace") == "y" else 3

    g64 = models.G_REGISTRY["g64_stack"]((64, 64, channels), noise_dim)
    g64_vars = g64.init(jax.random.PRNGKey(args.seed),
                        (1, noise_dim))
    with np.load(args.ckpt) as z:
        adv = {k: z[k] for k in z.files if k.startswith(".g_")}
    grafted = graft_base(g64_vars, adv)

    out = os.path.join(args.save, ckpt.g_pretrained_filename(
        channels, 64, 64, noise_dim))
    os.makedirs(args.save, exist_ok=True)
    ckpt.save(out, grafted, {
        "epoch": meta.get("epoch", 0),
        "warmstart_source": os.path.abspath(args.ckpt),
        "warmstart_source_epoch": meta.get("epoch"),
        "warmstart_seed": args.seed,
    })
    n_base = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(
        grafted["params"]["00_G32up_c"]))
    n_all = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(
        grafted["params"]))
    print(f"[warmstart] wrote {out}")
    print(f"[warmstart] base (grafted from epoch "
          f"{meta.get('epoch')}): {n_base} params; "
          f"refiner (fresh, seed {args.seed}): {n_all - n_base} params")
    return 0


if __name__ == "__main__":
    sys.exit(main())
