"""Quality-parity evaluation CLI — computes the BASELINE.md quality
statistics (D-score distribution, NN 2-norm distribution, diversity,
V-rating) for a trained adversarial checkpoint and writes
``<save>/quality_report.json``.

    python -m catgen.cli.eval_quality --save logs
    python -m catgen.cli.eval_quality --save logs --network logs/adversarial.ckpt

The checkpoint's own metadata (harness + gan config) reconstructs the model
pair, so the command needs no model flags. Reference artifacts matched:
sample.lua:78-151 (D-ranked grids + NN search), README.md:32-60 (epoch
690/750 showcase results).
"""

from __future__ import annotations

import argparse
import json
import os

from catgen.cli.common import (add_common_args, add_dataset_args,
                               apply_platform, build_dataset)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_dataset_args(p)
    p.add_argument("--network", default="",
                   help="checkpoint to evaluate (default <save>/adversarial.ckpt)")
    p.add_argument("--samples", type=int, default=1024,
                   help="generated sample count (sample.lua uses 1024)")
    p.add_argument("--out", default="",
                   help="report path (default <save>/quality_report.json)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)

    import jax

    from catgen import models
    from catgen.eval.quality import quality_report, summarize
    from catgen.io import checkpoint as ckpt
    from catgen.train import gan

    path = args.network or os.path.join(args.save,
                                        ckpt.adversarial_filename())
    meta = ckpt.load_meta(path)
    hc = meta.get("config", {})
    gc_meta = meta.get("gan_config", {})
    scale = int(hc.get("scale", args.scale))
    colorspace = hc.get("colorspace", args.colorSpace)
    noise_dim = int(hc.get("noise_dim", args.noiseDim))
    from catgen.data import color as colorlib
    image_shape = (scale, scale, colorlib.channels(colorspace))

    g = models.G_REGISTRY[hc.get("g_model", "default")](image_shape,
                                                        noise_dim)
    d = models.D_REGISTRY[hc.get("d_model", "default")](image_shape)
    config = gan.GanConfig(
        batch_size=int(gc_meta.get("batch_size", 32)),
        noise_dim=noise_dim,
        acc_window=int(gc_meta.get("acc_window", 20)))
    template = gan.ckpt_template(g, d, config, jax.random.PRNGKey(0),
                                 image_shape)
    state, _ = ckpt.load(path, template)
    g_vars = {"params": state.g_params, "state": state.g_state}
    d_vars = {"params": state.d_params, "state": state.d_state}

    # corpus at the checkpoint's scale/colorspace (NN reference set),
    # ALWAYS loaded in [0,1]: the NN/copy stats compare against sigmoid
    # [0,1] G samples. A --normalize-trained D saw reals in [-1,1], so
    # that flag (restored from the checkpoint like scale/colorspace) is
    # passed to quality_report, which remaps the corpus only for the
    # D real-score pass.
    args.scale, args.colorSpace = scale, colorspace
    args.normalize = False
    normalized_inputs = bool(hc.get("normalize", False))
    dataset = build_dataset(args, create_fixture=False)
    corpus = dataset.load_images(0, len(dataset))

    # V checkpoint, if trained (pseudo-validation score)
    v = v_vars = None
    h, w, c = image_shape
    v_path = os.path.join(args.save, ckpt.v_filename(c, h, w))
    if os.path.exists(v_path):
        v = models.V_REGISTRY[hc.get("v_model", "default")](image_shape)
        v_tmpl = v.init(jax.random.PRNGKey(0), (1,) + image_shape)
        v_vars, _ = ckpt.load(v_path, v_tmpl)

    report = quality_report(g, d, g_vars, d_vars, corpus,
                            noise_dim=noise_dim, n_samples=args.samples,
                            seed=args.seed, v=v, v_vars=v_vars,
                            normalized_inputs=normalized_inputs)
    report["checkpoint"] = path
    report["epoch"] = int(meta.get("epoch", -1))

    out = args.out or os.path.join(args.save, "quality_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[eval_quality] epoch {report['epoch']} -> {out}")
    print(summarize(report))
    return report


if __name__ == "__main__":
    main()
