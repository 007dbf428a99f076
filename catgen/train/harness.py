"""Training harnesses: the orchestration layer the reference spreads over
train.lua / train_v.lua / pretrain_g.lua main() + epoch loops.

Each harness owns: dataset wiring, model construction, (DP) step
compilation, the epoch loop with per-epoch visual artifacts (grids with the
epoch stamp, sanity probes, NaN checks), metrics, checkpoint save/resume
with the reference's cadence and filename conventions, and the V-rating
pseudo-validation curve.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from catgen import dist, models
from catgen.core.module import param_count
from catgen.data import color as colorlib
from catgen.data.loader import ImageDataset
from catgen.io import checkpoint as ckpt
from catgen.io.grids import save_grid
from catgen.io.metrics import MetricsLogger, confusion_summary
from catgen.train import gan, pretrainer, synthetic, v_trainer


@dataclasses.dataclass
class HarnessConfig:
    """Shared harness knobs (the common part of the reference flag blocks,
    SURVEY.md §5.6)."""
    save_dir: str = "logs"
    save_freq: int = 30
    n_epoch: int = 1000           # examples per epoch (train.lua:27)
    scale: int = 32
    colorspace: str = "rgb"
    noise_dim: int = 100
    seed: int = 1
    n_devices: int = 1            # DP mesh size (1 = single chip)
    g_model: str = "default"
    d_model: str = "default"
    v_model: str = "default"
    epochs: Optional[int] = None  # None = run forever (train.lua:223)
    weights_vis_freq: int = 0     # --weightsVisFreq equivalent (train.lua:46)
    vis_freq: int = 1             # write grids/probes every N epochs — the
                                  # reference's --noplot spirit (train.lua:24)
                                  # for hosts where per-epoch PNG writing
                                  # dominates the fast TPU epoch
    normalize: bool = False       # [-1,1] input remap; persists
                                  # normalize_mean/std in the checkpoint
                                  # (train.lua:51,209-227,260)
    collapse_detect: bool = False # watch for GAN collapse (eval/collapse
                                  # signals) and stop the run when it fires
                                  # — the automation the reference's
                                  # eyeball-the-grids workflow lacked

    @property
    def image_shape(self):
        return (self.scale, self.scale, colorlib.channels(self.colorspace))


def _acc_window(n_epoch: int, batch_size: int) -> int:
    """train.lua:238: max(20, min(N_epoch/batchSize, 250))."""
    return int(max(20, min(n_epoch / batch_size, 250)))


class GanHarness:
    """th train.lua equivalent (SURVEY.md §3.1)."""

    def __init__(self, hc: HarnessConfig, gc: gan.GanConfig,
                 dataset: ImageDataset,
                 logger: Optional[MetricsLogger] = None):
        self.hc = hc
        axis = dist.DATA_AXIS if hc.n_devices > 1 else None
        self.gc = dataclasses.replace(
            gc, noise_dim=hc.noise_dim, axis_name=axis,
            acc_window=_acc_window(hc.n_epoch, gc.batch_size))
        self.dataset = dataset
        self.logger = logger or MetricsLogger(
            os.path.join(hc.save_dir, "train_metrics.jsonl"))
        self.g = models.G_REGISTRY[hc.g_model](hc.image_shape, hc.noise_dim,
                                               axis_name=axis)
        self.d = models.D_REGISTRY[hc.d_model](hc.image_shape, axis_name=axis)
        self.mesh = dist.make_mesh(hc.n_devices) if hc.n_devices > 1 else None

        key = jax.random.PRNGKey(hc.seed)
        self.state = gan.init_state(self.g, self.d, self.gc, key,
                                    hc.image_shape)
        self._maybe_pickup_pretrained_g()
        if self.mesh is not None:
            self.state = dist.replicate(self.state, self.mesh)
            self.epoch_fn = dist.make_dp_train_epoch(
                self.g, self.d, self.gc, self.mesh,
                image_shape=hc.image_shape)
        else:
            self.epoch_fn = jax.jit(gan.make_train_epoch(
                self.g, self.d, self.gc, image_shape=hc.image_shape))
        # both paths stage FLAT reals (tile-padding of C=3 NHWC epoch
        # tensors costs 42x HBM per shard; gan.make_train_epoch)
        # V is inference-only inside the GAN loop (train.lua:119-123)
        self.v = None
        self.v_vars = None
        self._load_v()
        # fixed visualization noise (train.lua VIS_NOISE_INPUTS)
        self.vis_noise = gan.uniform_noise(
            jax.random.PRNGKey(hc.seed + 1), 100, hc.noise_dim)
        # V-rating history, persisted in the checkpoint like the
        # reference's PLOT_DATA (train.lua:260)
        self.plot_data = []
        if hc.collapse_detect:
            from catgen.eval.collapse import CollapseDetector
            self.collapse = CollapseDetector()
        else:
            self.collapse = None
        self.logger.log("setup", g_params=param_count(self.state.g_params),
                        d_params=param_count(self.state.d_params),
                        acc_window=self.gc.acc_window,
                        n_devices=hc.n_devices)

    # -- checkpoint plumbing ------------------------------------------

    def _ckpt_path(self) -> str:
        return os.path.join(self.hc.save_dir, ckpt.adversarial_filename())

    def _maybe_pickup_pretrained_g(self):
        """train.lua:152-162: if a pretrained decoder exists under the
        save dir (filename-keyed), load it into G."""
        h, w, c = self.hc.image_shape
        path = os.path.join(self.hc.save_dir,
                            ckpt.g_pretrained_filename(c, h, w,
                                                       self.hc.noise_dim))
        if not os.path.exists(path):
            return
        template = {"params": self.state.g_params, "state": self.state.g_state}
        g_vars, meta = ckpt.load(path, template)
        self.state = self.state._replace(g_params=g_vars["params"],
                                         g_state=g_vars["state"])
        self.logger.log("pretrained_g_loaded", path=path,
                        epoch=meta.get("epoch"))

    def _load_v(self):
        h, w, c = self.hc.image_shape
        path = os.path.join(self.hc.save_dir, ckpt.v_filename(c, h, w))
        if not os.path.exists(path):
            self.logger.log("v_missing", path=path)
            return
        self.v = models.V_REGISTRY[self.hc.v_model](self.hc.image_shape)
        variables = self.v.init(jax.random.PRNGKey(0),
                                (1,) + self.hc.image_shape)
        self.v_vars, _ = ckpt.load(path, variables)
        self.logger.log("v_loaded", path=path)

    def save(self, path: Optional[str] = None):
        # normalize_mean/std checkpoint fields (train.lua:260): the active
        # reference path is a fixed [0,1]->[-1,1] remap whose
        # nn_utils.normalize returns the 0.5/0.5 dummy pair
        # (nn_utils.lua:410-411); None when normalization is off
        norm = 0.5 if self.hc.normalize else None
        meta = {"epoch": int(self.state.epoch),
                "plot_data": self.plot_data,
                "normalize_mean": norm, "normalize_std": norm,
                "config": dataclasses.asdict(self.hc),
                "gan_config": {k: v for k, v in
                               dataclasses.asdict(self.gc).items()
                               if not callable(v) and k != "compute_dtype"}}
        path = path or self._ckpt_path()
        # checkpoints keep the per-leaf optimizer-state format regardless
        # of the in-step representation (CATGEN_FLAT_OPT): flat states
        # unravel here, so files stay interchangeable across the knob
        ckpt.save(path, self._with_tree_opt(self.state), meta)
        self.logger.log("checkpoint_saved", path=path,
                        epoch=int(self.state.epoch))

    @staticmethod
    def _with_tree_opt(state):
        from catgen import optim
        return state._replace(
            g_opt=optim.opt_state_to_tree(state.g_opt, state.g_params),
            d_opt=optim.opt_state_to_tree(state.d_opt, state.d_params))

    @staticmethod
    def _with_runtime_opt(state):
        """Convert per-leaf opt state to the active step representation."""
        from catgen import optim
        from catgen.kernels import config as kconfig
        if kconfig.resolve_flat_opt() != "flat":
            return state
        return state._replace(
            g_opt=optim.opt_state_to_flat(state.g_opt),
            d_opt=optim.opt_state_to_flat(state.d_opt))

    def resume(self, path: Optional[str] = None,
               rebuild_optstate: bool = False):
        """train.lua:127-142 (+ --rebuildOptstate, train.lua:44,191).

        Gate-buffer leaves load leniently: a checkpoint saved with a
        different ``acc_window`` (batch-size- or N_epoch-derived) re-inits
        the rolling-accuracy window with a warning instead of failing —
        the model/optimizer state is what matters for resume."""
        path = path or self._ckpt_path()
        lenient = ("acc_buffer", "acc_count", "acc_index")
        if rebuild_optstate:
            lenient += ("g_opt", "d_opt")
        restored, meta = ckpt.load(path, self._with_tree_opt(self.state),
                                   lenient=lenient)
        restored = self._with_runtime_opt(restored)
        self.plot_data = list(meta.get("plot_data", []))
        if rebuild_optstate:
            from catgen.kernels import config as kconfig
            d_optim, g_optim = self.gc.make_optimizers()
            if kconfig.resolve_flat_opt() == "flat":
                from catgen import optim
                restored = restored._replace(
                    g_opt=optim.flat_init(g_optim, restored.g_params),
                    d_opt=optim.flat_init(d_optim, restored.d_params))
            else:
                restored = restored._replace(
                    g_opt=g_optim.init(restored.g_params),
                    d_opt=d_optim.init(restored.d_params))
        if meta.get("_reinitialized"):
            self.logger.log("resume_reinit", leaves=meta["_reinitialized"])
        self.state = restored
        if self.mesh is not None:
            self.state = dist.replicate(self.state, self.mesh)
        self.logger.log("resumed", path=path, epoch=int(self.state.epoch))

    # -- epoch loop ----------------------------------------------------

    def _epoch_reals(self) -> jax.Array:
        half = self.gc.batch_size // 2 * max(self.hc.n_devices, 1)
        batches = self.dataset.epoch_batches(self.hc.n_epoch, half,
                                             self.gc.d_iterations)
        batches = batches.reshape(batches.shape[:2] + (-1,))  # flat staging
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batches = jax.device_put(
                batches, NamedSharding(self.mesh,
                                       P(None, dist.DATA_AXIS, None)))
        return batches

    def run_epoch(self) -> dict:
        t0 = time.time()
        batches = self._epoch_reals()
        rng = jax.random.fold_in(jax.random.PRNGKey(self.hc.seed),
                                 int(self.state.epoch))
        self.state, metrics = self.epoch_fn(self.state, batches, rng)
        # ONE device->host fetch for every epoch scalar, and the timing
        # stops only after it: through the axon tunnel block_until_ready
        # returns before device execution finishes, so a fetch is the only
        # true synchronization point (CLAUDE.md / KERNELS.md "Timing
        # honesty") — and each extra fetch pays a tunnel RTT
        (loss_d, loss_g, acc_d, d_trained, tp, tn, fp, fn) = (
            jax.device_get((jnp.mean(metrics.loss_d),
                            jnp.mean(metrics.loss_g),
                            jnp.mean(metrics.acc_d),
                            jnp.mean(metrics.d_trained),
                            jnp.sum(metrics.tp_real),
                            jnp.sum(metrics.tn_fake),
                            jnp.sum(metrics.fp),
                            jnp.sum(metrics.fn))))
        dt = time.time() - t0
        nb = batches.shape[0]
        n_seen = nb * batches.shape[1]
        summary = {
            "epoch": int(self.state.epoch) - 1,
            "loss_d": float(loss_d),
            "loss_g": float(loss_g),
            "acc_d": float(acc_d),
            "d_trained_frac": float(d_trained),
            "sec": round(dt, 3),
            "ms_per_sample": round(1000 * dt / max(n_seen, 1), 4),
            "imgs_per_sec": round(n_seen / dt, 1),
        }
        self.logger.log("epoch", **summary)
        print(confusion_summary(int(tp), int(tn), int(fp), int(fn)))
        if self.collapse is not None:
            self.collapse.observe_epoch(summary["epoch"], summary["acc_d"],
                                        summary["loss_g"])
        return summary

    def _viz_fn(self):
        """One jitted program for ALL the viz device work (G samples, D
        ranking, RGB conversions, sanity probes, V ratings) fetched with a
        single device->host transfer — the previous one-op-at-a-time
        formulation paid ~10 tunnel round trips per viz, costing ~10x the
        training epoch it decorates (KERNELS.md "Timing honesty")."""
        if getattr(self, "_viz_jit", None) is not None:
            return self._viz_jit
        g, d, v = self.g, self.d, self.v
        colorspace = self.hc.colorspace
        normalize = self.hc.normalize

        def fn(g_params, g_state, d_params, d_state, v_vars, noise, reals,
               corpus):
            imgs, _ = g.apply({"params": g_params, "state": g_state},
                              noise, train=False)
            scores, _ = d.apply({"params": d_params, "state": d_state},
                                imgs, train=False)
            order = jnp.argsort(-scores[:, 0])
            rgb = colorlib.colorspace_to_rgb(imgs, colorspace)
            disp = colorlib.denormalize(reals) if normalize else reals
            rgb_reals = colorlib.colorspace_to_rgb(disp, colorspace)
            # sanity probes in-graph (nn_utils.lua:136-160): diagonal
            # pattern D should dislike + the first real it should like
            h, wd = reals.shape[1], reals.shape[2]
            pat = ((jnp.arange(h)[:, None] + jnp.arange(wd)[None, :])
                   % 4 < 2).astype(imgs.dtype)
            pat = jnp.broadcast_to(pat[..., None], reals.shape[1:])
            probes = jnp.stack([pat, reals[0].astype(imgs.dtype)])
            pscores, _ = d.apply({"params": d_params, "state": d_state},
                                 probes, train=False)
            out = {"imgs": imgs, "order": order, "rgb": rgb,
                   "rgb_reals": rgb_reals, "probe_scores": pscores[:, 0]}
            # blob-collapse signal: mean NN distance of the samples to the
            # training manifold, in display space (eval/collapse.py
            # far_from_data; probes/saturation miss the blob regime)
            cdisp = colorlib.denormalize(corpus) if normalize else corpus
            crgb = colorlib.colorspace_to_rgb(cdisp, colorspace)
            from catgen.sample.sampler import nn_l2_mean
            out["nn_l2"] = nn_l2_mean(rgb, crgb)
            if v is not None:
                sel = jnp.concatenate([imgs, imgs[order[:50]],
                                       imgs[order[-50:]]])
                vout, _ = v.apply(v_vars, sel, train=False)
                p = vout[:, 1]
                n = imgs.shape[0]
                out["v3"] = jnp.stack([jnp.mean(p[:n]),
                                       jnp.mean(p[n:n + 50]),
                                       jnp.mean(p[n + 50:])])
            return out

        self._viz_jit = jax.jit(fn)
        return self._viz_jit

    def visualize(self):
        """Per-epoch artifacts (nn_utils.visualizeProgress,
        nn_utils.lua:130-186): 100 fixed-noise samples, D-ranked good/bad
        grids, sanity probes, NaN check, V rating — one compiled call,
        one fetch."""
        epoch = int(self.state.epoch)
        reals_dev = self.dataset.load_random_images(16)
        if getattr(self, "_viz_corpus", None) is None:
            # fixed reference slice of the corpus for the NN-distance
            # signal + its leave-one-out self-NN normalizer (one-time)
            k = min(512, len(self.dataset))
            self._viz_corpus = self.dataset.load_images(0, k)
            self._nn_baseline = None
            if k >= 2:
                disp = (colorlib.denormalize(self._viz_corpus)
                        if self.hc.normalize else self._viz_corpus)
                crgb = colorlib.colorspace_to_rgb(disp, self.hc.colorspace)
                from catgen.sample.sampler import self_nn_mean
                # family-aware: an offline-augmented corpus slice holds
                # whole warp families whose intra-family NN distances are
                # near zero — excluding them keeps the normalizer (and so
                # the far_from_data threshold) corpus-independent
                fams = self.dataset.family_ids(0, k)
                self._nn_baseline = float(self_nn_mean(crgb, fams))
        res = jax.device_get(self._viz_fn()(
            self.state.g_params, self.state.g_state,
            self.state.d_params, self.state.d_state,
            self.v_vars, self.vis_noise, reals_dev, self._viz_corpus))
        if not np.isfinite(res["imgs"]).all():
            self.logger.log("nan_detected", epoch=epoch)
        order, rgb = res["order"], res["rgb"]
        base = self.hc.save_dir
        save_grid(os.path.join(base, "images", f"epoch_{epoch:06d}.png"),
                  rgb, epoch=epoch)
        save_grid(os.path.join(base, "images_good", f"epoch_{epoch:06d}.png"),
                  rgb[order[:50]], epoch=epoch)
        save_grid(os.path.join(base, "images_bad", f"epoch_{epoch:06d}.png"),
                  rgb[order[-50:]], epoch=epoch)
        # real training images for comparison (nn_utils.lua:168-175 shows
        # an "original images" window beside the generated ones)
        save_grid(os.path.join(base, "images_real", f"epoch_{epoch:06d}.png"),
                  res["rgb_reals"], epoch=epoch)
        # collapse-signal stats over the fixed-noise sample batch
        # (eval/collapse.py calibration; rgb is display-space [0,1])
        from catgen.eval.collapse import per_pixel_std, sat_fraction
        fields = {"epoch": epoch,
                  "d_probe_pattern": float(res["probe_scores"][0]),
                  "d_probe_real": float(res["probe_scores"][1]),
                  "sample_sat": sat_fraction(rgb),
                  "sample_std": per_pixel_std(rgb)}
        if self._nn_baseline:
            fields["nn_l2"] = float(res["nn_l2"])
            fields["nn_l2_ratio"] = fields["nn_l2"] / self._nn_baseline
        if self.v is not None:
            fields["v_rating_all"] = float(res["v3"][0])
            fields["v_rating_good"] = float(res["v3"][1])
            fields["v_rating_bad"] = float(res["v3"][2])
            self.plot_data.append([epoch, fields["v_rating_all"],
                                   fields["v_rating_good"],
                                   fields["v_rating_bad"]])
        self.logger.log("viz", **fields)
        if self.collapse is not None:
            self.collapse.observe_viz(epoch, fields["d_probe_pattern"],
                                      fields["d_probe_real"],
                                      fields["sample_sat"],
                                      fields["sample_std"],
                                      fields.get("nn_l2_ratio"))
        if self.hc.weights_vis_freq and                 epoch % self.hc.weights_vis_freq == 0:
            from catgen.io.activations import save_activation_grids
            d_vars = {"params": self.state.d_params,
                      "state": self.state.d_state}
            save_activation_grids(
                self.d, d_vars, jnp.asarray(res["imgs"][:1]),
                os.path.join(base, "activations", f"epoch_{epoch:06d}"))

    def train(self, epochs: Optional[int] = None,
              profile_dir: Optional[str] = None):
        """The reference's infinite epoch loop (train.lua:223-247).

        ``profile_dir``: capture a jax.profiler device trace of the SECOND
        epoch (the first compiles outside the trace window; with a single
        epoch the first is traced, compile included) — the profiled epoch
        runs through the normal loop, so it counts against ``epochs`` and
        respects the save/vis cadence (--profile, SURVEY.md §5.1)."""
        epochs = epochs if epochs is not None else self.hc.epochs
        profile_at = 1 if (epochs is None or epochs > 1) else 0
        done = 0
        while epochs is None or done < epochs:
            if done == 0 or int(self.state.epoch) % self.hc.vis_freq == 0:
                self.visualize()
            if self.collapse is not None and self.collapse.verdict:
                return self._abort_collapsed()
            if profile_dir and done == profile_at:
                with jax.profiler.trace(profile_dir):
                    self.run_epoch()
                print(f"[profile] trace written to {profile_dir}")
            else:
                self.run_epoch()
            done += 1
            if int(self.state.epoch) % self.hc.save_freq == 0:
                self.save()
        # the loop's verdict check only runs at the TOP of an iteration, so
        # a firing during the final epoch would otherwise be ignored — and
        # the final state's viz signals (probe saturation, nn_l2_ratio)
        # are never observed by the top-of-loop visualize. Check both
        # before the final save writes a possibly-degenerate state.
        if self.collapse is not None and done > 0:
            if not self.collapse.verdict:
                self.visualize()
            if self.collapse.verdict:
                return self._abort_collapsed()
        # final save — unless the loop's cadence save just wrote this
        # exact state (a duplicate would rotate the real previous
        # snapshot out of adversarial.ckpt.old)
        if done == 0 or int(self.state.epoch) % self.hc.save_freq != 0:
            self.save()
        return "completed"

    def _abort_collapsed(self) -> str:
        """Collapse detector fired: save state + a collapse.json verdict,
        stop the run (tools/seed_sweep.py reads both)."""
        import json
        report = self.collapse.report()
        report["aborted_at_epoch"] = int(self.state.epoch)
        path = os.path.join(self.hc.save_dir, "collapse.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        self.logger.log("collapse_detected", **{
            k: report[k] for k in ("reason", "fired_epoch")})
        print(f"[collapse] {report['reason']} fired at epoch "
              f"{report['fired_epoch']} — stopping (verdict in {path})")
        # the degenerate state goes to its own file: rotating it into
        # adversarial.ckpt would destroy the last healthy snapshot, which
        # tools/rescue.py needs to resume past the collapse
        self.save(os.path.join(self.hc.save_dir, "adversarial_collapsed.ckpt"))
        return "collapsed"


class VHarness:
    """th train_v.lua equivalent (SURVEY.md §3.2). DP over the mesh when
    hc.n_devices > 1 (reals/fakes batch-sharded, grads pmean-ed)."""

    def __init__(self, hc: HarnessConfig, vc: v_trainer.VConfig,
                 dataset: ImageDataset,
                 logger: Optional[MetricsLogger] = None):
        self.hc = hc
        axis = dist.DATA_AXIS if hc.n_devices > 1 else None
        self.vc = dataclasses.replace(vc, axis_name=axis)
        self.dataset = dataset
        self.logger = logger or MetricsLogger(
            os.path.join(hc.save_dir, "train_v_metrics.jsonl"))
        self.v = models.V_REGISTRY[hc.v_model](hc.image_shape,
                                               axis_name=axis)
        self.mesh = dist.make_mesh(hc.n_devices) if hc.n_devices > 1 else None
        self.state = v_trainer.init_state(
            self.v, self.vc, jax.random.PRNGKey(hc.seed), hc.image_shape)
        h, w, c = hc.image_shape
        bank = synthetic.build_overlay_bank(h, w, n=1000, n_points=10000,
                                            seed=hc.seed)
        # the epoch (synthetic generation + V updates) is ONE compiled scan:
        # the per-batch host loop costs a tunnel RTT per batch on TPU
        if self.mesh is not None:
            self.state = dist.replicate(self.state, self.mesh)
            self.epoch_fn = dist.make_dp_v_epoch(self.v, self.vc, self.mesh,
                                                 bank, hc.image_shape,
                                                 flat_xs=True)
        else:
            self.epoch_fn = jax.jit(v_trainer.make_train_epoch(
                self.v, self.vc, bank, hc.image_shape, flat_xs=True))
        self.factory = synthetic.SyntheticImageFactory(bank, hc.image_shape,
                                                       seed=hc.seed)
        self._np = np.random.RandomState(hc.seed)
        self.logger.log("setup", v_params=param_count(self.state.params))

    def _ckpt_path(self) -> str:
        h, w, c = self.hc.image_shape
        return os.path.join(self.hc.save_dir, ckpt.v_filename(c, h, w))

    def save(self):
        variables = {"params": self.state.params, "state": self.state.state}
        ckpt.save(self._ckpt_path(), variables,
                  {"epoch": int(self.state.epoch)})
        self.logger.log("checkpoint_saved", path=self._ckpt_path(),
                        epoch=int(self.state.epoch))

    def run_epoch(self) -> dict:
        """One scanned epoch: pre-stage 5 real batches per step (1 for the
        half-real V batch + 4 generator feeds), host-draw the sequential
        branch randomness (train_v.lua:294-316 math.random semantics), run
        one compiled program, fetch metrics once."""
        t0 = time.time()
        ndev = max(self.hc.n_devices, 1)
        half = self.vc.batch_size // 2 * ndev
        nb = max(self.hc.n_epoch // self.vc.batch_size, 1)
        raw = self.dataset.sample_uint8(nb * 5 * half)
        staged = self.dataset.postprocess(raw)
        # flat staging (flat_xs=True epoch, both paths): C=3 NHWC epoch
        # tensors are tile-padded 3->128 on TPU — 42x HBM at 5 batches/step
        staged = staged.reshape((nb, 5, half, -1))
        reals, gen_reals = staged[:, 0], staged[:, 1:]
        branches = jnp.asarray(self._np.randint(0, 4, nb), jnp.int32)
        sub_branches = jnp.asarray(self._np.randint(0, 4, nb), jnp.int32)
        submix = jnp.asarray(self._np.rand(nb) < 0.33)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            reals = jax.device_put(reals, NamedSharding(
                self.mesh, P(None, dist.DATA_AXIS)))
            gen_reals = jax.device_put(gen_reals, NamedSharding(
                self.mesh, P(None, None, dist.DATA_AXIS)))
        rng = jax.random.PRNGKey(self._np.randint(2 ** 31))
        self.state, m = self.epoch_fn(self.state, reals, gen_reals,
                                      branches, sub_branches, submix, rng)
        # one fetch for all scalars; dt only after it (the fetch is the
        # true sync point through the tunnel — see GanHarness.run_epoch)
        loss, acc, tp, tn, fp, fn = jax.device_get(
            (jnp.mean(m.loss), jnp.mean(m.acc), jnp.sum(m.tp_real),
             jnp.sum(m.tn_fake), jnp.sum(m.fp), jnp.sum(m.fn)))
        conf = [int(tp), int(tn), int(fp), int(fn)]
        dt = time.time() - t0
        summary = {"epoch": int(self.state.epoch) - 1,
                   "loss": float(loss),
                   "acc": float(acc),
                   "sec": round(dt, 3)}
        self.logger.log("epoch", **summary)
        print(confusion_summary(*conf))
        return summary

    def visualize(self):
        """train_v.lua:227-285: V judges 50 real + 50 synthetic images,
        split into good/bad grids at p(real)=0.5, with range warnings."""
        epoch = int(self.state.epoch)
        reals = self.dataset.postprocess(self.dataset.sample_uint8(50))

        def sample_reals(n):
            return self.dataset.postprocess(self.dataset.sample_uint8(n))

        fakes = self.factory(50, sample_reals)
        imgs = jnp.concatenate([reals, fakes])
        arr = np.asarray(imgs)
        if arr.min() < -0.01 or arr.max() > 1.01:
            self.logger.log("range_warning", epoch=epoch,
                            vmin=float(arr.min()), vmax=float(arr.max()))
        scores = np.asarray(v_trainer.v_scores(
            self.v, {"params": self.state.params,
                     "state": self.state.state}, imgs))
        rgb = np.asarray(colorlib.colorspace_to_rgb(
            imgs, self.hc.colorspace))
        good = rgb[scores > 0.5]
        bad = rgb[scores <= 0.5]
        base = self.hc.save_dir
        if len(good):
            save_grid(os.path.join(base, "v_judged_real",
                                   f"epoch_{epoch:06d}.png"), good,
                      epoch=epoch)
        if len(bad):
            save_grid(os.path.join(base, "v_judged_fake",
                                   f"epoch_{epoch:06d}.png"), bad,
                      epoch=epoch)
        self.logger.log("viz", epoch=epoch,
                        judged_real=int((scores > 0.5).sum()),
                        judged_fake=int((scores <= 0.5).sum()),
                        mean_score_reals=float(scores[:50].mean()),
                        mean_score_fakes=float(scores[50:].mean()))

    def train(self, epochs: int, save_freq: int = 10):
        for _ in range(epochs):
            self.run_epoch()
            self.visualize()
            if int(self.state.epoch) % save_freq == 0:
                self.save()
        self.save()


class PretrainHarness:
    """th pretrain_g.lua equivalent (SURVEY.md §3.3)."""

    def __init__(self, hc: HarnessConfig, pc: pretrainer.PretrainConfig,
                 dataset: ImageDataset,
                 logger: Optional[MetricsLogger] = None):
        self.hc = hc
        self.pc = dataclasses.replace(pc, noise_dim=hc.noise_dim)
        self.dataset = dataset
        self.logger = logger or MetricsLogger(
            os.path.join(hc.save_dir, "pretrain_metrics.jsonl"))
        axis = dist.DATA_AXIS if hc.n_devices > 1 else None
        self.pc = dataclasses.replace(self.pc, axis_name=axis)
        self.ae = models.create_G_autoencoder(hc.image_shape, hc.noise_dim,
                                              axis_name=axis)
        self.mesh = dist.make_mesh(hc.n_devices) if hc.n_devices > 1 else None
        self.state = pretrainer.init_state(
            self.ae, self.pc, jax.random.PRNGKey(hc.seed), hc.image_shape)
        if self.mesh is not None:
            self.state = dist.replicate(self.state, self.mesh)
            self.epoch_fn = dist.make_dp_ae_epoch(self.ae, self.pc, self.mesh,
                                                  image_shape=hc.image_shape)
        else:
            self.epoch_fn = jax.jit(pretrainer.make_train_epoch(
                self.ae, self.pc, image_shape=hc.image_shape))
        self.logger.log("setup", ae_params=param_count(self.state.params))

    def _ckpt_path(self) -> str:
        h, w, c = self.hc.image_shape
        return os.path.join(
            self.hc.save_dir,
            ckpt.g_pretrained_filename(c, h, w, self.hc.noise_dim))

    def save(self):
        dec_vars = pretrainer.extract_decoder(self.ae, self.state)
        ckpt.save(self._ckpt_path(), dec_vars,
                  {"epoch": int(self.state.epoch)})
        self.logger.log("checkpoint_saved", path=self._ckpt_path(),
                        epoch=int(self.state.epoch))

    def run_epoch(self) -> dict:
        """One scanned epoch over pre-staged batches; metrics fetched once
        (the per-batch loop costs a tunnel RTT per batch on TPU)."""
        t0 = time.time()
        n_batches = max(self.hc.n_epoch // self.pc.batch_size, 1)
        bsz = self.pc.batch_size * max(self.hc.n_devices, 1)
        imgs = self.dataset.load_random_images(n_batches * bsz)
        # flat staging, both paths (see gan.make_train_epoch on tile padding)
        batches = imgs.reshape((n_batches, bsz, -1))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batches = jax.device_put(batches, NamedSharding(
                self.mesh, P(None, dist.DATA_AXIS)))
        rng = jax.random.fold_in(jax.random.PRNGKey(self.hc.seed),
                                 int(self.state.epoch))
        self.state, losses = self.epoch_fn(self.state, batches, rng)
        # fetch BEFORE timing: the fetch is the only true sync point
        # through the tunnel (see GanHarness.run_epoch)
        mse = float(jax.device_get(jnp.mean(losses)))
        dt = time.time() - t0
        summary = {"epoch": int(self.state.epoch) - 1,
                   "mse": mse, "sec": round(dt, 3)}
        self.logger.log("epoch", **summary)
        return summary

    def visualize(self):
        """pretrain_g.lua:221-253: originals vs reconstructions grid."""
        epoch = int(self.state.epoch)
        originals = self.dataset.load_random_images(16)
        recon = pretrainer.reconstruct(self.ae, self.state, originals)
        pairs = jnp.stack([originals, recon], axis=1).reshape(
            (-1,) + tuple(originals.shape[1:]))
        rgb = np.asarray(colorlib.colorspace_to_rgb(
            pairs, self.hc.colorspace))
        save_grid(os.path.join(self.hc.save_dir, "reconstructions",
                               f"epoch_{epoch:06d}.png"), rgb, nrow=8,
                  epoch=epoch)

    def train(self, epochs: int, save_freq: int = 1):
        saved_at = None
        for _ in range(epochs):
            self.run_epoch()
            self.visualize()
            if int(self.state.epoch) % save_freq == 0:
                self.save()
                saved_at = int(self.state.epoch)
        # final save — epochs not aligned with save_freq must not lose
        # the trailing epochs (mirrors GanHarness/VHarness.train)
        if epochs > 0 and saved_at != int(self.state.epoch):
            self.save()
