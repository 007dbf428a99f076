"""The GAN training engine: a single jitted two-optimizer step.

Rebuilds /root/reference/adversarial.lua (the per-batch D/G closures driven
by ``optim.*``) as one compiled XLA program:

  * D phase x D_iterations: half real / half G-fake batch, targets
    real=1 / fake=0 (adversarial.lua:221-238), BCE, L1/L2 penalty
    (adversarial.lua:92-98), elementwise grad clamp +-D_clamp (:110-112),
    and the **rolling-accuracy gate**: the D update is skipped while the
    mean accuracy over the last ``acc_window`` batches (including the
    current one) is >= ``d_max_acc`` (adversarial.lua:144-166). Under jit
    the gate is data-dependent control flow — it becomes a ``lax.cond`` on
    a circular accuracy buffer carried in ``TrainState``, with optimizer
    state frozen when gated (matching "skip update but still compute
    stats", SURVEY.md §7).
  * G phase x G_iterations: a full batch of fresh uniform(-1,1) noise with
    flipped labels (targets=1, adversarial.lua:253-255); gradients flow
    through a frozen D. L1/L2 use the *correct* coefficients (the reference
    mistakenly uses G_L2 for G's L1 term, adversarial.lua:206 — not
    replicated), clamp +-G_clamp (:210-212).

Both optimizer states, both parameter sets, BN state and the gate buffer
live in one ``TrainState`` pytree, so the whole alternating update is a
single ``jit`` (optionally ``lax.scan``-ed over an epoch of batches and
``shard_map``-ed over a mesh — see catgen/dist).

Mode semantics match the reference's always-training-mode loop: dropout is
active in D for both phases and in G; G's BatchNorm uses batch statistics
AND advances its running stats on every training-mode forward — including
the D-phase fake generation (Torch modules stay in training mode through
NN_UTILS.createImages, adversarial.lua:233 / nn_utils.lua:45-77).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from catgen import optim
from catgen.core.module import Module


@dataclasses.dataclass(frozen=True)
class GanConfig:
    """Training knobs — the reference's train.lua flag block (train.lua:15-49)."""
    batch_size: int = 32
    noise_dim: int = 100
    d_optimizer: str = "adam"
    g_optimizer: str = "adam"
    d_lr: Optional[float] = None          # None -> per-method torch default
    g_lr: Optional[float] = None
    d_sgd_lr: float = 0.02                # --D_sgd_lr
    g_sgd_lr: float = 0.02
    d_sgd_momentum: float = 0.0
    g_sgd_momentum: float = 0.0
    d_adagrad_lr: float = 1e-3            # train.lua:195-198 presets
    g_adagrad_lr: float = 3e-3
    d_l1: float = 0.0
    d_l2: float = 1e-4
    g_l1: float = 0.0
    g_l2: float = 0.0
    d_clamp: float = 1.0
    g_clamp: float = 5.0
    d_iterations: int = 1
    g_iterations: int = 1
    d_max_acc: float = 1.01
    acc_window: int = 20                  # train.lua:238: max(20,min(N/bs,250))
    axis_name: Optional[str] = None       # data-parallel mesh axis
    compute_dtype: Any = jnp.float32      # bfloat16 for the TPU fast path
    remat: bool = False                   # jax.checkpoint the D/G applies
                                          # (trade FLOPs for memory at
                                          # large batch, SURVEY.md "HBM")
    augment: bool = False                 # on-device train-time augmentation
                                          # of the real half-batches (XLA-
                                          # fused affine+brightness+noise,
                                          # generate_dataset.py:68-73
                                          # semantics applied at train time)
    normalized_inputs: bool = False       # reals arrive [-1,1] (--normalize):
                                          # augment_batch assumes [0,1], so
                                          # the step denormalizes around it
    g_bn_advance_in_d: bool = True        # Torch semantics: G stays in
                                          # training mode through the D
                                          # phase's createImages
                                          # (adversarial.lua:233), so its BN
                                          # running stats advance on that
                                          # forward too. False freezes
                                          # g_state during the D phase —
                                          # an A/B knob for the corpus-scale
                                          # collapse audit (QUALITY.md r5).
    g_frozen_children: Tuple[str, ...] = ()
                                          # top-level G children excluded
                                          # from training: grads zeroed,
                                          # params+BN state pinned. Stage-
                                          # wise pyramid training (reference
                                          # README.md:156-188): at 64px the
                                          # warm-started base G stays fixed
                                          # and only the RefineStage learns
                                          # — a fresh D's early garbage
                                          # gradients otherwise destroy the
                                          # trained base within ~20 epochs
                                          # (runs/longrun64b attempt 1).
    bce: Optional[str] = None             # "logits" | "torch" | "clip";
                                          # None -> the CATGEN_BCE env
                                          # default. See bce_logits /
                                          # bce_torch / bce_clip.

    def make_optimizers(self) -> Tuple[optim.Optimizer, optim.Optimizer]:
        return (self._make(self.d_optimizer, self.d_lr, self.d_sgd_lr,
                           self.d_sgd_momentum, self.d_adagrad_lr),
                self._make(self.g_optimizer, self.g_lr, self.g_sgd_lr,
                           self.g_sgd_momentum, self.g_adagrad_lr))

    @staticmethod
    def _make(name, lr, sgd_lr, sgd_momentum, adagrad_lr) -> optim.Optimizer:
        if name == "sgd":
            return optim.sgd(lr=lr if lr is not None else sgd_lr,
                             momentum=sgd_momentum)
        if name == "adagrad":
            return optim.adagrad(lr=lr if lr is not None else adagrad_lr)
        if lr is not None:
            return optim.make(name, lr=lr)
        return optim.make(name)


class TrainState(NamedTuple):
    g_params: Any
    g_state: Any          # BN running stats etc.
    d_params: Any
    d_state: Any
    g_opt: Any
    d_opt: Any
    acc_buffer: jax.Array  # (acc_window,) rolling D batch accuracies
    acc_count: jax.Array   # valid entries in the buffer (saturates at W)
    acc_index: jax.Array   # circular write position
    step: jax.Array
    epoch: jax.Array


class StepMetrics(NamedTuple):
    loss_d: jax.Array       # mean D loss over the d_iterations batches
    loss_g: jax.Array
    acc_d: jax.Array        # mean D batch accuracy over the iterations
    acc_avg: jax.Array      # rolling mean that drives the gate (after last)
    d_trained: jax.Array    # fraction of D iterations whose update applied
    # confusion counts summed over ALL d_iterations batches — the reference
    # feeds CONFUSION:add for every batch of every iteration
    # (adversarial.lua:101-106), so per-epoch sums must count
    # d_iterations * batch_size predictions per step
    tp_real: jax.Array
    tn_fake: jax.Array
    fp: jax.Array
    fn: jax.Array


def bce_torch(pred: jax.Array, target: jax.Array,
              eps: float = 1e-12) -> jax.Array:
    """nn.BCECriterion exactly as Torch7 computes it (train.lua:181;
    torch/nn BCECriterion.lua): ``-(t*log(p+eps) + (1-t)*log(1-p+eps))``
    with eps=1e-12 added INSIDE the log — never clipped. Autodiff of this
    expression reproduces Torch's gradInput ``-(t-p)/((1-p+eps)*(p+eps))``,
    which stays nonzero arbitrarily deep into sigmoid saturation: at
    p -> 0 with t=1 the (huge) dL/dp cancels against the (tiny) sigmoid
    jacobian p*(1-p) to the healthy dL/dlogit ~ (p - t). The network only
    truly deadlocks if the sigmoid underflows to an exact f32 zero
    (logit < ~-104), which bounded adam steps essentially never reach.

    XLA-proofing (two corpus runs NaN'd at epoch 2 learning this,
    runs/audit5/bcefix{,2} s1): the fake-side term may NOT be written as
    an associative chain containing both the 1 and the eps —
    ``log1p(eps - p)`` computes ``eps - p`` which rounds to exactly -1.0
    at p == 1.0f, and Torch's literal ``log(1 - p + eps)`` survives eager
    but under jit XLA's algebraic simplifier reassociates it to
    ``(1 + eps) - p`` and constant-folds ``1 + eps -> 1.0f`` — the eps
    vanishes and the term is log(0) = -inf, so real targets hit
    ``0 * -inf = NaN``. ``maximum`` floors are fold-proof: XLA cannot
    merge the constant through a max. Values/gradients match Torch's to
    ~1.7e-5 relative everywhere representable (for p > eps,
    log(max(p, eps)) = log(p) vs Torch's log(p + eps)); they differ only
    at EXACT 0.0f/1.0f, where the max floor zeroes dL/dp while Torch
    keeps +-1/eps — indistinguishable through the sigmoid, whose jacobian
    p*(1-p) is exactly zero there too."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    pos = jnp.log(jnp.maximum(p, eps))
    neg = jnp.log(jnp.maximum(1.0 - p, eps))
    return -jnp.mean(t * pos + (1.0 - t) * neg)


def bce_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """BCE computed in logit space: ``mean(softplus(l) - t*l)`` — exactly
    ``bce(sigmoid(l), t)`` mathematically, but with none of probability
    space's f32 pathologies. The gradient is exactly ``sigmoid(l) - t``
    at ANY saturation depth: where prob-space forms lose the recovery
    force once the sigmoid output rounds to 0.0f/1.0f (|logit| ~ 17; the
    mode-A/B permanent-collapse mechanism, QUALITY.md round 5), this one
    keeps pulling a saturated network back forever, and it cannot produce
    inf/NaN (softplus is the stable max(l,0)+log1p(exp(-|l|))). This is
    the TPU-native formulation of train.lua:181's criterion: selected by
    CATGEN_BCE=logits, the train step peels D's final paramless Sigmoid
    and feeds logits here (identical param/state trees, identical
    checkpoints); sigmoid(l) is still computed for confusion/gate
    metrics."""
    l = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(jax.nn.softplus(l) - t * l)


def bce_clip(pred: jax.Array, target: jax.Array,
             eps: float = 1e-7) -> jax.Array:
    """BCE with the prediction *clipped* to [eps, 1-eps].

    Rounds 1-4 used this as "nn.BCECriterion with clamping for stability" —
    but ``jnp.clip`` has ZERO gradient outside the window, so once a
    sigmoid output saturates past |logit| > log(1/eps)-ish (~16.1), every
    upstream parameter receives an exactly-zero adversarial gradient and
    the network is permanently dead: no recovery force exists, unlike the
    reference (see ``bce_torch``). This is the corpus-scale "mode B" death
    signature — loss_d/loss_g frozen at exactly -log(1e-7)/2 = 8.059 and
    16.118 for hundreds of epochs (QUALITY.md round 5). Kept selectable
    (CATGEN_BCE=clip) as the A/B baseline of that audit."""
    p = jnp.clip(pred.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


_BCE_IMPLS = {"torch": bce_torch, "clip": bce_clip, "logits": bce_torch}
_bce_choice = os.environ.get("CATGEN_BCE", "logits")
if _bce_choice not in _BCE_IMPLS:
    raise ValueError(f"CATGEN_BCE={_bce_choice!r}: pick one of "
                     f"{sorted(_BCE_IMPLS)}")
# prob-space binding (used by any caller holding probabilities; under
# "logits" the train step goes through bce_logits instead and this
# binding only covers prob-space stragglers)
bce = _BCE_IMPLS[_bce_choice]
use_logit_loss = _bce_choice == "logits"


def uniform_noise(rng: jax.Array, n: int, noise_dim: int,
                  dtype=jnp.float32) -> jax.Array:
    """Noise ~ U(-1, 1), dim 100 by default (nn_utils.lua:35-39)."""
    return jax.random.uniform(rng, (n, noise_dim), dtype, -1.0, 1.0)


def augment_reals(config: GanConfig, rng: jax.Array,
                  reals: jax.Array) -> jax.Array:
    """On-device train-time augmentation of the real half-batches.

    ``augment_batch`` works in [0,1] (its brightness is multiplicative and
    it clips to [0,1]); with --normalize the reals arrive in [-1,1]
    (normalized_inputs), so the step unmaps/remaps around it — two fused
    elementwise ops, exact inverse pair on in-range values."""
    from catgen.data.ops import augment_batch
    from catgen.data import color as colorlib

    x = reals
    if config.normalized_inputs:
        x = colorlib.denormalize(x)
    x = augment_batch(rng, x)
    if config.normalized_inputs:
        x = colorlib.normalize(x)
    return x


def init_state(g: Module, d: Module, config: GanConfig,
               key: jax.Array, image_shape) -> TrainState:
    from catgen.kernels import config as kconfig

    kg, kd = jax.random.split(key)
    g_vars = g.init(kg, (1, config.noise_dim))
    d_vars = d.init(kd, (1,) + tuple(image_shape))
    d_optim, g_optim = config.make_optimizers()
    if kconfig.resolve_flat_opt() == "flat":
        g_opt = optim.flat_init(g_optim, g_vars["params"])
        d_opt = optim.flat_init(d_optim, d_vars["params"])
    else:
        g_opt = g_optim.init(g_vars["params"])
        d_opt = d_optim.init(d_vars["params"])
    return TrainState(
        g_params=g_vars["params"], g_state=g_vars["state"],
        d_params=d_vars["params"], d_state=d_vars["state"],
        g_opt=g_opt,
        d_opt=d_opt,
        acc_buffer=jnp.zeros((config.acc_window,), jnp.float32),
        acc_count=jnp.zeros((), jnp.int32),
        acc_index=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.ones((), jnp.int32),
    )


def ckpt_template(g: Module, d: Module, config: GanConfig,
                  key: jax.Array, image_shape) -> TrainState:
    """``init_state`` in the checkpoint's canonical representation —
    optimizer state per-leaf regardless of CATGEN_FLAT_OPT (checkpoints
    always store per-leaf; see harness.save)."""
    st = init_state(g, d, config, key, image_shape)
    return st._replace(
        g_opt=optim.opt_state_to_tree(st.g_opt, st.g_params),
        d_opt=optim.opt_state_to_tree(st.d_opt, st.d_params))


def _select(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: lax.select(pred, x, y), a, b)


def make_train_step(g: Module, d: Module, config: GanConfig):
    """Builds the jitted step: (state, real_images, rng) ->
    (state, StepMetrics).

    ``real_images`` is ``d_iterations`` half-batches of reals stacked along
    the batch axis — shape (d_iterations * batch_size/2, H, W, C) in [0,1].
    The reference draws FRESH reals (and fresh fakes) for every iteration of
    the ``for k=1, OPT.D_iterations`` loop (adversarial.lua:221-238, the
    per-k refill of ``inputs``); iteration k here consumes slice k of the
    stacked reals and re-folds the noise stream. The step draws its own
    noise from ``rng``.
    """
    if config.d_iterations < 1 or config.g_iterations < 1:
        raise ValueError(
            f"d_iterations/g_iterations must be >= 1 (got "
            f"{config.d_iterations}/{config.g_iterations}); the reference "
            f"always runs at least one D and one G update per batch")
    from catgen.kernels import config as kconfig

    d_optim, g_optim = config.make_optimizers()
    half = config.batch_size // 2
    cdt = config.compute_dtype
    use_flat = kconfig.resolve_flat_opt() == "flat"
    bce_choice = config.bce or _bce_choice
    if bce_choice not in _BCE_IMPLS:
        raise ValueError(f"GanConfig.bce={bce_choice!r}: pick one of "
                         f"{sorted(_BCE_IMPLS)}")
    prob_bce = _BCE_IMPLS[bce_choice]
    use_logits = bce_choice == "logits"

    def _update(opt, grads, opt_state, params, l1, l2, clamp):
        """grad pipeline + optimizer + apply; flat (one raveled vector,
        train.lua:184-185 getParameters semantics) or per-leaf — identical
        updates either way (tests/test_flat_opt.py)."""
        if use_flat:
            return optim.flat_update(opt, grads, opt_state, params,
                                     l1, l2, clamp)
        grads = optim.clamp_and_penalize(grads, params, l1, l2, clamp)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optim.apply_updates(params, updates), new_opt

    def _apply(module):
        def fn(variables, x, train, rng):
            return module.apply(variables, x, train=train, rng=rng)
        if config.remat:
            return jax.checkpoint(fn, static_argnums=(2,))
        return fn

    g_apply = _apply(g)
    d_apply = _apply(d)

    # CATGEN_BCE=logits: peel D's final paramless Sigmoid and train in
    # logit space (see bce_logits). Child names are index-based, so the
    # truncated Sequential reads the SAME param/state subtrees; the
    # Sigmoid's (empty) state entry is re-added to keep the carried
    # d_state structure identical to init_state's.
    if use_logits:
        from catgen.core.module import Sequential as _Seq
        from catgen.nn.layers import Sigmoid as _Sigmoid
        if not (isinstance(d, _Seq) and d.layers
                and isinstance(d.layers[-1], _Sigmoid)):
            raise ValueError(
                "CATGEN_BCE=logits needs D to be a Sequential ending in "
                f"Sigmoid (models.lua D variants all do); got {d.name} "
                f"ending in "
                f"{d.layers[-1].name if getattr(d, 'layers', None) else d}")
        _sig_name = d._child_name(len(d.layers) - 1)
        _d_trunc = _Seq(d.layers[:-1], name=d.name)

        def _logits_fn(variables, x, train, rng):
            out, st = _d_trunc.apply(variables, x, train=train, rng=rng)
            st = dict(st)
            st[_sig_name] = {}
            return out, st

        d_apply_logits = (jax.checkpoint(_logits_fn, static_argnums=(2,))
                          if config.remat else _logits_fn)

        def d_loss_and_prob(variables, x, train, rng, targets):
            logits, d_state = d_apply_logits(variables, x, train, rng)
            loss = bce_logits(logits[:, 0], targets)
            return loss, jax.nn.sigmoid(logits[:, 0]), d_state
    else:
        def d_loss_and_prob(variables, x, train, rng, targets):
            out, d_state = d_apply(variables, x, train, rng)
            return prob_bce(out[:, 0], targets), out[:, 0], d_state

    frozen = tuple(config.g_frozen_children)

    def _zero_frozen_grads(grads):
        """Zero the frozen children's G grads (-> exactly-zero adam/sgd
        updates and moments)."""
        if not frozen:
            return grads
        out = dict(grads)
        for name in frozen:
            if name not in out:
                raise KeyError(
                    f"g_frozen_children entry {name!r} is not a top-level "
                    f"G child (children: {sorted(out)})")
            out[name] = jax.tree_util.tree_map(jnp.zeros_like, out[name])
        return out

    def _pin_frozen(new_tree, old_tree):
        """Pin frozen children's params/state to their pre-step values —
        exact freezing even under l1/l2 penalties (which add
        params-dependent grad terms after the zeroing) and BN
        running-stat advancement in training-mode forwards."""
        if not frozen:
            return new_tree
        out = dict(new_tree)
        for name in frozen:
            if name in out:
                out[name] = old_tree[name]
        return out

    def _pin_frozen_opt(new_opt, old_opt, params):
        """Pin frozen children's OPTIMIZER-state subtrees too (round-4
        advisor): grads are zeroed before clamp_and_penalize, which
        re-adds params-dependent L1/L2 terms, so with --G_L1/--G_L2 > 0
        the frozen children's moments would otherwise accumulate pure
        weight-decay gradients every step — polluting the checkpointed
        g_opt that a later whole-stack unfreeze resumes from. Fields that
        mirror the params structure get their frozen children restored;
        scalar fields (step counters) pass through. In flat mode the
        state round-trips through the per-leaf representation (pure
        elementwise reshuffles, fused by XLA)."""
        if not frozen:
            return new_opt
        new_t = (optim.opt_state_to_tree(new_opt, params)
                 if use_flat else new_opt)
        old_t = (optim.opt_state_to_tree(old_opt, params)
                 if use_flat else old_opt)
        fields = [(_pin_frozen(nf, of) if isinstance(nf, dict) else nf)
                  for nf, of in zip(new_t, old_t)]
        pinned = type(new_t)(*fields)
        return optim.opt_state_to_flat(pinned) if use_flat else pinned

    def d_phase(state: TrainState, reals, rng, it):
        rng_noise, rng_g, rng_d = jax.random.split(jax.random.fold_in(rng, it), 3)
        noise = uniform_noise(rng_noise, half, config.noise_dim, cdt)
        # G in training mode: batch-stat BN whose running stats ADVANCE on
        # this forward too — Torch modules stay in training mode through
        # the D phase's createImages (adversarial.lua:233), so every
        # training-mode G forward updates the running estimates.
        g_vars = {"params": state.g_params, "state": state.g_state}
        fakes, g_state = g_apply(g_vars, noise, True, rng_g)
        g_state = (_pin_frozen(g_state, state.g_state)
                   if config.g_bn_advance_in_d else state.g_state)
        fakes = lax.stop_gradient(fakes)
        inputs = jnp.concatenate([reals.astype(cdt), fakes], axis=0)
        targets = jnp.concatenate([jnp.ones((half,)), jnp.zeros((half,))])

        def loss_fn(d_params):
            loss, prob, d_state = d_loss_and_prob(
                {"params": d_params, "state": state.d_state}, inputs,
                True, rng_d, targets)
            return loss, (prob, d_state)

        (loss, (out, d_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_params)
        if config.axis_name is not None:
            grads = lax.pmean(grads, config.axis_name)

        # batch confusion / accuracy (adversarial.lua:101-106)
        pred_real = out > 0.5
        is_real = targets > 0.5
        acc = jnp.mean((pred_real == is_real).astype(jnp.float32))
        if config.axis_name is not None:
            acc = lax.pmean(acc, config.axis_name)
        tp = jnp.sum(pred_real & is_real)
        tn = jnp.sum(~pred_real & ~is_real)
        fp = jnp.sum(pred_real & ~is_real)
        fn = jnp.sum(~pred_real & is_real)

        # rolling-accuracy gate (adversarial.lua:144-166): append current
        # accuracy, average over the valid window, gate on avg < max_acc
        buf = state.acc_buffer.at[state.acc_index].set(acc)
        count = jnp.minimum(state.acc_count + 1, config.acc_window)
        index = (state.acc_index + 1) % config.acc_window
        acc_avg = jnp.sum(buf) / count.astype(jnp.float32)
        do_train = acc_avg < config.d_max_acc

        new_params, new_opt = _update(
            d_optim, grads, state.d_opt, state.d_params,
            config.d_l1, config.d_l2, config.d_clamp)
        d_params = _select(do_train, new_params, state.d_params)
        d_opt = _select(do_train, new_opt, state.d_opt)

        state = state._replace(
            d_params=d_params, d_state=d_state, d_opt=d_opt,
            g_state=g_state,
            acc_buffer=buf, acc_count=count, acc_index=index)
        stats = (loss, acc, acc_avg,
                 do_train.astype(jnp.float32), tp, tn, fp, fn)
        return state, stats

    def g_phase(state: TrainState, rng, it):
        rng_noise, rng_g, rng_d = jax.random.split(
            jax.random.fold_in(rng, 1000 + it), 3)
        noise = uniform_noise(rng_noise, config.batch_size,
                              config.noise_dim, cdt)
        targets = jnp.ones((config.batch_size,))  # flipped labels

        def loss_fn(g_params):
            fakes, g_state = g_apply(
                {"params": g_params, "state": state.g_state},
                noise, True, rng_g)
            loss, _, _ = d_loss_and_prob(
                {"params": state.d_params, "state": state.d_state},
                fakes, True, rng_d, targets)
            return loss, g_state

        (loss, g_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        grads = _zero_frozen_grads(grads)
        if config.axis_name is not None:
            grads = lax.pmean(grads, config.axis_name)
        g_params, g_opt = _update(
            g_optim, grads, state.g_opt, state.g_params,
            config.g_l1, config.g_l2, config.g_clamp)
        g_params = _pin_frozen(g_params, state.g_params)
        g_state = _pin_frozen(g_state, state.g_state)
        g_opt = _pin_frozen_opt(g_opt, state.g_opt, state.g_params)
        state = state._replace(g_params=g_params, g_state=g_state, g_opt=g_opt)
        return state, loss

    def train_step(state: TrainState, reals: jax.Array, rng: jax.Array):
        assert reals.shape[0] == config.d_iterations * half, (
            f"step wants d_iterations*batch_size/2 = "
            f"{config.d_iterations * half} reals, got {reals.shape[0]}")
        rng = jax.random.fold_in(rng, state.step)
        if config.augment:
            reals = augment_reals(config, jax.random.fold_in(rng, 0x0A06),
                                  reals.astype(cdt))
        d_stats = []
        for it in range(config.d_iterations):
            # fresh reals per D iteration (adversarial.lua:221-238)
            state, stats = d_phase(
                state, reals[it * half:(it + 1) * half], rng, it)
            d_stats.append(stats)
        loss_g = None
        for it in range(config.g_iterations):
            state, loss_g = g_phase(state, rng, it)
        # accumulate over the D iterations: losses/accuracies averaged,
        # confusion counts summed (adversarial.lua:101-106 adds every batch
        # of every iteration to CONFUSION); acc_avg is the gate's rolling
        # mean after the final iteration
        loss_d = sum(s[0] for s in d_stats) / config.d_iterations
        acc = sum(s[1] for s in d_stats) / config.d_iterations
        acc_avg = d_stats[-1][2]
        trained = sum(s[3] for s in d_stats) / config.d_iterations
        tp, tn, fp, fn = (sum(s[i] for s in d_stats) for i in (4, 5, 6, 7))
        state = state._replace(step=state.step + 1)
        metrics = StepMetrics(loss_d, loss_g, acc, acc_avg, trained,
                              tp, tn, fp, fn)
        return state, metrics

    # exposed for parity tests: each D iteration is exactly one d_phase on
    # its own half-batch of reals
    train_step.d_phase = d_phase
    train_step.g_phase = g_phase
    return train_step


def make_train_epoch(g: Module, d: Module, config: GanConfig,
                     image_shape=None):
    """Scans the step over an epoch of pre-batched reals:
    (state, reals (nb, d_iterations*B/2, H, W, C), rng) ->
    (state, stacked metrics). One compiled program per epoch — the
    TPU-throughput path.

    ``image_shape=(H, W, C)`` switches the expected reals layout to FLAT
    images, (nb, d_iterations*B/2, H*W*C), reshaped per step inside the
    scan body. TPU tiled layouts pad the trailing (8, 128) tile, so a
    staged NHWC epoch tensor with C=3 costs 128/3 ≈ 42x its logical HBM
    (a bs=640 50-step epoch: 196 MB logical -> 8.4 GB resident); the flat
    layout pads nothing and the per-step relayout is small and transient.
    """
    step = make_train_step(g, d, config)

    def epoch_fn(state: TrainState, real_batches: jax.Array, rng: jax.Array):
        def body(carry, batch):
            st, i = carry
            if image_shape is not None:
                batch = batch.reshape(batch.shape[:1] + tuple(image_shape))
            st, m = step(st, batch, jax.random.fold_in(rng, i))
            return (st, i + 1), m

        (state, _), metrics = lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), real_batches)
        state = state._replace(epoch=state.epoch + 1)
        return state, metrics

    return epoch_fn


def generate(g: Module, state_or_vars, noise: jax.Array) -> jax.Array:
    """Batched inference through G in eval mode (nn_utils.lua:45-77)."""
    if isinstance(state_or_vars, TrainState):
        variables = {"params": state_or_vars.g_params,
                     "state": state_or_vars.g_state}
    else:
        variables = state_or_vars
    imgs, _ = g.apply(variables, noise, train=False)
    return imgs


def discriminate(d: Module, state_or_vars, images: jax.Array) -> jax.Array:
    """Batched D scores in eval mode (for ranking, nn_utils.lua:89-117)."""
    if isinstance(state_or_vars, TrainState):
        variables = {"params": state_or_vars.d_params,
                     "state": state_or_vars.d_state}
    else:
        variables = state_or_vars
    out, _ = d.apply(variables, images, train=False)
    return out[:, 0]
