"""V trainer: real-vs-synthetic-fake classifier used as a GAN
pseudo-validation score.

Rebuilds train_v.lua's training loop as a jitted step: batches of half real
/ half synthetic images (train_v.lua:167-185), 2-way softmax targets with
BCE (:87-97; class order fake=0, real=1, :37-39), adam with the reference's
defaults V_L2=0.01, clamp +-5 (:24-26, 124-161), confusion tracking.

Also provides ``rate_with_v`` — the mean p(real) score V assigns a batch
(nn_utils.lua:686-711), logged per epoch by the GAN harness as the
pseudo-validation curve (README.md:130-145).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from catgen import optim
from catgen.core.module import Module


@dataclasses.dataclass(frozen=True)
class VConfig:
    """train_v.lua flag block (train_v.lua:12-28)."""
    batch_size: int = 32
    v_l1: float = 0.0
    v_l2: float = 0.01
    v_clamp: float = 5.0
    lr: Optional[float] = None            # None -> torch adam default
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32


class VTrainState(NamedTuple):
    params: Any
    state: Any
    opt: Any
    step: jax.Array
    epoch: jax.Array


class VStepMetrics(NamedTuple):
    loss: jax.Array
    acc: jax.Array
    tp_real: jax.Array
    tn_fake: jax.Array
    fp: jax.Array
    fn: jax.Array


def _bce2(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    p = jnp.clip(pred.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log1p(-p))


def init_state(v: Module, config: VConfig, key: jax.Array,
               image_shape) -> VTrainState:
    variables = v.init(key, (1,) + tuple(image_shape))
    opt = optim.adam() if config.lr is None else optim.adam(lr=config.lr)
    return VTrainState(variables["params"], variables["state"],
                       opt.init(variables["params"]),
                       jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32))


def make_train_step(v: Module, config: VConfig):
    """(state, reals (B/2,H,W,C), fakes (B/2,H,W,C), rng) ->
    (state, VStepMetrics)."""
    opt = optim.adam() if config.lr is None else optim.adam(lr=config.lr)
    half = config.batch_size // 2

    def step(state: VTrainState, reals, fakes, rng):
        rng = jax.random.fold_in(rng, state.step)
        cdt = config.compute_dtype
        inputs = jnp.concatenate([reals.astype(cdt), fakes.astype(cdt)])
        # channel 0 = fake, channel 1 = real (train_v.lua:37-39,172-184)
        t_real = jnp.concatenate([jnp.ones((half,)), jnp.zeros((half,))])
        targets = jnp.stack([1.0 - t_real, t_real], axis=-1)

        def loss_fn(params):
            out, new_state = v.apply({"params": params, "state": state.state},
                                     inputs, train=True, rng=rng)
            return _bce2(out, targets), (out, new_state)

        (loss, (out, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if config.axis_name is not None:
            grads = lax.pmean(grads, config.axis_name)
        grads = optim.clamp_and_penalize(grads, state.params, config.v_l1,
                                         config.v_l2, config.v_clamp)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        params = optim.apply_updates(state.params, updates)

        pred_real = out[:, 1] > 0.5
        is_real = t_real > 0.5
        acc = jnp.mean((pred_real == is_real).astype(jnp.float32))
        if config.axis_name is not None:
            acc = lax.pmean(acc, config.axis_name)
        metrics = VStepMetrics(
            loss=loss, acc=acc,
            tp_real=jnp.sum(pred_real & is_real),
            tn_fake=jnp.sum(~pred_real & ~is_real),
            fp=jnp.sum(pred_real & ~is_real),
            fn=jnp.sum(~pred_real & is_real))
        return VTrainState(params, new_state, new_opt,
                           state.step + 1, state.epoch), metrics

    return step


def make_train_epoch(v: Module, config: VConfig, bank, image_shape,
                     flat_xs: bool = False):
    """One compiled program per V epoch (the host-driven loop costs a
    device->host tunnel round-trip per batch; train_v.lua:115-213 is a
    per-batch Lua loop — here the synthetic generation AND the training
    step are scanned together on device).

    (state, reals (nb, B/2, H, W, C), gen_reals (nb, 4, B/2, H, W, C),
     branches (nb,), sub_branches (nb,), submix (nb,), rng)
      -> (state, VStepMetrics stacked over nb)

    ``branches``/``sub_branches``/``submix`` carry the host-side sequential
    randomness (generator choice p=1/4 each, recursive mix p=0.33);
    ``gen_reals`` are the fresh TRAIN_DATA samples each generator draws.

    ``flat_xs=True`` switches reals/gen_reals to FLAT images — (nb, B/2,
    H*W*C) and (nb, 4, B/2, H*W*C) — reshaped per step inside the scan
    body: a staged NHWC tensor with C=3 is tile-padded 3->128 on TPU
    (42x HBM; the 5-batches-per-step V staging OOMs at bench scale),
    while the flat layout pads nothing (see gan.make_train_epoch).
    """
    from catgen.train import synthetic

    step = make_train_step(v, config)
    generate = synthetic.make_batch_generator(bank, image_shape)

    def epoch_fn(state: VTrainState, reals, gen_reals, branches,
                 sub_branches, submix, rng):
        def body(carry, inputs):
            st, i = carry
            r, gr, br, sbr, sm = inputs
            if flat_xs:
                r = r.reshape(r.shape[:1] + tuple(image_shape))
                gr = gr.reshape(gr.shape[:2] + tuple(image_shape))
            k = jax.random.fold_in(rng, i)
            # namespace-separate the synthetic-generation key from the
            # step's own fold_in(k, state.step) stream: fold_in(k, 1)
            # would COLLIDE with it at state.step == 1 (key reused both
            # to split and to draw bits — round-3 review fix)
            gen_k = jax.random.fold_in(k, 0x7FFFFFFF)
            fakes = generate(gen_k, br, sbr, sm, gr)
            st, m = step(st, r, fakes, k)
            return (st, i + 1), m

        (state, _), metrics = lax.scan(
            body, (state, jnp.zeros((), jnp.int32)),
            (reals, gen_reals, branches, sub_branches, submix))
        state = state._replace(epoch=state.epoch + 1)
        return state, metrics

    return epoch_fn


def rate_with_v(v: Module, state_or_vars, images: jax.Array) -> jax.Array:
    """Mean p(real) over a batch (nn_utils.rateWithV, nn_utils.lua:686-711)."""
    if isinstance(state_or_vars, VTrainState):
        variables = {"params": state_or_vars.params,
                     "state": state_or_vars.state}
    else:
        variables = state_or_vars
    out, _ = v.apply(variables, images, train=False)
    return jnp.mean(out[:, 1])


def v_scores(v: Module, state_or_vars, images: jax.Array) -> jax.Array:
    """Per-image p(real)."""
    if isinstance(state_or_vars, VTrainState):
        variables = {"params": state_or_vars.params,
                     "state": state_or_vars.state}
    else:
        variables = state_or_vars
    out, _ = v.apply(variables, images, train=False)
    return out[:, 1]
