"""G autoencoder pretrainer (MSE warm-up for the generator).

Rebuilds pretrain_g.lua: the G decoder is composed with a conv encoder into
an autoencoder trained on input==target reconstruction with MSE
(pretrain_g.lua:101,138-148), adam, grad clamp +-5 and optional L1/L2
(:164-176, defaults G_clamp=5, G_L1=G_L2=0, :24-26). Only the **decoder**
parameters are exported (``:get(2)``, pretrain_g.lua:199-214) into
``g_pretrained_<C>x<H>x<W>_nd<N>.ckpt``, which the GAN harness picks up by
filename at start (train.lua:152-162).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from catgen import optim
from catgen.core.module import Module, Sequential


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """pretrain_g.lua flag block (:12-29)."""
    batch_size: int = 16
    noise_dim: int = 100
    g_l1: float = 0.0
    g_l2: float = 0.0
    g_clamp: float = 5.0
    lr: Optional[float] = None
    axis_name: Optional[str] = None


class AEState(NamedTuple):
    params: Any
    state: Any
    opt: Any
    step: jax.Array
    epoch: jax.Array


def init_state(autoencoder: Module, config: PretrainConfig, key: jax.Array,
               image_shape) -> AEState:
    variables = autoencoder.init(key, (1,) + tuple(image_shape))
    opt = optim.adam() if config.lr is None else optim.adam(lr=config.lr)
    return AEState(variables["params"], variables["state"],
                   opt.init(variables["params"]),
                   jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32))


def make_train_step(autoencoder: Module, config: PretrainConfig):
    """(state, images, rng) -> (state, mse_loss). input == target
    (pretrain_g.lua:138-148)."""
    opt = optim.adam() if config.lr is None else optim.adam(lr=config.lr)

    def step(state: AEState, images, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            recon, new_state = autoencoder.apply(
                {"params": params, "state": state.state}, images,
                train=True, rng=rng)
            return jnp.mean(jnp.square(recon - images)), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if config.axis_name is not None:
            grads = lax.pmean(grads, config.axis_name)
        grads = optim.clamp_and_penalize(grads, state.params, config.g_l1,
                                         config.g_l2, config.g_clamp)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        params = optim.apply_updates(state.params, updates)
        return AEState(params, new_state, new_opt, state.step + 1,
                       state.epoch), loss

    return step


def make_train_epoch(autoencoder: Module, config: PretrainConfig,
                     image_shape=None):
    """Scans the AE step over pre-staged batches: (state, images
    (nb, B, H, W, C), rng) -> (state, losses (nb,)). One compiled program
    per epoch — replaces pretrain_g.lua's per-batch host loop (:120-180)
    and its per-batch device sync.

    ``image_shape=(H, W, C)`` switches the expected layout to FLAT images
    (nb, B, H*W*C), reshaped per step inside the scan body — C=3 NHWC
    epoch tensors are tile-padded 3->128 on TPU (42x HBM; see
    gan.make_train_epoch)."""
    step = make_train_step(autoencoder, config)

    def epoch_fn(state: AEState, batches, rng):
        def body(carry, batch):
            st, i = carry
            if image_shape is not None:
                batch = batch.reshape(batch.shape[:1] + tuple(image_shape))
            st, loss = step(st, batch, jax.random.fold_in(rng, i))
            return (st, i + 1), loss

        (state, _), losses = lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), batches)
        state = state._replace(epoch=state.epoch + 1)
        return state, losses

    return epoch_fn


def decoder_child_name(autoencoder: Sequential) -> str:
    """The decoder is child 1 of the encoder+decoder Sequential
    (models.lua:246-262)."""
    return autoencoder._child_name(1)


def extract_decoder(autoencoder: Sequential, state: AEState):
    """Decoder-only variables — the ``:get(2)`` export of
    pretrain_g.lua:199-214. Returns {"params": ..., "state": ...} keyed as
    a standalone G."""
    name = decoder_child_name(autoencoder)
    return {"params": state.params[name], "state": state.state[name]}


def insert_decoder(autoencoder: Sequential, state: AEState, decoder_vars):
    """Inverse of extract_decoder (for tests / warm starts)."""
    name = decoder_child_name(autoencoder)
    params = dict(state.params)
    st = dict(state.state)
    params[name] = decoder_vars["params"]
    st[name] = decoder_vars["state"]
    return state._replace(params=params, state=st)


def reconstruct(autoencoder: Module, state: AEState,
                images: jax.Array) -> jax.Array:
    recon, _ = autoencoder.apply(
        {"params": state.params, "state": state.state}, images, train=False)
    return recon
