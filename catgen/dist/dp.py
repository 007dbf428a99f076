"""Data-parallel GAN training over the mesh.

Wraps the single-chip jitted step (catgen/train/gan.py) in ``shard_map``:

  * parameters + optimizer states + gate buffer: replicated (out spec P());
    they stay bit-identical across devices because gradients and the gate's
    batch accuracy are ``pmean``-ed inside the step (GanConfig.axis_name);
  * real images: batch-sharded over the ``data`` axis — each device trains
    on its local half-batch of reals plus locally generated fakes;
  * per-device RNG streams via fold_in(axis_index) so noise, dropout and
    augmentation differ per shard (global batch semantics);
  * BatchNorm batch statistics are pmean-synced by passing axis_name into
    the model constructors (catgen.nn.layers.BatchNorm).

Global batch = config.batch_size * mesh size. All collectives ride ICI
(all-reduce of grads/stats compiled by XLA); nothing crosses hosts except
via DCN at the jax.distributed layer.

Verified in tests/test_dist.py: the 8-device CPU-simulated DP step matches
the single-device step on the concatenated batch (SURVEY.md §4(e)).
"""

from __future__ import annotations

import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from catgen.core.module import Module
from catgen.dist.mesh import DATA_AXIS, fold_in_axis_index
from catgen.train import gan


def _with_axis(config):
    """Hands the inner step a config whose ``axis_name`` is SET. A config
    with axis_name=None would build a step that skips its grad/BN-stat/
    gate-acc pmeans while the shard_map still declares the outputs
    replicated (check_vma=False) — per-device state would silently
    diverge. Rebinding here makes the builders safe to call with the
    default config."""
    import dataclasses
    if config.axis_name is None:
        config = dataclasses.replace(config, axis_name=DATA_AXIS)
    assert config.axis_name is not None
    return config, config.axis_name


def _reduce_metrics(metrics: gan.StepMetrics, axis: str) -> gan.StepMetrics:
    """Losses/accuracies pmean-ed; confusion counts psum-ed."""
    return gan.StepMetrics(
        loss_d=lax.pmean(metrics.loss_d, axis),
        loss_g=lax.pmean(metrics.loss_g, axis),
        acc_d=lax.pmean(metrics.acc_d, axis),
        acc_avg=lax.pmean(metrics.acc_avg, axis),
        d_trained=lax.pmean(metrics.d_trained, axis),
        tp_real=lax.psum(metrics.tp_real, axis),
        tn_fake=lax.psum(metrics.tn_fake, axis),
        fp=lax.psum(metrics.fp, axis),
        fn=lax.psum(metrics.fn, axis),
    )


def make_dp_train_step(g: Module, d: Module, config: gan.GanConfig,
                       mesh: Mesh):
    """(state, reals (ndev*B/2, H, W, C), rng) -> (state, metrics), compiled
    once over the mesh. ``config.axis_name`` must equal the mesh data axis.
    """
    config, axis = _with_axis(config)
    assert axis in mesh.axis_names, (axis, mesh.axis_names)
    step = gan.make_train_step(g, d, config)

    def dp_step(state, reals, rng):
        local_rng = fold_in_axis_index(rng, axis)
        state, metrics = step(state, reals, local_rng)
        return state, _reduce_metrics(metrics, axis)

    sharded = shard_map(
        dp_step, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_train_epoch(g: Module, d: Module, config: gan.GanConfig,
                        mesh: Mesh, image_shape=None):
    """Epoch scan over pre-batched reals (nb, ndev*B/2, H, W, C).

    ``image_shape=(H, W, C)`` switches the expected layout to FLAT images
    (nb, ndev*B/2, H*W*C), exactly like ``gan.make_train_epoch``: resident
    NHWC C=3 epoch tensors are tile-padded 3->128 on TPU (42x HBM,
    KERNELS.md §4c) and DP sharding divides that by the device count but
    each shard still pays the padding — flat staging pads nothing. The
    batch dim stays dim 1, so the ``P(None, axis)`` sharding is unchanged."""
    config, axis = _with_axis(config)
    assert axis in mesh.axis_names
    epoch = gan.make_train_epoch(g, d, config, image_shape=image_shape)

    def dp_epoch(state, real_batches, rng):
        local_rng = fold_in_axis_index(rng, axis)
        state, metrics = epoch(state, real_batches, local_rng)
        return state, _reduce_metrics(metrics, axis)

    sharded = shard_map(
        dp_epoch, mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_v_step(v: Module, config, mesh: Mesh):
    """Data-parallel V train step: (state, reals (ndev*B/2,...),
    fakes (ndev*B/2,...), rng) -> (state, metrics). Same replication
    contract as the GAN step (grads/acc pmean-ed inside via
    config.axis_name)."""
    from catgen.train import v_trainer

    config, axis = _with_axis(config)
    assert axis in mesh.axis_names
    step = v_trainer.make_train_step(v, config)

    def dp_step(state, reals, fakes, rng):
        local_rng = fold_in_axis_index(rng, axis)
        state, m = step(state, reals, fakes, local_rng)
        m = v_trainer.VStepMetrics(
            loss=lax.pmean(m.loss, axis), acc=lax.pmean(m.acc, axis),
            tp_real=lax.psum(m.tp_real, axis),
            tn_fake=lax.psum(m.tn_fake, axis),
            fp=lax.psum(m.fp, axis), fn=lax.psum(m.fn, axis))
        return state, m

    sharded = shard_map(
        dp_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_v_epoch(v: Module, config, mesh: Mesh, bank, image_shape,
                    flat_xs: bool = False):
    """Data-parallel scanned V epoch: reals/gen_reals batch-sharded over
    the data axis (gen_reals on dim 2 — dim 1 is the 4 generator feeds),
    branch choices replicated (one generator per global batch, matching the
    reference's per-batch math.random), grads/acc pmean-ed inside.
    ``flat_xs=True`` stages reals/gen_reals FLAT (trailing H*W*C dim) —
    see make_dp_train_epoch; batch dims are unchanged so the shardings
    hold."""
    from catgen.train import v_trainer

    config, axis = _with_axis(config)
    assert axis in mesh.axis_names
    epoch = v_trainer.make_train_epoch(v, config, bank, image_shape,
                                       flat_xs=flat_xs)

    def dp_epoch(state, reals, gen_reals, branches, sub_branches, submix,
                 rng):
        local_rng = fold_in_axis_index(rng, axis)
        state, m = epoch(state, reals, gen_reals, branches, sub_branches,
                         submix, local_rng)
        m = v_trainer.VStepMetrics(
            loss=lax.pmean(m.loss, axis), acc=lax.pmean(m.acc, axis),
            tp_real=lax.psum(m.tp_real, axis),
            tn_fake=lax.psum(m.tn_fake, axis),
            fp=lax.psum(m.fp, axis), fn=lax.psum(m.fn, axis))
        return state, m

    sharded = shard_map(
        dp_epoch, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, None, axis), P(None), P(None),
                  P(None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_ae_step(autoencoder: Module, config, mesh: Mesh):
    """Data-parallel autoencoder pretrain step: (state, images, rng) ->
    (state, loss)."""
    from catgen.train import pretrainer

    config, axis = _with_axis(config)
    assert axis in mesh.axis_names
    step = pretrainer.make_train_step(autoencoder, config)

    def dp_step(state, images, rng):
        local_rng = fold_in_axis_index(rng, axis)
        state, loss = step(state, images, local_rng)
        return state, lax.pmean(loss, axis)

    sharded = shard_map(
        dp_step, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_ae_epoch(autoencoder: Module, config, mesh: Mesh,
                     image_shape=None):
    """Data-parallel scanned pretrain epoch: (state, batches
    (nb, ndev*B, H, W, C), rng) -> (state, losses (nb,)).
    ``image_shape=(H, W, C)`` switches to FLAT (nb, ndev*B, H*W*C)
    staging — see make_dp_train_epoch."""
    from catgen.train import pretrainer

    config, axis = _with_axis(config)
    assert axis in mesh.axis_names
    epoch = pretrainer.make_train_epoch(autoencoder, config, image_shape)

    def dp_epoch(state, batches, rng):
        local_rng = fold_in_axis_index(rng, axis)
        state, losses = epoch(state, batches, local_rng)
        return state, lax.pmean(losses, axis)

    sharded = shard_map(
        dp_epoch, mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
