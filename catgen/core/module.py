"""Functional pytree module system.

This replaces the reference's stateful ``nn.Module`` object graphs
(Torch7 ``nn.Sequential`` trees, /root/reference/models.lua) with a functional
design that is natural for JAX/XLA:

  * a ``Module`` is an immutable *description* of a computation — it owns no
    tensors;
  * parameters and mutable state (BatchNorm running stats) live in a plain
    nested-dict pytree ``Variables = {"params": ..., "state": ...}``;
  * ``init(key, x_shape) -> Variables`` builds the pytree from shapes alone
    (no FLOPs, no tracing);
  * ``apply(variables, x, train=..., rng=...) -> (y, new_state)`` is a pure
    function — safe under ``jax.jit``, ``grad``, ``vmap``, ``shard_map``.

Because checkpoints are pytrees of arrays, they are code-decoupled — unlike
the reference's ``torch.save`` object graphs which require ``require``-ing
every layer class before load (/root/reference/train.lua:98-107).

Layout convention is NHWC throughout (TPU-native; the last dimension maps to
the 128-wide lane dimension of the VPU/MXU), unlike the reference's NCHW.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Variables = Dict[str, Any]  # {"params": pytree, "state": pytree}
Shape = Tuple[int, ...]


def make_variables(params: Any = None, state: Any = None) -> Variables:
    return {"params": {} if params is None else params,
            "state": {} if state is None else state}


def merge_variables(children: Dict[str, Variables]) -> Variables:
    """Nests child Variables under their names."""
    return {
        "params": {k: v["params"] for k, v in children.items()},
        "state": {k: v["state"] for k, v in children.items()},
    }


def child_variables(variables: Variables, name: str) -> Variables:
    return {"params": variables["params"][name],
            "state": variables["state"][name]}


def param_count(variables_or_params: Any) -> int:
    tree = variables_or_params
    if isinstance(tree, dict) and set(tree.keys()) == {"params", "state"}:
        tree = tree["params"]
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


class Module:
    """Base class. Subclasses implement init/apply/out_shape.

    ``x_shape`` always includes the batch dimension. ``rng`` is only needed
    when the module (or a descendant) is stochastic and ``train=True``.
    """

    def init(self, key: jax.Array, x_shape: Shape) -> Variables:
        raise NotImplementedError

    def apply(
        self,
        variables: Variables,
        x: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Any]:
        raise NotImplementedError

    def out_shape(self, x_shape: Shape) -> Shape:
        raise NotImplementedError

    # convenience: apply and drop state (for stateless inference)
    def __call__(self, variables, x, **kw):
        y, _ = self.apply(variables, x, **kw)
        return y

    @property
    def name(self) -> str:
        return type(self).__name__


class Stateless(Module):
    """Mixin for modules with no params and no state."""

    def init(self, key, x_shape):
        del key, x_shape
        return make_variables()

    def apply(self, variables, x, *, train=False, rng=None):
        return self.forward(x, train=train, rng=rng), variables["state"]

    def forward(self, x, *, train, rng):
        raise NotImplementedError

    def out_shape(self, x_shape):
        return x_shape


def _child_rng(rng: Optional[jax.Array], index: int) -> Optional[jax.Array]:
    if rng is None:
        return None
    return jax.random.fold_in(rng, index)


class Sequential(Module):
    """Chain of modules. Children are named ``{i:02d}_{ClassName}`` so the
    variables tree is stable and readable."""

    def __init__(self, layers: Sequence[Module], name: Optional[str] = None):
        self.layers = list(layers)
        self._name = name

    def _child_name(self, i: int) -> str:
        return f"{i:02d}_{self.layers[i].name}"

    def init(self, key, x_shape):
        children = {}
        shape = x_shape
        for i, layer in enumerate(self.layers):
            children[self._child_name(i)] = layer.init(
                jax.random.fold_in(key, i), shape)
            shape = layer.out_shape(shape)
        return merge_variables(children)

    def apply(self, variables, x, *, train=False, rng=None):
        new_state = {}
        for i, layer in enumerate(self.layers):
            name = self._child_name(i)
            x, st = layer.apply(
                child_variables(variables, name), x,
                train=train, rng=_child_rng(rng, i))
            new_state[name] = st
        return x, new_state

    def out_shape(self, x_shape):
        shape = x_shape
        for layer in self.layers:
            shape = layer.out_shape(shape)
        return shape

    @property
    def name(self):
        return self._name or "Sequential"


class ConcatBranches(Module):
    """Runs branches on the same input and concatenates outputs along the
    channel (last) axis — the TPU-native equivalent of the reference's 4-way
    ``nn.Concat(2)`` in D (/root/reference/models.lua:688-693). All branches
    are dense (always executed), like the reference."""

    def __init__(self, branches: Sequence[Module], axis: int = -1):
        self.branches = list(branches)
        self.axis = axis

    def _child_name(self, i: int) -> str:
        return f"branch{i}_{self.branches[i].name}"

    def init(self, key, x_shape):
        children = {
            self._child_name(i): b.init(jax.random.fold_in(key, i), x_shape)
            for i, b in enumerate(self.branches)
        }
        return merge_variables(children)

    def apply(self, variables, x, *, train=False, rng=None):
        outs = []
        new_state = {}
        for i, b in enumerate(self.branches):
            name = self._child_name(i)
            y, st = b.apply(child_variables(variables, name), x,
                            train=train, rng=_child_rng(rng, i))
            outs.append(y)
            new_state[name] = st
        return jnp.concatenate(outs, axis=self.axis), new_state

    def out_shape(self, x_shape):
        shapes = [b.out_shape(x_shape) for b in self.branches]
        ax = self.axis % len(shapes[0])
        for s in shapes[1:]:
            assert all(a == b for i, (a, b) in enumerate(zip(s, shapes[0])) if i != ax), (
                f"branch shapes incompatible: {shapes}")
        total = sum(s[ax] for s in shapes)
        out = list(shapes[0])
        out[ax] = total
        return tuple(out)


class Lambda(Stateless):
    """Wraps a pure function (shape-preserving unless out_shape_fn given)."""

    def __init__(self, fn, out_shape_fn=None, name="Lambda"):
        self.fn = fn
        self.out_shape_fn = out_shape_fn
        self._name = name

    def forward(self, x, *, train, rng):
        del train, rng
        return self.fn(x)

    def out_shape(self, x_shape):
        if self.out_shape_fn is not None:
            return self.out_shape_fn(x_shape)
        return x_shape

    @property
    def name(self):
        return self._name


def apply_with_intermediates(seq: "Sequential", variables, x, *,
                             train: bool = False, rng=None):
    """Runs a Sequential layer-by-layer, returning (y, new_state,
    [(child_name, activation), ...]) — the debug hook behind the
    activation viewer (the reference's adversarial.visualizeNetwork,
    adversarial.lua:307-355)."""
    intermediates = []
    new_state = {}
    for i, layer in enumerate(seq.layers):
        name = seq._child_name(i)
        x, st = layer.apply(child_variables(variables, name), x,
                            train=train, rng=_child_rng(rng, i))
        new_state[name] = st
        intermediates.append((name, x))
    return x, new_state, intermediates
