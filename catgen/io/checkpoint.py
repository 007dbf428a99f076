"""Code-decoupled pytree checkpoints.

The reference checkpoints are ``torch.save``-d live module trees that cannot
be loaded without ``require``-ing every layer class first
(/root/reference/train.lua:98-107) and need manual buffer-zeroing to stay
small (nn_utils.lua:415-451). Here a checkpoint is a plain ``.npz`` of
pytree leaves keyed by their tree paths plus a JSON metadata blob — no code
coupling, no live objects, safe across refactors.

Artifact layout mirrors the reference triple (SURVEY.md §5.4):
  * ``adversarial.ckpt``      — D+G params, both optimizer states, gate
                                 buffer, epoch, config (train.lua:260)
  * ``v_<C>x<H>x<W>.ckpt``    — V params/state + epoch (train_v.lua:204-209)
  * ``g_pretrained_<C>x<H>x<W>_nd<N>.ckpt`` — decoder-only G params
                                 (pretrain_g.lua:199-214), picked up by
                                 filename at train start (train.lua:152-162)

Before overwrite, the predecessor is kept as ``<file>.old``
(train.lua:254-256).
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    # One batched device->host fetch: jax.device_get issues
    # copy_to_host_async on every leaf before blocking, so a TrainState
    # with hundreds of leaves costs ~one tunnel round trip instead of one
    # per leaf (the per-leaf np.asarray formulation measured ~25 s per
    # adversarial.ckpt save on the axon tunnel).
    leaves = jax.device_get([leaf for _, leaf in paths_leaves])
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for (path, _), leaf in zip(paths_leaves, leaves)}


FORMAT_VERSION = 2  # v2: adds the format_version meta field

# -- legacy key migration ---------------------------------------------------
# Round 3 wrapped the ST-D models' input prefix [SpatialTransformer, Conv,
# PReLU] into one FusedSTConvPReLU module (models/zoo.py), which renamed
# those three top-level layers and shifted every later top-level index down
# by 2 (e.g. 07_FusedSTBranches -> 05_FusedSTBranches). Checkpoints written
# before that restructure spell the same tensors under the old keys; the
# loader transparently migrates them. The migration pass only activates
# when the archive carries the old-format signature (a
# '00_SpatialTransformer' key), so it can never misfire on other models.

_LEGACY_PREFIX_RENAMES = (
    ("['00_FusedSTConvPReLU']['st']", "['00_SpatialTransformer']"),
    ("['00_FusedSTConvPReLU']['conv']", "['01_Conv']"),
    ("['00_FusedSTConvPReLU']['act']", "['02_PReLU']"),
)
_LAYER_SEG = None  # compiled lazily


def _legacy_key(key: str) -> Optional[str]:
    """The pre-round-3 spelling of a current tree key, or None."""
    global _LAYER_SEG
    for new, old in _LEGACY_PREFIX_RENAMES:
        if new in key:
            return key.replace(new, old, 1)
    if _LAYER_SEG is None:
        import re
        _LAYER_SEG = re.compile(r"\['(\d{2})_([A-Za-z0-9]+)'\]")
    m = _LAYER_SEG.search(key)
    if m and int(m.group(1)) >= 1:
        shifted = f"['{int(m.group(1)) + 2:02d}_{m.group(2)}']"
        return key[:m.start()] + shifted + key[m.end():]
    return None


def save(path: str, tree: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    """Atomically writes leaves + metadata; keeps previous file as .old."""
    flat = _flatten(tree)
    meta = dict(meta or {})
    meta.setdefault("format_version", FORMAT_VERSION)
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **flat)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    if os.path.exists(path):
        os.replace(path, path + ".old")
    os.replace(tmp, path)


def load_meta(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"]).decode())


def load(path: str, template: Any,
         lenient: Tuple[str, ...] = ()) -> Tuple[Any, Dict[str, Any]]:
    """Restores a pytree shaped like ``template`` (values ignored) and the
    metadata dict. Raises KeyError/ValueError on structure mismatch —
    except for leaves whose tree path contains one of the ``lenient``
    substrings: those fall back to the template's value (re-init with a
    warning) when missing or shape-incompatible. This is the
    ``--rebuildOptstate`` spirit (train.lua:44,191) generalized to config
    drift like a changed gate-buffer ``acc_window``: resume keeps the model
    and re-derives the rest instead of dying."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        legacy = any("00_SpatialTransformer" in k for k in z.files)
        migrated = []
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        reinit = []
        for p, leaf in leaves_with_path:
            key = jax.tree_util.keystr(p)
            is_lenient = any(s in key for s in lenient)
            want = np.shape(leaf)
            # legacy ST-D archives: the D tree's layer names were
            # restructured in round 3, and the old spelling can COLLIDE
            # with a current name at the same or a different shape (old
            # 01_Conv is the renamed input conv; old 02_PReLU has the new
            # 02_PReLU's shape but is the fused act's alpha) — so for D
            # keys the migrated spelling takes priority over an exact hit
            if legacy and key.startswith(".d_"):
                old = _legacy_key(key)
                if old is not None and old in z \
                        and tuple(z[old].shape) == tuple(want):
                    migrated.append(key)
                    leaves.append(z[old])
                    continue
            if key not in z:
                if is_lenient:
                    reinit.append(key)
                    leaves.append(np.asarray(leaf))
                    continue
                raise KeyError(f"checkpoint {path} missing leaf {key}")
            arr = z[key]
            if tuple(arr.shape) != tuple(want):
                if is_lenient:
                    reinit.append(key)
                    leaves.append(np.asarray(leaf))
                    continue
                raise ValueError(
                    f"checkpoint leaf {key} shape {arr.shape} != template {want}")
            leaves.append(arr)
    if migrated:
        import warnings
        warnings.warn(f"checkpoint {path}: restored {len(migrated)} leaves "
                      f"from their pre-round-3 keys (ST-D input-prefix "
                      f"restructure), e.g. {migrated[0]}")
        meta["_migrated"] = migrated
    if reinit:
        import warnings
        warnings.warn(f"checkpoint {path}: re-initialized {len(reinit)} "
                      f"lenient leaves from the template: {reinit[:4]}...")
        meta["_reinitialized"] = reinit
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def v_filename(channels: int, height: int, width: int) -> str:
    """train_v.lua's v_CxHxW naming."""
    return f"v_{channels}x{height}x{width}.ckpt"


def g_pretrained_filename(channels: int, height: int, width: int,
                          noise_dim: int) -> str:
    """pretrain_g.lua's g_pretrained_CxHxW_nd<N> naming."""
    return f"g_pretrained_{channels}x{height}x{width}_nd{noise_dim}.ckpt"


def adversarial_filename() -> str:
    return "adversarial.ckpt"
