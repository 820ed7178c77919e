"""Checkpointing: rolling step-tagged training checkpoints + per-criterion
best-model snapshots, with find-last / prune lifecycle.

Parity target: /root/reference/dlib/utils/utils_checkpoints.py:112-243 —
files `{step}_checkpoint` holding model/optimizer/lr-scheduler/ELB-t,
`find_last_checkpoint` max-step scan, `keep_last_n_checkpoints` pruning —
and the per-component best-model snapshots saved on val peaks
(/root/reference/dlib/learning/train_wsol.py:1681-1755).

TPU-native: one msgpack blob per checkpoint via flax.serialization over
the TrainState pytree (params + batch_stats + optax state + elb_t + step +
epoch), written atomically.  Best snapshots store the variables dict
keyed by component (encoder / classification_head / decoder /
segmentation_head / reconstruction_head / box_head) so component-wise
strict reloads work like instantiators.py:575-715.
"""
from __future__ import annotations

import os
import re
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization
import flax.traverse_util
import jax
import numpy as np

_CKPT_RE = re.compile(r"^(\d+)_checkpoint\.msgpack$")
_BEST_RE = re.compile(r"^(\d+)_best_model\.msgpack$")


def _atomic_write(path: str, blob: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def save_checkpoint(folder: str, step: int, state) -> str:
    path = os.path.join(folder, f"{step}_checkpoint.msgpack")
    host_state = jax.device_get(state)
    _atomic_write(path, flax.serialization.to_bytes(host_state))
    return path


def find_last_checkpoint(folder: str, template=None
                         ) -> Tuple[Optional[int], Optional[Any]]:
    """Highest-step checkpoint restored into `template`'s structure."""
    if not os.path.isdir(folder):
        return None, None
    steps = []
    for f in os.listdir(folder):
        m = _CKPT_RE.match(f)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None, None
    step = max(steps)
    path = os.path.join(folder, f"{step}_checkpoint.msgpack")
    with open(path, "rb") as f:
        blob = f.read()
    state = flax.serialization.from_bytes(template, blob)
    return step, state


def keep_last_n_checkpoints(folder: str, n: int) -> List[str]:
    """Prune old rolling checkpoints; returns removed paths."""
    if not os.path.isdir(folder):
        return []
    found = []
    for f in os.listdir(folder):
        m = _CKPT_RE.match(f)
        if m:
            found.append((int(m.group(1)), f))
    found.sort()
    removed = []
    for _, f in found[:-n] if n > 0 else found:
        p = os.path.join(folder, f)
        os.remove(p)
        removed.append(p)
    return removed


# ------------------------------------------------------- best snapshots
def split_by_component(variables: Dict[str, Any]) -> Dict[str, Any]:
    """{'params': {...}, 'batch_stats': {...}} -> per-component dicts."""
    out: Dict[str, Any] = {}
    for coll, tree in variables.items():
        for comp, sub in tree.items():
            out.setdefault(comp, {})[coll] = sub
    return out


def save_best_model(folder: str, step: int, variables: Dict[str, Any],
                    extra: Optional[Dict[str, Any]] = None) -> str:
    payload = {"components": split_by_component(jax.device_get(variables)),
               "extra": extra or {}}
    path = os.path.join(folder, f"{step}_best_model.msgpack")
    _atomic_write(path, flax.serialization.msgpack_serialize(payload))
    # keep only the newest best snapshot
    for f in os.listdir(folder):
        m = _BEST_RE.match(f)
        if m and int(m.group(1)) != step:
            os.remove(os.path.join(folder, f))
    return path


def load_best_model(folder: str) -> Tuple[Optional[int],
                                          Optional[Dict[str, Any]]]:
    if not os.path.isdir(folder):
        return None, None
    steps = []
    for f in os.listdir(folder):
        m = _BEST_RE.match(f)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None, None
    step = max(steps)
    with open(os.path.join(folder, f"{step}_best_model.msgpack"),
              "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return step, payload


def merge_components_into_variables(variables: Dict[str, Any],
                                    components: Dict[str, Any],
                                    only: Optional[List[str]] = None
                                    ) -> Dict[str, Any]:
    """Strict component-wise reload (reference strict=True loads,
    instantiators.py:575-715): shapes must match leaf-for-leaf."""
    out = jax.tree_util.tree_map(lambda x: x, variables)
    for comp, colls in components.items():
        if only is not None and comp not in only:
            continue
        for coll, tree in colls.items():
            assert comp in out.get(coll, {}), (coll, comp)
            ref = out[coll][comp]
            flat_ref = flax.traverse_util.flatten_dict(ref)
            flat_new = flax.traverse_util.flatten_dict(tree)
            assert set(flat_ref) == set(flat_new), (
                f"component {comp}/{coll} key mismatch")
            for k, v in flat_new.items():
                assert np.asarray(v).shape == np.asarray(flat_ref[k]).shape
            out[coll][comp] = tree
    return out
