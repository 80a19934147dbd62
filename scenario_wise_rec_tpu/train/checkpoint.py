"""Checkpoint save/restore for arbitrary pytrees.

Capability superset of the reference, which can only ``torch.save`` a final
state_dict and has **no load/resume path** (ctr_trainer.py:94-97; SURVEY
§5.4). Trees are flattened to path-keyed numpy arrays in one ``.npz`` — no
pickle, portable across hosts, and restorable without an example tree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save(path: str, tree, metadata: Dict[str, Any] | None = None) -> None:
    """Save a pytree (+ JSON-able metadata) to ``path`` (.npz appended).

    bfloat16 leaves (e.g. the sorted impl's ``sorted_dtype="bf16"``
    authority tiles) are stored as raw uint16 bits with their keys listed
    in ``__bf16__`` — ``np.savez`` would otherwise persist ml_dtypes
    bfloat16 as an opaque void dtype that cannot round-trip."""
    import ml_dtypes

    flat = _flatten(tree)
    bf16_keys = []
    for k, v in list(flat.items()):
        if v.dtype == ml_dtypes.bfloat16:
            flat[k] = v.view(np.uint16)
            bf16_keys.append(k)
    flat["__bf16__"] = np.frombuffer(
        json.dumps(bf16_keys).encode(), dtype=np.uint8)
    flat["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def read_metadata(path: str) -> Dict[str, Any]:
    """Read only the JSON metadata (cheap: npz members load lazily) —
    lets callers validate compatibility BEFORE shape-matching the tree."""
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    with np.load(path) as data:
        if "__metadata__" not in data:
            return {}
        return json.loads(bytes(data["__metadata__"]).decode())


def load(path: str, example_tree, coerce=None):
    """Restore ``(tree, metadata)``; shapes validated against example_tree.

    ``coerce``: optional ``(key, saved_array, expected_shape) -> array``
    hook invoked on shape mismatches BEFORE the validation — the trainer
    uses it to re-lay-out the sorted impl's packed authority moments when
    a checkpoint moves between mesh shard counts or block sizes (elastic
    resharding on resume). The returned array must match the expected
    shape or the load still fails loud."""
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    import ml_dtypes

    with np.load(path) as data:
        meta = json.loads(bytes(data["__metadata__"]).decode()) if "__metadata__" in data else {}
        bf16 = set(json.loads(bytes(data["__bf16__"]).decode())) \
            if "__bf16__" in data else set()
        leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(example_tree)
        new_leaves = []
        for p, leaf in leaves_paths:
            key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
            arr = data[key]
            if key in bf16:
                arr = arr.view(ml_dtypes.bfloat16)
            if arr.shape != np.shape(leaf) and coerce is not None:
                arr = coerce(key, arr, np.shape(leaf))
            assert arr.shape == np.shape(leaf), (
                f"checkpoint leaf {key}: shape {arr.shape} != expected {np.shape(leaf)}"
            )
            new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta
