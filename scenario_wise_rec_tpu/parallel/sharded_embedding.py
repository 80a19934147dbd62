"""Explicitly row-sharded embedding lookup via shard_map + collectives.

The packed mega-table (ops/embedding.py) is the only component at scale:
Ali-CCP vocabularies reach ~467k rows x 23 features x 16 dims. Two execution
paths exist:

1. **XLA SPMD** (default): place the table with ``P("embed", None)`` and jit
   — the partitioner inserts the collectives (used by __graft_entry__ and
   the trainer's mesh path).
2. **shard_map** (this module): explicit control. Each shard owns a
   contiguous row range; a lookup masks ids to the local range, gathers
   locally, and ``psum``s the partial rows over the ``embed`` axis. One
   collective per batch regardless of feature count, and each device's
   gather touches only its HBM-local shard — the same exchange pattern a
   hand-written all-to-all would produce for dense (every-row-hits) lookups,
   without custom transport.

``sharded_lookup`` is the in-shard primitive; ``make_sharded_lookup_fn``
wraps table + mesh into a host-callable jitted function for tests/benches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_lookup(table_local: jnp.ndarray, ids: jnp.ndarray,
                   axis_name: str = "embed") -> jnp.ndarray:
    """Lookup inside shard_map: ``table_local`` is this shard's row block.

    Args:
        table_local: ``[V_local, D]`` — contiguous row range
            ``[idx * V_local, (idx+1) * V_local)`` of the logical table.
        ids: any integer shape; global row indices.

    Returns: gathered rows, ``ids.shape + (D,)`` — full (psum-reduced) rows.
    """
    idx = jax.lax.axis_index(axis_name)
    v_local = table_local.shape[0]
    lo = idx * v_local
    local = ids - lo
    in_range = (local >= 0) & (local < v_local)
    safe = jnp.clip(local, 0, v_local - 1)
    rows = table_local[safe] * in_range[..., None].astype(table_local.dtype)
    return jax.lax.psum(rows, axis_name)


def pad_vocab(vocab: int, n_shards: int) -> int:
    """Round the vocab up so it divides evenly across shards."""
    return ((vocab + n_shards - 1) // n_shards) * n_shards


def make_sharded_lookup_fn(mesh: Mesh, table: jnp.ndarray,
                           axis_name: str = "embed"):
    """Return ``(sharded_table, lookup_fn)``.

    ``lookup_fn(sharded_table, ids)`` is jitted; ids are replicated, output
    replicated. The table is padded to a multiple of the shard count and
    placed with rows sharded over ``axis_name``.
    """
    n = mesh.shape[axis_name]
    v, d = table.shape
    v_pad = pad_vocab(v, n)
    if v_pad != v:
        table = jnp.concatenate(
            [table, jnp.zeros((v_pad - v, d), table.dtype)], axis=0
        )
    sharded = jax.device_put(table, NamedSharding(mesh, P(axis_name, None)))

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(),
    )
    def lookup(table_local, ids):
        return sharded_lookup(table_local, ids, axis_name)

    return sharded, lookup
