"""Device mesh + sharding placement.

The reference's only multi-device mechanism is single-process
``nn.DataParallel`` (ctr_trainer.py:45-47; never exercised by any script).
The TPU-native story (SURVEY §2.4): a named device mesh with a ``data`` axis
(batch sharding / DP — XLA inserts the gradient ``psum``) and an ``embed``
axis reserved for row-sharded embedding tables
(see :mod:`scenario_wise_rec_tpu.parallel.sharded_embedding`).

Multi-host: call :func:`init_distributed` once per process before building
the mesh; ICI/DCN routing is XLA's job.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op for single-process runs)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(n_data: Optional[int] = None, n_embed: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, embed)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_data is None:
        n_data = n // n_embed
    assert n_data * n_embed == n, (
        f"mesh {n_data}x{n_embed} != {n} devices"
    )
    return Mesh(devices.reshape(n_data, n_embed), axis_names=("data", "embed"))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_fn(mesh: Mesh):
    """Return ``(x_dict, y, w) -> same``, sharded on the batch (leading) dim
    over the ``data`` axis. XLA then partitions the whole train step and
    all-reduces gradients automatically."""
    data_sharding = NamedSharding(mesh, P("data"))

    def shard(x, y, w):
        x = {k: jax.device_put(v, data_sharding) for k, v in x.items()}
        y = None if y is None else jax.device_put(y, data_sharding)
        w = jax.device_put(w, data_sharding)
        return x, y, w

    return shard


def shard_stacked_batch_fn(mesh: Mesh):
    """Like :func:`shard_batch_fn` but for scan-stacked ``[S, B]`` batches
    (trainer ``scan_steps > 1``): the scan axis stays whole, the batch axis
    (dim 1) is sharded over ``data``."""
    sharding = NamedSharding(mesh, P(None, "data"))

    def shard(x, y, w):
        x = {k: jax.device_put(v, sharding) for k, v in x.items()}
        y = None if y is None else jax.device_put(y, sharding)
        w = jax.device_put(w, sharding)
        return x, y, w

    return shard
