"""Sharding rules: map model pytrees to PartitionSpecs on the (data, embed)
mesh.

The distribution design (SURVEY §2.4): the dense expert/gate/tower stacks are
small (KB-MB) and stay **replicated**; the batch is sharded over ``data``
(DP — XLA all-reduces gradients); the packed embedding mega-table — the only
component that actually scales (Ali-CCP vocabs reach ~467k rows x 23 features)
— is **row-sharded** over the ``embed`` axis. Lookups on the row-sharded
table are partitioned by XLA's SPMD pass into shard-local gathers + cross-
shard collectives; no hand-written transport.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_specs(params) -> dict:
    """PartitionSpec pytree: packed embedding tables row-sharded on 'embed',
    everything else replicated."""

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        if "packed" in keys and leaf.ndim == 2:
            return P("embed", None)
        if "tables" in keys and leaf.ndim == 2:
            return P("embed", None)
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [spec_for(p, l) for p, l in flat]
    )


def place_params(mesh: Mesh, params):
    """device_put params according to :func:`param_specs`."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
    )


def place_opt_state(mesh: Mesh, opt_state, params):
    """Place optimizer state on the mesh: Adam moment pytrees (``mu``/``nu``
    leaves mirroring the params tree, e.g. optax ``ScaleByAdamState``) get
    their parameter's sharding — so the row-sharded packed table's moments
    are row-sharded too — and every other leaf (counts, scalars) is
    replicated."""
    pspecs = param_specs(params)
    repl = NamedSharding(mesh, P())

    def put(tree, specs):
        return jax.tree_util.tree_map(
            lambda l, s: jax.device_put(l, NamedSharding(mesh, s)),
            tree, specs,
        )

    # Leaves with a SHARDED param's shape (the packed/loose embedding
    # tables — the only leaves param_specs row-shards) that we would be
    # silently replicating is exactly the bug this guard exists for: a
    # future optax transform whose param-mirroring state is NOT named
    # mu/nu (e.g. a momentum trace) would replicate a [V_total, D]-sized
    # buffer per device. Restricted to the sharded shapes on purpose: a
    # momentum trace mirroring a REPLICATED param is correctly replicated
    # and must not trip the guard (ADVICE r3).
    param_shapes = set()
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", "")) for p in path]
        if getattr(leaf, "ndim", 0) == 2 and (
                "packed" in keys or "tables" in keys):
            param_shapes.add(leaf.shape)

    def place_item(item):
        if hasattr(item, "mu") and hasattr(item, "nu") and hasattr(item, "_replace"):
            placed = item._replace(mu=put(item.mu, pspecs),
                                   nu=put(item.nu, pspecs))
            # every other field of the state (e.g. ScaleByAdamState.count)
            # is explicitly replicated, as the docstring promises
            other = {
                f: jax.device_put(getattr(placed, f), repl)
                for f in getattr(placed, "_fields", ())
                if f not in ("mu", "nu")
            }
            return placed._replace(**other) if other else placed
        big = [
            l for l in jax.tree_util.tree_leaves(item)
            if getattr(l, "ndim", 0) == 2 and l.shape in param_shapes
        ]
        assert not big, (
            "optimizer state carries param-shaped leaves under unrecognized "
            f"field names ({type(item).__name__}); extend place_opt_state "
            "before replicating them wholesale"
        )
        return jax.device_put(item, repl)

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        # optax.chain state: one item per transform
        return tuple(place_item(i) for i in opt_state)
    return place_item(opt_state)


def batch_spec() -> P:
    return P("data")
