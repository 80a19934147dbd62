"""Worker process for tests/test_multihost.py.

Runs as one of N processes: initializes multi-host JAX over CPU devices
(parallel/mesh.py:init_distributed — the jax.distributed.initialize path),
builds the global (data, embed) mesh, places a real CTRTrainer on it, and
executes train steps whose gradient psum crosses the PROCESS boundary.
Prints machine-checkable markers consumed by the parent test.
"""

import os
import sys

# each process gets its own 4 virtual CPU devices -> 8 global
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU platform; the env var alone
# does not override it (CLAUDE.md) — set the config before any backend init
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    from scenario_wise_rec_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4
    print(f"MARKER init ok pid={pid} global_devices={len(jax.devices())}",
          flush=True)

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = ([SparseFeature(f"s{i}", vocab_size=50, embed_dim=8)
              for i in range(3)] + [DenseFeature("d0")])
    model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    mesh = make_mesh(n_data=4, n_embed=2)
    trainer = CTRTrainer(model, mesh=mesh, seed=0)
    table_shards = {
        s.data.shape
        for s in trainer.params["embedding"]["packed"].addressable_shards
    }
    assert table_shards == {(75, 8)}, table_shards  # 150 rows / 2 embed

    rng = np.random.default_rng(0)  # same data on every process (DP input)
    b = 32
    x = {f"s{i}": rng.integers(0, 50, b).astype(np.int32) for i in range(3)}
    x["d0"] = rng.normal(size=b).astype(np.float32)
    x["domain_indicator"] = rng.integers(0, 2, b).astype(np.int32)
    y = rng.integers(0, 2, b).astype(np.float32)
    w = np.ones(b, np.float32)

    xb, yb, wb = trainer._device_batch(x, y, w)
    losses = []
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        key, k = jax.random.split(key)
        (trainer.params, trainer.opt_state, trainer.state,
         loss) = trainer._train_step(trainer.params, trainer.opt_state,
                                     trainer.state, xb, yb, wb, k)
        # loss is fully replicated -> addressable on every process
        losses.append(float(np.asarray(loss)))
    assert losses[0] > losses[-1] or abs(losses[0] - losses[-1]) < 1.0
    print(f"MARKER steps ok pid={pid} losses={losses}", flush=True)

    # the PRODUCTION sparse configs across the process boundary (VERDICT
    # r4 #2/#3): the sorted impl through its shard_map'd Pallas engine
    # (each process's devices stream only their own authority tiles) and
    # the occurrence combined-store impl
    for impl, kw in (("sorted", dict(sparse_update_impl="sorted",
                                     sorted_kernel=True,
                                     sorted_block_rows=16)),
                     ("occurrence", dict(sparse_update_impl="occurrence"))):
        tr2 = CTRTrainer(model, mesh=mesh, sparse_embedding_updates=True,
                         seed=0, **kw)
        if impl == "sorted":
            # packed vocab 150 -> 10 blocks of 16 -> [10, 128] tiles,
            # [5, 128] per embed shard
            shards = {s.data.shape
                      for s in tr2.opt_state["emb"]["table"].addressable_shards}
            assert shards == {(5, 128)}, shards
        else:
            shards = {s.data.shape
                      for s in tr2.opt_state["emb"]["comb"].addressable_shards}
            assert shards == {(75, 24)}, shards
        key = jax.random.PRNGKey(7)
        for _ in range(2):
            key, k = jax.random.split(key)
            (tr2.params, tr2.opt_state, tr2.state, loss) = tr2._train_step(
                tr2.params, tr2.opt_state, tr2.state, xb, yb, wb, k)
        lv = float(np.asarray(loss))
        assert np.isfinite(lv), (impl, lv)
        print(f"MARKER {impl} ok pid={pid} loss={lv}", flush=True)


if __name__ == "__main__":
    main()
