"""Data-parallel scaling proxy on the virtual CPU mesh.

One real chip cannot measure N-chip scaling, but two scale-relevant
quantities are measurable without hardware and recorded here (SCALING.md):

1. The collective census: for each mesh width, compile the REAL sharded
   train step and count the collectives + bytes-per-step XLA emits. This is
   deterministic and hardware-independent — it IS the communication volume
   a real pod would move per step, and it should stay CONSTANT per device
   as n_data grows (weak scaling: DP gradient all-reduce of the replicated
   dense params only).
2. Wall-clock weak scaling on the virtual mesh (fixed per-device batch).
   Virtual CPU "devices" share host cores, so absolute efficiency is
   meaningless — but a superlinear BLOWUP here would indicate an SPMD
   partitioning pathology (e.g. a full-table collective sneaking in).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_proxy.py
"""

import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PER_DEVICE_BATCH = 256
VOCAB, NFEAT, D = 2000, 8, 16


def build(n_data, n_embed, mode):
    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.parallel.mesh import make_mesh
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = ([SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=D)
              for i in range(NFEAT)] + [DenseFeature("d0")])
    model = MMOE(feats, 3, n_expert=3,
                 expert_params={"dims": [64, 32]}, tower_params={"dims": [16]})
    mesh = make_mesh(n_data=n_data, n_embed=n_embed,
                     devices=jax.devices()[: n_data * n_embed])
    kw = {}
    if mode == "sorted":
        # the production impl through its shard_map'd kernel (interpret
        # on the virtual mesh — the collective pattern is mode-identical)
        kw = dict(sparse_update_impl="sorted", sorted_kernel=True,
                  sorted_block_rows=512)
    tr = CTRTrainer(model, mesh=mesh,
                    sparse_embedding_updates=(mode != "dense"), **kw)
    b = PER_DEVICE_BATCH * n_data
    rng = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(rng.integers(0, VOCAB, b).astype(np.int32))
         for i in range(NFEAT)}
    x["d0"] = jnp.asarray(rng.normal(size=b).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(rng.integers(0, 3, b).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)
    xb, yb, wb = tr._shard(x, y, w)
    return tr, (xb, yb, wb)


def census(txt):
    """(op -> (count, total_bytes)) for collective ops in compiled HLO."""
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        n, byts = 0, 0
        # result shapes sit between '=' and the op name:
        #   %x = f32[64,32]{1,0} all-reduce(...)
        #   %y = (f32[8]{0}, f32[8]{0}) all-reduce(...)
        for m in re.finditer(rf"= *((?:[^=\n])*?){op}(?:-start)?\(", txt):
            n += 1
            for shape in re.findall(r"f32\[([\d,]*)\]", m.group(1)):
                dims = [int(s) for s in shape.split(",") if s]
                byts += 4 * int(np.prod(dims)) if dims else 4
        if n:
            out[op] = (n, byts)
    return out


def main():
    print(f"per-device batch {PER_DEVICE_BATCH}, MMOE {NFEAT}x{VOCAB}x{D}")
    for mode in ("dense", "sparse", "sorted"):
        base = None
        for n_data, n_embed in ((1, 1), (2, 1), (4, 1), (8, 1), (4, 2)):
            tr, batch = build(n_data, n_embed, mode)
            low = tr._train_step.lower(tr.params, tr.opt_state, tr.state,
                                       *batch, jax.random.PRNGKey(0))
            comp = low.compile()
            cen = census(comp.as_text())
            # timed steps (virtual devices share cores: relative only)
            p, o, s = tr.params, tr.opt_state, tr.state
            for _ in range(3):
                p, o, s, loss = tr._train_step(p, o, s, *batch,
                                               jax.random.PRNGKey(1))
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for _ in range(10):
                p, o, s, loss = tr._train_step(p, o, s, *batch,
                                               jax.random.PRNGKey(1))
            jax.block_until_ready(loss)
            dt = (time.perf_counter() - t0) / 10
            if base is None:
                base = dt
            eff = base / dt
            cen_s = "; ".join(f"{k}:{v[0]}x/{v[1] / 1024:.0f}KiB"
                              for k, v in cen.items()) or "none"
            print(f"{mode} mesh {n_data}x{n_embed}: {dt * 1e3:7.1f} ms/step "
                  f"(weak-scaling time ratio {eff:4.2f}) collectives: {cen_s}",
                  flush=True)


if __name__ == "__main__":
    main()
