"""Step-time breakdown for the flagship train step.

Times progressively larger sub-programs of the train step (all jitted
separately, 100 iterations each) to attribute the per-step cost:

  emb_only       embedding gather + flatten
  fwd            full eval forward (no grad)
  fwd_train      train-mode forward (batch-stat BN)
  fwd_bwd        value_and_grad, no optimizer
  full_dense     + dense Adam update      (= bench.py default)
  full_sparse    + sparse lazy-Adam mode  (SWR_SPARSE_EMB irrelevant here)

Prints one JSON line per stage. Differences between consecutive stages
approximate each component's cost. ±10% tunnel noise: compare within one run.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("SWR_BATCH", 4096))
N_SPARSE, N_DENSE, DOMAINS = 23, 8, 3
VOCAB = int(os.environ.get("SWR_VOCAB", 20_000))
STEPS = int(os.environ.get("SWR_STEPS", 100))


def main():
    import jax
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer
    from scenario_wise_rec_tpu.train.loss import bce_loss

    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=16)
              for i in range(N_SPARSE)]
    dense = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    model = MMOE(dense + sparse, DOMAINS, n_expert=DOMAINS,
                 expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                 tower_params={"dims": [16]})
    r = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(r.integers(0, VOCAB, BATCH).astype(np.int32))
         for i in range(N_SPARSE)}
    x.update({f"d{i}": jnp.asarray(r.normal(size=BATCH).astype(np.float32))
              for i in range(N_DENSE)})
    x["domain_indicator"] = jnp.asarray(
        r.integers(0, DOMAINS, BATCH).astype(np.int32))
    y = jnp.asarray(r.integers(0, 2, BATCH).astype(np.float32))
    w = jnp.ones((BATCH,), jnp.float32)

    tr_dense = CTRTrainer(model, seed=0)
    tr_sparse = CTRTrainer(model, seed=0, sparse_embedding_updates=True,
                           sparse_update_impl="winner")  # the impl PROFILE.md attributes
    params, state = tr_dense.params, tr_dense.state

    @jax.jit
    def emb_only(params, x):
        return model.embedding.apply(params["embedding"], x, model.features,
                                     squeeze_dim=True)

    @jax.jit
    def fwd(params, state, x):
        probs, _ = model.apply(params, state, x, train=False, rng=None)
        return probs

    @jax.jit
    def fwd_train(params, state, x, rng):
        probs, ns = model.apply(params, state, x, train=True, rng=rng)
        return probs

    @jax.jit
    def fwd_bwd(params, state, x, y, w, rng):
        def loss_fn(p):
            probs, ns = model.apply(p, state, x, train=True, rng=rng)
            return bce_loss(probs, y, w), ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    key = jax.random.PRNGKey(0)

    def sync(out):
        # real barrier: block_until_ready is a no-op on the axon remote-TPU
        # platform (see bench.py) — fetch one scalar instead; the single
        # execution stream serializes everything enqueued before it.
        leaf = jax.tree_util.tree_leaves(out)[-1]
        return float(np.asarray(leaf).ravel()[-1])

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        sync(out)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        print(json.dumps({"stage": name, "ms_per_step": round(ms, 4),
                          "examples_per_s": round(BATCH / ms * 1e3, 1)}),
              flush=True)

    timeit("emb_only", emb_only, params, x)
    timeit("fwd", fwd, params, state, x)
    timeit("fwd_train", fwd_train, params, state, x, key)
    timeit("fwd_bwd", fwd_bwd, params, state, x, y, w, key)
    timeit("full_dense", tr_dense._train_step, tr_dense.params,
           tr_dense.opt_state, tr_dense.state, x, y, w, key)
    timeit("full_sparse", tr_sparse._train_step, tr_sparse.params,
           tr_sparse.opt_state, tr_sparse.state, x, y, w, key)


if __name__ == "__main__":
    main()
