"""Scanned multi-step training (CTRTrainer(scan_steps=S)).

The scanned path executes S optimizer steps inside ONE jitted dispatch
(lax.scan) to amortize per-call launch overhead; it must be numerically
identical to S sequential single-step dispatches (same batches, same math,
same sequential Adam state evolution).
"""

import numpy as np
import jax
import jax.numpy as jnp

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.models import MMOE
from scenario_wise_rec_tpu.train import CTRTrainer

DOMAINS = 3


def _model():
    sparse = [SparseFeature(f"s{i}", vocab_size=50, embed_dim=4)
              for i in range(3)]
    dense = [DenseFeature("d0")]
    return MMOE(dense + sparse, DOMAINS, n_expert=2,
                expert_params={"dims": [16, 8]}, tower_params={"dims": [4]})


def _batches(n, b, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        x = {f"s{i}": rng.integers(0, 50, b).astype(np.int32)
             for i in range(3)}
        x["d0"] = rng.normal(size=b).astype(np.float32)
        x["domain_indicator"] = rng.integers(0, DOMAINS, b).astype(np.int32)
        y = rng.integers(0, 2, b).astype(np.float32)
        w = np.ones(b, np.float32)
        out.append((x, y, w))
    return out


def test_scan_steps_matches_sequential():
    S, B = 4, 32
    batches = _batches(S, B)

    seq = CTRTrainer(_model(), seed=11)
    p, o, s = seq.params, seq.opt_state, seq.state
    key = jax.random.PRNGKey(0)
    losses_seq = []
    for x, y, w in batches:
        key, k = jax.random.split(key)
        xb = {kk: jnp.asarray(v) for kk, v in x.items()}
        p, o, s, loss = seq._train_step(p, o, s, xb, jnp.asarray(y),
                                        jnp.asarray(w), k)
        losses_seq.append(float(loss))

    sc = CTRTrainer(_model(), seed=11, scan_steps=S)
    xs = {k: jnp.asarray(np.stack([b[0][k] for b in batches]))
          for k in batches[0][0]}
    ys = jnp.asarray(np.stack([b[1] for b in batches]))
    ws = jnp.asarray(np.stack([b[2] for b in batches]))
    p2, o2, s2, losses = sc._train_step_scan(
        sc.params, sc.opt_state, sc.state, xs, ys, ws, jax.random.PRNGKey(0))

    # same seed -> identical init; MMOE w/o dropout is rng-independent
    np.testing.assert_allclose(np.asarray(losses), losses_seq, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_scan_epoch_end_to_end():
    """train_one_epoch with scan_steps: stacked dispatches + remainder path."""
    batches = _batches(7, 16, seed=3)

    class Loader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    tr = CTRTrainer(_model(), seed=5, scan_steps=3)
    before = jax.tree_util.tree_leaves(tr.params)[0].copy()
    tr.train_one_epoch(Loader(), log_interval=4)
    after = jax.tree_util.tree_leaves(tr.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_scan_sparse_embedding_mode():
    """scan_steps composes with the fully-sparse lazy-Adam embedding path."""
    batches = _batches(4, 16, seed=9)
    seq = CTRTrainer(_model(), seed=2, sparse_embedding_updates=True)
    p, o, s = seq.params, seq.opt_state, seq.state
    key = jax.random.PRNGKey(0)
    for x, y, w in batches:
        key, k = jax.random.split(key)
        xb = {kk: jnp.asarray(v) for kk, v in x.items()}
        p, o, s, _ = seq._train_step(p, o, s, xb, jnp.asarray(y),
                                     jnp.asarray(w), k)

    sc = CTRTrainer(_model(), seed=2, sparse_embedding_updates=True,
                    scan_steps=4)
    xs = {k: jnp.asarray(np.stack([b[0][k] for b in batches]))
          for k in batches[0][0]}
    ys = jnp.asarray(np.stack([b[1] for b in batches]))
    ws = jnp.asarray(np.stack([b[2] for b in batches]))
    p2, o2, _, _ = sc._train_step_scan(
        sc.params, sc.opt_state, sc.state, xs, ys, ws, jax.random.PRNGKey(0))

    # default sparse impl is "occurrence": the live table is comb[:, :D]
    np.testing.assert_allclose(
        np.asarray(o["emb"]["comb"]),
        np.asarray(o2["emb"]["comb"]), rtol=1e-5, atol=1e-6)
