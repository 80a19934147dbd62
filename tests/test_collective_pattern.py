"""Prove the row-sharded embedding path never materializes the full table.

VERDICT r2 #4: the trainer's mesh path relies on XLA SPMD for the
``[V_total, D]`` gather with batch-sharded ids; if SPMD chose to all-gather
the table per step, row-sharding would collapse at exactly the scale it
exists for. These tests compile the REAL mesh train step (4x2 virtual mesh)
and inspect the emitted HLO:

- sparse mode (the production-vocab path): NO tensor of the full packed
  shape may appear anywhere in the compiled module — every table-sized
  operand must be a [V/n_embed, ...] shard.
- dense mode: no all-gather may produce a full-table-sized tensor (the
  data-axis gradient all-reduce over row shards is the expected pattern).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.models import MMOE
from scenario_wise_rec_tpu.parallel.mesh import make_mesh
from scenario_wise_rec_tpu.train import CTRTrainer

VOCAB, NFEAT, D = 1000, 3, 8
PACKED = VOCAB * NFEAT          # 3000 x 8 packed table
B = 32


def _trainer(mesh, **kw):
    feats = ([SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=D)
              for i in range(NFEAT)] + [DenseFeature("d0")])
    model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    return CTRTrainer(model, mesh=mesh, **kw)


def _compiled_text(tr):
    rng = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(rng.integers(0, VOCAB, B).astype(np.int32))
         for i in range(NFEAT)}
    x["d0"] = jnp.asarray(rng.normal(size=B).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(
        rng.integers(0, 2, B).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))
    w = jnp.ones((B,), jnp.float32)
    xb, yb, wb = tr._shard(x, y, w)
    lowered = tr._train_step.lower(tr.params, tr.opt_state, tr.state,
                                   xb, yb, wb, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def _shapes(txt, op_prefix):
    """All result shapes of instructions named with the given HLO op."""
    out = []
    for m in re.finditer(
            rf"= *(?:\([^)]*\)|\S+) ({op_prefix}[\w-]*)\(", txt):
        line_start = txt.rfind("\n", 0, m.start()) + 1
        line = txt[line_start: txt.find("(", m.start())]
        for shape in re.findall(r"f32\[([\d,]+)\]", line):
            dims = [int(s) for s in shape.split(",") if s]
            out.append(dims)
    return out


def test_sparse_mesh_step_never_materializes_full_table():
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = _trainer(mesh, sparse_embedding_updates=True,
                  sparse_update_impl="winner")
    txt = _compiled_text(tr)
    # SPMD shapes are per-shard: the full packed table (3000 rows) must not
    # exist anywhere; its 1500-row shards must
    full = re.findall(r"f32\[3000,8\]", txt)
    assert not full, f"full packed table materialized {len(full)} times"
    assert re.search(r"f32\[1500,8\]", txt), "row shards missing?"


def test_sparse_occurrence_mesh_step_never_materializes_full_store():
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = _trainer(mesh, sparse_embedding_updates=True,
                  sparse_update_impl="occurrence")
    txt = _compiled_text(tr)
    assert not re.findall(r"f32\[3000,24\]", txt), \
        "full combined store materialized"
    assert re.search(r"f32\[1500,24\]", txt), "combined-store shards missing?"


def test_sorted_mesh_step_never_materializes_full_tiles():
    """Sorted impl (the production default) through its shard_map'd Pallas
    engine on a 4x2 mesh (VERDICT r4 #2): the compiled step must keep the
    packed authority tiles strictly per-shard — no tensor of the full tile
    shape, no all-gather of table-sized data, and no unpacked ``[V2, D]``
    view (the padded-layout OOM hazard) anywhere in the module."""
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = _trainer(mesh, sparse_embedding_updates=True,
                  sparse_update_impl="sorted", sorted_block_rows=128,
                  sorted_kernel=True)
    # layout: packed vocab 3000 -> nb=24 blocks of 128 rows -> v2=3072
    # logical rows -> [192, 128] tiles (r = 128//8 = 16); shards [96, 128]
    assert tr.opt_state["emb"]["table"].shape == (192, 128)
    txt = _compiled_text(tr)
    full = re.findall(r"f32\[192,128\]", txt)
    assert not full, f"full packed tiles materialized {len(full)} times"
    assert re.search(r"f32\[96,128\]", txt), "tile shards missing?"
    assert not re.search(r"f32\[3072,8\]", txt), \
        "unpacked [V2, D] view materialized (padded-layout hazard)"
    # all-gathers exist (the replicated id/grad lists) but none table-sized
    tile_elems = 192 * 128
    bad = [s for s in _shapes(txt, "all-gather")
           if int(np.prod(s)) >= tile_elems]
    assert not bad, f"all-gather of table-sized tensors: {bad}"


def test_dense_mesh_step_no_full_table_allgather():
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = _trainer(mesh)
    txt = _compiled_text(tr)
    table_elems = PACKED * D
    bad = [d for d in _shapes(txt, "all-gather")
           if int(np.prod(d)) >= table_elems]
    assert not bad, f"all-gather of full-table-sized tensors: {bad}"
    # guard against a vacuous pass: the extractor must see the DP gradient
    # all-reduces (small dense-layer grads), and the table must appear
    # only in per-shard form
    ar = _shapes(txt, "all-reduce")
    assert ar, "shape extractor found no all-reduces — regex broken?"
    assert max(int(np.prod(d)) for d in ar) < table_elems
    assert not re.search(r"f32\[3000,8\]", txt)
    assert re.search(r"f32\[1500,8\]", txt)
