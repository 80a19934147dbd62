"""CTR trainer: jitted train/eval steps + the reference's benchmark protocol.

Re-designs the reference trainer (trainers/ctr_trainer.py:10-165) around a
single compiled XLA program per step:

- ``train_step``: forward + BCE-on-probabilities + backward + torch-Adam
  update, all fused under ``jax.jit``. Model state (BatchNorm running stats,
  AdaSparse alpha, AdaptDHM centers, M3oE tau) is threaded explicitly.
- Evaluation gathers probabilities and computes sklearn-parity AUC/logloss on
  host (``evaluate``), plus the exact per-domain slicing protocol of
  ``evaluate_multi_domain_loss`` (ctr_trainer.py:113-152) — the acceptance
  metric of the whole benchmark.
- Early stopping on val AUC with best-weights restore (ctr_trainer.py:88-93)
  and a final timestamped checkpoint (ctr_trainer.py:94-97), with a true
  resume path the reference lacks.

Optional ``mesh`` enables data-parallel training: batches are sharded on the
leading axis over the mesh's ``data`` axis; XLA inserts the gradient
all-reduce (see parallel/mesh.py).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import checkpoint as ckpt_lib
from ..data.device import DeviceResidentLoader
from ..data.prefetch import prefetch
from .callback import EarlyStopper
from .loss import bce_loss
from .metrics import (auc_score, auc_score_device, log_loss_device,
                      log_loss_score)
from .optim import (adam, fused_dense_adam_update, sorted_dense_adam_init,
                    sorted_dense_adam_update, sparse_adam_init,
                    sparse_adam_occurrence_init, sparse_adam_occurrence_update,
                    sparse_adam_rowgrads_update)


class CTRTrainer:
    """General single-task CTR trainer (reference ctr_trainer.py:10-60 API).

    Args:
        model: a model object exposing ``init(rng) -> (params, state)`` and
            ``apply(params, state, x, train, rng) -> (probs, new_state)``.
        data_set_type: dataset name used in checkpoint filenames.
        optimizer_params: ``{"lr": .., "weight_decay": ..}`` (torch-Adam
            semantics; default lr 1e-3, wd 1e-5 as ctr_trainer.py:50-52).
        scheduler_fn/scheduler_params: optional epoch-level lr schedule
            factory, e.g. ``optim.step_lr``. NOTE the reference never actually
            instantiates its scheduler (scripts pass params but no fn,
            SURVEY §7 parity ledger) so the default here is constant lr.
        n_epoch / earlystop_patience / model_path: as reference.
        device/gpus: accepted for API parity; placement is JAX's job.
        mesh: optional ``jax.sharding.Mesh`` for data-parallel training.
    """

    def __init__(
        self,
        model,
        data_set_type: str = "dataset",
        optimizer_fn=None,
        optimizer_params: Optional[dict] = None,
        scheduler_fn=None,
        scheduler_params: Optional[dict] = None,
        n_epoch: int = 10,
        earlystop_patience: int = 10,
        device: str = "",
        gpus=None,
        model_path: str = "./",
        seed: int = 0,
        mesh=None,
        sparse_embedding_updates: bool = False,
        sparse_update_impl: str = "occurrence",
        fused_inference=False,  # False | True | "auto"
        donate_buffers: bool = False,
        scan_steps: int = 1,
        prefetch_depth: int = 2,
        sorted_reorder: str = "gather",
        sorted_block_rows: Optional[int] = None,
        sorted_chunk_ids: int = 128,
        sorted_dtype: Optional[str] = None,
        sorted_precision: Optional[str] = None,
        sorted_kernel: Optional[bool] = None,
        resident_gather: str = "step",
    ):
        self.model = model
        self.data_set_type = data_set_type
        if optimizer_params is None:
            optimizer_params = {"lr": 1e-3, "weight_decay": 1e-5}
        self._epoch_schedule = None
        if scheduler_fn is not None:
            # scheduler_fn(**scheduler_params) -> epoch -> multiplier
            self._epoch_schedule = scheduler_fn(**(scheduler_params or {}))
        if optimizer_fn is None:
            optimizer_fn = adam
        # Sparse/lazy embedding updates (opt-in, Adam-only): the packed
        # mega-table is excluded from the differentiated tree and the dense
        # optax chain entirely. The train step differentiates w.r.t. the
        # pre-gathered rows (EmbeddingCollection ``__rows__`` cache), so
        # NOTHING O(vocab) is allocated — no dense grad, no full-table Adam
        # read+write, the dominant per-step HBM cost at production vocabulary
        # scale (see optim.sparse_adam_rowgrads_update).
        self._sparse_emb = bool(
            sparse_embedding_updates
            and getattr(model, "embedding", None) is not None
            and getattr(model.embedding, "packed_names", None)
        )
        # How the packed embedding table updates when
        # sparse_embedding_updates=True (all reuse the rows-differentiated
        # backward: the embedding grad is [K, D], never a dense [V, D]):
        #   "dense"      — EXACT dense torch-Adam via the streaming fused
        #                  Pallas kernel (ops/pallas/fused_adam.py): zero
        #                  scatters, every row decays every step — NO
        #                  parity deviation. The production-vocab default
        #                  choice on TPU.
        #   "winner"     — lazy SparseAdam: winner-scatter dedup + XLA row
        #                  scatters (train/optim.py:sparse_adam_rowgrads_update)
        #   "occurrence" (DEFAULT) — lazy SparseAdam: equality-matmul dup
        #                  segsum + combined [V, 3·D] row store, exactly
        #                  two indexed HBM ops per step — the measured-best
        #                  LAZY production-vocab mode (PROFILE.md)
        #                  (sparse_adam_occurrence_update)
        #   "sorted"     — EXACT dense torch-Adam via the chunk-vectorized
        #                  sorted streaming kernel
        #                  (ops/pallas/sorted_adam.py): per-owner batched
        #                  sorts + MXU one-hot block matmuls + full-table
        #                  streaming — zero scatters, zero per-id scalar
        #                  ops, NO parity deviation. The production-vocab
        #                  throughput winner (PROFILE.md SS3). Under a
        #                  mesh the kernel runs PER SHARD over the row-
        #                  sharded authority via shard_map
        #                  (sorted_dense_adam_apply_sharded) — the
        #                  streaming engine survives sharding.
        # Under a mesh the dense/winner/occurrence impls run their pure-XLA
        # formulations (SPMD partitions the scatter-class ops; their Pallas
        # variants are single-chip-only).
        assert sparse_update_impl in ("dense", "winner", "occurrence",
                                      "sorted"), sparse_update_impl
        self._sparse_impl = sparse_update_impl
        self._sorted_reorder = sorted_reorder
        # vocab-block size of the sorted streaming kernel. None = auto
        # (one-session A/Bs, PROFILE.md SS5): 16384 wins +2.8% at 10.7M
        # packed rows with f32 storage, where the kernel is HBM-stream-
        # bound and fewer/fatter blocks shave grid overhead; at 0.46M rows
        # the same setting LOSES 32% — the per-chunk one-hot matmul is
        # O(block_rows) and dominates when there is little to stream —
        # and with bf16 tiles (half the stream) 8192 wins even at 10.7M
        # (1.095M vs 1.074M at b16384). 32768 compile-needs the raised
        # VMEM budget and measured slower everywhere.
        if sorted_block_rows is None:
            pv = getattr(getattr(model, "embedding", None),
                         "packed_vocab", 0) or 0
            sorted_block_rows = (16384 if pv >= 4_000_000
                                 and sorted_dtype != "bf16" else 8192)
        self._sorted_block_rows = int(sorted_block_rows)
        # id-chunk width of the sorted kernel's work items (multiple of
        # 128): wider chunks shrink the work-item grid at constant MXU
        # FLOPs — a per-item-overhead dial (ops/pallas/sorted_adam.py)
        assert sorted_chunk_ids % 128 == 0, sorted_chunk_ids
        self._sorted_chunk_ids = int(sorted_chunk_ids)
        # sorted-mode authority storage dtype: "bf16" halves the streaming
        # floor (Adam math stays f32 in-kernel; weights+moments round to
        # bf16 each step — documented parity-ledger deviation)
        assert sorted_dtype in (None, "bf16", "float32"), sorted_dtype
        self._sorted_dtype = (jnp.bfloat16 if sorted_dtype == "bf16"
                              else None)
        # segment-sum matmul precision inside the sorted kernel:
        # None -> "split" for f32 storage, "fast" for bf16 storage
        # (measured tradeoff table in ops/pallas/sorted_adam._kernel)
        assert sorted_precision in (None, "fast", "split", "highest"), \
            sorted_precision
        self._sorted_precision = sorted_precision
        # sorted-kernel engine selection: None = Pallas kernel on TPU
        # (single-chip AND mesh via shard_map), XLA formulation elsewhere;
        # True forces the kernel (interpreter off-TPU — CPU mesh tests);
        # False forces the XLA formulation.
        assert sorted_kernel in (None, True, False), sorted_kernel
        self._sorted_kernel = sorted_kernel
        # the mesh's embed-axis size: the sorted authority pads its block
        # count to a multiple of it so shards hold whole blocks
        self._sorted_shards = int(mesh.shape["embed"]) if mesh is not None \
            else 1
        # frozen pretrained tables (Pretrained(freeze=True), reference
        # basic/initializers.py:76-92): static packed spans + loose names
        # from the feature list; every update path masks them
        # (train/freeze.py)
        emb_col = getattr(model, "embedding", None)
        self._frozen_spans = tuple(getattr(emb_col, "frozen_spans", ()) or ())
        self._frozen_loose = tuple(getattr(emb_col, "frozen_loose", ()) or ())
        self.optimizer = self._wrap_frozen(optimizer_fn(**optimizer_params))
        self._base_lr = optimizer_params.get("lr", 1e-3)
        self._opt_params = dict(optimizer_params)
        self._opt_fn = optimizer_fn
        self.n_epoch = n_epoch
        self.early_stopper = EarlyStopper(patience=earlystop_patience)
        self.model_path = model_path
        self.mesh = mesh
        self.rng = jax.random.PRNGKey(seed)

        self.rng, k_init = jax.random.split(self.rng)
        # jit the init: eager op-by-op dispatch is orders slower than one
        # compiled program, even for parameter initialization
        self.params, self.state = jax.jit(model.init)(k_init)
        if self._sparse_emb and self._sparse_impl == "occurrence":
            # combined-store mode: the packed table's authority moves into
            # the [V, 3·D] comb array (optim.sparse_adam_occurrence_init);
            # params carry NO packed leaf during training — passing the
            # stale table through the jitted step would cost an O(V) output
            # copy per step. Eval/save materialize it via _params_for_eval.
            self.opt_state = {
                "base": self.optimizer.init(self._strip_packed(self.params)),
                "emb": sparse_adam_occurrence_init(
                    self.params["embedding"]["packed"]),
            }
            self.params = self._strip_packed(self.params)
        elif self._sparse_emb and self._sparse_impl == "sorted":
            # sorted-kernel mode: authority = the PADDED, PACKED-layout
            # table/moments in opt_state (ops/pallas/sorted_adam.py —
            # [V2/r, 128] tiles; the [V2, D] shape must never appear
            # inside the step). Like the combined store, params carry no
            # packed leaf during training.
            assert 128 % self.model.embedding.packed_dim == 0, (
                "sparse_update_impl='sorted' requires the packed embed_dim "
                f"to divide 128, got {self.model.embedding.packed_dim}; "
                "use impl='dense' or 'occurrence'")
            self.opt_state = {
                "base": self.optimizer.init(self._strip_packed(self.params)),
                "emb": sorted_dense_adam_init(
                    self.params["embedding"]["packed"],
                    block_rows=self._sorted_block_rows,
                    dtype=self._sorted_dtype,
                    n_shards=self._sorted_shards),
            }
            self.params = self._strip_packed(self.params)
        elif self._sparse_emb:
            self.opt_state = {
                "base": self.optimizer.init(self._strip_packed(self.params)),
                "emb": sparse_adam_init(self.params["embedding"]["packed"]),
            }
        else:
            self.opt_state = self.optimizer.init(self.params)
        self.epoch_i = 0

        self._lr_now = self._base_lr
        # fused_inference: False | True | "auto" — "auto" consults the
        # measured per-model win table (ops/pallas.FUSED_INFERENCE_WINS,
        # PROFILE.md SS1): gate/mixture families fuse, adapter/hyper
        # families stay on the XLA eval.
        if fused_inference == "auto":
            from ..ops.pallas import fused_inference_auto

            fused_inference = fused_inference_auto(model)
        elif not isinstance(fused_inference, bool):
            # a stray string like "false"/"off" would otherwise coerce to
            # True and force fused eval on models where it measured slower
            raise ValueError(
                f"fused_inference must be True, False or 'auto', got "
                f"{fused_inference!r}")
        self._fused_inference = bool(fused_inference)
        self._donate_buffers = bool(donate_buffers)
        self.scan_steps = max(1, int(scan_steps))
        # Host batch prep (slice / [S,B] stack) runs on a prefetch thread so
        # it overlaps device execution (data/prefetch.py); 0 disables.
        self.prefetch_depth = max(0, int(prefetch_depth))
        # device-resident epochs: "step" gathers each batch's rows inside
        # the scan body (two [B]-row gathers per step); "dispatch" gathers
        # all S batches once per dispatch (two [S*B]-row gathers) — same
        # bytes, fewer indexed ops; A/B'd on-chip (PROFILE.md SS4)
        assert resident_gather in ("step", "dispatch"), resident_gather
        self._resident_gather = resident_gather
        self._train_step = self._build_train_step(self.optimizer)
        self._train_step_scan = (
            self._build_train_step_scan(self.optimizer)
            if self.scan_steps > 1 else None)
        self._eval_step = self._build_eval_step()
        self._shard = None
        self._shard_stacked = None
        if mesh is not None:
            self._place_on_mesh(mesh)

    def _place_on_mesh(self, mesh):
        """Distribute trainer buffers over the ``(data, embed)`` mesh.

        The packed embedding mega-table (the only component that scales —
        SURVEY §2.4) is row-sharded over ``embed``; its Adam moments mirror
        that sharding (dense optax state AND the sparse-mode row-Adam
        ``mu``/``nu``); every other param/state leaf is replicated. Batches
        are sharded over ``data`` — XLA inserts the gradient all-reduce.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import (replicate, shard_batch_fn,
                                     shard_stacked_batch_fn)
        from ..parallel.sharding_rules import place_opt_state, place_params

        self._shard = shard_batch_fn(mesh)
        self._shard_stacked = shard_stacked_batch_fn(mesh)
        self.params = place_params(mesh, self.params)
        self.state = replicate(mesh, self.state)
        if self._sparse_emb:
            table_sh = NamedSharding(mesh, P("embed", None))
            emb = self.opt_state["emb"]
            base = place_opt_state(mesh, self.opt_state["base"],
                                   self._strip_packed(self.params))
            if "comb" in emb:  # occurrence impl: [V, 3·D] combined store
                emb_placed = {
                    "comb": jax.device_put(
                        emb["comb"], NamedSharding(mesh, P("embed", None))),
                    "step": replicate(mesh, emb["step"]),
                }
            elif "table" in emb:  # sorted impl: padded authority table
                emb_placed = {
                    "table": jax.device_put(emb["table"], table_sh),
                    "mu": jax.device_put(emb["mu"], table_sh),
                    "nu": jax.device_put(emb["nu"], table_sh),
                    "step": replicate(mesh, emb["step"]),
                }
            else:
                emb_placed = {
                    "mu": jax.device_put(emb["mu"], table_sh),
                    "nu": jax.device_put(emb["nu"], table_sh),
                    "step": replicate(mesh, emb["step"]),
                }
            self.opt_state = {"base": base, "emb": emb_placed}
        else:
            self.opt_state = place_opt_state(mesh, self.opt_state,
                                             self.params)

    # ------------------------------------------------------------------

    def _wrap_frozen(self, opt):
        """Mask frozen pretrained embeddings out of an optax chain's
        updates (no-op when the feature list has no frozen tables)."""
        from .freeze import freeze_updates

        return freeze_updates(opt, self._frozen_spans, self._frozen_loose)

    @staticmethod
    def _strip_packed(params):
        """Params tree without the packed embedding leaf (sparse mode)."""
        emb = {k: v for k, v in params["embedding"].items() if k != "packed"}
        return {**params, "embedding": emb}

    @property
    def _comb_mode(self) -> bool:
        return self._sparse_emb and self._sparse_impl == "occurrence"

    @property
    def _sorted_mode(self) -> bool:
        return self._sparse_emb and self._sparse_impl == "sorted"

    def _params_for_eval(self):
        """Params with the packed table materialized (occurrence mode keeps
        the live weights in ``opt_state["emb"]["comb"][:, :D]``; sorted
        mode in the padded ``opt_state["emb"]["table"][:V]``)."""
        if self._comb_mode:
            d = self.model.embedding.packed_dim
            packed = self.opt_state["emb"]["comb"][:, :d]
        elif self._sorted_mode:
            from ..ops.pallas.sorted_adam import unpack_rows

            packed = unpack_rows(self.opt_state["emb"]["table"],
                                 self.model.embedding.packed_vocab,
                                 self.model.embedding.packed_dim
                                 ).astype(jnp.float32)
        else:
            return self.params
        return {**self.params,
                "embedding": {**self.params["embedding"], "packed": packed}}

    def _adopt_params(self, params):
        """Inverse of :meth:`_params_for_eval`: accept a full params tree
        (checkpoint load, early-stop best-weights restore) and route the
        packed table back into the authority store in occurrence/sorted
        mode."""
        if (not (self._comb_mode or self._sorted_mode)
                or "packed" not in params.get("embedding", {})):
            self.params = params
            return
        packed = jnp.asarray(params["embedding"]["packed"])
        emb = self.opt_state["emb"]
        if self._comb_mode:
            d = self.model.embedding.packed_dim
            comb = jnp.asarray(emb["comb"])  # checkpoints load as numpy
            emb = {**emb, "comb": comb.at[:, :d].set(packed)}
        else:
            from ..ops.pallas.sorted_adam import pack_rows

            new_packed = pack_rows(packed, self._sorted_block_rows,
                                   n_shards=self._sorted_shards).astype(
                jnp.asarray(emb["table"]).dtype)
            assert new_packed.shape == jnp.shape(emb["table"]), (
                new_packed.shape, jnp.shape(emb["table"]))
            emb = {**emb, "table": new_packed}
        self.opt_state = {**self.opt_state, "emb": emb}
        self.params = self._strip_packed(params)

    def _make_step_body(self, optimizer):
        """One un-jitted optimizer step: the shared body of the single-step
        and scanned (multi-step-per-dispatch) train paths."""
        model = self.model
        sparse_emb = self._sparse_emb
        if sparse_emb:
            collection = model.embedding
            adam_kw = dict(
                lr=self._lr_now,
                weight_decay=self._opt_params.get("weight_decay", 1e-5),
                b1=self._opt_params.get("b1", 0.9),
                b2=self._opt_params.get("b2", 0.999),
                eps=self._opt_params.get("eps", 1e-8),
                frozen_spans=self._frozen_spans,
            )

        def step(params, opt_state, state, x, y, w, rng):
            if not sparse_emb:
                def loss_fn(p):
                    probs, new_state = model.apply(p, state, x, train=True,
                                                   rng=rng, w=w)
                    return bce_loss(probs, y, w), new_state

                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, new_state, loss

            # fully-sparse mode: differentiate w.r.t. the GATHERED rows, not
            # the table — the embedding grad is [K, D], never [vocab, D]
            ids = collection.touched_ids(x)
            occurrence = self._sparse_impl == "occurrence"
            if occurrence:
                # ONE gather serves both the forward (rows = weights) and
                # the optimizer (mu/nu ride along in the same [K, 3·D])
                r3 = opt_state["emb"]["comb"][ids]
                rows = r3[:, :collection.packed_dim]
            elif self._sparse_impl == "sorted":
                # authority = padded packed-layout table in opt_state (pad
                # rows stay 0 and ids never reach them); rows read straight
                # from the [V2/r, 128] tiles
                from ..ops.pallas.sorted_adam import packed_row_gather

                rows = packed_row_gather(opt_state["emb"]["table"], ids,
                                         collection.packed_dim
                                         ).astype(jnp.float32)
            else:
                packed = params["embedding"]["packed"]
                rows = packed[ids]
            rest = self._strip_packed(params)

            def loss_fn(rest_p, rows_p):
                emb_p = dict(rest_p["embedding"])
                emb_p["__rows__"] = rows_p
                p2 = {**rest_p, "embedding": emb_p}
                probs, new_state = model.apply(p2, state, x, train=True,
                                               rng=rng, w=w)
                return bce_loss(probs, y, w), new_state

            (loss, new_state), (g_rest, g_rows) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(rest, rows)
            updates, base_state = optimizer.update(
                g_rest, opt_state["base"], rest
            )
            rest = optax.apply_updates(rest, updates)
            if occurrence:
                emb_state = sparse_adam_occurrence_update(
                    opt_state["emb"], g_rows, ids,
                    collection.touched_owner_segments(x), r3,
                    use_pallas=False if self.mesh is not None else None,
                    **adam_kw,
                )
                return (rest, {"base": base_state, "emb": emb_state},
                        new_state, loss)
            if self._sparse_impl == "sorted":
                emb_state = sorted_dense_adam_update(
                    opt_state["emb"], g_rows, ids,
                    collection.touched_owner_segments(x),
                    collection.offsets,
                    collection.packed_dim,
                    block_rows=self._sorted_block_rows,
                    chunk_ids=self._sorted_chunk_ids,
                    reorder=self._sorted_reorder,
                    precision=self._sorted_precision,
                    use_pallas=self._sorted_kernel,
                    mesh=self.mesh,
                    **adam_kw,
                )
                return (rest, {"base": base_state, "emb": emb_state},
                        new_state, loss)
            if self._sparse_impl == "dense":
                table, emb_state = fused_dense_adam_update(
                    packed, opt_state["emb"], g_rows, ids,
                    collection.touched_owner_segments(x),
                    use_pallas=False if self.mesh is not None else None,
                    **adam_kw,
                )
            else:
                table, emb_state = sparse_adam_rowgrads_update(
                    packed, opt_state["emb"], g_rows, ids, **adam_kw
                )
            params = {**rest,
                      "embedding": {**rest["embedding"], "packed": table}}
            return (params, {"base": base_state, "emb": emb_state},
                    new_state, loss)

        return step

    def _jit(self):
        # Buffer donation is OFF by default: on the axon remote-TPU platform
        # donating params/opt_state was measured 35% SLOWER per step
        # (0.74 -> 1.15 ms for the flagship config) — the tunnel runtime
        # seems to pay an aliasing/sync cost. On a directly-attached TPU,
        # donation is the usual memory win; flip donate_buffers=True there.
        return (partial(jax.jit, donate_argnums=(0, 1, 2))
                if self._donate_buffers else jax.jit)

    def _build_train_step(self, optimizer):
        return self._jit()(self._make_step_body(optimizer))

    def _build_train_step_scan(self, optimizer):
        """S optimizer steps per device dispatch via ``lax.scan``.

        Numerically identical to S sequential ``_train_step`` calls (same
        math, same sequential Adam updates) — pinned by
        tests/test_metrics_trainer_data.py::test_scan_steps_matches_sequential.
        The win is dispatch amortization: on the axon remote-TPU platform the
        per-call host→tunnel→device launch overhead is comparable to the
        step's compute at batch 4096, so executing S steps inside one XLA
        program divides that overhead by S. Batches arrive stacked on a new
        leading axis ``[S, B]``; the per-step RNG is split inside the carry.
        """
        body = self._make_step_body(optimizer)

        @self._jit()
        def scan_step(params, opt_state, state, xs, ys, ws, rng):
            def f(carry, batch):
                params, opt_state, state, rng = carry
                x, y, w = batch
                rng, k = jax.random.split(rng)
                params, opt_state, state, loss = body(
                    params, opt_state, state, x, y, w, k)
                return (params, opt_state, state, rng), loss

            (params, opt_state, state, _), losses = jax.lax.scan(
                f, (params, opt_state, state, rng), (xs, ys, ws))
            return params, opt_state, state, losses

        return scan_step

    def _build_eval_step(self):
        model = self.model
        # opt-in Pallas fused inference (ops/pallas): numerically equal to
        # apply(train=False) — pinned by tests/test_pallas_kernels.py
        if self._fused_inference and hasattr(model, "apply_fused_eval"):
            @jax.jit
            def step(params, state, x, w):
                return model.apply_fused_eval(params, state, x, w=w)

            return step

        @jax.jit
        def step(params, state, x, w):
            probs, _ = model.apply(params, state, x, train=False, rng=None,
                                   w=w)
            return probs

        return step

    def _device_batch(self, x, y, w):
        xb = {k: jnp.asarray(v) for k, v in x.items()}
        yb = None if y is None else jnp.asarray(np.asarray(y, np.float32))
        wb = jnp.asarray(w)
        if self._shard is not None:
            xb, yb, wb = self._shard(xb, yb, wb)
        return xb, yb, wb

    # ------------------------------------------------------------------

    def _flush_epoch_log(self):
        """Print a deferred end-of-epoch loss line (resident epochs defer
        the final loss fetch so the epoch boundary never blocks on the
        device — VERDICT r4 #4). This fetch is a REAL device sync: it
        completes only after the epoch's last dispatch."""
        d = getattr(self, "_deferred_log", None)
        if d is None:
            return
        self._deferred_log = None
        done, nb, pending = d
        mean = float(np.mean([np.mean(np.asarray(l)) for l in pending]))
        print(f"  step {done}/{nb} loss {mean:.5f}", flush=True)

    def barrier(self):
        """Wait for all enqueued device work via a real fetch
        (``jax.block_until_ready`` is a no-op on the axon remote platform;
        fetching the deferred last-dispatch loss is ordered after every
        prior dispatch on the device stream)."""
        self._flush_epoch_log()

    def train_one_epoch(self, data_loader, log_interval: int = 10):
        self._flush_epoch_log()
        if isinstance(data_loader, DeviceResidentLoader):
            return self.train_one_epoch_resident(data_loader, log_interval)
        # Losses stay on device until a log boundary: float(loss) every step
        # would force a host sync per dispatch and serialize the pipeline.
        pending, done = [], 0
        n_total = len(data_loader)

        def flush():
            nonlocal pending
            if pending:
                mean = float(np.mean([np.mean(np.asarray(l)) for l in pending]))
                print(f"  step {done}/{n_total} loss {mean:.5f}", flush=True)
                pending = []

        if self._train_step_scan is None:
            for x, y, w in prefetch(data_loader, self.prefetch_depth):
                xb, yb, wb = self._device_batch(x, y, w)
                self.rng, k = jax.random.split(self.rng)
                (self.params, self.opt_state, self.state,
                 loss) = self._train_step(
                    self.params, self.opt_state, self.state, xb, yb, wb, k)
                pending.append(loss)
                done += 1
                if done % log_interval == 0:
                    flush()
            flush()
            return

        # scanned path: S batches stacked to [S, B] per dispatch; the stack
        # (real memcpy work) runs on the prefetch thread, off the dispatch
        # critical path
        for kind, payload in prefetch(self._scan_producer(data_loader),
                                      self.prefetch_depth):
            if kind == "scan":
                pending.append(self._dispatch_scan(payload))
                done += self.scan_steps
                if done % log_interval < self.scan_steps:
                    flush()
            else:  # remainder < scan_steps: single steps
                x, y, w = payload
                xb, yb, wb = self._device_batch(x, y, w)
                self.rng, k = jax.random.split(self.rng)
                (self.params, self.opt_state, self.state,
                 loss) = self._train_step(
                    self.params, self.opt_state, self.state, xb, yb, wb, k)
                pending.append(loss)
                done += 1
        flush()

    # -- device-resident epochs (data/device.py) -----------------------

    def _build_train_step_scan_resident(self, optimizer, loader):
        """S steps per dispatch with ON-DEVICE batch assembly: the scan
        body gathers each batch's rows from the resident column matrices
        (two row gathers) instead of consuming host-built arrays.

        The dispatch's ids ``[S, B]`` arrive via the prefetch thread (the
        upload overlaps the previous dispatch's execution); the
        per-dispatch RNG keys are chained in ONE device op per epoch
        (``_chain_keys``) and sliced on device by the traced dispatch
        index ``d``, and the padding weights are derived from position
        math (``flat epoch position < n_rows`` — exactly BatchIterable's
        repeat-row-0 padding mask). vs round 4 this removes one upload
        and one eager `jax.random.split` per dispatch — each eager device
        op is a tunnel round-trip on the axon platform (VERDICT r4 #4)."""
        body = self._make_step_body(optimizer)
        gather_batch = loader.gather_batch
        per_dispatch = self._resident_gather == "dispatch"
        # device_shuffle mode: the ids operand is the whole epoch's
        # DEVICE-GENERATED [n_disp, S, B] permutation, sliced in-jit by d
        # (no per-dispatch upload exists to prefetch)
        ids_by_index = getattr(loader, "device_shuffle", False)
        n_rows = loader.n
        s = max(self.scan_steps, 1)
        b = loader.batch_size

        @self._jit()
        def scan_step(params, opt_state, state, int_mat, float_mat,
                      ids, keys_all, d):
            if ids_by_index:
                ids = jax.lax.dynamic_index_in_dim(ids, d, 0,
                                                   keepdims=False)  # [S, B]
            rng = jax.lax.dynamic_index_in_dim(keys_all, d, 0,
                                               keepdims=False)
            # padding-weight mask from flat epoch positions (rows past the
            # dataset's end are the repeated-pad tail with weight 0)
            pos = (d * (s * b)
                   + jnp.arange(s * b, dtype=jnp.int32).reshape(s, b))
            ws = (pos < n_rows).astype(jnp.float32)
            if per_dispatch:
                # ONE [S*B]-row gather per matrix per dispatch; the scan
                # then consumes pre-gathered [S, B, C] slices
                flat = ids.reshape(-1)
                xi_all = int_mat[flat].reshape(s, b, -1)
                xf_all = float_mat[flat].reshape(s, b, -1)
                batches = (xi_all, xf_all, ws)
            else:
                batches = (ids, ws)

            def f(carry, batch):
                params, opt_state, state, rng = carry
                if per_dispatch:
                    xi, xf, w = batch
                else:
                    bids, w = batch
                    xi, xf = int_mat[bids], float_mat[bids]
                x, y = gather_batch(xi, xf, None)
                rng, k = jax.random.split(rng)
                params, opt_state, state, loss = body(
                    params, opt_state, state, x, y, w, k)
                return (params, opt_state, state, rng), loss

            (params, opt_state, state, _), losses = jax.lax.scan(
                f, (params, opt_state, state, rng), batches)
            return params, opt_state, state, losses

        return scan_step

    @staticmethod
    @partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
    def _device_epoch_ids(seed, n, bs, s, n_disp, shuffle):
        """The epoch's permuted row ids generated ON DEVICE
        (``DeviceResidentLoader(device_shuffle=True)``): one tiny seed
        upload replaces the host's O(N) RNG pass and the O(N)
        permutation transfer. Same padding semantics as ``epoch_perm``
        (the final partial batch repeats its first row). Returns
        ``(scan_ids [n_disp, S, B], tail_ids [nb*B - n_disp*S*B])``."""
        key = jax.random.PRNGKey(seed)
        idx = (jax.random.permutation(key, n).astype(jnp.int32) if shuffle
               else jnp.arange(n, dtype=jnp.int32))
        rem = n % bs
        if rem:
            idx = jnp.concatenate(
                [idx, jnp.broadcast_to(idx[n - rem], (bs - rem,))])
        cut = n_disp * s * bs
        return idx[:cut].reshape(n_disp, s, bs), idx[cut:]

    @staticmethod
    @partial(jax.jit, static_argnums=(1,))
    def _chain_keys(rng, n):
        """``n`` keys from the SAME sequential split stream the host loop
        would produce (``rng, k = split(rng)`` n times), in ONE device
        dispatch. Returns ``(next_rng, keys[n])``."""
        def f(c, _):
            c, k = jax.random.split(c)
            return c, k

        return jax.lax.scan(f, rng, None, length=n)

    def _resident_scan_fn(self, loader):
        # cache holds STRONG refs to (loader, optimizer) and compares by
        # identity — id()-keyed caching would alias if a freed loader's id
        # were reused, silently running a stale gather_batch closure
        # (distinct n_disp epoch shapes retrace under the same jit)
        cache = getattr(self, "_resident_cache", None)
        if (cache is None or cache[0] is not loader
                or cache[1] is not self.optimizer):
            self._resident_cache = (
                loader, self.optimizer,
                self._build_train_step_scan_resident(self.optimizer, loader),
            )
        return self._resident_cache[2]

    def train_one_epoch_resident(self, loader: DeviceResidentLoader,
                                 log_interval: int = 10):
        """One epoch from device-resident columns (same batch semantics as
        the host path — tests/test_device_resident.py). Full scan_steps
        dispatches assemble batches on device; the remainder (< scan_steps
        batches) reuses the already-compiled single-step program with
        host-built batches, so no extra XLA program exists for the tail.

        Per-epoch host work (VERDICT r4 #4): the dispatch key chain is ONE
        device op (same split stream as the host loop) and the padding
        weights are position math inside the jitted step. The dispatch
        ids come either as prefetch-threaded per-dispatch uploads (host
        permutation stream — the [S*B]-int transfer for dispatch d+1
        overlaps dispatch d's execution; an epoch-upfront single upload
        measured WORSE, serializing ~16 MB into the epoch start) or, with
        ``device_shuffle=True``, as one DEVICE-GENERATED [n_disp, S, B]
        permutation sliced in-jit (no host RNG pass, no upload;
        jax.random stream — documented opt-in)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._flush_epoch_log()
        s = max(self.scan_steps, 1)
        b = loader.batch_size
        nb = len(loader)
        n_disp = nb // s
        fn = self._resident_scan_fn(loader) if n_disp else None
        int_mat, float_mat = self._resident_mats(loader)
        n_rows = n_disp * s * b
        if n_disp:
            self.rng, keys_all = self._chain_keys(self.rng, n_disp)

        tail_ids = None            # remainder batches' row ids (host)
        if getattr(loader, "device_shuffle", False):
            ids_all, tail = self._device_epoch_ids(
                np.uint32(loader.epoch_seed()), loader.n, b, s, n_disp,
                loader.shuffle)
            dispatches = ((d, ids_all) for d in range(n_disp))
            if n_disp * s < nb:
                tail_ids = np.asarray(tail)   # one small fetch
        else:
            perm, _ = loader.epoch_perm()
            ids_host = perm[:n_rows].reshape(n_disp, s, b)
            sh = (NamedSharding(self.mesh, P(None, "data"))
                  if self.mesh is not None else None)

            def _uploads():
                for d in range(n_disp):
                    ids_d = jnp.asarray(ids_host[d])
                    if sh is not None:
                        ids_d = jax.device_put(ids_d, sh)
                    yield d, ids_d

            dispatches = prefetch(_uploads(), self.prefetch_depth)
            tail_ids = perm[n_rows:]

        pending, done = [], 0
        for d, ids_op in dispatches:
            (self.params, self.opt_state, self.state,
             losses) = fn(self.params, self.opt_state, self.state,
                          int_mat, float_mat, ids_op, keys_all,
                          jnp.int32(d))
            pending.append(losses)
            done += s
            if done % max(log_interval, 1) < s:
                mean = float(np.mean([np.mean(np.asarray(l))
                                      for l in pending]))
                print(f"  step {done}/{nb} loss {mean:.5f}", flush=True)
                pending = []
        # remainder: host-built batches through the single-step program;
        # padding weights from position math (identical to epoch_perm's w:
        # zeros exactly on the repeated-pad tail past the dataset's end)
        ds = loader.dataset
        for bi in range(n_disp * s, nb):
            off = (bi - n_disp * s) * b
            sel = tail_ids[off:off + b]
            xb = {kk: v[sel] for kk, v in ds.x.items()}
            yb = ds.y[sel]
            wb = (np.arange(bi * b, (bi + 1) * b) < loader.n
                  ).astype(np.float32)
            xb, yb, wb = self._device_batch(xb, yb, wb)
            self.rng, k = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state,
             loss) = self._train_step(
                self.params, self.opt_state, self.state, xb, yb, wb, k)
            pending.append(loss)
            done += 1
        if pending:
            # DEFER the final loss fetch (losses stay on device): fetching
            # here would make the epoch boundary wait for the last dispatch
            # before epoch N+1's uploads could even start — measured as THE
            # residual E2E gap (PROFILE.md SS4). The line prints at the
            # next trainer entry point (_flush_epoch_log), whose fetch
            # doubles as the real barrier.
            self._deferred_log = (done, nb, pending)

    def _resident_mats(self, loader):
        """The loader's resident column matrices, mesh-replicated ONCE per
        (loader, mesh): these arrays never change, and re-placing them
        every epoch is an O(N-rows) transfer (ADVICE r3). Strong refs +
        identity compare, like _resident_scan_fn."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        int_mat, float_mat = loader.int_mat, loader.float_mat
        if self.mesh is None:
            return int_mat, float_mat
        cache = getattr(self, "_resident_repl", None)
        if (cache is None or cache[0] is not loader
                or cache[1] is not self.mesh):
            repl = NamedSharding(self.mesh, P())
            self._resident_repl = (
                loader, self.mesh,
                jax.device_put(int_mat, repl),
                jax.device_put(float_mat, repl),
            )
        return self._resident_repl[2], self._resident_repl[3]

    def _scan_producer(self, data_loader):
        """Group the loader into ``("scan", stacked)`` items of ``scan_steps``
        batches (stacked host-side to [S, B]) plus trailing ``("single", b)``
        remainders."""
        buf = []
        for batch in data_loader:
            buf.append(batch)
            if len(buf) == self.scan_steps:
                yield "scan", self._stack_host(buf)
                buf = []
        for b in buf:
            yield "single", b

    @staticmethod
    def _stack_host(batches):
        xs = {k: np.stack([b[0][k] for b in batches])
              for k in batches[0][0]}
        ys = np.stack([np.asarray(b[1], np.float32) for b in batches])
        ws = np.stack([b[2] for b in batches])
        return xs, ys, ws

    def _dispatch_scan(self, stacked):
        """Run one scanned dispatch on host-stacked [S, B] arrays. Returns
        the [S] per-step loss array (on device)."""
        xs, ys, ws = stacked
        xb = {k: jnp.asarray(v) for k, v in xs.items()}
        yb, wb = jnp.asarray(ys), jnp.asarray(ws)
        if self._shard_stacked is not None:
            xb, yb, wb = self._shard_stacked(xb, yb, wb)
        self.rng, k = jax.random.split(self.rng)
        (self.params, self.opt_state, self.state,
         losses) = self._train_step_scan(
            self.params, self.opt_state, self.state, xb, yb, wb, k)
        return losses

    def fit(self, train_dataloader, val_dataloader=None):
        for epoch_i in range(self.epoch_i, self.n_epoch):
            print("epoch:", epoch_i)
            self.epoch_i = epoch_i
            if self._epoch_schedule is not None:
                # epoch-level StepLR: rebuild the constant-lr optimizer with
                # the scheduled multiplier (cheap; models are small)
                scale = self._epoch_schedule(epoch_i)
                p = dict(self._opt_params)
                p["lr"] = self._base_lr * float(scale)
                self.optimizer = self._wrap_frozen(self._opt_fn(**p))
                self._lr_now = p["lr"]
                self._train_step = self._build_train_step(self.optimizer)
                if self.scan_steps > 1:
                    self._train_step_scan = self._build_train_step_scan(
                        self.optimizer)
            self.train_one_epoch(train_dataloader)
            if val_dataloader:
                auc, logloss = self.evaluate(self.model, val_dataloader)
                print(f"epoch:{epoch_i} | val auc: {auc} | val logloss: {logloss}")
                # snapshot with the packed table materialized so the
                # combined-store mode restores embedding weights too
                if self.early_stopper.stop_training(
                        auc, (self._params_for_eval(), self.state)):
                    print(f"validation: best auc: {self.early_stopper.best_auc}")
                    best_params, self.state = self.early_stopper.best_weights
                    self._adopt_params(best_params)
                    break
        # NOTE: like the reference, best weights are restored only on early
        # stop; a natural end of the epoch loop keeps last-epoch weights
        # (ctr_trainer.py:88-93).
        time_now = time.strftime("%m_%d_%H_%M", time.localtime())
        name = (
            type(self.model).__name__ + "_" + self.data_set_type + "_" + time_now
        )
        self.save(os.path.join(self.model_path, name))

    # ------------------------------------------------------------------

    def _predict_loader(self, data_loader):
        """Run the jitted eval step over a loader; returns (y, p, domain, w)."""
        self._flush_epoch_log()
        ys, ps, ds, ws = [], [], [], []
        eval_params = self._params_for_eval()
        for x, y, w in prefetch(data_loader, self.prefetch_depth):
            xb, yb, wb = self._device_batch(x, y, w)
            probs = self._eval_step(eval_params, self.state, xb, wb)
            keep = np.asarray(w) > 0
            ps.append(np.asarray(probs)[keep])
            if y is not None:
                ys.append(np.asarray(y)[keep])
            if "domain_indicator" in x:
                ds.append(np.asarray(x["domain_indicator"])[keep])
            ws.append(np.asarray(w)[keep])
        cat = lambda lst: np.concatenate(lst) if lst else np.array([])
        return cat(ys), cat(ps), cat(ds), cat(ws)

    def _predict_loader_device(self, data_loader):
        """Device-resident prediction pass: probabilities, labels, domain
        ids and padding weights stay ON DEVICE (one concatenated array
        each) — no per-batch host transfer. Large eval sets then score
        with the O(n log n) device AUC instead of the host rank loop."""
        self._flush_epoch_log()
        ys, ps, ds, ws = [], [], [], []
        eval_params = self._params_for_eval()
        for x, y, w in prefetch(data_loader, self.prefetch_depth):
            xb, yb, wb = self._device_batch(x, y, w)
            if yb is None:
                # a predict-style loader (no labels) would otherwise fail
                # deep inside jnp.concatenate (ADVICE r4)
                raise ValueError(
                    "on_device evaluation requires labeled batches; use "
                    "predict() (host path) for unlabeled loaders")
            ps.append(self._eval_step(eval_params, self.state, xb, wb))
            ys.append(yb)
            ws.append(wb)
            if "domain_indicator" in xb:
                ds.append(xb["domain_indicator"])
        cat = lambda lst: (jnp.concatenate(lst) if lst
                           else jnp.zeros((0,), jnp.float32))
        return cat(ys), cat(ps), cat(ds), cat(ws)

    def evaluate(self, model, data_loader, mode: str = "val",
                 on_device: bool = False):
        """Overall AUC + logloss (reference ctr_trainer.py:99-111).

        ``on_device=True``: score with the device AUC/logloss under the
        padding-weight mask — validated equal to the host path on all six
        dataset samples (scripts/validate_device_eval.py) and in
        tests/test_metrics_trainer_data.py.
        """
        if on_device:
            y, p, _, w = self._predict_loader_device(data_loader)
            self._check_eval_scores(p)
            m = w > 0
            self._check_two_classes(y, m)
            return (float(auc_score_device(y, p, m)),
                    float(log_loss_device(y, p, m)))
        y, p, _, _ = self._predict_loader(data_loader)
        return auc_score(y, p), log_loss_score(y, p)

    @staticmethod
    def _check_two_classes(y, m):
        """Device-path parity with the host AUC's fail-loud behavior: a
        single-class subset would silently divide by zero on device."""
        n_pos = float(jnp.sum(y * m))
        n = float(jnp.sum(m))
        if n_pos == 0 or n_pos == n:
            raise ValueError(
                "Only one class present in y_true. ROC AUC score is not "
                "defined."
            )

    @staticmethod
    def _check_eval_scores(p):
        """Device-path parity with the host AUC's NaN check: a diverged
        model must raise, not silently return a bogus AUC (ADVICE r4)."""
        if bool(jnp.isnan(p).any()):
            raise ValueError("Input contains NaN.")

    def evaluate_multi_domain_loss(self, model, data_loader, domain_num: int,
                                   on_device: bool = False):
        """Per-domain + overall AUC/logloss (reference ctr_trainer.py:113-152).

        Returns ``(domain_logloss[D], domain_auc[D], total_logloss,
        total_auc)`` with ``None`` for empty domains, exactly as reference.
        ``on_device=True`` computes every metric from device arrays with
        static-shape per-domain masks (one host fetch for the counts).
        """
        if on_device:
            y, p, d, w = self._predict_loader_device(data_loader)
            self._check_eval_scores(p)
            keep = w > 0
            counts = np.asarray(jnp.stack(
                [jnp.sum((d == dom) & keep) for dom in range(domain_num)]))
            domain_logloss_list, domain_auc_list = [], []
            for dom in range(domain_num):
                if counts[dom] > 0:
                    m = (d == dom) & keep
                    # match the host path: single-class domains raise
                    self._check_two_classes(y, m)
                    domain_logloss_list.append(
                        float(log_loss_device(y, p, m)))
                    domain_auc_list.append(float(auc_score_device(y, p, m)))
                else:
                    domain_logloss_list.append(None)
                    domain_auc_list.append(None)
            any_rows = bool(counts.sum() > 0) or bool(
                float(jnp.sum(keep)) > 0)
            if any_rows:
                self._check_two_classes(y, keep)
            total_logloss = (float(log_loss_device(y, p, keep))
                             if any_rows else None)
            total_auc = (float(auc_score_device(y, p, keep))
                         if any_rows else None)
            return (domain_logloss_list, domain_auc_list, total_logloss,
                    total_auc)
        y, p, d, _ = self._predict_loader(data_loader)
        domain_logloss_list, domain_auc_list = [], []
        for dom in range(domain_num):
            m = d == dom
            if m.any():
                domain_logloss_list.append(log_loss_score(y[m], p[m]))
                domain_auc_list.append(auc_score(y[m], p[m]))
            else:
                domain_logloss_list.append(None)
                domain_auc_list.append(None)
        total_logloss = log_loss_score(y, p) if len(p) else None
        total_auc = auc_score(y, p) if len(p) else None
        return domain_logloss_list, domain_auc_list, total_logloss, total_auc

    def predict(self, model, data_loader):
        _, p, _, _ = self._predict_loader(data_loader)
        return list(p)

    # ------------------------------------------------------------------

    def _opt_state_for_save(self):
        """Opt state with the authority weights DEDUPLICATED out: the saved
        params tree already carries the materialized packed table
        (_params_for_eval), so occurrence mode stores only the moment
        columns of comb and sorted mode drops its padded table entirely
        (~25-33% smaller checkpoints at production vocab; ADVICE r3).
        ``load`` reconstructs both from the params tree."""
        if self._comb_mode:
            d = self.model.embedding.packed_dim
            emb = self.opt_state["emb"]
            return {**self.opt_state,
                    "emb": {**emb, "comb": emb["comb"][:, d:]}}
        if self._sorted_mode:
            emb = {k: v for k, v in self.opt_state["emb"].items()
                   if k != "table"}
            return {**self.opt_state, "emb": emb}
        return self.opt_state

    def save(self, path: str):
        self._flush_epoch_log()
        ckpt_lib.save(
            path,
            {"params": self._params_for_eval(), "state": self.state,
             "opt_state": self._opt_state_for_save()},
            metadata={
                "epoch": self.epoch_i,
                "best_auc": self.early_stopper.best_auc,
                "model": type(self.model).__name__,
                "sparse_embedding_updates": bool(self._sparse_emb),
                "sparse_update_impl": (self._sparse_impl if self._sparse_emb
                                       else None),
                # sorted-mode packed-layout provenance (informational; load
                # re-lays-out across mesh/block changes automatically)
                "sorted_block_rows": (self._sorted_block_rows
                                      if self._sorted_mode else None),
                "sorted_shards": (self._sorted_shards if self._sorted_mode
                                  else None),
            },
        )

    def load(self, path: str):
        meta_pre = ckpt_lib.read_metadata(path)
        if "sparse_update_impl" in meta_pre:
            saved_impl = meta_pre["sparse_update_impl"]
            mine = self._sparse_impl if self._sparse_emb else None
            if saved_impl != mine:
                raise ValueError(
                    f"checkpoint was written with sparse_update_impl="
                    f"{saved_impl!r} but this trainer uses {mine!r}; "
                    "construct CTRTrainer with the matching "
                    "sparse_embedding_updates/sparse_update_impl to resume"
                )
        coerce = None
        if self._sorted_mode:
            # ELASTIC RESHARDING: the sorted authority moments are saved in
            # the packed [V2/r, 128] tile layout, whose padded length
            # depends on block_rows AND the mesh's embed-shard count
            # (sorted_dense_adam_init). A checkpoint written under a
            # different mesh size (or block size) re-lays-out here:
            # unpack to the live [V, D] rows, repack for THIS trainer's
            # layout (pad rows are zero in both, so this is lossless).
            col = self.model.embedding

            def coerce(key, arr, expected):
                from ..ops.pallas.sorted_adam import pack_rows, unpack_rows

                if (not key.startswith("opt_state/emb/") or arr.ndim != 2
                        or arr.shape[-1] != 128):
                    return arr
                live = unpack_rows(jnp.asarray(arr), col.packed_vocab,
                                   col.packed_dim)
                return np.asarray(pack_rows(live, self._sorted_block_rows,
                                            n_shards=self._sorted_shards))

        tree, meta = ckpt_lib.load(
            path,
            {"params": self._params_for_eval(), "state": self.state,
             "opt_state": self._opt_state_for_save()},
            coerce=coerce,
        )
        self.state = tree["state"]
        loaded_opt = tree["opt_state"]
        if self._comb_mode:
            # rebuild comb = [packed weights | saved moments]; the weight
            # columns are re-filled from params by _adopt_params below
            d = self.model.embedding.packed_dim
            emb = loaded_opt["emb"]
            v = emb["comb"].shape[0]
            comb = jnp.concatenate(
                [jnp.zeros((v, d), jnp.float32), jnp.asarray(emb["comb"])],
                axis=1)
            loaded_opt = {**loaded_opt, "emb": {**emb, "comb": comb}}
        elif self._sorted_mode:
            # rebuild the padded authority table; rows re-filled from
            # params by _adopt_params below (pad rows stay zero)
            emb = dict(loaded_opt["emb"])
            emb["table"] = jnp.zeros_like(self.opt_state["emb"]["table"])
            loaded_opt = {**loaded_opt, "emb": emb}
        self.opt_state = loaded_opt
        self._adopt_params(tree["params"])
        self.epoch_i = int(meta.get("epoch", 0))
        self.early_stopper.best_auc = float(meta.get("best_auc", 0.0))
        return meta
