"""Benchmark: training throughput (examples/s/chip) of the flagship config.

Flagship = MMOE with the Ali-CCP shape (23 sparse x 16-dim embeddings +
8 dense, experts [256,128,64,32,16,8], 3 domains), batch 4096 — the
reference's headline benchmark config (run_ali_ccp…py:140-141, batch
4096 per :193). Measures the REAL CTRTrainer jitted train step (forward +
BCE + backward + torch-Adam) on the available accelerator, at TWO shapes:

1. the 20k-vocab flagship (the primary metric, comparable to the torch-CPU
   baseline in BASELINE_MEASURED.json), and
2. the PRODUCTION vocabulary (467k rows/feature -> packed [10.7M, 16] —
   the reference's real Ali-CCP scale, run_ali_ccp…py:26) with the best
   sparse embedding-update impl, reported as the ``prod_vocab`` sub-object
   of the same JSON line so the headline can never be only the flattering
   shape (VERDICT r3 #2).

Round-4 default change: the PRIMARY metric also runs the `sorted`
chunk-vectorized streaming update (`SWR_SPARSE_EMB=1 SWR_SPARSE_IMPL=
sorted` is now the default) — measured 2.26M vs 1.43M examples/s
same-session at the 20k flagship shape with IDENTICAL semantics (exact
dense torch-Adam; the impl is pinned against the plain dense trainer in
tests/test_sorted_adam.py). `SWR_SPARSE_EMB=0` restores the plain
optax-dense step.

Modes (env vars, default = full-parity f32, both shapes):
  SWR_SPARSE_EMB=0  plain optax dense-Adam step for the primary metric
                    (r3's default; same math, slower mechanism)
  SWR_SPARSE_IMPL=M embedding-update formulation for the primary metric:
                    occurrence | winner | dense | sorted (default)
  SWR_PROD=0        skip the production-vocab measurement
  SWR_PROD_VOCAB=N  production per-feature vocab (default 467000)
  SWR_PROD_IMPL=M   impl for the production measurement (default sorted —
                    the chunk-vectorized exact-dense streaming kernel,
                    ops/pallas/sorted_adam.py)
  SWR_PROD_BIG=0    skip the third measurement: the production vocab at the
                    DOCUMENTED production batch (SWR_PROD_BIG_BATCH,
                    default 16384 — the batch-scaling lever of PROFILE.md
                    SS5, reported as ``prod_vocab_b16384``; VERDICT r4 #8)
  SWR_BF16=1        bf16 matmul inputs, f32 accumulation
  SWR_VOCAB=N       primary per-feature vocab (default 20000)
  SWR_BATCH=N       batch size (default 4096)
  SWR_EMB_GRAD=M    embedding-grad mode: auto|onehot|scatter
  SWR_SCAN=S        S optimizer steps per dispatch via lax.scan (default 64)
  SWR_TIME_BUDGET=T seconds of timed measurement per shape (default 45)
  SWR_E2E=1         measure the REAL input pipeline end to end (device-
                    resident epochs, data/device.py; SWR_E2E_HOST=1 for the
                    host pipeline; SWR_E2E_DISPATCHES=K epoch size).
                    Production-vocab is skipped in this mode.
  SWR_BENCH_DEADLINE=T  stall guard (default 1200 s): if the run hasn't
                    produced its measurement by T, a watchdog emits a
                    partial-but-parseable JSON line whose metric name
                    carries a "_partial" suffix (so a first-line parser
                    can never mistake it for the real measurement; a
                    last-line parser sees the real line if the stall
                    resolves). "compile_s" is always present.

Timing uses a REAL device-to-host fetch as the barrier:
``jax.block_until_ready`` is a no-op on the axon remote-TPU platform
(measured: returns in 0.7ms while the fetch of the same value takes the
full execution time), so any timing based on it only measures enqueue rate.

``vs_baseline`` compares against the PyTorch reference's measured
throughput for the identical model/batch on this host's CPU (the
reference's only non-CUDA device path), stored in BASELINE_MEASURED.json
by scripts/measure_torch_baseline.py.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
 "compile_s": ..., "prod_vocab": {"vocab": V, "impl": ..., "value": M,
 "unit": ..., "compile_s": ...}, "prod_vocab_b16384": {..., "batch": 16384}}
"""

import json
import os
import sys
import threading
import time

import numpy as np


def _progress(msg: str) -> None:
    """Progress to stderr: stdout stays reserved for the JSON line(s), and a
    driver that times out still sees how far the bench got."""
    print(f"bench: {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Stall guard: the remote-compile service occasionally stalls for 10+ minutes
# even on a warm cache (CLAUDE.md). If the whole run exceeds
# SWR_BENCH_DEADLINE seconds before the real measurement lands, a watchdog
# thread emits a PARTIAL-but-parseable JSON line (value 0, "partial": true,
# metric suffixed "_partial", "stage": where it was stuck) so a driver that
# kills the process on timeout still finds a valid line on stdout. If the
# run later completes, the real line is printed too — a last-line parser
# sees the good number; a first-line parser sees a metric name that cannot
# collide with the real one. tests/test_bench_contract.py pins this.
# ---------------------------------------------------------------------------

_stage = {"name": "init", "t0": time.perf_counter()}
_emit_lock = threading.Lock()


def _set_stage(name: str) -> None:
    _stage["name"] = name


def _metric_name():
    return ("train_e2e_throughput_mmoe_aliccp_b4096" if E2E
            else "train_throughput_mmoe_aliccp_b4096")


def _partial_payload():
    return {
        "metric": _metric_name() + "_partial",
        "value": 0.0,
        "unit": "examples/s/chip",
        "vs_baseline": None,
        "partial": True,
        "stage": _stage["name"],
        "compile_s": round(time.perf_counter() - _stage["t0"], 1),
    }


def _emit_partial():
    with _emit_lock:
        print(json.dumps(_partial_payload()), flush=True)
    _progress(f"deadline hit during stage '{_stage['name']}' — partial JSON "
              "line emitted; continuing in case the stall resolves")


def _start_watchdog():
    deadline = float(os.environ.get("SWR_BENCH_DEADLINE", 1200))
    timer = threading.Timer(deadline, _emit_partial)
    timer.daemon = True
    timer.start()
    return timer

BATCH = int(os.environ.get("SWR_BATCH", 4096))
N_SPARSE, N_DENSE, DOMAINS = 23, 8, 3
VOCAB = int(os.environ.get("SWR_VOCAB", 20_000))
# default 1280 steps = 20 scanned dispatches: enough to amortize the final
# device->host fetch that serves as the timing barrier (3 dispatches read
# ~5% low; compile is persistent-cached so the extra steps are cheap)
STEPS = int(os.environ.get("SWR_STEPS", 1280))
SPARSE = os.environ.get("SWR_SPARSE_EMB", "1") == "1"
SPARSE_IMPL = os.environ.get("SWR_SPARSE_IMPL", "sorted")
BF16 = os.environ.get("SWR_BF16", "0") == "1"
SCAN = int(os.environ.get("SWR_SCAN", 64))
E2E = os.environ.get("SWR_E2E", "0") == "1"
PROD = os.environ.get("SWR_PROD", "1") == "1" and not E2E
PROD_VOCAB = int(os.environ.get("SWR_PROD_VOCAB", 467_000))
PROD_IMPL = os.environ.get("SWR_PROD_IMPL", "sorted")
PROD_BIG = os.environ.get("SWR_PROD_BIG", "1") == "1" and PROD
PROD_BIG_BATCH = int(os.environ.get("SWR_PROD_BIG_BATCH", 16384))


def _make_batch(vocab, batch=None):
    import jax.numpy as jnp

    batch = BATCH if batch is None else batch
    rng = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(rng.integers(0, vocab, batch).astype(np.int32))
         for i in range(N_SPARSE)}
    x.update({f"d{i}": jnp.asarray(rng.normal(size=batch).astype(np.float32))
              for i in range(N_DENSE)})
    x["domain_indicator"] = jnp.asarray(
        rng.integers(0, DOMAINS, batch).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))
    w = jnp.ones((batch,), jnp.float32)
    return x, y, w


def _make_trainer(vocab, sparse, impl):
    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    sparse_feas = [SparseFeature(f"s{i}", vocab_size=vocab, embed_dim=16)
                   for i in range(N_SPARSE)]
    dense_feas = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    model = MMOE(dense_feas + sparse_feas, DOMAINS, n_expert=DOMAINS,
                 expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                 tower_params={"dims": [16]})
    return CTRTrainer(model, sparse_embedding_updates=sparse,
                      sparse_update_impl=impl, scan_steps=SCAN,
                      sorted_block_rows=(int(os.environ[
                          "SWR_SORTED_BLOCK_ROWS"])
                          if os.environ.get("SWR_SORTED_BLOCK_ROWS")
                          else None),   # None = trainer auto by table size
                      sorted_chunk_ids=int(os.environ.get(
                          "SWR_SORTED_CHUNK_IDS", 128)),
                      sorted_reorder=os.environ.get("SWR_SORTED_REORDER",
                                                    "gather"),
                      sorted_dtype=os.environ.get("SWR_SORTED_DTYPE") or None,
                      sorted_precision=os.environ.get(
                          "SWR_SORTED_PRECISION") or None,
                      resident_gather=os.environ.get("SWR_RESIDENT_GATHER",
                                                     "step"))


def _measure_device_only(vocab, sparse, impl, stage_prefix="",
                         batch=None):
    """Compile + time the jitted train step at one shape.

    ``batch`` overrides the global BATCH (the prod_vocab_b16384
    measurement). In E2E mode this measurement is NOT discarded: it is
    the same-session, same-config denominator behind the JSON line's
    ``fraction_of_device_only`` (the BASELINE.md >=90% bar). Returns
    (examples_per_s, compile_s, trainer, per_call)."""
    import jax
    import jax.numpy as jnp

    batch = BATCH if batch is None else batch
    _set_stage(stage_prefix + "init_params")
    _progress(f"{stage_prefix or 'primary '}init (vocab={vocab}, "
              f"sparse={sparse}, impl={impl}, batch={batch})")
    trainer = _make_trainer(vocab, sparse, impl)
    params, opt_state, state = trainer.params, trainer.opt_state, trainer.state
    x, y, w = _make_batch(vocab, batch)

    if SCAN > 1:
        xs = {k: jnp.broadcast_to(v, (SCAN,) + v.shape) for k, v in x.items()}
        ys = jnp.broadcast_to(y, (SCAN,) + y.shape)
        ws = jnp.broadcast_to(w, (SCAN,) + w.shape)
        raw = trainer._train_step_scan
        step = lambda p, o, s, k: raw(p, o, s, xs, ys, ws, k)
        n_calls = max(3, STEPS // SCAN)
    else:
        step = lambda p, o, s, k: trainer._train_step(p, o, s, x, y, w, k)
        n_calls = STEPS

    def sync(v):
        # real barrier: block_until_ready is a no-op on the axon platform
        return float(np.asarray(v).ravel()[-1])

    key = jax.random.PRNGKey(1)
    _set_stage(stage_prefix + "compiling")
    _progress(f"compiling (backend={jax.default_backend()}, batch={batch}, "
              f"vocab={vocab}, scan={SCAN}; cold remote compiles take "
              "minutes, warm persistent cache seconds)")
    t_c = time.perf_counter()
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, state, loss = step(params, opt_state, state, k)
    sync(loss)
    compile_s = time.perf_counter() - t_c
    _set_stage(stage_prefix + "measuring")
    _progress(f"compiled+warm in {compile_s:.1f}s")

    # calibrate: one synced dispatch picks how many timed calls fit the
    # budget, so the bench finishes inside the driver's timeout even on a
    # slow tunnel session (floor 3 dispatches for a stable mean)
    t_c = time.perf_counter()
    key, k = jax.random.split(key)
    params, opt_state, state, loss = step(params, opt_state, state, k)
    sync(loss)
    per_call = time.perf_counter() - t_c
    budget = float(os.environ.get("SWR_TIME_BUDGET", 45))
    n_calls = max(3, min(n_calls, int(budget / max(per_call, 1e-4))))
    _progress(f"calibrated {per_call * 1e3:.1f} ms/dispatch -> "
              f"{n_calls} timed dispatches")

    t0 = time.perf_counter()
    for _ in range(n_calls):
        key, k = jax.random.split(key)
        params, opt_state, state, loss = step(params, opt_state, state, k)
    sync(loss)
    dt = time.perf_counter() - t0
    eps = n_calls * (SCAN if SCAN > 1 else 1) * batch / dt
    return eps, compile_s, trainer, per_call


def _bench_e2e(trainer, budget):
    """Time CTRTrainer.train_one_epoch over a REAL epoch pipeline.

    Default: the device-resident pipeline (data/device.py) — columns
    uploaded once, batches gathered on device inside the scanned step; the
    host's per-epoch work is one RNG permutation (this is a NEW XLA program
    vs the default mode: expect one extra compile on a cold cache).
    ``SWR_E2E_HOST=1``: the host pipeline instead (BatchIterable ->
    prefetch thread -> [S, B] stacking), which reuses the default mode's
    exact XLA program. Row count is an exact multiple of scan_steps*batch
    so either epoch is pure scanned dispatches. Returns
    (examples_timed, seconds).
    """
    import contextlib

    from scenario_wise_rec_tpu.data.dataset import (BatchIterable,
                                                    ColumnarDataset)
    from scenario_wise_rec_tpu.data.device import DeviceResidentLoader

    n_disp = max(1, int(os.environ.get("SWR_E2E_DISPATCHES", 16)))
    rows = n_disp * max(SCAN, 1) * BATCH
    rng = np.random.default_rng(7)
    cols = {f"s{i}": rng.integers(0, VOCAB, rows).astype(np.int32)
            for i in range(N_SPARSE)}
    cols.update({f"d{i}": rng.normal(size=rows).astype(np.float32)
                 for i in range(N_DENSE)})
    cols["domain_indicator"] = rng.integers(0, DOMAINS, rows).astype(np.int32)
    y = rng.integers(0, 2, rows).astype(np.float32)
    ds = ColumnarDataset(cols, y)
    if os.environ.get("SWR_E2E_HOST", "0") == "1":
        loader = BatchIterable(ds, BATCH, shuffle=True, seed=7)
    else:
        # SWR_E2E_SHUFFLE=device: epoch permutations generated ON DEVICE
        # (zero host RNG pass, zero permutation upload; jax.random stream)
        loader = DeviceResidentLoader(
            ds, BATCH, seed=7,
            device_shuffle=os.environ.get("SWR_E2E_SHUFFLE") == "device")

    # the epoch loop logs per-epoch loss to stdout; keep stdout reserved
    # for the ONE JSON line (train_one_epoch's own end-of-epoch loss fetch
    # is the host-sync barrier, same as a real fit() epoch)
    with contextlib.redirect_stdout(sys.stderr):
        trainer.train_one_epoch(loader, log_interval=10**9)  # compile + warm
        trainer.barrier()   # resident epochs defer the end-of-epoch fetch
        # estimate on a SECOND warm epoch: the first includes the resident
        # program's compile, which would shrink n_epochs to 1 and leave the
        # per-epoch boundary unamortized (the quantity under test)
        t0 = time.perf_counter()
        trainer.train_one_epoch(loader, log_interval=10**9)
        trainer.barrier()
        epoch_est = max(time.perf_counter() - t0, 1e-3)
        n_epochs = max(3, min(50, int(budget / epoch_est)))
        _progress(f"e2e: {rows} rows/epoch ({n_disp} scanned dispatches, "
                  f"warm epoch {epoch_est:.1f}s), {n_epochs} timed epochs")
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            trainer.train_one_epoch(loader, log_interval=10**9)
        trainer.barrier()   # real fetch: waits for the last dispatch
        dt = time.perf_counter() - t0
    return n_epochs * rows, dt


def main():
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.core import config

    if BF16:
        config.set_compute_dtype(jnp.bfloat16)
    emb_grad = os.environ.get("SWR_EMB_GRAD")
    if emb_grad:
        config.set_embedding_grad_mode(emb_grad)

    timer = _start_watchdog()
    test_stall = float(os.environ.get("SWR_TEST_STALL_S", 0))
    if test_stall:  # simulated remote-compile stall (contract test hook)
        _set_stage("compiling")
        time.sleep(test_stall)

    eps, compile_s, trainer, per_call = _measure_device_only(
        VOCAB, SPARSE, SPARSE_IMPL)
    device_only_eps = None
    if E2E:
        # the device-only number above is the SAME-session, SAME-config
        # denominator for the pipeline fraction (BASELINE.md >=90% bar)
        device_only_eps = eps
        budget = float(os.environ.get("SWR_TIME_BUDGET", 45))
        n_examples, dt = _bench_e2e(trainer, budget)
        eps = n_examples / dt

    prod = None
    if PROD:
        # release the primary trainer's device buffers before the ~2 GB
        # production-shape allocations (one full-bench run hit a transient
        # RESOURCE_EXHAUSTED here with the primary still resident)
        import gc

        trainer = None
        gc.collect()
        prod_eps, prod_compile_s, _tr, _ = _measure_device_only(
            PROD_VOCAB, True, PROD_IMPL, stage_prefix="prod_")
        _tr = None
        gc.collect()
        prod = {
            "vocab": PROD_VOCAB,
            "impl": PROD_IMPL,
            "value": round(prod_eps, 1),
            "unit": "examples/s/chip",
            "compile_s": round(prod_compile_s, 1),
        }

    prod_big = None
    if PROD_BIG:
        # the documented production configuration: same vocab/impl at the
        # batch the batch-scaling lever recommends (PROFILE.md SS5;
        # VERDICT r4 #8 — the driver artifact should carry it, not only
        # the b4096 floor)
        big_eps, big_compile_s, _, _ = _measure_device_only(
            PROD_VOCAB, True, PROD_IMPL, stage_prefix="prod_big_",
            batch=PROD_BIG_BATCH)
        prod_big = {
            "vocab": PROD_VOCAB,
            "impl": PROD_IMPL,
            "batch": PROD_BIG_BATCH,
            "value": round(big_eps, 1),
            "unit": "examples/s/chip",
            "compile_s": round(big_compile_s, 1),
        }

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_eps = ref.get("torch_mmoe_examples_per_s")
        if ref_eps:
            vs = eps / ref_eps

    timer.cancel()
    payload = {
        "metric": _metric_name(),
        "value": round(eps, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "compile_s": round(compile_s, 1),
    }
    if device_only_eps:
        payload["device_only"] = round(device_only_eps, 1)
        payload["fraction_of_device_only"] = round(eps / device_only_eps, 4)
    if prod is not None:
        payload["prod_vocab"] = prod
    if prod_big is not None:
        payload[f"prod_vocab_b{PROD_BIG_BATCH}"] = prod_big
    with _emit_lock:
        print(json.dumps(payload))


if __name__ == "__main__":
    main()
