"""Targeted check: does AdaSparse's documented alpha-anneal deviation
explain its parity flags? (VERDICT r3 #6)

The reference advances ``alpha`` by ``delta_alpha`` on EVERY forward —
including every val/test eval batch (adasparse.py:61-62 runs inside
``forward`` under ``no_grad``). Ours advances it only on train steps
(state is threaded through the jitted train step; the eval step is pure,
models/adasparse.py). The cumulative difference after E epochs is
``delta_alpha * (E * n_val_batches + n_test_batches)`` — a ~1e-3 shift on
alpha ~= 1.0 for the parity protocol.

This script runs OUR movielens AdaSparse cell over seeds in two arms:
  A: as shipped (train-step-only anneal)
  B: reference-matched at epoch granularity — after each val evaluation
     alpha is bumped by ``delta_alpha * n_val_batches`` (the advances the
     reference's val forwards would have made), and before the final test
     pass by ``delta_alpha * n_test_batches / 2`` (the mid-pass average).
The PAIRED per-seed AUC differences measure the deviation's whole effect.
If |mean(B - A)| is far below the cross-seed sigma, the anneal deviation
cannot be the systematic cause of the flagged cells.

Runs on JAX-CPU. Output: parity_results/resweep_r4/ADASPARSE_ALPHA.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # before any backend init

import numpy as np  # noqa: E402

import run_movielens  # noqa: E402
from scenario_wise_rec_tpu.configs import build_model  # noqa: E402
from scenario_wise_rec_tpu.data import DataGenerator  # noqa: E402
from scenario_wise_rec_tpu.train import CTRTrainer  # noqa: E402
from scenario_wise_rec_tpu.train.optim import step_lr  # noqa: E402

_SYN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "data_synthetic", "ml-1m")
SEEDS = [2030, 2031, 2032, 2033, 2034, 2035, 2036, 2037, 2038, 2039]
EPOCHS, BATCH = 3, 4096
DELTA = 1e-4  # configs movielens adasparse delta_alpha


def run_cell(seed: int, eval_anneal: bool) -> float:
    d = run_movielens.load(_SYN, synthetic=False)
    dg = DataGenerator(d["x_train"], d["y_train"])
    train_dl, val_dl, test_dl = dg.generate_dataloader(
        split_ratio=[0.8, 0.1], batch_size=BATCH, seed=seed)
    model = build_model("movielens", "adasparse", d)
    tr = CTRTrainer(model, "Movielens", n_epoch=EPOCHS,
                    earlystop_patience=4, seed=seed,
                    scheduler_fn=None,
                    scheduler_params={"step_size": 2, "gamma": 0.85},
                    model_path="/tmp/alpha_check")
    # manual fit loop (mirrors CTRTrainer.fit without the checkpoint write)
    for epoch in range(EPOCHS):
        tr.train_one_epoch(train_dl, log_interval=10**9)
        auc, _ = tr.evaluate(model, val_dl)
        if eval_anneal:
            tr.state = {**tr.state,
                        "alpha": tr.state["alpha"] + DELTA * len(val_dl)}
        if tr.early_stopper.stop_training(auc,
                                          (tr._params_for_eval(), tr.state)):
            best_params, tr.state = tr.early_stopper.best_weights
            tr._adopt_params(best_params)
            break
    if eval_anneal:
        tr.state = {**tr.state,
                    "alpha": tr.state["alpha"] + DELTA * len(test_dl) / 2}
    _, _, _, test_auc = tr.evaluate_multi_domain_loss(model, test_dl,
                                                      d["domain_num"])
    return float(test_auc)


def main():
    rows = []
    for seed in SEEDS:
        a = run_cell(seed, eval_anneal=False)
        b = run_cell(seed, eval_anneal=True)
        rows.append((seed, a, b))
        print(f"seed {seed}: A(shipped)={a:.4f}  B(ref-matched)={b:.4f}  "
              f"B-A={b - a:+.5f}", flush=True)
    a = np.array([r[1] for r in rows])
    b = np.array([r[2] for r in rows])
    diff = b - a
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "parity_results", "resweep_r4")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ADASPARSE_ALPHA.md"), "w") as f:
        f.write(
            "# AdaSparse alpha-anneal deviation: targeted check\n\n"
            "Reference advances alpha on every forward incl. eval batches "
            "(adasparse.py:61-62); ours only on train steps (parity-ledger "
            "deviation). Arm B replays the reference's eval-time advances "
            "at epoch granularity inside OUR framework; paired per-seed "
            "test-AUC differences isolate the deviation's entire effect on "
            "the movielens cell (the dataset where the r3 flag appeared).\n\n"
            "| seed | A: shipped | B: ref-matched anneal | B − A |\n"
            "|---|---|---|---|\n")
        for seed, av, bv in rows:
            f.write(f"| {seed} | {av:.4f} | {bv:.4f} | {bv - av:+.5f} |\n")
        f.write(
            f"\nA: {a.mean():.4f}±{a.std(ddof=1):.4f}  "
            f"B: {b.mean():.4f}±{b.std(ddof=1):.4f}  "
            f"paired Δ: {diff.mean():+.5f}±{diff.std(ddof=1):.5f}\n\n"
            f"Conclusion: |mean paired Δ| = {abs(diff.mean()):.5f} vs "
            f"cross-seed σ = {a.std(ddof=1):.4f} — the anneal deviation "
            + ("CANNOT explain the flagged ΔAUC magnitudes (two orders "
               "smaller than the noise)."
               if abs(diff.mean()) < 0.1 * a.std(ddof=1) else
               "has a measurable effect; investigate further.") + "\n")
    print("wrote", os.path.join(out_dir, "ADASPARSE_ALPHA.md"))


if __name__ == "__main__":
    main()
