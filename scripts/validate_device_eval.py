"""Validate the device-side eval path against the host path on all six
dataset samples (VERDICT r3 #8).

For each dataset: load the bundled/synthetic sample, train the flagship
model for one epoch on CPU (so probabilities are non-degenerate and carry
real tie structure), then score the test split BOTH ways —
``evaluate``/``evaluate_multi_domain_loss`` host (sklearn-parity numpy
rank AUC) vs ``on_device=True`` (jnp sort + static-shape per-domain
masks, train/metrics.py:auc_score_device) — and assert agreement to
float32 tolerance.

Usage: python validate_device_eval.py   (runs on JAX-CPU; prints a table)
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

from scenario_wise_rec_tpu.configs import build_model  # noqa: E402
from scenario_wise_rec_tpu.data import DataGenerator  # noqa: E402
from scenario_wise_rec_tpu.train import CTRTrainer  # noqa: E402

REF_ROOT = "/root/reference"
_SYN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "data_synthetic")


def _loaders():
    import run_ali_ccp
    import run_amazon
    import run_douban
    import run_kuairand
    import run_mind
    import run_movielens

    return {
        "ali_ccp": lambda: (run_ali_ccp.get_ali_ccp_data_dict(
            f"{REF_ROOT}/scripts/data/ali-ccp"), None),
        "kuairand": lambda: (run_kuairand.load(
            f"{REF_ROOT}/scripts/data/kuairand"), [0.8, 0.1]),
        "douban": lambda: (run_douban.load(
            f"{REF_ROOT}/scripts/data/douban"), [0.8, 0.1]),
        "mind": lambda: (run_mind.load(
            f"{REF_ROOT}/scripts/data/mind"), [0.8, 0.1]),
        "movielens": lambda: (run_movielens.load(
            os.path.join(_SYN, "ml-1m"), synthetic=False), [0.8, 0.1]),
        "amazon": lambda: (run_amazon.load(
            os.path.join(_SYN, "amazon_5_core"), synthetic=False),
            [0.8, 0.1]),
    }


def main():
    rows = []
    for name, make in _loaders().items():
        d, split = make()
        dg = DataGenerator(d["x_train"], d["y_train"])
        if split is not None:
            train_dl, val_dl, test_dl = dg.generate_dataloader(
                split_ratio=split, batch_size=512, seed=2022)
        else:
            train_dl, val_dl, test_dl = dg.generate_dataloader(
                x_val=d["x_val"], y_val=d["y_val"], x_test=d["x_test"],
                y_test=d["y_test"], batch_size=512, seed=2022)
        model = build_model(name, "mmoe", d)
        tr = CTRTrainer(model, n_epoch=1, model_path="/tmp/dev_eval_ck",
                        seed=2022)
        tr.train_one_epoch(train_dl, log_interval=10**9)

        auc_h, ll_h = tr.evaluate(model, test_dl)
        auc_d, ll_d = tr.evaluate(model, test_dl, on_device=True)
        dn = d["domain_num"]
        h = tr.evaluate_multi_domain_loss(model, test_dl, dn)
        dv = tr.evaluate_multi_domain_loss(model, test_dl, dn,
                                           on_device=True)
        max_dom_dauc = max(
            (abs(a - b) for a, b in zip(h[1], dv[1])
             if a is not None and b is not None), default=0.0)
        max_dom_dll = max(
            (abs(a - b) for a, b in zip(h[0], dv[0])
             if a is not None and b is not None), default=0.0)
        assert [a is None for a in h[1]] == [a is None for a in dv[1]]
        row = (name, auc_h, abs(auc_h - auc_d), abs(ll_h - ll_d),
               max_dom_dauc, max_dom_dll)
        rows.append(row)
        print(f"{name:10s} auc={auc_h:.5f} |Δauc|={row[2]:.2e} "
              f"|Δll|={row[3]:.2e} max|Δdom_auc|={row[4]:.2e} "
              f"max|Δdom_ll|={row[5]:.2e}", flush=True)
        assert row[2] < 5e-5 and row[3] < 5e-6, (name, row)
        assert row[4] < 5e-5 and row[5] < 5e-6, (name, row)
    print(f"OK: device eval matches host eval on {len(rows)}/6 sample sets")


if __name__ == "__main__":
    main()
