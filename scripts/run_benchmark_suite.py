"""Benchmark-protocol runner: model x dataset x seed sweep + aggregation.

Implements BASELINE.md's measurement protocol: run each (dataset, model)
over a seed set (default 2020..2024), collect per-run CSVs (the reference's
artifact format), and aggregate mean/std of overall + per-domain AUC/LogLoss
into ``summary_{dataset}.csv``.

Usage:
  python run_benchmark_suite.py --dataset ali_ccp --models mmoe star \
      --seeds 2020 2021 2022 --epoch 1 --save_dir ./results
"""

from __future__ import annotations

import argparse
import csv
import importlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

RUNNERS = {
    "ali_ccp": ("run_ali_ccp", "Aliccp"),
    "movielens": ("run_movielens", "Movielens"),
    "kuairand": ("run_kuairand", "Kuairand"),
    "amazon": ("run_amazon", "amazon_5_core"),
    "douban": ("run_douban", "Douban"),
    "mind": ("run_mind", "Mind"),
}

ALL_MODELS = ["sharedbottom", "mmoe", "ple", "star", "sarnet", "epnet",
              "ppnet", "adasparse", "m2m", "adaptdhm", "hamur", "m3oe"]


def run_one(dataset: str, model: str, seed: int, args) -> str:
    mod_name, ds_name = RUNNERS[dataset]
    mod = importlib.import_module(mod_name)
    ns = argparse.Namespace(
        dataset_path=args.dataset_path or default_path(dataset),
        model_name=model, epoch=args.epoch, learning_rate=args.learning_rate,
        batch_size=args.batch_size, weight_decay=args.weight_decay,
        device=args.device, save_dir=args.save_dir, seed=seed,
        synthetic=getattr(args, "synthetic", False),
    )
    mod.main(ns) if mod_name != "run_ali_ccp" else mod.main(
        ns.dataset_path, ns.model_name, ns.epoch, ns.learning_rate,
        ns.batch_size, ns.weight_decay, ns.device, ns.save_dir, ns.seed)
    return os.path.join(args.save_dir, f"{model}_{ds_name}_{seed}.csv")


def default_path(dataset: str) -> str:
    base = "/root/reference/scripts/data"
    return {
        "ali_ccp": f"{base}/ali-ccp", "kuairand": f"{base}/kuairand",
        "douban": f"{base}/douban", "mind": f"{base}/mind",
        "movielens": "./data/ml-1m", "amazon": "./data/amazon_5_core",
    }[dataset]


def aggregate(dataset: str, models, seeds, save_dir: str) -> str:
    _, ds_name = RUNNERS[dataset]
    out_path = os.path.join(save_dir, f"summary_{ds_name}.csv")
    rows = []
    header = None
    for model in models:
        per_seed = []
        for seed in seeds:
            path = os.path.join(save_dir, f"{model}_{ds_name}_{seed}.csv")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                r = list(csv.reader(f))
            header = r[0]
            per_seed.append([float(v) if v not in ("", "None") else np.nan
                             for v in r[1][2:]])
        if not per_seed:
            continue
        arr = np.asarray(per_seed)
        mean = np.nanmean(arr, axis=0)
        std = np.nanstd(arr, axis=0)
        rows.append([model, len(per_seed)]
                    + [f"{m:.5f}±{s:.5f}" for m, s in zip(mean, std)])
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        metric_names = header[2:] if header else []
        w.writerow(["model", "n_seeds"] + metric_names)
        w.writerows(rows)
    print("wrote", out_path)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, choices=sorted(RUNNERS))
    ap.add_argument("--models", nargs="+", default=ALL_MODELS)
    ap.add_argument("--seeds", nargs="+", type=int,
                    default=[2020, 2021, 2022, 2023, 2024])
    ap.add_argument("--dataset_path", default=None)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--weight_decay", type=float, default=1e-5)
    ap.add_argument("--device", default="")
    ap.add_argument("--save_dir", default="./results")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.save_dir, exist_ok=True)
    for model in args.models:
        for seed in args.seeds:
            print(f"--- {args.dataset} / {model} / seed {seed} ---", flush=True)
            try:
                run_one(args.dataset, model, seed, args)
            except Exception as e:  # keep sweeping
                print(f"FAILED {model} seed {seed}: {e}", flush=True)
    aggregate(args.dataset, args.models, args.seeds, args.save_dir)


if __name__ == "__main__":
    main()
