"""Ali-CCP multi-domain CTR run script.

Mirrors the reference CLI surface (scripts/run_ali_ccp_ctr_ranking_multi_
domain.py:118-204): same flags, same 3-loader-variant data handling, same
hard-coded per-model hyperparameters, same result CSV.

Usage: python run_ali_ccp.py --model_name mmoe [--device tpu]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd

from scenario_wise_rec_tpu.configs import build_model
from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.data import DataGenerator, read_csv_fast, reduce_mem_usage
from scenario_wise_rec_tpu.train import CTRTrainer

DENSE_COLS = ["D109_14", "D110_14", "D127_14", "D150_14", "D508", "D509",
              "D702", "D853"]


def _load(data_path):
    df_train = reduce_mem_usage(read_csv_fast(data_path + "/ali_ccp_train_sample.csv"))
    df_val = reduce_mem_usage(read_csv_fast(data_path + "/ali_ccp_val_sample.csv"))
    df_test = reduce_mem_usage(read_csv_fast(data_path + "/ali_ccp_test_sample.csv"))
    print("train : val : test = %d %d %d" % (len(df_train), len(df_val), len(df_test)))
    train_idx, val_idx = len(df_train), len(df_train) + len(df_val)
    data = pd.concat([df_train, df_val, df_test], axis=0)
    data["domain_indicator"] = data["301"].map({1: 0, 2: 1, 3: 2})
    return data, train_idx, val_idx


def get_ali_ccp_data_dict(data_path):
    """Default loader (reference run_ali_ccp…py:11-34)."""
    data, train_idx, val_idx = _load(data_path)
    col_names = data.columns.values.tolist()
    sparse_cols = [c for c in col_names if c not in DENSE_COLS
                   and c not in ["click", "purchase", "domain_indicator"]]
    print("sparse cols:%d dense cols:%d" % (len(sparse_cols), len(DENSE_COLS)))
    dense_feas = [DenseFeature(c) for c in DENSE_COLS]
    sparse_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                   for c in sparse_cols]
    y = data["click"]
    x = data.drop(columns=["click"])
    return dict(
        dense_feas=dense_feas, sparse_feas=sparse_feas, domain_num=3,
        x_train=x[:train_idx], y_train=y[:train_idx],
        x_val=x[train_idx:val_idx], y_val=y[train_idx:val_idx],
        x_test=x[val_idx:], y_test=y[val_idx:],
    )


def get_ali_ccp_data_dict_scenario(data_path):
    """adasparse/m2m/adaptdhm/epnet loader: scenario feature = embedded
    domain_indicator, raw ``301`` deleted (reference run_ali_ccp…py:37-74)."""
    data, train_idx, val_idx = _load(data_path)
    col_names = data.columns.values.tolist()
    scenario_cols = ["domain_indicator"]
    data = data.drop(columns=["301"])
    sparse_cols = [c for c in col_names if c not in DENSE_COLS
                   and c not in ["click", "purchase", "domain_indicator", "301"]]
    print("scenario_cols:%d sparse cols:%d dense cols:%d"
          % (len(scenario_cols), len(sparse_cols), len(DENSE_COLS)))
    dense_feas = [DenseFeature(c) for c in DENSE_COLS]
    sparse_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                   for c in sparse_cols]
    scenario_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                     for c in scenario_cols]
    y = data["click"]
    x = data.drop(columns=["click"])
    return dict(
        dense_feas=dense_feas, sparse_feas=sparse_feas,
        scenario_feas=scenario_feas, domain_num=3,
        x_train=x[:train_idx], y_train=y[:train_idx],
        x_val=x[train_idx:val_idx], y_val=y[train_idx:val_idx],
        x_test=x[val_idx:], y_test=y[val_idx:],
    )


def get_ali_ccp_data_dict_ppnet(data_path):
    """ppnet loader: id features 101/205 split out (reference :76-115)."""
    data, train_idx, val_idx = _load(data_path)
    col_names = data.columns.values.tolist()
    id_cols = ["101", "205"]
    scenario_cols = ["domain_indicator"]
    data = data.drop(columns=["301"])
    sparse_cols = [c for c in col_names if c not in DENSE_COLS and c not in id_cols
                   and c not in ["click", "purchase", "domain_indicator", "301"]]
    dense_feas = [DenseFeature(c) for c in DENSE_COLS]
    sparse_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                   for c in sparse_cols]
    scenario_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                     for c in scenario_cols]
    id_feas = [SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
               for c in id_cols]
    y = data["click"]
    x = data.drop(columns=["click"])
    return dict(
        dense_feas=dense_feas, sparse_feas=sparse_feas,
        scenario_feas=scenario_feas, id_feas=id_feas, domain_num=3,
        x_train=x[:train_idx], y_train=y[:train_idx],
        x_val=x[train_idx:val_idx], y_val=y[train_idx:val_idx],
        x_test=x[val_idx:], y_test=y[val_idx:],
    )


def main(dataset_path, model_name, epoch, learning_rate, batch_size,
         weight_decay, device, save_dir, seed, args=None):
    from _runner import apply_device, trainer_kwargs_from_args

    apply_device(device)
    dataset_name = "Aliccp"
    if model_name in ("adasparse", "m2m", "adaptdhm", "epnet"):
        d = get_ali_ccp_data_dict_scenario(dataset_path)
    elif model_name == "ppnet":
        d = get_ali_ccp_data_dict_ppnet(dataset_path)
    else:
        d = get_ali_ccp_data_dict(dataset_path)

    dg = DataGenerator(d["x_train"], d["y_train"])
    train_dl, val_dl, test_dl = dg.generate_dataloader(
        x_val=d["x_val"], y_val=d["y_val"], x_test=d["x_test"],
        y_test=d["y_test"], batch_size=batch_size, seed=seed,
    )
    model = build_model("ali_ccp", model_name, d)
    domain_num = d["domain_num"]
    trainer = CTRTrainer(
        model, dataset_name,
        optimizer_params={"lr": learning_rate, "weight_decay": weight_decay},
        n_epoch=epoch, earlystop_patience=5, device=device,
        model_path=save_dir, seed=seed,
        scheduler_params={"step_size": 4, "gamma": 0.95},
        **trainer_kwargs_from_args(args, model),
    )
    if getattr(args, "device_resident", False):
        from scenario_wise_rec_tpu.data.device import DeviceResidentLoader

        train_dl = DeviceResidentLoader(
            train_dl.dataset, batch_size, seed=seed,
            device_shuffle=getattr(args, "device_shuffle", False))
    trainer.fit(train_dl, val_dl)
    domain_logloss, domain_auc, logloss, auc = trainer.evaluate_multi_domain_loss(
        trainer.model, test_dl, domain_num,
        on_device=getattr(args, "device_eval", False),
    )
    print(f"test auc: {auc} | test logloss: {logloss}")
    for dom in range(domain_num):
        print(f"test domain {dom} auc: {domain_auc[dom]} | "
              f"test domain {dom} logloss: {domain_logloss[dom]}")

    out = os.path.join(save_dir, model_name + "_" + dataset_name + "_" + str(seed) + ".csv")
    with open(out, "w", newline="") as f:
        writer = csv.writer(f)
        header = ["model", "seed", "auc", "log"]
        row = [model_name, str(seed), auc, logloss]
        for dom in range(domain_num):
            header += [f"auc{dom}", f"log{dom}"]
            row += [domain_auc[dom], domain_logloss[dom]]
        writer.writerow(header)
        writer.writerow(row)
    print("wrote", out)


if __name__ == "__main__":
    # the shared standard parser carries every TPU-native flag with the
    # measured defaults (_runner.standard_argparser) — a bespoke copy here
    # drifted in round 4 (stale occurrence default, missing sorted_* /
    # device_shuffle flags)
    from _runner import standard_argparser

    parser = standard_argparser("/root/reference/scripts/data/ali-ccp")
    parser.set_defaults(model_name="star", epoch=1, seed=2022)
    args = parser.parse_args()
    if getattr(args, "synthetic", False):
        parser.error("ali-ccp bundles a real sample; --synthetic is only "
                     "for the datasets whose raw files are stripped "
                     "(run_movielens.py / run_amazon.py)")
    main(args.dataset_path, args.model_name, args.epoch, args.learning_rate,
         args.batch_size, args.weight_decay, args.device, args.save_dir,
         args.seed, args=args)
