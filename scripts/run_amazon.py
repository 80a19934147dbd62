"""Amazon 5-core multi-domain CTR run script.

Mirrors reference scripts/run_amazon_ctr_multi_domain.py:13-195: 3 category
domains (pre-built ``domain_indicator``), all-sparse, label pre-binarized by
the offline preprocessor; random [0.8, 0.1] split; patience 5,
StepLR(4, 0.95) (never instantiated).

The amazon.csv raw file is stripped from the reference snapshot
(.MISSING_LARGE_BLOBS) — ``--synthetic`` generates schema-faithful data.
"""

import numpy as np
import pandas as pd
from sklearn.preprocessing import LabelEncoder

from _runner import run, standard_argparser

from scenario_wise_rec_tpu.core import SparseFeature


def synthetic_frame(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user": rng.integers(0, 600, n),
        "item": rng.integers(0, 900, n),
        "cate_id": rng.integers(0, 30, n),
        "label": rng.integers(0, 2, n),
        "domain_indicator": rng.integers(0, 3, n),
    })


def load(data_path, ppnet: bool = False, synthetic: bool = False):
    if synthetic:
        data = synthetic_frame()
    else:
        data = pd.read_csv(data_path + "/amazon.csv")
    domain_num = 3
    col_names = data.columns.values.tolist()
    scenario_cols = ["domain_indicator"]
    id_cols = ["user", "item"] if ppnet else []
    sparse_cols = [c for c in col_names if c not in id_cols
                   and c not in ["label", "domain_indicator"]]
    for f in sparse_cols + id_cols:
        data[f] = LabelEncoder().fit_transform(data[f])

    d = dict(
        dense_feas=[],
        sparse_feas=[SparseFeature(c, vocab_size=data[c].max() + 1, embed_dim=16)
                     for c in sparse_cols],
        scenario_feas=[SparseFeature(c, vocab_size=data[c].max() + 1,
                                     embed_dim=16) for c in scenario_cols],
        domain_num=domain_num,
    )
    if ppnet:
        d["id_feas"] = [SparseFeature(c, vocab_size=data[c].max() + 1,
                                      embed_dim=16) for c in id_cols]
    y = data["label"]
    d["x_train"], d["y_train"] = data.drop(columns=["label"]), y
    return d


def main(args):
    data = load(args.dataset_path, ppnet=(args.model_name == "ppnet"),
                synthetic=args.synthetic)
    run("amazon", "amazon_5_core", data, args.model_name, args.epoch,
        args.learning_rate, args.batch_size, args.weight_decay, args.device,
        args.save_dir, args.seed, earlystop_patience=5,
        scheduler_params={"step_size": 4, "gamma": 0.95},
        split_ratio=[0.8, 0.1],
        args=args)


if __name__ == "__main__":
    main(standard_argparser("./data/amazon_5_core").parse_args())
