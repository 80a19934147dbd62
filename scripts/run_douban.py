"""Douban multi-domain rank run script.

Mirrors reference scripts/run_douban_rank_multi_domain.py:14-164:
domain = {book, music, movie} -> {0, 1, 2}; features user/item/living_place/
time_bin; label = rating (already binarized by the offline preprocessor);
random [0.8, 0.1] split; patience 4, StepLR(2, 0.85) (never instantiated).
"""

import pandas as pd
from sklearn.preprocessing import LabelEncoder

from _runner import run, standard_argparser

from scenario_wise_rec_tpu.core import SparseFeature


def load(data_path, ppnet: bool = False):
    data = pd.read_csv(data_path + "/douban_sample.csv")
    mapping = {"book": 0, "music": 1, "movie": 2}
    data["domain_indicator"] = data["domain"].apply(lambda v: mapping[v])
    data = data.drop(columns=["join_time", "domain"])
    scenario_features = ["domain_indicator"]
    if ppnet:
        sparse_features = ["living_place", "time_bin"]
        id_features = ["user_id", "item_id"]
    else:
        sparse_features = ["user_id", "item_id", "living_place", "time_bin"]
        id_features = []
    for f in sparse_features + id_features:
        data[f] = LabelEncoder().fit_transform(data[f])

    d = dict(
        dense_feas=[],
        sparse_feas=[SparseFeature(f, vocab_size=data[f].nunique(), embed_dim=16)
                     for f in sparse_features],
        scenario_feas=[SparseFeature(f, vocab_size=data[f].max() + 1,
                                     embed_dim=16) for f in scenario_features],
        domain_num=3,
    )
    if ppnet:
        d["id_feas"] = [SparseFeature(f, vocab_size=data[f].nunique(),
                                      embed_dim=16) for f in id_features]
    y = data["rating"]
    d["x_train"], d["y_train"] = data.drop(columns=["rating"]), y
    return d


def main(args):
    data = load(args.dataset_path, ppnet=(args.model_name == "ppnet"))
    run("douban", "Douban", data, args.model_name, args.epoch,
        args.learning_rate, args.batch_size, args.weight_decay, args.device,
        args.save_dir, args.seed, earlystop_patience=4,
        scheduler_params={"step_size": 2, "gamma": 0.85},
        split_ratio=[0.8, 0.1],
        args=args)


if __name__ == "__main__":
    main(standard_argparser("/root/reference/scripts/data/douban").parse_args())
