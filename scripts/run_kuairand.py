"""KuaiRand multi-domain CTR run script.

Mirrors reference scripts/run_kuairand_ctr_multi_domain.py:16-188: keep
``tab in {1, 0, 4, 2, 6}`` -> 5 domains, 4 min-max-scaled dense cols, drop
playtime cols, label ``is_click``, random [0.8, 0.1] split, patience 4,
(never-instantiated) StepLR(4, 0.75).
"""

import pandas as pd
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from _runner import run, standard_argparser

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature

DENSE = ["follow_user_num", "fans_user_num", "friend_user_num", "register_days"]
USELESS = ["play_time_ms", "duration_ms", "profile_stay_time", "comment_stay_time"]


def load(data_path, ppnet: bool = False):
    data = pd.read_csv(data_path + "/kuairand_sample.csv")
    data = data[data["tab"].apply(lambda t: t in [1, 0, 4, 2, 6])]
    data.reset_index(drop=True, inplace=True)
    data.rename(columns={"tab": "domain_indicator"}, inplace=True)
    domain_num = data.domain_indicator.nunique()

    col_names = data.columns.to_list()
    scenario_features = ["domain_indicator"]
    id_features = ["user_id", "video_id"] if ppnet else []
    sparse_features = [c for c in col_names if c not in DENSE and c not in USELESS
                       and c not in id_features
                       and c not in (["is_click"] if ppnet
                                     else ["is_click", "domain_indicator"])]

    for f in DENSE:
        data[f] = data[f].apply(int)
    data[DENSE] = MinMaxScaler().fit_transform(data[DENSE])
    data = data.drop(columns=USELESS)
    for f in sparse_features + scenario_features + id_features:
        data[f] = LabelEncoder().fit_transform(data[f])

    d = dict(
        dense_feas=[DenseFeature(f) for f in DENSE],
        sparse_feas=[SparseFeature(f, vocab_size=data[f].nunique(), embed_dim=16)
                     for f in sparse_features],
        scenario_feas=[SparseFeature(f, vocab_size=data[f].max() + 1,
                                     embed_dim=16) for f in scenario_features],
        domain_num=domain_num,
    )
    if ppnet:
        d["id_feas"] = [SparseFeature(f, vocab_size=data[f].nunique(),
                                      embed_dim=16) for f in id_features]
    y = data["is_click"]
    d["x_train"], d["y_train"] = data.drop(columns=["is_click"]), y
    return d


def main(args):
    data = load(args.dataset_path, ppnet=(args.model_name == "ppnet"))
    run("kuairand", "Kuairand", data, args.model_name, args.epoch,
        args.learning_rate, args.batch_size, args.weight_decay, args.device,
        args.save_dir, args.seed, earlystop_patience=4,
        scheduler_params={"step_size": 4, "gamma": 0.75},
        split_ratio=[0.8, 0.1],
        args=args)


if __name__ == "__main__":
    main(standard_argparser("/root/reference/scripts/data/kuairand").parse_args())
