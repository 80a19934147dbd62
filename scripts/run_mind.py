"""MIND multi-domain CTR run script.

Mirrors reference scripts/run_mind_ctr_multi_domain.py:14-159: domain =
Category {news, lifestyle, sports, finance} -> 0..3; sparse
User_ID/News_ID/SubCategory; label from impression clicks (offline preproc);
random [0.8, 0.1] split; patience 4, StepLR(4, 0.75) (never instantiated).
"""

import pandas as pd
from sklearn.preprocessing import LabelEncoder

from _runner import run, standard_argparser

from scenario_wise_rec_tpu.core import SparseFeature


def load(data_path, ppnet: bool = False):
    data = pd.read_csv(data_path + "/mind_sample.csv")
    mapping = {"news": 0, "lifestyle": 1, "sports": 2, "finance": 3}
    data["domain_indicator"] = data["Category"].apply(lambda v: mapping[v])
    domain_num = data.domain_indicator.nunique()
    data = data.drop(columns=["Category"])
    scenario_features = ["domain_indicator"]
    if ppnet:
        sparse_features = ["SubCategory"]
        id_features = ["User_ID", "News_ID"]
    else:
        sparse_features = ["User_ID", "News_ID", "SubCategory"]
        id_features = []
    for f in id_features + sparse_features:
        data[f] = LabelEncoder().fit_transform(data[f])

    d = dict(
        dense_feas=[],
        sparse_feas=[SparseFeature(f, vocab_size=data[f].nunique(), embed_dim=16)
                     for f in sparse_features],
        scenario_feas=[SparseFeature(f, vocab_size=data[f].max() + 1,
                                     embed_dim=16) for f in scenario_features],
        domain_num=domain_num,
    )
    if ppnet:
        # NB reference sizes MIND id features by max+1 (run_mind…py:75), not
        # nunique as other datasets do — reproduced
        d["id_feas"] = [SparseFeature(f, vocab_size=data[f].max() + 1,
                                      embed_dim=16) for f in id_features]
    y = data["label"]
    d["x_train"], d["y_train"] = data.drop(columns=["label"]), y
    return d


def main(args):
    data = load(args.dataset_path, ppnet=(args.model_name == "ppnet"))
    run("mind", "Mind", data, args.model_name, args.epoch,
        args.learning_rate, args.batch_size, args.weight_decay, args.device,
        args.save_dir, args.seed, earlystop_patience=4,
        scheduler_params={"step_size": 4, "gamma": 0.75},
        split_ratio=[0.8, 0.1],
        args=args)


if __name__ == "__main__":
    main(standard_argparser("/root/reference/scripts/data/mind").parse_args())
