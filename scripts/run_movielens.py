"""MovieLens multi-domain rank run script.

Mirrors reference scripts/run_movielens_rank_multi_domain.py:60-258 (the
file defines its loader twice; the second definition wins and is the one
reproduced here): domain = age buckets {1,18}/{25}/{35,45,50,56}; label =
rating > 3; MinMaxScaler on age; LabelEncoder sparse; random [0.8, 0.1]
split; patience 4, StepLR(2, 0.85) (never instantiated).

The ml-1m.csv raw file is stripped from the reference snapshot
(.MISSING_LARGE_BLOBS) — ``--synthetic`` generates schema-faithful data.
"""

import numpy as np
import pandas as pd
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from _runner import run, standard_argparser

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature

GROUPS = [{1, 18}, {25}, {35, 45, 50, 56}]


def _map_group(age):
    for i, g in enumerate(GROUPS):
        if age in g:
            return i


def synthetic_frame(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    ages = rng.choice([1, 18, 25, 35, 45, 50, 56], n)
    return pd.DataFrame({
        "user_id": rng.integers(1, 500, n),
        "movie_id": rng.integers(1, 800, n),
        "rating": rng.integers(1, 6, n),
        "timestamp": rng.integers(0, 10**9, n),
        "title": ["t"] * n,
        "genres": rng.choice(["Action|Comedy", "Drama", "Comedy|Romance"], n),
        "gender": rng.choice(["M", "F"], n),
        "age": ages,
        "occupation": rng.integers(0, 20, n),
        "zip": rng.integers(10000, 99999, n).astype(str),
    })


def load(data_path, ppnet: bool = False, synthetic: bool = False):
    if synthetic:
        data = synthetic_frame()
    else:
        data = pd.read_csv(data_path + "/ml-1m.csv")
    data["cate_id"] = data["genres"].apply(lambda g: g.split("|")[0])
    del data["genres"]
    data["domain_indicator"] = data["age"].apply(_map_group)

    dense_features = ["age"]
    scenario_features = ["domain_indicator"]
    if ppnet:
        sparse_features = ["gender", "occupation", "zip", "cate_id"]
        id_features = ["user_id", "movie_id"]
    else:
        sparse_features = ["user_id", "movie_id", "gender", "occupation",
                           "zip", "cate_id"]
        id_features = []

    for f in dense_features:
        data[f] = data[f].apply(int)
    data[dense_features] = MinMaxScaler().fit_transform(data[dense_features])
    data = data.drop(columns=["title", "timestamp"])
    for f in sparse_features + id_features:
        data[f] = LabelEncoder().fit_transform(data[f])
    data["rating"] = (data["rating"] > 3).astype(int)

    d = dict(
        dense_feas=[DenseFeature(f) for f in dense_features],
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
    data = load(args.dataset_path, ppnet=(args.model_name == "ppnet"),
                synthetic=args.synthetic)
    run("movielens", "Movielens", data, args.model_name, args.epoch,
        args.learning_rate, args.batch_size, args.weight_decay, args.device,
        args.save_dir, args.seed, earlystop_patience=4,
        scheduler_params={"step_size": 2, "gamma": 0.85},
        split_ratio=[0.8, 0.1],
        args=args)


if __name__ == "__main__":
    main(standard_argparser("./data/ml-1m").parse_args())
