"""Generate schema-faithful synthetic raw CSVs for movielens + amazon.

The reference snapshot strips the raw ml-1m and amazon blobs
(.MISSING_LARGE_BLOBS), so the parity sweep (run_parity_suite.py) cannot use
real data for these two datasets. This writes small CSVs matching the exact
schemas the UNMODIFIED reference loaders read:

- ml-1m/ml-1m.csv: user_id, movie_id, rating, timestamp, title, genres,
  gender, age, occupation, zip (run_movielens_rank_multi_domain.py:60-100 —
  genres split on '|', age buckets -> 3 domains, rating>3 -> label)
- amazon_5_core/amazon.csv: user, item, cate_id, domain_indicator, label
  (run_amazon_ctr_multi_domain.py:13-39 — preprocessor output schema:
  label pre-binarized, domain_indicator pre-built)

Labels carry real signal (a logistic function of a few feature interactions
plus noise) so trained AUC is meaningfully above 0.5 and the ours-vs-
reference comparison tests learning dynamics, not coin flips. Both
frameworks' scripts read THE SAME files via --dataset_path.

Output: scripts/data_synthetic/{ml-1m,amazon_5_core}/ (committed — ~250 KB).
"""

import os

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "data_synthetic")


def sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def make_movielens(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    ages = rng.choice([1, 18, 25, 35, 45, 50, 56], n)
    user = rng.integers(1, 500, n)
    movie = rng.integers(1, 800, n)
    genres = rng.choice(
        ["Action|Comedy", "Drama", "Comedy|Romance", "Thriller|Drama",
         "Animation|Children's"], n)
    gender = rng.choice(["M", "F"], n)
    occupation = rng.integers(0, 20, n)
    zipc = rng.integers(10000, 99999, n).astype(str)
    # latent user/movie quality + a genre and age effect drive the rating
    uq = rng.normal(0, 1, 500)
    mq = rng.normal(0, 1, 800)
    z = (0.9 * uq[user - 1] + 0.9 * mq[movie - 1]
         + 0.5 * (np.char.startswith(genres.astype(str), "Action"))
         + 0.3 * (ages >= 35) - 0.2 * (gender == "F")
         + rng.normal(0, 0.8, n))
    rating = np.clip(np.round(3.0 + 1.4 * np.tanh(z)), 1, 5).astype(int)
    return pd.DataFrame({
        "user_id": user, "movie_id": movie, "rating": rating,
        "timestamp": rng.integers(0, 10 ** 9, n),
        "title": ["t"] * n, "genres": genres, "gender": gender,
        "age": ages, "occupation": occupation, "zip": zipc,
    })


def make_amazon(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, 600, n)
    item = rng.integers(0, 900, n)
    cate = rng.integers(0, 30, n)
    dom = rng.integers(0, 3, n)
    uq = rng.normal(0, 1, 600)
    iq = rng.normal(0, 1, 900)
    z = (0.9 * uq[user] + 0.9 * iq[item] + 0.25 * (cate % 3 == 0)
         + 0.3 * (dom == 1) + rng.normal(0, 0.8, n))
    label = (rng.random(n) < sigmoid(z)).astype(int)
    return pd.DataFrame({
        "user": user, "item": item, "cate_id": cate,
        "domain_indicator": dom, "label": label,
    })


def main():
    ml_dir = os.path.join(OUT, "ml-1m")
    am_dir = os.path.join(OUT, "amazon_5_core")
    os.makedirs(ml_dir, exist_ok=True)
    os.makedirs(am_dir, exist_ok=True)
    ml = make_movielens()
    am = make_amazon()
    ml.to_csv(os.path.join(ml_dir, "ml-1m.csv"), index=False)
    am.to_csv(os.path.join(am_dir, "amazon.csv"), index=False)
    print(f"ml-1m: {len(ml)} rows, label rate "
          f"{(ml.rating > 3).mean():.3f} -> {ml_dir}/ml-1m.csv")
    print(f"amazon: {len(am)} rows, label rate {am.label.mean():.3f} "
          f"-> {am_dir}/amazon.csv")


if __name__ == "__main__":
    main()
