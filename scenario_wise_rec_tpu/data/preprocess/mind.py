"""MIND preprocessor: behaviors + news TSVs -> mind_all.csv / mind_sample.csv.

Re-implements scripts/data/mind/data_process.py:1-65: explode each
impression list into (User_ID, News_ID, label) rows for train+dev, join news
Category/SubCategory, keep the 4 selected categories, and draw the 8000-row
sample (random_state=1).

Usage: python -m scenario_wise_rec_tpu.data.preprocess.mind --train_dir train --dev_dir dev
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

CATEGORIES = {"news", "lifestyle", "sports", "finance"}


def explode_split(split_dir: str) -> pd.DataFrame:
    behaviors = pd.read_table(os.path.join(split_dir, "behaviors.tsv"),
                              sep="\t", header=None)[[1, 4]]
    behaviors.columns = ["User_ID", "Impressions"]
    uids, nids, labels = [], [], []
    for uid, imps in zip(behaviors["User_ID"], behaviors["Impressions"]):
        for item in str(imps).strip().split(" "):
            news_id, label = item.split("-")[0], item.split("-")[1]
            uids.append(uid)
            nids.append(news_id)
            labels.append(label)
    data = pd.DataFrame({"User_ID": uids, "News_ID": nids, "label": labels})
    news = pd.read_table(os.path.join(split_dir, "news.tsv"), sep="\t",
                         header=None)[[0, 1, 2]]
    news.columns = ["News_ID", "Category", "SubCategory"]
    return pd.merge(data, news, on="News_ID", how="left")


def main(train_dir: str, dev_dir: str, out_all: str, out_sample: str,
         sample_n: int = 8000):
    data = pd.concat([explode_split(train_dir), explode_split(dev_dir)])
    data = data[data["Category"].apply(lambda c: c in CATEGORIES)]
    data.reset_index(drop=True, inplace=True)
    data.to_csv(out_all, index=False)
    data.sample(n=sample_n, random_state=1).to_csv(out_sample, index=False)
    print(f"wrote {out_all} ({len(data)}) and {out_sample} ({sample_n})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_dir", default="train")
    ap.add_argument("--dev_dir", default="dev")
    ap.add_argument("--out_all", default="mind_all.csv")
    ap.add_argument("--out_sample", default="mind_sample.csv")
    a = ap.parse_args()
    main(a.train_dir, a.dev_dir, a.out_all, a.out_sample)
