"""Douban preprocessor: 3 review tables + user table -> douban.csv.

Re-implements scripts/data/douban/data_process.py:1-38: book/movie/music
reviews unioned with item-id offsetting (movie ids += max book id, music ids
+= max movie id); per-user living_place/join_time join; rating binarized at
> 3; join_time monthly-binned over 2005-03..2018-04.

NOTE the reference writes ``domain_id`` 0=book, 1=movie, 2=music here, while
the run script maps {"book":0, "music":1, "movie":2} from a ``domain``
column (run_douban…py:16-18) — i.e. the bundled douban_sample.csv carries a
string ``domain`` column; this preprocessor emits both.

Usage: python -m scenario_wise_rec_tpu.data.preprocess.douban --raw_dir /Douban/...
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def main(raw_dir: str, out: str):
    user = pd.read_table(os.path.join(raw_dir, "users_cleaned.txt"), sep="\t",
                         header=0)
    user = user[["living_place", "join_time", "UID"]]
    user = user.rename(columns={"UID": "user_id"})

    def load(fname, id_col, name):
        df = pd.read_table(os.path.join(raw_dir, fname), sep="\t", header=0)
        df = df[["user_id", id_col, "rating"]]
        df["domain"] = name
        return df.rename(columns={id_col: "item_id"})

    book = load("bookreviews_cleaned.txt", "book_id", "book")
    movie = load("moviereviews_cleaned.txt", "movie_id", "movie")
    music = load("musicreviews_cleaned.txt", "music_id", "music")
    movie.item_id += book.item_id.max()
    music.item_id += movie.item_id.max()

    data = pd.concat([book, movie, music]).reset_index(drop=True)
    data = pd.merge(data, user, on="user_id", how="left")
    data.rating = data.rating.apply(lambda v: 1 if v > 3 else 0)

    data["join_time"] = pd.to_datetime(data["join_time"])
    bins = pd.date_range("2005-03", "2018-04", freq="ME")
    data["time_bin"] = pd.cut(data["join_time"], bins,
                              labels=list(range(len(bins) - 1)))
    data.to_csv(out, index=False)
    print(f"wrote {out}: {len(data)} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", default=".")
    ap.add_argument("--out", default="douban.csv")
    a = ap.parse_args()
    main(a.raw_dir, a.out)
