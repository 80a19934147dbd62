"""Amazon 5-core preprocessor: 3 review JSONs -> amazon.csv.

Re-implements scripts/data/amazon_5_core/data_process.py:1-51: Beauty /
Clothing / Health domains -> domain_indicator 0/1/2; label = overall > 3.

Usage: python -m scenario_wise_rec_tpu.data.preprocess.amazon --raw_dir . --out amazon.csv
"""

from __future__ import annotations

import argparse
import json
import os

import pandas as pd

DOMAIN_FILES = [
    ("reviews_Beauty_5.json", 0),
    ("reviews_Clothing_Shoes_and_Jewelry_5.json", 1),
    ("reviews_Health_and_Personal_Care_5.json", 2),
]


def load_domain(path: str, domain: int) -> pd.DataFrame:
    users, items, labels = [], [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            d = json.loads(line.strip())
            users.append(d["reviewerID"])
            items.append(d["asin"])
            labels.append(int(d["overall"]))
    df = pd.DataFrame({"user": users, "item": items, "label": labels})
    df["domain_indicator"] = domain
    return df


def main(raw_dir: str, out: str):
    frames = [load_domain(os.path.join(raw_dir, f), d) for f, d in DOMAIN_FILES]
    data = pd.concat(frames).reset_index(drop=True)
    data.label = data.label.apply(lambda v: 1 if v > 3 else 0)
    data.to_csv(out, index=False)
    print(f"wrote {out}: {len(data)} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", default=".")
    ap.add_argument("--out", default="amazon.csv")
    a = ap.parse_args()
    main(a.raw_dir, a.out)
