"""Ali-CCP offline preprocessor: raw sample-skeleton + common-features ->
train/val/test CSVs.

From-scratch re-implementation of the reference pipeline
(scripts/data/ali-ccp/preprocess_ali_ccp.py:28-147), preserving its
behavioral contract:

- parse the \\x01/\\x02/\\x03-delimited feature strings; keep the 23 sparse
  fields and the 8 dense fields (prefixed 'D');
- drop rows with click=0 & purchase=1;
- build the sparse vocab from train only, drop ids with freq < 10, remap
  survivors to 1..n (0 = OOV);
- min-max scale the dense columns over the *combined* splits;
- split the raw test file 50/50 into val/test (seed 2022).

Usage: python -m scenario_wise_rec_tpu.data.preprocess.ali_ccp --raw_dir . --out_dir .
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

SPARSE_COLS = ['101', '121', '122', '124', '125', '126', '127', '128', '129',
               '205', '206', '207', '210', '216', '508', '509', '702', '853',
               '301', '109_14', '110_14', '127_14', '150_14']
DENSE_COLS = ['109_14', '110_14', '127_14', '150_14', '508', '509', '702', '853']
USE_COLS = list(SPARSE_COLS) + ['D' + c for c in DENSE_COLS]
MIN_FREQ = 10


def _parse_feat_str(feat_str: str) -> dict:
    out = {}
    for fstr in feat_str.split('\x01'):
        field, feat_val = fstr.split('\x02')
        feat, val = feat_val.split('\x03')
        if field in SPARSE_COLS:
            out[field] = feat
        if field in DENSE_COLS:
            out['D' + field] = val
    return out


def _read_common(path: str) -> dict:
    common = {}
    with open(path) as fr:
        for line in fr:
            parts = line.strip().split(',')
            common[parts[0]] = _parse_feat_str(parts[2])
    return common


def extract_rows(skeleton_path: str, common_path: str):
    """Yield [click, purchase, *features] string rows."""
    common = _read_common(common_path)
    with open(skeleton_path) as fr:
        for line in fr:
            parts = line.strip().split(',')
            if parts[1] == '0' and parts[2] == '1':
                continue  # click=0 & purchase=1 rows dropped
            feat = _parse_feat_str(parts[5])
            feat.update(common[parts[3]])
            yield parts[1:3] + [feat.get(k, '0') for k in USE_COLS]


def build_vocab(rows) -> dict:
    counts = {c: {} for c in SPARSE_COLS}
    for row in rows:
        for col, val in zip(USE_COLS, row[2:]):
            if col in counts:
                counts[col][val] = counts[col].get(val, 0) + 1
    return {
        c: {v: i + 1 for i, v in enumerate(vv for vv, n in cnt.items()
                                           if n >= MIN_FREQ)}
        for c, cnt in counts.items()
    }


def encode(rows, vocab) -> pd.DataFrame:
    recs = []
    for row in rows:
        rec = row[:2]
        for col, val in zip(USE_COLS, row[2:]):
            rec.append(str(vocab[col].get(val, 0)) if col in SPARSE_COLS else val)
        recs.append(rec)
    df = pd.DataFrame(recs, columns=['click', 'purchase'] + USE_COLS)
    for c in df.columns:
        df[c] = pd.to_numeric(df[c])
    return df


def main(raw_dir: str, out_dir: str, seed: int = 2022):
    train_rows = list(extract_rows(
        os.path.join(raw_dir, 'sample_skeleton_train.csv'),
        os.path.join(raw_dir, 'common_features_train.csv')))
    vocab = build_vocab(train_rows)
    train = encode(train_rows, vocab)
    del train_rows

    test_rows = list(extract_rows(
        os.path.join(raw_dir, 'sample_skeleton_test.csv'),
        os.path.join(raw_dir, 'common_features_test.csv')))
    test_all = encode(test_rows, vocab)
    del test_rows

    # 50/50 val/test split of the raw test file (preprocess_ali_ccp.py:125)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(test_all))
    half = len(test_all) // 2
    val = test_all.iloc[perm[:half]].reset_index(drop=True)
    test = test_all.iloc[perm[half:]].reset_index(drop=True)

    # min-max over the combined splits (preprocess_ali_ccp.py:137-139)
    dense = ['D' + c for c in DENSE_COLS]
    combined = pd.concat([train, val, test], axis=0)
    lo, hi = combined[dense].min(), combined[dense].max()
    for df in (train, val, test):
        df[dense] = (df[dense] - lo) / (hi - lo).replace(0, 1)

    os.makedirs(out_dir, exist_ok=True)
    train.to_csv(os.path.join(out_dir, 'ali_ccp_train_sample.csv'), index=False)
    val.to_csv(os.path.join(out_dir, 'ali_ccp_val_sample.csv'), index=False)
    test.to_csv(os.path.join(out_dir, 'ali_ccp_test_sample.csv'), index=False)
    print(f"train={len(train)} val={len(val)} test={len(test)}")


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--raw_dir', default='.')
    ap.add_argument('--out_dir', default='.')
    ap.add_argument('--seed', type=int, default=2022)
    a = ap.parse_args()
    main(a.raw_dir, a.out_dir, a.seed)
