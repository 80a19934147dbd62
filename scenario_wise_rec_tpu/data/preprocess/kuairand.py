"""KuaiRand-1K preprocessor: logs + user + video features -> kuairand.csv.

Re-implements scripts/data/kuairand/load_data_1k.py:14-113: join the
standard interaction log with user features (categorical range columns
remapped to ints, onehot NaNs filled with per-column defaults) and basic
video features (several columns dropped, video_type remapped, NaNs filled);
every non-label column re-mapped to dense 0..n-1 ids (mapping JSONs saved);
rows shuffled.

Usage: python -m scenario_wise_rec_tpu.data.preprocess.kuairand --data_dir ./data
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

USER_ACTIVE = {'high_active': 0, 'full_active': 1, 'middle_active': 2,
               'low_active': 3, '2_14_day_new': 4, '30day_retention': 5,
               'single_low_active': 6, 'UNKNOWN': 7}
FOLLOW_RANGE = {'0': 0, '(0,10]': 1, '(10,50]': 2, '(100,150]': 3,
                '(150,250]': 4, '(250,500]': 5, '(50,100]': 6, '500+': 7}
FANS_RANGE = {'0': 0, '[1,10)': 1, '[10,100)': 2, '[100,1k)': 3, '[1k,5k)': 4,
              '[5k,1w)': 5, '[1w,10w)': 6, '[10w,100w)': 7}
FRIEND_RANGE = {'0': 0, '[1,5)': 1, '[5,30)': 2, '[30,60)': 3, '[60,120)': 4,
                '[120,250)': 5, '250+': 6}
REGISTER_RANGE = {'15-30': 0, '31-60': 1, '61-90': 2, '91-180': 3,
                  '181-365': 4, '366-730': 5, '730+': 6}
ONEHOT_FILL = {'onehot_feat0': 2, 'onehot_feat1': 7, 'onehot_feat2': 50,
               'onehot_feat3': 1471, 'onehot_feat4': 15, 'onehot_feat5': 34,
               'onehot_feat6': 3, 'onehot_feat7': 118, 'onehot_feat8': 454,
               'onehot_feat9': 7, 'onehot_feat10': 5, 'onehot_feat11': 5,
               'onehot_feat12': 2, 'onehot_feat13': 2, 'onehot_feat14': 2,
               'onehot_feat15': 2, 'onehot_feat16': 2, 'onehot_feat17': 2}
VIDEO_DROP = ['upload_dt', 'upload_type', 'tag', 'video_duration',
              'music_type', 'music_id', 'author_id']
VIDEO_TYPE = {'NORMAL': 0, 'AD': 1, 'UNKNOWN': 2}
VIDEO_FILL = {'visible_status': 2, 'server_width': 0, 'server_height': 0}
LOG_COLS = ['user_id', 'video_id', 'is_click', 'tab', 'play_time_ms',
            'duration_ms', 'profile_stay_time', 'comment_stay_time']


def main(data_dir: str, out: str, mapping_dir: str = "feature_mapping",
         seed=None):
    interaction = pd.read_csv(
        os.path.join(data_dir, "log_standard_4_22_to_5_08_1k.csv"),
        usecols=LOG_COLS)

    user = pd.read_csv(os.path.join(data_dir, "user_features_1k.csv"))
    user['user_active_degree'] = user['user_active_degree'].replace(USER_ACTIVE)
    user['follow_user_num_range'] = user['follow_user_num_range'].replace(FOLLOW_RANGE)
    user['fans_user_num_range'] = user['fans_user_num_range'].replace(FANS_RANGE)
    user['friend_user_num_range'] = user['friend_user_num_range'].replace(FRIEND_RANGE)
    user['register_days_range'] = user['register_days_range'].replace(REGISTER_RANGE)
    user = user.fillna(value=ONEHOT_FILL)

    video = pd.read_csv(os.path.join(data_dir, "video_features_basic_1k.csv"))
    video = video.drop(columns=VIDEO_DROP)
    video['video_type'] = video['video_type'].replace(VIDEO_TYPE)
    video = video.fillna(value=VIDEO_FILL)

    interaction = pd.merge(interaction, user, how='inner', on='user_id',
                           sort=False)
    interaction = pd.merge(interaction, video, how='inner', on='video_id',
                           sort=False)
    interaction = interaction.astype('int')

    os.makedirs(mapping_dir, exist_ok=True)
    cols = [c for c in interaction.columns if c != "is_click"]
    for col in cols:
        values = interaction[col].unique().tolist()
        rep = dict(zip(values, range(len(values))))
        with open(os.path.join(mapping_dir, f"{col}.json"), "w") as fp:
            json.dump({str(k): v for k, v in rep.items()}, fp)
        interaction[col] = interaction[col].map(rep)
    interaction = interaction.sample(frac=1, random_state=seed).reset_index(
        drop=True)
    interaction.to_csv(out, index=None)
    print(f"wrote {out}: {len(interaction)} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="./data")
    ap.add_argument("--out", default="kuairand.csv")
    ap.add_argument("--mapping_dir", default="feature_mapping")
    a = ap.parse_args()
    main(a.data_dir, a.out, a.mapping_dir)
