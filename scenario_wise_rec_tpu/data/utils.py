"""DataFrame helpers (reference utils/data.py:79-134) + native fast reader."""

from __future__ import annotations

import numpy as np


def read_csv_fast(path: str):
    """CSV -> DataFrame via the native multithreaded columnar parser
    (data/native/fastcsv.cpp) when available; pandas fallback otherwise.
    Only for all-numeric CSVs (the benchmark datasets' processed form)."""
    import pandas as pd

    try:
        from . import native

        if native.available():
            return pd.DataFrame(native.read_csv_columnar(path))
    except Exception:
        pass
    return pd.read_csv(path)


def df_to_dict(data):
    """DataFrame -> dict of numpy columns (reference utils/data.py:79-90)."""
    data_dict = data.to_dict("list")
    for key in data.keys():
        data_dict[key] = np.array(data_dict[key])
    return data_dict


def reduce_mem_usage(df):
    """Downcast int/float columns to the smallest safe dtype
    (reference utils/data.py:92-134; same open-interval bounds)."""
    start_mem = df.memory_usage().sum() / 1024 ** 2
    print("-----Memory compression starts-----")

    for col in df.columns:
        col_type = df[col].dtype
        if col_type != object:
            c_min = df[col].min()
            c_max = df[col].max()
            if str(col_type)[:3] == "int":
                if c_min > np.iinfo(np.int8).min and c_max < np.iinfo(np.int8).max:
                    df[col] = df[col].astype(np.int8)
                elif c_min > np.iinfo(np.int16).min and c_max < np.iinfo(np.int16).max:
                    df[col] = df[col].astype(np.int16)
                elif c_min > np.iinfo(np.int32).min and c_max < np.iinfo(np.int32).max:
                    df[col] = df[col].astype(np.int32)
                elif c_min > np.iinfo(np.int64).min and c_max < np.iinfo(np.int64).max:
                    df[col] = df[col].astype(np.int64)
            else:
                if c_min > np.finfo(np.float16).min and c_max < np.finfo(np.float16).max:
                    df[col] = df[col].astype(np.float16)
                elif c_min > np.finfo(np.float32).min and c_max < np.finfo(np.float32).max:
                    df[col] = df[col].astype(np.float32)
                else:
                    df[col] = df[col].astype(np.float64)
        else:
            df[col] = df[col].astype("category")

    end_mem = df.memory_usage().sum() / 1024 ** 2
    print("-----Memory compression ends-----")
    print("Decreased by {:.1f}%".format(100 * (start_mem - end_mem) / start_mem))
    return df
