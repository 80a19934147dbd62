from .dataset import (
    BatchIterable,
    ColumnarDataset,
    DataGenerator,
    PredictIterable,
)
from .prefetch import Prefetcher, prefetch
from .utils import df_to_dict, read_csv_fast, reduce_mem_usage
from ..core.features import get_auto_embedding_dim

__all__ = [
    "BatchIterable",
    "ColumnarDataset",
    "DataGenerator",
    "PredictIterable",
    "Prefetcher",
    "prefetch",
    "df_to_dict",
    "read_csv_fast",
    "reduce_mem_usage",
    "get_auto_embedding_dim",
]
