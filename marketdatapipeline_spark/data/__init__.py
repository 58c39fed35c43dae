from marketdatapipeline_spark.data.schema import (
    OHLCV_SCHEMA,
    align_and_union,
    fuzzy_rename_ohlcv,
    normalize_datetime_column,
)
from marketdatapipeline_spark.data.storage import (
    data_exists,
    find_latest_data_file,
    get_processed_data_path,
    get_raw_data_path,
    load_bucketed,
    load_dataframe,
    save_bucketed,
    save_dataframe,
)

__all__ = [
    "OHLCV_SCHEMA",
    "align_and_union",
    "fuzzy_rename_ohlcv",
    "normalize_datetime_column",
    "save_dataframe",
    "load_dataframe",
    "get_raw_data_path",
    "get_processed_data_path",
    "find_latest_data_file",
    "data_exists",
    "save_bucketed",
    "load_bucketed",
]
