"""Sample-cube exporters (CSV / Arrow IPC / Parquet).

Feature-gated in the reference via Cargo features ``csv``/``arrow``/
``parquet`` (/root/reference/src/io/mod.rs); here Arrow/Parquet degrade
gracefully when pyarrow is absent (CSV is dependency-free).
"""

from .csv_io import save_csv, save_csv_tensor
from .arrow_io import save_arrow
from .parquet_io import ParquetStreamWriter, save_parquet, save_parquet_tensor

__all__ = [
    "ParquetStreamWriter",
    "save_arrow",
    "save_csv",
    "save_csv_tensor",
    "save_parquet",
    "save_parquet_tensor",
]
