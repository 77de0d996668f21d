"""Additional sources/sinks beyond io.py's CSV/Parquet core."""

from dados_publicos_etl_spark.sources.formats import (
    read_binary_files,
    read_json,
    write_json,
)

__all__ = ["read_binary_files", "read_json", "write_json"]
