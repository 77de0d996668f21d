"""Additional sources/sinks beyond io.py's CSV/Parquet core."""

from dados_publicos_etl_spark.sources.formats import (
    read_binary_files,
    read_json,
    read_orc,
    read_text,
    write_json,
    write_orc,
)

__all__ = [
    "read_binary_files",
    "read_json",
    "read_orc",
    "read_text",
    "write_json",
    "write_orc",
]
