from .parquet import SCHEMAS, TABLES, load, load_all
from .alphavantage import fetch_payload, payload_to_df
from .jdbc import jdbc_append, jdbc_reader
from .catalog import (
    jdbc_table_exists,
    path_exists,
    read_path_if_exists,
    table_exists,
)
from .files import quarantine_corrupt, read_csv, read_jsonl
from .layout import co_located_join, write_bucketed, write_partitioned

__all__ = [
    "SCHEMAS",
    "TABLES",
    "load",
    "load_all",
    "fetch_payload",
    "payload_to_df",
    "jdbc_append",
    "jdbc_reader",
    "jdbc_table_exists",
    "path_exists",
    "read_path_if_exists",
    "table_exists",
    "co_located_join",
    "write_bucketed",
    "write_partitioned",
    "quarantine_corrupt",
    "read_csv",
    "read_jsonl",
]
