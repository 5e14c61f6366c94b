from .parquet import SCHEMAS, TABLES, load, load_all

__all__ = ["SCHEMAS", "TABLES", "load", "load_all"]
