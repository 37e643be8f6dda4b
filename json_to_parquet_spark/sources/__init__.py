from .catalog import TABLES, load_table, register_all
from .ndjson import read_ndjson

__all__ = ["TABLES", "load_table", "register_all", "read_ndjson"]
