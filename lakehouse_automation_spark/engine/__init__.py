from .session import get_spark, tune_session
from .catalog import load_tables, table, TABLE_NAMES

__all__ = ["get_spark", "tune_session", "load_tables", "table", "TABLE_NAMES"]
