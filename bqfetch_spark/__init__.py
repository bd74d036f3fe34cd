"""bqfetch_spark — a PySpark-native analytics engine with the query
surface of TristanBilot/bqfetch, extended into a full DataFrame/SQL
analytics + LLM-data-pipeline engine (see SURVEY.md)."""

from bqfetch_spark.catalog import Catalog, load_catalog, normalize_table
from bqfetch_spark.fetcher import Fetcher, FetchingChunk, TableRef
from bqfetch_spark.session import get_session

__all__ = [
    "Catalog",
    "load_catalog",
    "normalize_table",
    "Fetcher",
    "FetchingChunk",
    "TableRef",
    "get_session",
]
