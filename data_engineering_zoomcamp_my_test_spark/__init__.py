"""PySpark-native analytics engine.

A brand-new engine, built Spark-first, with the query and data-processing
capabilities of the reference ETL system (an ingest -> store -> SQL ->
transform -> publish pipeline stack; see SURVEY.md for the full structural
analysis with reference file:line citations). The in-flight data model is the
PySpark DataFrame; query planning/optimization is Catalyst; custom LLM-data
operators (dedup, similarity search, text analysis, event windows) are
compositions of built-in DataFrame ops, with Arrow-batched pandas UDFs only
where built-ins cannot express the semantics.
"""

from .session import EngineConfig, get_spark
from .sources.tables import TABLE_NAMES, load_tables, register_tables

__all__ = [
    "EngineConfig",
    "get_spark",
    "TABLE_NAMES",
    "load_tables",
    "register_tables",
]

__version__ = "0.1.0"
