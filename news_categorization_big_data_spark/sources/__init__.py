"""Source connectors: parquet catalog, permissive JSON, streaming sources."""

from news_categorization_big_data_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
