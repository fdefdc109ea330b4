"""news_categorization_big_data_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference `ansbkh159/News-Categorization-Big-Data`
(a PySpark news classify/summarize pipeline), generalized into a reusable
operator surface:

- relational core (scans, filters, joins, aggregations, windows, set ops)
- scalar function catalog (string / date / math / array / map / json)
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns)
- MLlib classification pipeline + extractive summarization (engine-native
  replacement of the reference's HuggingFace models)
- Structured Streaming topology (Kafka-shaped sources, event-time windows,
  idempotent foreachBatch sinks)

Everything is declared through the DataFrame API so Catalyst/Tungsten own
physical planning; Python UDFs appear only where built-in operators cannot
express the semantics (model inference, opaque binary decode).
"""

__version__ = "0.1.0"

from news_categorization_big_data_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session", "__version__"]
