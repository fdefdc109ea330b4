"""Permissive JSON corpus reader.

The reference accepts its news corpus as EITHER a single JSON array OR
JSON-Lines with malformed lines skipped (raw_news_to_telegram.py:36-54),
and tolerates ``authors`` being a scalar string, a list, or absent
(raw_news_to_telegram.py:58-64). This reproduces those semantics on
``spark.read.json``:

- array vs JSONL is auto-detected from the first non-whitespace byte of
  the file head (cheap: one driver-side open of one file);
- ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` gives per-line
  error-skip, distributed (the reference's try/except per line, minus
  the driver loop);
- the ``authors`` union type is normalized to ``array<string>`` by
  parsing the field as a raw JSON string and branching on its shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _looks_like_array(spark: SparkSession, path: str) -> bool:
    # One tiny driver-side read of the file head; works for local and
    # hadoop-visible paths via the JVM filesystem API.
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    status = fs.getFileStatus(hpath)
    target = status.getPath()
    if status.isDirectory():
        for st in fs.listStatus(target):
            if st.isFile() and st.getLen() > 0:
                target = st.getPath()
                break
    stream = fs.open(target)
    try:
        for _ in range(4096):
            byte = stream.read()
            if byte < 0:
                return False
            char = chr(byte)
            if not char.isspace():
                return char == "["
    finally:
        stream.close()
    return False


def read_json_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-array or JSON-Lines corpus with per-record error skip.

    Returns all data columns plus none of the corrupt-record bookkeeping;
    malformed JSONL lines are dropped (the reference logs-and-skips).
    """
    multiline = _looks_like_array(spark, path)
    # DROPMALFORMED: bad records vanish at parse time, distributed —
    # Spark 4 disallows filtering the corrupt-record column straight off
    # raw files, so PERMISSIVE+filter is not an option here.
    df = spark.read.option("multiLine", multiline).option("mode", "DROPMALFORMED").json(path)
    if CORRUPT_COL in df.columns:
        df = df.drop(CORRUPT_COL)
    return df


def with_expected_columns(df: DataFrame, expected: dict[str, str]) -> DataFrame:
    """Schema-drift tolerance for INFERRED reads: ensure every expected
    column exists, adding absent ones as typed NULLs.

    Inference only sees the records that parsed — a shard whose JSON
    records are all malformed (or simply absent) infers an empty/
    partial schema, and the downstream projection would fail analysis
    on the missing names. At 100 TB "this shard had nothing parseable"
    is routine, so a permissive corpus reader must degrade to NULL
    columns, exactly as it already does for the union-typed authors
    field (the /tmp/skew6 empty-input sweep caught the crash)."""
    for name, dtype in expected.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(dtype))
    return df


def normalize_authors(df: DataFrame, col: str = "authors") -> DataFrame:
    """Normalize the union-typed authors field to array<string>.

    Accepts: JSON list, scalar string, null/absent → [], matching the
    reference's `authors or 'Unknown'` + isinstance(list) handling
    (raw_news_to_telegram.py:61-64). Implemented by re-serializing the
    inferred column to JSON and branching on its first character —
    column-native, no UDF.
    """
    if col not in df.columns:
        return df.withColumn(col, F.array().cast("array<string>"))
    as_json = F.to_json(F.struct(F.col(col).alias("v")))  # {"v": ...} regardless of type
    raw = F.get_json_object(as_json, "$.v")
    arr = F.from_json(raw, "array<string>")
    normalized = (
        F.when(F.col(col).isNull(), F.array().cast("array<string>"))
        # A scalar that merely *starts* with '[' but isn't valid JSON
        # (from_json → null) is still a scalar author → one-element array,
        # not silently [].
        .when(raw.startswith("[") & arr.isNotNull(), arr)
        .otherwise(F.array(raw))
    )
    return df.withColumn(col, normalized)


def flatten_message(df: DataFrame) -> DataFrame:
    """The reference's flattened-message projection
    (raw_news_to_telegram.py:58-69): field defaults + template concat."""
    headline = F.coalesce(F.col("headline"), F.lit(""))
    desc = F.coalesce(F.col("short_description"), F.lit(""))
    authors = F.when(
        F.size(F.col("authors")) > 0, F.array_join(F.col("authors"), ", ")
    ).otherwise(F.lit("Unknown"))
    return df.select(
        F.concat(
            F.lit("Headline: "), headline,
            F.lit(", Authors: "), authors,
            F.lit(", Description: "), desc,
        ).alias("message")
    )
