"""Python UDTF surface (SURVEY.md §2.10 "(udtf)" row): a set-returning
table function registered and invoked through the engine's SQL front end
(``LATERAL udtf(...)``), completing the UDF surface alongside the scalar
``@pandas_udf`` and grouped-map ``applyInPandas`` queries in plans/udf.py.

The function itself — fixed-width token chunking — deliberately mirrors
the native-array ``split_units`` stage in operators/summarize.py: the
point is the UDTF *mechanism* (per-row Python generator → rows), checked
against a DuckDB oracle that recomputes the chunking relationally.

Scale note: a Python UDTF is a row-at-a-time generator across the
JVM↔Python boundary — strictly the slowest UDF shape. It exists for
set-returning logic that genuinely cannot be expressed as arrays +
``explode`` (recursive parsers, per-row API fan-out); anything
expressible natively (like this chunker) should use the array form in
production — see operators/summarize.py:split_units for the native
equivalent of exactly this function.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table

#: Tokens per chunk — matches split_units' default unit_tokens.
CHUNK_TOKENS = 12


@udtf(returnType="pos int, chunk string, n_tokens int")
class ChunkDoc:
    """Yield fixed-width token chunks of one document.

    Tokenization is ``re.split(r"\\s+", ..., flags=re.ASCII)`` — the
    ASCII flag matters: Python's ``\\s`` is Unicode-aware by default,
    while Java's (Spark ``split``) and RE2's (DuckDB
    ``regexp_split_to_array``) are ASCII-only, so a U+00A0 no-break
    space would split here but not there. With ASCII all three agree,
    including empty leading/trailing fields.
    """

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        toks = re.split(r"\s+", text or "", flags=re.ASCII)
        for i in range(0, len(toks), CHUNK_TOKENS):
            window = toks[i : i + CHUNK_TOKENS]
            yield i // CHUNK_TOKENS, " ".join(window), len(window)


@register(
    "q_udtf_chunks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
                  FROM documents WHERE text <> '' AND doc_id < 100),
    ch AS (SELECT doc_id, CAST(u.i AS INT) AS pos,
                  array_to_string(t[u.i * {CHUNK_TOKENS} + 1 : (u.i + 1) * {CHUNK_TOKENS}], ' ')
                    AS chunk,
                  CAST(len(t[u.i * {CHUNK_TOKENS} + 1 : (u.i + 1) * {CHUNK_TOKENS}]) AS INT)
                    AS n_tokens
           FROM toks,
                UNNEST(range(0, CAST(ceil(len(t) / {CHUNK_TOKENS}.0) AS BIGINT))) AS u(i))
    SELECT doc_id, pos, chunk, n_tokens FROM ch
    """,
    tier="B",
    doc="Python UDTF (set-returning table function, Spark ≥3.5) invoked "
    "via LATERAL: fixed-width token chunking of each document. The "
    "oracle recomputes the chunks relationally; the native-array "
    "equivalent of this function is operators/summarize.py:split_units "
    "(the production path — the UDTF exists to verify the mechanism).",
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("text <> '' AND doc_id < 100")
    spark.udtf.register("chunk_doc", ChunkDoc)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.pos, c.chunk, c.n_tokens "
        "FROM _udtf_docs d, LATERAL chunk_doc(d.text) c"
    )


#: n-gram width for the registered polymorphic-UDTF query.
POLY_NGRAM_K = 3


@udtf
class NGramsUDTF:
    """POLYMORPHIC UDTF (Spark ≥4): the output schema is computed by
    ``analyze`` from the literal ``k`` argument — ``pos`` plus word
    columns ``w1..wk`` — so one registration serves every n-gram width,
    the dynamic-schema capability a ``returnType`` UDTF cannot express.
    Tokenization matches ChunkDoc (ASCII ``\\s`` split) for
    cross-engine agreement.
    """

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.types import IntegerType, StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if k.value is None or not isinstance(k.value, int) or k.value < 1:
            raise ValueError("ngrams(text, k): k must be a positive int literal")
        schema = StructType().add("pos", IntegerType())
        for i in range(k.value):
            schema = schema.add(f"w{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, k: int):
        toks = re.split(r"\s+", text or "", flags=re.ASCII)
        for i in range(len(toks) - k + 1):
            yield (i, *toks[i : i + k])


@register(
    "q_udtf_polymorphic",
    oracle=f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
                  FROM documents WHERE text <> '' AND doc_id < 50)
    SELECT doc_id, CAST(u.i AS INT) AS pos,
           t[u.i + 1] AS w1, t[u.i + 2] AS w2, t[u.i + 3] AS w3
    FROM toks, UNNEST(range(0, GREATEST(len(t) - {POLY_NGRAM_K - 1}, 0))) AS u(i)
    """,
    tier="B",
    doc=f"Polymorphic Python UDTF (Spark 4 analyze()): the n-gram "
    f"emitter's schema (pos, w1..wk) is derived from the literal "
    f"k={POLY_NGRAM_K} at ANALYSIS time — Catalyst resolves the "
    "LATERAL's output columns from the UDTF's own analyze method, the "
    "dynamic-schema contract static returnType UDTFs can't express. "
    "Oracle recomputes the k-grams relationally.",
)
def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("text <> '' AND doc_id < 50")
    spark.udtf.register("poly_ngrams", NGramsUDTF)
    docs.createOrReplaceTempView("_udtf_poly_docs")
    return spark.sql(
        f"SELECT d.doc_id, g.pos, g.w1, g.w2, g.w3 "
        f"FROM _udtf_poly_docs d, LATERAL poly_ngrams(d.text, {POLY_NGRAM_K}) g"
    )


@udtf(returnType="event_type string, n_rows long, n_up_steps long, longest_up_run long")
class RunStats:
    """Per-partition sequential state over ordered rows: strictly-
    increasing run tracking for one event-type series. The TABLE(...)
    PARTITION BY / ORDER BY contract delivers each partition's rows to
    ONE instance in order; terminate() emits the partition summary."""

    def __init__(self) -> None:
        self._type = None
        self._prev = None
        self._n = 0
        self._up = 0
        self._run = 0
        self._best = 0

    def eval(self, row) -> None:  # noqa: D102 - UDTF contract
        self._type = row["event_type"]
        self._n += 1
        # NULL value: not comparable — never an up-step, and it becomes
        # prev (breaking the next comparison too), exactly like the
        # oracle's lag(value) chain (a None > float is a TypeError, the
        # /tmp/skew4 null-value crash). NaN needs no branch: IEEE
        # comparisons are False, matching the oracle's isnan guards.
        v = row["value"]
        if self._prev is not None and v is not None and v > self._prev:
            self._up += 1
            self._run += 1
        else:
            self._run = 1
        self._best = max(self._best, self._run)
        self._prev = v

    def terminate(self):  # noqa: D102 - UDTF contract
        if self._n:
            yield self._type, self._n, self._up, self._best


@register(
    "q_udtf_table_arg",
    oracle="""
    WITH s AS (SELECT event_type, value,
                      LAG(value) OVER w AS pv,
                      ROW_NUMBER() OVER w AS rn
               FROM events
               WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    -- isnan guards pin IEEE comparison semantics: the Python UDTF's
    -- `value > prev` is False whenever either side is NaN, while SQL
    -- NaN-sorts-greatest would count NaN as an up-step (the
    -- /tmp/skew7 finding). ±Inf compares identically in both.
    f AS (SELECT event_type, rn,
                 CASE WHEN pv IS NOT NULL
                       AND NOT isnan(value) AND NOT isnan(pv)
                       AND value > pv THEN 1 ELSE 0 END AS up
          FROM s),
    g AS (SELECT event_type, rn, up,
                 SUM(1 - up) OVER (PARTITION BY event_type ORDER BY rn) AS grp
          FROM f),
    runs AS (SELECT event_type, grp, CAST(COUNT(*) AS BIGINT) AS run_rows
             FROM g GROUP BY event_type, grp)
    SELECT f.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(up) AS BIGINT) AS n_up_steps,
           MAX(r.longest) AS longest_up_run
    FROM f
    JOIN (SELECT event_type, MAX(run_rows) AS longest
          FROM runs GROUP BY event_type) r USING (event_type)
    GROUP BY f.event_type
    """,
    tier="B",
    doc="Spark 4 UDTF with a TABLE argument (SQL-invoked table-valued "
    "function over PARTITION BY event_type ORDER BY ts, event_id): a "
    "stateful Python generator receives each series' rows IN ORDER on "
    "one instance and emits per-partition run statistics — row count, "
    "strictly-increasing steps, and the longest increasing run. This "
    "is the API surface for sequential per-group logic that windows "
    "express awkwardly (parsers, legacy sessionizers, protocol "
    "decoders); the oracle recomputes the same statistics relationally "
    "(gaps-and-islands over a lag flag), so the green hash proves the "
    "partitioning contract delivered every row exactly once and in "
    "order. Scale: parallelism = partition count (like any grouped "
    "map); per-row Python cost applies — the relational form wins "
    "whenever it exists, which is exactly what the paired oracle "
    "demonstrates. Unique (ts, event_id) order makes runs exact.",
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("run_stats_tvf", RunStats)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT * FROM run_stats_tvf(
            TABLE(SELECT event_type, value, ts, event_id FROM events)
            PARTITION BY event_type ORDER BY (ts, event_id)
        )
        """
    )
