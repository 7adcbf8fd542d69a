"""Python UDTF surface — table-valued functions for row-expanding logic.

The reference registers no UDTF (SURVEY §2.7) and nearly everything this
engine fans out is a codegen'd ``explode`` over an array expression (the
fast path — see operators/text.chunk_documents). A UDTF is the escape
hatch for expansions whose per-row logic is genuinely imperative; this
module keeps one production-shaped example — sentence segmentation — to
pin the registration/LATERAL-join plumbing, and q131 proves the executed
result against a DuckDB twin (the split rule is RE2-compatible, so the
oracle replays it with regexp_split_to_array).

Scale note: Python UDTFs pay the same serialization toll as row-at-a-time
UDFs (no Arrow batching as of Spark 4.1) — use them for logic that cannot
be an array expression, never in a hot aggregation path.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)

# Period followed by whitespace — deliberately RE2-safe (no lookbehind),
# so DuckDB's regexp_split_to_array applies the IDENTICAL rule.
_SENT_RULE = r"\.\s+"


@udtf(returnType="sent_id int, sentence string")
class SentenceSplit:
    """One output row per sentence (split on '. ', empties dropped)."""

    def eval(self, text: str) -> Iterator[tuple[int, str]]:
        if text is None:
            return
        i = 0
        for piece in re.split(_SENT_RULE, text):
            if piece:
                yield i, piece
                i += 1


def register_sentence_split(spark: SparkSession, name: str = "sentence_split"):
    spark.udtf.register(name, SentenceSplit)


@_register(
    "q131_sentence_stats",
    oracle=r"""
    WITH sents AS (
        SELECT lang, doc_id,
               list_filter(regexp_split_to_array(text, '\.\s+'),
                           p -> p <> '') AS pieces
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(pieces)) AS BIGINT) AS n_sentences,
           CAST(SUM(list_sum(list_transform(pieces, p -> length(p))))
                AS BIGINT) AS sum_sentence_chars
    FROM sents
    GROUP BY lang
    """,
)
def q131_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence census per language, computed THROUGH the Python UDTF via
    a LATERAL join — the row-expanding UDF surface on the oracle gate
    (DuckDB replays the identical RE2 split rule over arrays).

    Scale notes: the LATERAL UDTF fans each doc into its sentences in the
    Python worker (row-serialized — the documented slow path); the
    aggregation then shuffles six groups. The array-expression form
    (regexp-split + explode, all JVM) is the production shape for this
    particular rule — the UDTF exists for expansions that cannot be
    array expressions, and this query pins that plumbing end-to-end.
    """
    register_sentence_split(spark)
    d = load_table(spark, "documents", sf_dir)
    d.createOrReplaceTempView("q131_docs")
    sents = spark.sql(
        "SELECT d.lang, d.doc_id, s.sentence "
        "FROM q131_docs d, LATERAL sentence_split(d.text) s"
    )
    return (
        sents.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum(F.length("sentence")).alias("sum_sentence_chars"),
        )
    )
