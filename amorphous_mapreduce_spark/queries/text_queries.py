"""Text-pipeline queries: word count + text analysis over ``documents``.

These re-express the reference's word-count pipeline (src/word_count.rs,
SURVEY.md §2.2 W1-W8) and the north-star text-analysis operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amorphous_mapreduce_spark.operators.wordcount import word_counts
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

WORDCOUNT_ORACLE = """
SELECT word, COUNT(*) AS cnt
FROM (
    SELECT regexp_replace(lower(unnest(regexp_split_to_array(text, '\\s+'))),
                          '[,.]', '', 'g') AS word
    FROM documents
)
WHERE length(word) > 0
GROUP BY word
"""


@register("wordcount", WORDCOUNT_ORACLE)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-W8: tokenize -> normalise -> hash-shuffle -> count (src/word_count.rs:90-128)."""
    return word_counts(load_table(spark, sf_dir, "documents"))
