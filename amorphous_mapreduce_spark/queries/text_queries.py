"""Text-pipeline queries: word count + text analysis over ``documents``.

These re-express the reference's word-count pipeline (src/word_count.rs,
SURVEY.md §2.2 W1-W8) and the north-star text-analysis operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


BM25_TERMS = ("spark", "window", "merge")

_BM25_TS = []
for _i in range(3):
    _BM25_TS.append(
        f"""((CAST(_n_doc AS DOUBLE) - CAST(_df_{_i} AS DOUBLE) + 0.5)
      / (CAST(_df_{_i} AS DOUBLE) + 0.5))
    * (CAST(tf_{_i} AS DOUBLE) * 2.2)
    / (CAST(tf_{_i} AS DOUBLE)
       + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE)
                                     * CAST(_n_doc AS DOUBLE)
                                     / CAST(_n_tok AS DOUBLE))))"""
    )

BM25_ORACLE = f"""
WITH toks AS (
    SELECT id, word FROM (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                   ' ')) AS word
        FROM documents
    ) WHERE length(word) > 0
),
per_doc AS (
    SELECT id, COUNT(*) AS dl,
           CAST(SUM(CASE WHEN word = '{BM25_TERMS[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_0,
           CAST(SUM(CASE WHEN word = '{BM25_TERMS[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_1,
           CAST(SUM(CASE WHEN word = '{BM25_TERMS[2]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_2
    FROM toks GROUP BY id
),
scal AS (
    SELECT COUNT(*) AS _n_doc,
           CAST(SUM(dl) AS BIGINT) AS _n_tok,
           CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df_0,
           CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df_1,
           CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df_2
    FROM per_doc
)
SELECT id, dl, tf_0, tf_1, tf_2,
       {_BM25_TS[0]}
     + {_BM25_TS[1]}
     + {_BM25_TS[2]} AS score
FROM per_doc CROSS JOIN scal
WHERE greatest(tf_0, tf_1, tf_2) > 0
ORDER BY score DESC, id
LIMIT 15
"""


@register("bm25_ranking", BM25_ORACLE)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 documents for a fixed 3-term query. Rational Robertson
    IDF (no libm log — rank-equivalent, bit-identical across engines),
    per-term scores summed in literal term order, scalars (N, total
    tokens, per-term df) broadcast from ONE 1-row aggregate. Top-k is a
    TakeOrderedAndProject with id tie-break."""
    from amorphous_mapreduce_spark.operators.text_analysis import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, BM25_TERMS)
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(15)
