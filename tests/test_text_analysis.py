from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.text_analysis import (
    bigram_counts,
    doc_fingerprints,
    doc_stats,
    language_id,
    term_frequencies,
    token_counts_bpe,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en", "s1"),
            (2, "der hund ist und das haus ist gross", "de", "s1"),
            (3, "xyzzy plugh qwerty", "zz", "s2"),
            (4, "Hello, world! 42 tokens?", "en", "s2"),
        ],
        ["doc_id", "text", "lang", "source"],
    )


def test_doc_stats_basic(docs):
    rows = {r["id"]: r for r in doc_stats(docs).collect()}
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["stopword_ratio"] == pytest.approx(2 / 6)  # 'the' x2
    assert rows[1]["punct_ratio"] == 0.0
    assert rows[4]["punct_ratio"] > 0
    assert rows[3]["quality"] == 0.0  # < 5 tokens


def test_language_id_markers(docs):
    rows = {r["id"]: r for r in language_id(docs).collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert rows[3]["lang_pred"] == "und" and rows[3]["lang_score"] == 0


def test_token_counts_bpe(docs):
    rows = {r["id"]: r for r in token_counts_bpe(docs).collect()}
    # "Hello, world! 42 tokens?" -> Hello , world ! 42 tokens ? = 7 pieces
    assert rows[4]["n_bpe_tokens"] == 7
    assert rows[4]["n_word_tokens"] == 4


def test_fingerprints_shared_for_shared_text(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra tail words here"), (3, "unrelated words only three four five")],
        ["doc_id", "text"],
    )
    fps = doc_fingerprints(docs, window=4)
    f1 = {r["fp"] for r in fps.filter(F.col("id") == 1).collect()}
    f2 = {r["fp"] for r in fps.filter(F.col("id") == 2).collect()}
    f3 = {r["fp"] for r in fps.filter(F.col("id") == 3).collect()}
    assert f1 & f2  # shared prefix -> shared fingerprints
    assert not (f1 & f3)


def test_term_frequencies_topk(docs):
    rows = term_frequencies(docs, group_col="lang", top_k=2).collect()
    en = [(r["word"], r["cnt"]) for r in rows if r["grp"] == "en" and r["rnk"] == 1]
    assert en == [("the", 2)]
    assert all(r["rnk"] <= 2 for r in rows)


def test_bigram_counts(spark):
    docs = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    got = {r["bigram"]: r["cnt"] for r in bigram_counts(docs).collect()}
    assert got == {"a b": 2, "b a": 2}


def test_quality_pandas_udf_matches_expression(spark, sf_dir):
    from amorphous_mapreduce_spark.operators.text_analysis import (
        quality_scores_pandas,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expr = {r["id"]: r["quality"] for r in doc_stats(docs).collect()}
    udf = {r["id"]: r["quality"] for r in quality_scores_pandas(docs).collect()}
    assert set(expr) == set(udf)
    assert all(abs(expr[i] - udf[i]) < 1e-12 for i in expr)


def test_bm25_ranks_and_rarity(spark):
    from amorphous_mapreduce_spark.operators.text_analysis import bm25_scores

    rows = [
        (1, "apple apple apple banana x y z"),   # heavy on 'apple'
        (2, "apple banana q r s t u"),           # one of each
        (3, "banana banana banana m n o p"),     # heavy on 'banana'
        (4, "nothing relevant here at all ok"),  # no query terms
        (5, "cherry w v u t s r"),               # rare term (df=1)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: r
        for r in bm25_scores(docs, ("apple", "banana", "cherry")).collect()
    }
    assert 4 not in got  # no-term docs are filtered out
    assert got[1]["tf_0"] == 3 and got[1]["tf_1"] == 1 and got[1]["tf_2"] == 0
    # Same length, higher tf of the same term -> higher score.
    assert got[1]["score"] > got[2]["score"]
    # df=1 'cherry' out-scores a single occurrence of df=3 'apple'
    # at equal document length (rarity premium of the rational IDF).
    assert got[5]["score"] > got[2]["score"]


def test_phrase_search_finds_adjacent_pairs(spark):
    from pyspark.sql import Row

    from amorphous_mapreduce_spark.queries_registry import QUERIES

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="big data big data big data", lang="en",
                source="s", quality=1.0),
            Row(doc_id=2, text="big data rules", lang="en", source="s",
                quality=1.0),
            Row(doc_id=3, text="data big nothing here", lang="en",
                source="s", quality=1.0),
        ]
    )
    # drive the registered builder through a monkeyed loader: easier to
    # exercise end-to-end via the operator composition inline
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amorphous_mapreduce_spark.operators.dedup import tokenized

    toks = tokenized(docs)
    w = Window.partitionBy("id").orderBy("pos")
    bg = (
        toks.select("id", F.col("word").alias("w1"),
                    F.lead("word").over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    pc = bg.groupBy("w1", "w2", "id").agg(F.count("*").alias("n"))
    top = (
        pc.groupBy("w1", "w2").agg(F.sum("n").alias("t"))
        .orderBy(F.desc("t"), "w1", "w2").limit(1).collect()
    )
    assert (top[0].w1, top[0].w2, top[0].t) == ("big", "data", 4)
    assert "phrase_search" in QUERIES


def test_topic_shift_invariants(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["topic_shift_boundaries"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_blocks >= 2
        assert 0 <= r.n_weak_boundaries <= r.n_blocks - 1
        assert 0.0 <= r.min_jaccard <= 1.0
        assert 0 <= r.min_boundary_block <= r.n_blocks - 2
