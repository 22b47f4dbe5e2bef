"""Language-model scoring battery: unigram surprisal filtering, DSIR
importance weights, and cross-source cross-entropy — the perplexity-
style quality/selection ops of an LLM data-curation pipeline.

All three need a logarithm; libm is not cross-engine reproducible, so
every log goes through ``functions.intlog`` (exponent from binary
string length + 256-entry mantissa LUT shared verbatim by both
engines) — scores are exact integers, one final double division.

Oracle notes:
- DuckDB SUM(BIGINT) -> HUGEINT: every summed score is cast back.
- hex-hash bucketing uses the portable 60-bit MD5 prefix (convention 2).
- all ORDER BYs carry an id tie-break (convention 4).

Reference tie-in: tokenize/count W3-W7 (src/word_count.rs:90-128)
feeding VecOp reduce semantics (src/op.rs:18-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.intlog import (
    LOG2_SCALE,
    log2_scaled,
    log2_scaled_sql,
)
from amorphous_mapreduce_spark.queries.dedup_queries import toks_cte
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

TOKS_CTE = toks_cte()

SURPRISAL_TOP = 15

SURPRISAL_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, tf AS (SELECT id, word, CAST(COUNT(*) AS BIGINT) AS tf
         FROM toks GROUP BY id, word),
cw AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY word),
scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM cw),
per_doc AS (
    SELECT id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf * {log2_scaled_sql("c")}) AS BIGINT) AS sum_lq
    FROM tf JOIN cw USING (word) GROUP BY id
)
SELECT id,
       n_tokens,
       CAST({log2_scaled_sql("n_tok")} * n_tokens - sum_lq AS BIGINT)
           AS surprisal_scaled,
       CAST({log2_scaled_sql("n_tok")} * n_tokens - sum_lq AS DOUBLE)
           / CAST(n_tokens * {LOG2_SCALE} AS DOUBLE) AS mean_bits
FROM per_doc CROSS JOIN scal
ORDER BY mean_bits DESC, id LIMIT {SURPRISAL_TOP}
"""
)


@register("unigram_surprisal_filter", SURPRISAL_ORACLE)
def q_unigram_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter: rank documents by mean token
    surprisal under the corpus's own unigram LM — the classic
    "perplexity filtering" gate of LLM data curation (high mean
    surprisal = rare-token gibberish, the first candidates to drop or
    audit).

    Exactness: surprisal of token w is log2(N) - log2(c_w); both logs
    are intlog integer-scaled 2^20 values, so the per-doc sum is an
    exact BIGINT and the mean is ONE double division identical on both
    engines.

    Scale: tokenize -> (doc, word) count -> corpus-count join keyed on
    word (vocab-sized, hash join) -> per-doc aggregate; the corpus
    total is a 1-row scalar crossed back. No windows, no all-pairs."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        tokenized(docs)
        .groupBy("id", "word")
        .agg(F.count("*").alias("tf"))
    )
    cw = tf.groupBy("word").agg(F.sum("tf").alias("c"))
    scal = cw.agg(F.sum("c").alias("n_tok"))
    per_doc = (
        tf.join(cw, "word")
        .select("id", "tf", (F.col("tf") * log2_scaled("c")).alias("wlq"))
        .groupBy("id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("wlq").alias("sum_lq"))
    )
    joined = per_doc.crossJoin(F.broadcast(scal))
    num = log2_scaled("n_tok") * F.col("n_tokens") - F.col("sum_lq")
    return (
        joined.select(
            "id",
            "n_tokens",
            num.cast("long").alias("surprisal_scaled"),
            (
                num.cast("double")
                / (F.col("n_tokens") * F.lit(LOG2_SCALE)).cast("double")
            ).alias("mean_bits"),
        )
        .orderBy(F.desc("mean_bits"), F.asc("id"))
        .limit(SURPRISAL_TOP)
    )


# --- DSIR importance weights --------------------------------------------------

DSIR_BUCKETS = 512
DSIR_TOP = 20

_BUCKET_SQL = (
    "CAST('0x' || substr(md5('dsir:' || word), 1, 15) AS BIGINT)"
    f" % {DSIR_BUCKETS}"
)

DSIR_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, tb AS (
    SELECT t.id, {_BUCKET_SQL} AS b, d.lang
    FROM toks t JOIN documents d ON t.id = d.doc_id
),
ct AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tb
       WHERE lang <> 'en' GROUP BY b),
cr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tb GROUP BY b),
scal AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tb WHERE lang <> 'en') AS nt,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tb) AS nr
),
dtf AS (SELECT id, b, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tb WHERE lang = 'en' GROUP BY id, b),
per_doc AS (
    SELECT dtf.id,
           CAST(SUM(dtf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(dtf.tf * ({log2_scaled_sql("COALESCE(ct.c, 0) + 1")}
                              - {log2_scaled_sql("cr.c + 1")}))
                AS BIGINT) AS sum_ratio
    FROM dtf JOIN cr USING (b) LEFT JOIN ct USING (b)
    GROUP BY dtf.id
)
SELECT id, n_tokens,
       CAST(sum_ratio - n_tokens
            * ({log2_scaled_sql(f"nt + {DSIR_BUCKETS}")}
               - {log2_scaled_sql(f"nr + {DSIR_BUCKETS}")}) AS BIGINT)
           AS weight_scaled,
       CAST(sum_ratio - n_tokens
            * ({log2_scaled_sql(f"nt + {DSIR_BUCKETS}")}
               - {log2_scaled_sql(f"nr + {DSIR_BUCKETS}")}) AS DOUBLE)
           / CAST(n_tokens * {LOG2_SCALE} AS DOUBLE) AS bits_per_token
FROM per_doc CROSS JOIN scal
ORDER BY bits_per_token DESC, id LIMIT {DSIR_TOP}
"""
)


@register("dsir_importance_weights", DSIR_ORACLE)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
    score each raw-pool document (here: lang='en') by the hashed-unigram
    log-likelihood ratio between a target distribution (non-English
    docs) and the raw distribution — the published recipe for picking
    pretraining data that "looks like" a target domain. Positive
    bits_per_token = more target-like than an average raw doc.

    Exactness: words hash into 512 buckets via the portable MD5 hash;
    add-1-smoothed bucket log-probs are intlog integers, so the per-doc
    log-ratio is an exact BIGINT; ONE double division for the per-token
    normalization.

    Scale: bucket count tables are <= 512 rows (broadcast); per-doc
    (id, bucket) aggregate -> two broadcast joins -> per-doc reduce.
    The feature space is fixed-width regardless of corpus size."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    tb = (
        tokenized(docs)
        .select(
            "id",
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("word"))), 1, 15),
                    16,
                    10,
                ).cast("long")
                % DSIR_BUCKETS
            ).alias("b"),
        )
        .join(
            F.broadcast(docs.select(F.col("doc_id").alias("id"), "lang")), "id"
        )
        .persist()  # feeds target counts, raw counts, totals AND the pool
    )
    ct = tb.filter(F.col("lang") != "en").groupBy("b").agg(
        F.count("*").alias("ct")
    )
    cr = tb.groupBy("b").agg(F.count("*").alias("cr"))
    scal = tb.agg(
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("nt"),
        F.count("*").alias("nr"),
    )
    dtf = (
        tb.filter(F.col("lang") == "en")
        .groupBy("id", "b")
        .agg(F.count("*").alias("tf"))
    )
    ratio = log2_scaled("COALESCE(ct, 0) + 1") - log2_scaled("cr + 1")
    per_doc = (
        dtf.join(F.broadcast(cr), "b")
        .join(F.broadcast(ct), "b", "left")
        .select("id", "tf", (F.col("tf") * ratio).alias("wr"))
        .groupBy("id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("wr").alias("sum_ratio"))
    )
    base = log2_scaled(f"nt + {DSIR_BUCKETS}") - log2_scaled(f"nr + {DSIR_BUCKETS}")
    weight = F.col("sum_ratio") - F.col("n_tokens") * base
    return (
        per_doc.crossJoin(F.broadcast(scal))
        .select(
            "id",
            "n_tokens",
            weight.cast("long").alias("weight_scaled"),
            (
                weight.cast("double")
                / (F.col("n_tokens") * F.lit(LOG2_SCALE)).cast("double")
            ).alias("bits_per_token"),
        )
        .orderBy(F.desc("bits_per_token"), F.asc("id"))
        .limit(DSIR_TOP)
    )


# --- cross-language unigram cross-entropy matrix ------------------------------

XENT_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, tagged AS (
    SELECT t.word, d.lang FROM toks t JOIN documents d ON t.id = d.doc_id
),
cl AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
       FROM tagged GROUP BY lang, word),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM cl GROUP BY lang),
vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM tagged),
pairs AS (
    SELECT tr.lang AS train_lang, ev.lang AS eval_lang, ev.word,
           ev.c AS tf, COALESCE(ct.c, 0) AS c_t
    FROM cl ev
    CROSS JOIN (SELECT lang FROM tot) tr
    LEFT JOIN cl ct ON ct.lang = tr.lang AND ct.word = ev.word
),
num AS (
    SELECT train_lang, eval_lang,
           CAST(SUM(tf) AS BIGINT) AS eval_tokens,
           CAST(SUM(tf * {log2_scaled_sql("c_t + 1")}) AS BIGINT) AS sum_lp
    FROM pairs GROUP BY train_lang, eval_lang
)
SELECT train_lang, eval_lang, eval_tokens,
       CAST({log2_scaled_sql("n_l + v")} * eval_tokens - sum_lp AS DOUBLE)
           / CAST(eval_tokens * {LOG2_SCALE} AS DOUBLE) AS cross_entropy_bits
FROM num
JOIN tot ON tot.lang = num.train_lang
CROSS JOIN vocab
ORDER BY train_lang, eval_lang
"""
)


@register("lang_cross_entropy_matrix", XENT_ORACLE)
def q_lang_cross_entropy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy H(eval || train) for every language pair:
    train an add-1-smoothed unigram LM per language, evaluate every
    language's token stream under it — the domain-proximity matrix that
    drives dataset-mixing decisions (diagonal = in-domain entropy,
    off-diagonal = transfer cost in bits/token).

    Exactness: smoothed log-probs log2((c+1)/(N_l+V)) decompose into two
    intlog integers; the per-pair numerator is an exact BIGINT; ONE
    double division per output row.

    Scale: the fan-out is (vocab x #languages) rows — language count is
    a small constant, so the pair stage is a broadcast nested-loop over
    a 5-row side; per-pair reduce is a hash aggregate. Vocab-bounded,
    corpus-size-independent state."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    tagged = tokenized(docs).join(
        F.broadcast(docs.select(F.col("doc_id").alias("id"), "lang")), "id"
    )
    cl = tagged.groupBy("lang", "word").agg(F.count("*").alias("c")).persist()
    tot = cl.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = cl.agg(F.countDistinct("word").alias("v"))
    ev = cl.select(
        F.col("lang").alias("eval_lang"), "word", F.col("c").alias("tf")
    )
    tr = tot.select(F.col("lang").alias("train_lang"))
    ct = cl.select(
        F.col("lang").alias("train_lang"), "word", F.col("c").alias("c_t0")
    )
    pairs = (
        ev.crossJoin(F.broadcast(tr))
        .join(ct, ["train_lang", "word"], "left")
        .select(
            "train_lang",
            "eval_lang",
            "tf",
            F.coalesce(F.col("c_t0"), F.lit(0)).alias("c_t"),
        )
    )
    num = (
        pairs.select(
            "train_lang",
            "eval_lang",
            "tf",
            (F.col("tf") * log2_scaled("c_t + 1")).alias("wlp"),
        )
        .groupBy("train_lang", "eval_lang")
        .agg(F.sum("tf").alias("eval_tokens"), F.sum("wlp").alias("sum_lp"))
    )
    return (
        num.join(
            F.broadcast(tot.select(F.col("lang").alias("train_lang"), "n_l")),
            "train_lang",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "train_lang",
            "eval_lang",
            "eval_tokens",
            (
                (log2_scaled("n_l + v") * F.col("eval_tokens") - F.col("sum_lp"))
                .cast("double")
                / (F.col("eval_tokens") * F.lit(LOG2_SCALE)).cast("double")
            ).alias("cross_entropy_bits"),
        )
        .orderBy("train_lang", "eval_lang")
    )


# --- bigram-over-unigram perplexity gain per source ---------------------------

BIGRAM_GAIN_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, tagged AS (
    SELECT t.id, t.pos, t.word, d.source
    FROM toks t JOIN documents d ON t.id = d.doc_id
),
uni AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM tagged GROUP BY source, word),
stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM uni GROUP BY source),
vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM tagged),
bg AS (
    SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM (
        SELECT source, id, word AS w1,
               lead(word) OVER (PARTITION BY id ORDER BY pos) AS w2
        FROM tagged
    ) WHERE w2 IS NOT NULL GROUP BY source, w1, w2
),
h1 AS (
    SELECT u.source,
           CAST(SUM(u.c) AS BIGINT) AS n_tokens,
           CAST(SUM(u.c * ({log2_scaled_sql("n_s + v")}
                           - {log2_scaled_sql("u.c + 1")})) AS BIGINT) AS bits1
    FROM uni u JOIN stot USING (source) CROSS JOIN vocab
    GROUP BY u.source
),
h2 AS (
    SELECT bg.source,
           CAST(SUM(c12) AS BIGINT) AS n_bigrams,
           CAST(SUM(c12 * ({log2_scaled_sql("u.c + v")}
                           - {log2_scaled_sql("c12 + 1")})) AS BIGINT) AS bits2
    FROM bg
    JOIN uni u ON u.source = bg.source AND u.word = bg.w1
    CROSS JOIN vocab
    GROUP BY bg.source
)
SELECT h1.source, n_tokens, n_bigrams,
       CAST(bits1 AS DOUBLE) / CAST(n_tokens * {LOG2_SCALE} AS DOUBLE)
           AS unigram_bits,
       CAST(bits2 AS DOUBLE) / CAST(n_bigrams * {LOG2_SCALE} AS DOUBLE)
           AS bigram_bits,
       CAST(bits1 AS DOUBLE) / CAST(n_tokens * {LOG2_SCALE} AS DOUBLE)
       - CAST(bits2 AS DOUBLE) / CAST(n_bigrams * {LOG2_SCALE} AS DOUBLE)
           AS gain_bits
FROM h1 JOIN h2 ON h1.source = h2.source
ORDER BY h1.source
"""
)


@register("bigram_perplexity_gain", BIGRAM_GAIN_ORACLE)
def q_bigram_perplexity_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-order study per source: in-domain bits/token under an add-1
    unigram LM vs an add-1-smoothed bigram LM (conditional
    (c12+1)/(c1+V)) — the gain quantifies how much local word order
    each source's text carries (boilerplate-heavy sources gain most),
    informing tokenizer and context-length decisions.

    Exactness: both entropies decompose into intlog integers; per-source
    sums are exact BIGINTs; two double divisions per row.

    Scale: unigram and bigram tables are vocab-bounded hash aggregates;
    the bigram pass uses a per-doc window (partitioned by doc — never
    global); the conditional join is keyed on (source, w1)."""
    from pyspark.sql import Window

    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    tagged = (
        tokenized(docs)
        .join(F.broadcast(docs.select(F.col("doc_id").alias("id"), "source")), "id")
        .persist()  # unigram, vocab AND bigram passes
    )
    uni = tagged.groupBy("source", "word").agg(F.count("*").alias("c")).persist()
    stot = uni.groupBy("source").agg(F.sum("c").alias("n_s"))
    vocab = tagged.agg(F.countDistinct("word").alias("v"))
    w = Window.partitionBy("id").orderBy("pos")
    bg = (
        tagged.select("source", "id", "pos", F.col("word").alias("w1"))
        .withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .groupBy("source", "w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    h1 = (
        uni.join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            "c",
            (F.col("c") * (log2_scaled("n_s + v") - log2_scaled("c + 1"))).alias(
                "wb"
            ),
        )
        .groupBy("source")
        .agg(F.sum("c").alias("n_tokens"), F.sum("wb").alias("bits1"))
    )
    h2 = (
        bg.join(
            uni.select("source", F.col("word").alias("w1"), F.col("c").alias("c1")),
            ["source", "w1"],
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            "c12",
            (
                F.col("c12") * (log2_scaled("c1 + v") - log2_scaled("c12 + 1"))
            ).alias("wb"),
        )
        .groupBy("source")
        .agg(F.sum("c12").alias("n_bigrams"), F.sum("wb").alias("bits2"))
    )
    u_bits = F.col("bits1").cast("double") / (
        F.col("n_tokens") * F.lit(LOG2_SCALE)
    ).cast("double")
    b_bits = F.col("bits2").cast("double") / (
        F.col("n_bigrams") * F.lit(LOG2_SCALE)
    ).cast("double")
    return (
        h1.join(h2, "source")
        .select(
            "source",
            "n_tokens",
            "n_bigrams",
            u_bits.alias("unigram_bits"),
            b_bits.alias("bigram_bits"),
            (u_bits - b_bits).alias("gain_bits"),
        )
        .orderBy("source")
    )


# --- leave-one-source-out surprisal influence ---------------------------------

LOO_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, tf AS (SELECT id, word, CAST(COUNT(*) AS BIGINT) AS tf
         FROM toks GROUP BY id, word),
cw AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY word),
scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM cw),
contrib AS (
    SELECT d.source,
           CAST(SUM(tf) AS BIGINT) AS t_s,
           CAST(SUM(tf * ({log2_scaled_sql("n_tok")}
                          - {log2_scaled_sql("c")})) AS BIGINT) AS bits_s
    FROM tf JOIN cw USING (word) JOIN documents d ON tf.id = d.doc_id
    CROSS JOIN scal
    GROUP BY d.source
),
tot AS (
    SELECT CAST(SUM(t_s) AS BIGINT) AS t_all,
           CAST(SUM(bits_s) AS BIGINT) AS bits_all
    FROM contrib
)
SELECT source, t_s AS n_tokens,
       CAST(bits_s AS DOUBLE)
           / (CAST(t_s AS DOUBLE) * {LOG2_SCALE}.0) AS source_mean_bits,
       CAST(bits_all - bits_s AS DOUBLE)
           / (CAST(t_all - t_s AS DOUBLE) * {LOG2_SCALE}.0)
       - CAST(bits_all AS DOUBLE)
           / (CAST(t_all AS DOUBLE) * {LOG2_SCALE}.0) AS loo_influence_bits
FROM contrib CROSS JOIN tot
ORDER BY source
"""
)


@register("loo_source_influence", LOO_ORACLE)
def q_loo_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on corpus mean surprisal under the
    FIXED full-corpus unigram LM: dropping source s moves the corpus
    evaluation mean by (B-b_s)/(T-t_s) - B/T — the data-valuation
    screen (negative influence = the source drags quality up; large
    positive = it supplies the surprising mass). One scan serves all 20
    knockouts via the kfold moment-subtraction algebra.

    Exactness: per-source surprisal masses are intlog BIGINTs; each
    influence is ONE double expression of four exact integers.

    Scale: a (doc, word) count, one vocab join, a per-source rollup,
    20-row arithmetic — data touched once."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    tf = tokenized(docs).groupBy("id", "word").agg(F.count("*").alias("tf"))
    cw = tf.groupBy("word").agg(F.sum("tf").alias("c"))
    scal = cw.agg(F.sum("c").alias("n_tok"))
    contrib = (
        tf.join(cw, "word")
        .join(F.broadcast(docs.select(F.col("doc_id").alias("id"), "source")), "id")
        .crossJoin(F.broadcast(scal))
        .select(
            "source",
            "tf",
            (F.col("tf") * (log2_scaled("n_tok") - log2_scaled("c"))).alias("wb"),
        )
        .groupBy("source")
        .agg(F.sum("tf").alias("t_s"), F.sum("wb").alias("bits_s"))
    )
    tot = contrib.agg(
        F.sum("t_s").alias("t_all"), F.sum("bits_s").alias("bits_all")
    )
    sc = F.lit(float(LOG2_SCALE))
    return (
        contrib.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            (
                F.col("bits_s").cast("double") / (F.col("t_s").cast("double") * sc)
            ).alias("source_mean_bits"),
            (
                (F.col("bits_all") - F.col("bits_s")).cast("double")
                / ((F.col("t_all") - F.col("t_s")).cast("double") * sc)
                - F.col("bits_all").cast("double")
                / (F.col("t_all").cast("double") * sc)
            ).alias("loo_influence_bits"),
        )
        .orderBy("source")
    )


# --- Kneser-Ney smoothed bigram model ---------------------------------------

# Interpolated KN with discount d = 3/4 (exact rational):
#   P(w2|w1) = max(c-d,0)/c1 + d*N1p(w1)/c1 * Ncont(w2)/T
#            = [max(4c-3,0)*T + 3*N1p(w1)*Ncont(w2)] / (4*c1*T)
# ONE integer numerator over ONE integer denominator (both < 2^53), so
# the probability is a single exact double division — the full smoothed
# LM, not an approximation of it.
KN_TOP_CONTEXTS = 5
KN_TOP_CONT = 5

KN_ORACLE = (
    "WITH "
    + toks_cte()
    + f"""
, seq AS (
    SELECT id, pos, word AS w1,
           lead(word) OVER (PARTITION BY id ORDER BY pos) AS w2
    FROM toks
), bi AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
    FROM seq WHERE w2 IS NOT NULL GROUP BY w1, w2
), ctx AS (
    SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS n1p
    FROM bi GROUP BY w1
), cont AS (
    SELECT w2, CAST(COUNT(*) AS BIGINT) AS ncont FROM bi GROUP BY w2
), tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM bi),
topctx AS (
    SELECT w1, c1, n1p FROM ctx ORDER BY c1 DESC, w1 LIMIT {KN_TOP_CONTEXTS}
),
scored AS (
    SELECT b.w1, b.w2, b.c, x.c1, x.n1p, n.ncont, tt.t,
           CAST(greatest(4 * b.c - 3, 0) * tt.t
                + 3 * x.n1p * n.ncont AS BIGINT) AS p_num,
           CAST(4 * x.c1 * tt.t AS BIGINT) AS p_den
    FROM bi b
    JOIN topctx x ON b.w1 = x.w1
    JOIN cont n ON b.w2 = n.w2
    CROSS JOIN tt
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY w1
                                 ORDER BY p_num DESC, w2) AS rnk
    FROM scored
)
SELECT w1, w2, c, c1, n1p, ncont, p_num, p_den,
       CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS p_kn, rnk
FROM ranked WHERE rnk <= {KN_TOP_CONT}
"""
)


@register("kneser_ney_bigrams", KN_ORACLE)
def q_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (discount 3/4) for
    the top-5 continuations of the 5 most frequent context words — the
    production n-gram smoothing (continuation counts, absolute
    discounting, proper interpolation mass) cleared to ONE exact
    integer numerator/denominator pair per bigram, so the smoothed
    probability itself is hash-checkable. Completes the LM battery
    beside pmi_bigrams / bigram_perplexity_gain / bpe_merge_pairs.

    Scale: one keyed lead + three hash aggregates (bigrams, contexts,
    continuations); the context shortlist is a 5-row TakeOrdered; the
    per-context rank windows are keyed. Ranking uses p_num (same
    denominator within a context) — integer-only ordering."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized
    from pyspark.sql import Window as W

    toks = tokenized(load_table(spark, sf_dir, "documents"))
    w = W.partitionBy("id").orderBy("pos")
    bi = (
        toks.select(F.col("word").alias("w1"), F.lead("word").over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    bi = bi.persist()  # contexts, continuations, totals, and the join
    ctx = bi.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n1p")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("ncont"))
    tt = bi.agg(F.count("*").alias("t"))
    topctx = ctx.orderBy(F.desc("c1"), F.asc("w1")).limit(KN_TOP_CONTEXTS)
    scored = (
        bi.join(F.broadcast(topctx), "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "c",
            "c1",
            "n1p",
            "ncont",
            (
                F.greatest(4 * F.col("c") - 3, F.lit(0)) * F.col("t")
                + 3 * F.col("n1p") * F.col("ncont")
            ).cast("long").alias("p_num"),
            (4 * F.col("c1") * F.col("t")).cast("long").alias("p_den"),
        )
    )
    wr = W.partitionBy("w1").orderBy(F.desc("p_num"), F.asc("w2"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= KN_TOP_CONT)
        .select(
            "w1",
            "w2",
            "c",
            "c1",
            "n1p",
            "ncont",
            "p_num",
            "p_den",
            (F.col("p_num").cast("double") / F.col("p_den").cast("double")).alias(
                "p_kn"
            ),
            "rnk",
        )
    )


# --- trained naive-Bayes language classifier ----------------------------------

NB_SPLIT_SQL = (
    "CAST('0x' || substr(md5('nb:' || CAST(doc_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 5"
)

NB_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, split AS (
    SELECT doc_id, lang,
           CASE WHEN {NB_SPLIT_SQL} = 0 THEN 1 ELSE 0 END AS is_test
    FROM documents
),
cl AS (
    SELECT s.lang, t.word, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks t JOIN split s ON t.id = s.doc_id
    WHERE s.is_test = 0 GROUP BY s.lang, t.word
),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM cl GROUP BY lang),
vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM cl),
prior AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l
    FROM split WHERE is_test = 0 GROUP BY lang
),
ttf AS (
    SELECT t.id, t.word, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks t JOIN split s ON t.id = s.doc_id
    WHERE s.is_test = 1 GROUP BY t.id, t.word
),
scored AS (
    SELECT f.id, tr.lang,
           CAST(SUM(f.tf * {log2_scaled_sql("COALESCE(c.c, 0) + 1")})
                AS BIGINT) AS sum_lp,
           CAST(SUM(f.tf) AS BIGINT) AS n_tokens
    FROM ttf f
    CROSS JOIN (SELECT lang FROM tot) tr
    LEFT JOIN cl c ON c.lang = tr.lang AND c.word = f.word
    GROUP BY f.id, tr.lang
),
final AS (
    SELECT s.id, s.lang,
           CAST(s.sum_lp
                - s.n_tokens * {log2_scaled_sql("n_l + v")}
                + {log2_scaled_sql("d_l")} AS BIGINT) AS score
    FROM scored s
    JOIN tot USING (lang) JOIN prior USING (lang) CROSS JOIN vocab
),
pred AS (
    SELECT id, lang AS pred_lang FROM (
        SELECT id, lang,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY score DESC, lang) AS rn
        FROM final) WHERE rn = 1
)
SELECT s.lang AS true_lang, p.pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       (s.lang = p.pred_lang) AS is_correct
FROM pred p JOIN split s ON p.id = s.doc_id
GROUP BY 1, 2, 4 ORDER BY 1, 2
"""
)


@register("naive_bayes_langid", NB_ORACLE)
def q_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language identifier: multinomial naive Bayes with add-1
    smoothing, fit on an 80% hash split and evaluated on the held-out
    20% — the supervised counterpart of the heuristic language_id /
    langid_confusion queries (train per-language unigram LMs + log
    priors, classify each test doc by argmax posterior). Output is the
    held-out confusion matrix.

    Exactness: every log goes through the intlog kernel, so each
    (doc, lang) posterior is an exact BIGINT
    (sum_lp - n_tokens*L(N_l+V) + L(d_l)); argmax ties break on lang —
    the whole query is integer-deterministic, no floats at all.

    Scale: train counts are a (lang x vocab) hash aggregate; scoring
    fans each test token-count row out by #languages (small constant)
    and joins train counts on (lang, word) — keyed equi-joins; the
    argmax is a per-doc bounded window. No all-pairs, no global sort."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    from amorphous_mapreduce_spark.functions.hashing import hex_hash64

    split = docs.select(
        "doc_id",
        "lang",
        (
            F.pmod(
                hex_hash64(
                    F.concat(F.lit("nb:"), F.col("doc_id").cast("string"))
                ),
                F.lit(5),
            )
            == 0
        )
        .cast("int")
        .alias("is_test"),
    )
    toks = tokenized(docs).join(
        F.broadcast(split.withColumnRenamed("doc_id", "id")), "id"
    )
    cl = (
        toks.filter(F.col("is_test") == 0)
        .groupBy("lang", "word")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    tot = cl.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = cl.agg(F.countDistinct("word").alias("v"))
    prior = (
        split.filter(F.col("is_test") == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("d_l"))
    )
    ttf = (
        toks.filter(F.col("is_test") == 1)
        .groupBy("id", "word")
        .agg(F.count("*").alias("tf"))
    )
    tr = tot.select(F.col("lang").alias("tr_lang"))
    ct = cl.select(F.col("lang").alias("tr_lang"), "word", F.col("c").alias("c0"))
    scored = (
        ttf.crossJoin(F.broadcast(tr))
        .join(ct, ["tr_lang", "word"], "left")
        .select(
            "id",
            "tr_lang",
            "tf",
            (F.col("tf") * log2_scaled("COALESCE(c0, 0) + 1")).alias("wlp"),
        )
        .groupBy("id", "tr_lang")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("wlp").alias("sum_lp"))
    )
    final = (
        scored.join(
            F.broadcast(tot.select(F.col("lang").alias("tr_lang"), "n_l")),
            "tr_lang",
        )
        .join(
            F.broadcast(prior.select(F.col("lang").alias("tr_lang"), "d_l")),
            "tr_lang",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "tr_lang",
            (
                F.col("sum_lp")
                - F.col("n_tokens") * log2_scaled("n_l + v")
                + log2_scaled("d_l")
            ).cast("long").alias("score"),
        )
    )
    from pyspark.sql import Window as W

    pred = (
        final.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("id").orderBy(F.desc("score"), F.asc("tr_lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("id", F.col("tr_lang").alias("pred_lang"))
    )
    return (
        pred.join(
            F.broadcast(
                split.select(F.col("doc_id").alias("id"), F.col("lang"))
            ),
            "id",
        )
        .groupBy(
            F.col("lang").alias("true_lang"),
            "pred_lang",
            (F.col("lang") == F.col("pred_lang")).alias("is_correct"),
        )
        .agg(F.count("*").alias("n_docs"))
        .select("true_lang", "pred_lang", "n_docs", "is_correct")
        .orderBy("true_lang", "pred_lang")
    )


# --- greedy autoregressive decode over the corpus bigram LM -------------------

DECODE_STEPS = 8


def _decode_step_sql(i: int) -> str:
    return f"""
s{i} AS MATERIALIZED (
    SELECT b.w2 AS word, b.c AS in_count
    FROM bg b JOIN s{i - 1} p ON b.w1 = p.word
    ORDER BY b.c DESC, b.w2 LIMIT 1
)"""


DECODE_ORACLE = (
    "WITH "
    + TOKS_CTE
    + """
, adj AS (
    SELECT t1.word AS w1, t2.word AS w2
    FROM toks t1 JOIN toks t2 ON t1.id = t2.id AND t2.pos = t1.pos + 1
),
bg AS MATERIALIZED (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM adj GROUP BY w1, w2
),
s0 AS MATERIALIZED (
    SELECT word, CAST(NULL AS BIGINT) AS in_count FROM (
        SELECT w1 AS word, CAST(SUM(c) AS BIGINT) AS tot FROM bg GROUP BY w1
        ORDER BY tot DESC, word LIMIT 1
    )
),
"""
    + ",".join(_decode_step_sql(i) for i in range(1, DECODE_STEPS + 1))
    + "\nSELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS step, word, in_count FROM s{i}"
        for i in range(0, DECODE_STEPS + 1)
    )
    + ") ORDER BY step"
)


@register("greedy_lm_decode", DECODE_ORACLE)
def q_greedy_lm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy autoregressive decode as pure dataflow: train the corpus
    bigram LM, start from the highest-outflow token, and take 8 argmax
    steps (ties break lexicographically) — the toy-scale demonstration
    that an autoregressive generation loop is expressible as iterated
    keyed joins + top-1 picks, the same shape a distributed beam-search
    re-scorer takes at 100 TB (the LM table shards by context; each
    step is one broadcast probe of a 1-row frontier).

    Exactness: integer bigram counts, deterministic tie-breaks, fixed
    step count unrolled identically in the oracle (greedy cycles are
    part of the spec). The decode path and every count it used are the
    output."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenized(docs)
    nxt = toks.select(
        "id", (F.col("pos") + 1).alias("pos"), F.col("word").alias("w1")
    )
    bg = (
        toks.join(nxt, ["id", "pos"])
        .select("w1", F.col("word").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    start = (
        bg.groupBy("w1")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("w1"))
        .limit(1)
        .select(
            F.col("w1").alias("word"), F.lit(None).cast("long").alias("in_count")
        )
    )
    steps = [start.select(F.lit(0).alias("step"), "word", "in_count")]
    cur = start.select("word").localCheckpoint()
    for i in range(1, DECODE_STEPS + 1):
        nxt_row = (
            bg.join(F.broadcast(cur.withColumnRenamed("word", "w1")), "w1")
            .orderBy(F.desc("c"), F.asc("w2"))
            .limit(1)
            .select(F.col("w2").alias("word"), F.col("c").alias("in_count"))
            .localCheckpoint()
        )
        steps.append(nxt_row.select(F.lit(i).alias("step"), "word", "in_count"))
        cur = nxt_row.select("word")
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.orderBy("step")


# --- beam-search decode (k=3) over the bigram LM ------------------------------

BEAM_K = 3
BEAM_STEPS = 5


def _beam_step_sql(i: int) -> str:
    lp = log2_scaled_sql("b.c")
    lt = log2_scaled_sql("o.tot")
    return f"""
b{i} AS MATERIALIZED (
    SELECT p.path || ' ' || b.w2 AS path, b.w2 AS word,
           CAST(p.score_q + {lp} - {lt} AS BIGINT) AS score_q
    FROM b{i - 1} p
    JOIN bg b ON b.w1 = p.word
    JOIN outf o ON o.w1 = p.word
    ORDER BY score_q DESC, path LIMIT {BEAM_K}
)"""


BEAM_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, adj AS (
    SELECT t1.word AS w1, t2.word AS w2
    FROM toks t1 JOIN toks t2 ON t1.id = t2.id AND t2.pos = t1.pos + 1
),
bg AS MATERIALIZED (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM adj GROUP BY w1, w2
),
outf AS MATERIALIZED (
    SELECT w1, CAST(SUM(c) AS BIGINT) AS tot FROM bg GROUP BY w1
),
b0 AS MATERIALIZED (
    SELECT w1 AS path, w1 AS word, CAST(0 AS BIGINT) AS score_q
    FROM outf ORDER BY tot DESC, w1 LIMIT 1
),
"""
    + ",".join(_beam_step_sql(i) for i in range(1, BEAM_STEPS + 1))
    + f"""
SELECT ROW_NUMBER() OVER (ORDER BY score_q DESC, path) AS beam_rank,
       path, word AS last_word, score_q,
       -CAST(score_q AS DOUBLE) / {LOG2_SCALE} AS total_bits
FROM b{BEAM_STEPS} ORDER BY beam_rank
"""
)


@register("beam_search_decode", BEAM_ORACLE)
def q_beam_search_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam-search decode (k={BEAM_K}, {BEAM_STEPS} steps) over the
    corpus bigram LM: each step expands every frontier hypothesis
    through the sharded bigram table, scores continuations with exact
    intlog log-probs (L(c) - L(outflow)), and keeps the top-k by
    cumulative score — greedy_lm_decode's big sibling and the actual
    shape of distributed rescoring: the LM table is the big sharded
    side, the frontier is a tiny broadcast side, and the top-k cut is a
    TakeOrdered.

    Exactness: cumulative scores are exact BIGINT sums of intlog
    integers; ties break on the full hypothesis string, which is unique
    by construction; the oracle unrolls the identical {BEAM_STEPS}
    rounds.

    Scale: per step one broadcast probe of <= k rows against the
    vocab-bounded bigram table + a distributed top-k; no global state
    beyond the k-row frontier."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenized(docs)
    nxt = toks.select(
        "id", (F.col("pos") + 1).alias("pos"), F.col("word").alias("w1")
    )
    bg = (
        toks.join(nxt, ["id", "pos"])
        .select("w1", F.col("word").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    outf = bg.groupBy("w1").agg(F.sum("c").alias("tot")).persist()
    beam = (
        outf.orderBy(F.desc("tot"), F.asc("w1"))
        .limit(1)
        .select(
            F.col("w1").alias("path"),
            F.col("w1").alias("word"),
            F.lit(0).cast("long").alias("score_q"),
        )
        .localCheckpoint()
    )
    for _ in range(BEAM_STEPS):
        beam = (
            bg.join(
                F.broadcast(
                    beam.select(
                        F.col("word").alias("w1"), "path", "score_q"
                    )
                ),
                "w1",
            )
            .join(F.broadcast(outf), "w1")
            .select(
                F.expr("path || ' ' || w2").alias("path"),
                F.col("w2").alias("word"),
                (
                    F.col("score_q")
                    + log2_scaled("c")
                    - log2_scaled("tot")
                ).cast("long").alias("score_q"),
            )
            .orderBy(F.desc("score_q"), F.asc("path"))
            .limit(BEAM_K)
            .localCheckpoint()
        )
    w = Window.orderBy(F.desc("score_q"), F.asc("path"))
    return beam.select(
        F.row_number().over(w).alias("beam_rank"),
        "path",
        F.col("word").alias("last_word"),
        "score_q",
        (-F.col("score_q").cast("double") / LOG2_SCALE).alias("total_bits"),
    ).orderBy("beam_rank")


# --- held-out unigram perplexity per source ---------------------------------

# Train an add-1-smoothed unigram LM on the ~80% train split (stateless
# hash of doc_id), score the held-out 20%: per-source cross-entropy in
# 2^20-scaled bits (intlog) and perplexity = 2^H re-exponentiated through
# functions/intexp — libm-free on both engines.  The "train on one split,
# eval on the other" shape is the canonical data-quality loop of an LLM
# curation pipeline (SURVEY.md §2.5).

_PPL_SPLIT = (
    "CAST('0x' || substr(md5('ppl:' || CAST(doc_id AS VARCHAR)), 1, 15) "
    "AS BIGINT) % 5"
)

PPL_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, sp AS (
    SELECT doc_id AS id, source, ({_PPL_SPLIT}) = 0 AS held
    FROM documents
), tr AS (
    SELECT word FROM toks JOIN sp USING (id) WHERE NOT held
), cw AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tr GROUP BY word
), scal AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(c) AS BIGINT) AS n
    FROM cw
), ho AS (
    SELECT sp.source AS source, COALESCE(cw.c, 0) AS c
    FROM toks JOIN sp USING (id) LEFT JOIN cw USING (word)
    WHERE held
), per AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS m_tokens,
           CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           CAST(SUM({log2_scaled_sql('(n + v + 1)')}
                    - {log2_scaled_sql('(c + 1)')}) AS BIGINT) AS sum_scaled
    FROM ho CROSS JOIN scal
    GROUP BY source
)
SELECT source, m_tokens, oov_tokens,
       CAST(oov_tokens AS DOUBLE) / CAST(m_tokens AS DOUBLE) AS oov_rate,
       CAST(sum_scaled AS DOUBLE)
           / (CAST(m_tokens AS DOUBLE) * {LOG2_SCALE}.0) AS h_bits,
       {{PPL_EXP}} AS perplexity
FROM per
ORDER BY source
"""
)

from amorphous_mapreduce_spark.functions.intexp import (  # noqa: E402
    exp2_scaled,
    exp2_scaled_sql,
)

PPL_ORACLE = PPL_ORACLE.replace(
    "{PPL_EXP}", exp2_scaled_sql("sum_scaled // m_tokens")
)


@register("unigram_heldout_perplexity", PPL_ORACLE)
def q_unigram_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source held-out perplexity under an add-1 unigram LM.

    One tokenize pass feeds both splits; the vocabulary count table is
    re-joined onto the held-out stream (plain equi-join — at 100 TB the
    vocab is Zipf-bounded and AQE picks broadcast when it fits).  The
    scalar (V, N) frame is a 1-row broadcast cross.  Cross-entropy is an
    exact integer sum of 2^20-scaled surprisals; perplexity
    re-exponentiates the truncated per-token mean through the intexp
    LUT, so even the 2^H value hash-matches the oracle.
    """
    from amorphous_mapreduce_spark.functions.hashing import hex_hash64
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select(
        F.col("doc_id").alias("id"),
        "source",
        (
            hex_hash64(F.concat(F.lit("ppl:"), F.col("doc_id").cast("string")))
            % F.lit(5)
            == 0
        ).alias("held"),
    )
    # toks feeds BOTH the train-count branch and the held-out scoring
    # branch: persist so tokenization runs once (shared-lineage
    # convention; ADVICE_r03 item 4).
    toks = tokenized(docs).join(sp, "id").persist()
    cw = (
        toks.filter(~F.col("held"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    scal = cw.agg(F.count("*").alias("v"), F.sum("c").alias("n"))
    ho = (
        toks.filter(F.col("held"))
        .join(cw, "word", "left")
        .select("source", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .crossJoin(F.broadcast(scal))
    )
    per = ho.groupBy("source").agg(
        F.count("*").alias("m_tokens"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0))
        .cast("long")
        .alias("oov_tokens"),
        F.sum(
            log2_scaled("(n + v + 1)") - log2_scaled("(c + 1)")
        )
        .cast("long")
        .alias("sum_scaled"),
    )
    return per.select(
        "source",
        "m_tokens",
        "oov_tokens",
        (F.col("oov_tokens").cast("double") / F.col("m_tokens").cast("double"))
        .alias("oov_rate"),
        (
            F.col("sum_scaled").cast("double")
            / (F.col("m_tokens").cast("double") * F.lit(float(LOG2_SCALE)))
        ).alias("h_bits"),
        exp2_scaled("sum_scaled div m_tokens").alias("perplexity"),
    ).orderBy("source")


# --- SPPMI rank-1 word embedding --------------------------------------------

# "Train a word embedding exactly": the SGNS-equivalent shifted
# positive PMI matrix (Levy & Goldberg's identity, shift = log2 4 —
# a POWER OF TWO so the shift is exact without the LUT) over adjacent
# token pairs, factorized by 8 rounds of fixed-point power iteration —
# the same integer matvec/rescale recursion embedding_power_iteration
# runs on the Gram, now on a corpus-DERIVED vocab x vocab matrix.
# PMI_q = log2s(c12 * T) - log2s(c1 * c2) via the intlog primitive
# (both arguments < 2^55), so the matrix and therefore every iterate
# is bit-identical cross-engine.

_SPPMI_SHIFT = 2 * 1048576  # log2(4), exact in 2^20 fixed point
_SPPMI_ITERS = 8
_SPPMI_SCALE = 4096


def _sppmi_oracle() -> str:
    pmi = (
        f"({log2_scaled_sql('p.c12 * tot.t')}"
        f" - {log2_scaled_sql('u1.c * u2.c')})"
    )
    ctes = [
        toks_cte(),
        """pairs AS MATERIALIZED (
    SELECT a.word AS w1, b.word AS w2, CAST(COUNT(*) AS BIGINT) AS c12
    FROM toks a JOIN toks b
      ON b.id = a.id AND abs(b.pos - a.pos) = 1 AND a.word != b.word
    GROUP BY 1, 2
)""",
        """uni AS MATERIALIZED (
    SELECT w1 AS w, CAST(SUM(c12) AS BIGINT) AS c FROM pairs GROUP BY w1
)""",
        """tot AS MATERIALIZED (
    SELECT CAST(SUM(c12) AS BIGINT) AS t FROM pairs
)""",
        f"""m AS MATERIALIZED (
    SELECT p.w1, p.w2,
           GREATEST(CAST(0 AS BIGINT), {pmi} - {_SPPMI_SHIFT}) AS sp
    FROM pairs p
    JOIN uni u1 ON u1.w = p.w1
    JOIN uni u2 ON u2.w = p.w2
    CROSS JOIN tot
    WHERE {pmi} - {_SPPMI_SHIFT} > 0
)""",
        f"""v0 AS MATERIALIZED (
    SELECT DISTINCT w1 AS w, CAST({_SPPMI_SCALE} AS BIGINT) AS v FROM m
)""",
    ]
    for k in range(1, _SPPMI_ITERS + 1):
        ctes.append(
            f"""gv{k} AS MATERIALIZED (
    SELECT m.w1 AS w, CAST(SUM(m.sp * v.v) AS BIGINT) AS gv
    FROM m JOIN v{k - 1} v ON m.w2 = v.w
    GROUP BY m.w1
)"""
        )
        ctes.append(
            f"""v{k} AS MATERIALIZED (
    SELECT w,
           gv // GREATEST(CAST(1 AS BIGINT),
                (SELECT MAX(ABS(gv)) FROM gv{k}) // {_SPPMI_SCALE}) AS v
    FROM gv{k}
)"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT v.w AS word, v.v AS v_q, u.c AS pair_count
FROM v{_SPPMI_ITERS} v JOIN uni u ON u.w = v.w
ORDER BY word
"""
    )


SPPMI_ORACLE = _sppmi_oracle()


@register("sppmi_rank1_embedding", SPPMI_ORACLE)
def q_sppmi_rank1_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SGNS-style word embedding: shifted positive PMI (shift
    log2 4) over adjacent token pairs, factorized by 8 fixed-point
    power-iteration rounds into the top singular direction — every
    number from raw text to the final embedding coordinate is a
    deterministic integer, so the oracle replays training bit-for-bit.

    Scale: ONE token-adjacency self-join (<= 2 partners per token) is
    the corpus-sized stage; the SPPMI matrix is vocab², and the
    iteration runs inside one grouped kernel over it (the
    embedding_power_iteration pattern, sign-guarded truncating
    rescale). Reference tie-in: CrossPOp outer-product semantics
    (src/outer_product.rs:34-121) driven from text instead of
    embeddings."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenized(docs).select("id", "pos", "word")
    a = toks.select("id", F.col("pos").alias("pa"), F.col("word").alias("w1"))
    b = toks.select("id", F.col("pos").alias("pb"), F.col("word").alias("w2"))
    pairs = (
        a.join(b, "id")
        .filter(
            (F.abs(F.col("pb") - F.col("pa")) == 1)
            & (F.col("w1") != F.col("w2"))
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
        .persist()  # unigram margins, total, and the matrix all read it
    )
    uni = pairs.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c12").cast("long").alias("c")
    ).persist()  # both margins and the output join read it
    tot = pairs.agg(F.sum("c12").cast("long").alias("t"))
    feed = (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
    )
    pmi = log2_scaled("c12 * t") - log2_scaled("c1 * c2")
    m = feed.select(
        "w1", "w2", (pmi - _SPPMI_SHIFT).alias("sp")
    ).filter(F.col("sp") > 0)

    iters, scale = _SPPMI_ITERS, _SPPMI_SCALE

    def _factor(pdf):
        import pandas as pd

        rows = [
            (str(w1), str(w2), int(sp))
            for w1, w2, sp in zip(pdf["w1"], pdf["w2"], pdf["sp"])
        ]
        v = {w1: scale for w1, _, _ in rows}
        for _ in range(iters):
            gv: dict[str, int] = {}
            for w1, w2, sp in rows:
                gv[w1] = gv.get(w1, 0) + sp * v.get(w2, 0)
            mx = max(abs(x) for x in gv.values())
            d_ = max(1, mx // scale)
            v = {
                w: (x // d_ if x >= 0 else -((-x) // d_))
                for w, x in gv.items()
            }
        return pd.DataFrame(
            {"word": list(v.keys()), "v_q": [v[k] for k in v]}
        )

    emb = (
        m.groupBy(F.lit(0).alias("one"))
        .applyInPandas(_factor, "word string, v_q long")
    )
    return (
        emb.join(uni.select(F.col("w").alias("word"), F.col("c").alias("pair_count")), "word")
        .orderBy("word")
    )
