"""Iterative BPE tokenizer training (VERDICT_r04 item 3).

``bpe_merge_pairs`` (mining_queries) computes round-0 pair counts; this
module trains the tokenizer: N = 12 merge rounds, emitting the merge
table AND the post-merge token counts of the corpus tokenized with the
learned merges.

Distribution shape — the textbook BPE insight made Spark-first: training
operates on the WEIGHTED LEXICON (word type, corpus frequency), not the
token stream. The lexicon is vocabulary-sized (bounded by the language,
not the corpus: ~31 types here, ~10^5-10^6 for real corpora at ANY data
scale), so after one distributed groupBy(word) aggregate the entire
N-round training loop is corpus-size-independent bounded state — exactly
the "bounded-state loop inside one grouped kernel" pattern proven on
markov_removal_attribution / holt / power-iteration. At 100 TB the only
data-sized work is the token-count shuffle; the kernel state is still a
few MB.

Cross-engine determinism: a segmentation is a ' '-delimited symbol
string (' s p a r k '); applying a merge (l, r) is
``replace(seg, ' l r ', ' lr ')`` — Python ``str.replace`` and DuckDB
``replace`` are both left-to-right non-overlapping with resume-after-
replacement (verified byte-identical), so BOTH engines implement the
identical merge-application semantics by construction. (This is the
standard greedy scan; for pathological self-overlapping repeats like
'a a a a' it consumes pairs strictly left to right — same rule both
sides, documented here.) Merge selection tie-breaks on
(count DESC, left ASC, right ASC) — pure a-z symbol strings, binary
collation on both engines.

Oracle: 12 unrolled MATERIALIZED CTE rounds (the kcore lesson: without
MATERIALIZED DuckDB re-expands the chain exponentially); each round is
pair-explode (unnest(generate_series) in the SELECT list — the table-
function form can't take column args) -> weighted count -> LIMIT 1
argmax -> replace().

Reference tie-in: the pair-count aggregate is the reference's keyed
reduce (src/word_count.rs:90-118 count-merge semantics); the merge loop
is new capability the reference lacks (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.dedup import tokenized
from amorphous_mapreduce_spark.queries.dedup_queries import TOKS_CTE
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

BPE_ROUNDS = 12

# --- shared trainer --------------------------------------------------------
# NOTE on pickling: the grouped kernels below are built by _make_kernels,
# so both they and this trainer are NESTED functions — cloudpickle
# serializes them BY VALUE and executors never import this module as an
# entry point (a module-level helper would pickle by reference and drag
# the queries package's circular import chain onto the executors).


def _make_kernels(n_rounds: int):
    def bpe_train(words, freqs):
        """Greedy BPE on a weighted lexicon.

        Returns (merge rows [(round, l, r, merged, cnt)], final
        segmentations {word: ' sym sym '}). Merge application is
        str.replace — identical semantics to the oracle's replace().
        """
        segs = {w: " " + " ".join(w) + " " for w in words}
        freq = dict(zip(words, (int(f) for f in freqs)))
        merges = []
        for k in range(1, n_rounds + 1):
            counts = {}
            for w, seg in segs.items():
                parts = seg.split()
                for a, b in zip(parts, parts[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + freq[w]
            if not counts:
                break
            (left, right), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((k, left, right, left + right, cnt))
            pat, rep = f" {left} {right} ", f" {left}{right} "
            segs = {w: seg.replace(pat, rep) for w, seg in segs.items()}
        return merges, segs, freq

    def merge_kernel(pdf):
        import pandas as pd

        merges, _, _ = bpe_train(list(pdf["word"]), list(pdf["freq"]))
        return pd.DataFrame(
            merges, columns=["round", "l", "r", "merged", "cnt"]
        )

    def token_kernel(pdf):
        import pandas as pd

        _, segs, freq = bpe_train(list(pdf["word"]), list(pdf["freq"]))
        counts = {}
        for w, seg in segs.items():
            for sym in seg.split():
                counts[sym] = counts.get(sym, 0) + freq[w]
        rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return pd.DataFrame(rows, columns=["symbol", "n_tokens"])

    def wordsym_kernel(pdf):
        import pandas as pd

        _, segs, _ = bpe_train(list(pdf["word"]), list(pdf["freq"]))
        rows = sorted((w, len(seg.split())) for w, seg in segs.items())
        return pd.DataFrame(rows, columns=["word", "n_syms"])

    return merge_kernel, token_kernel, wordsym_kernel


# --- unrolled MATERIALIZED-CTE oracle ----------------------------------------

_LEX_CTE = (
    TOKS_CTE
    + """
, lex AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY word
),
r0 AS MATERIALIZED (
    SELECT word, freq,
           regexp_replace(word, '(.)', ' \\1', 'g') || ' ' AS seg
    FROM lex
)"""
)


def _round_ctes(k: int) -> str:
    return f"""
p{k} AS MATERIALIZED (
    SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT freq, parts[i] AS l, parts[i + 1] AS r FROM (
            SELECT freq, parts,
                   unnest(generate_series(1, len(parts) - 1)) AS i
            FROM (SELECT freq, string_split(trim(seg, ' '), ' ') AS parts
                  FROM r{k - 1})
        )
    ) GROUP BY l, r
),
m{k} AS MATERIALIZED (
    SELECT {k} AS round, l, r, l || r AS merged, cnt
    FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
),
r{k} AS MATERIALIZED (
    SELECT word, freq,
           replace(seg, ' ' || m.l || ' ' || m.r || ' ',
                   ' ' || m.l || m.r || ' ') AS seg
    FROM r{k - 1} CROSS JOIN m{k} m
)"""


_BPE_CHAIN = (
    "WITH "
    + _LEX_CTE
    + ","
    + ",".join(_round_ctes(k) for k in range(1, BPE_ROUNDS + 1))
)

BPE_TRAIN_ORACLE = (
    _BPE_CHAIN
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT round, l, r, merged, cnt FROM m{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    + "\nORDER BY round\n"
)


@register("bpe_train_merges", BPE_TRAIN_ORACLE)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-round BPE tokenizer training: the learned merge table
    [(round, l, r, merged, pair count at selection time)].

    One distributed groupBy(word) collapses the corpus to the weighted
    lexicon; the 12-round greedy loop runs in ONE grouped kernel over
    that bounded state. Oracle = 12 unrolled MATERIALIZED CTE rounds of
    pair-count/argmax/replace with identical merge-application and
    tie-break semantics (module docstring)."""
    lex = (
        tokenized(load_table(spark, sf_dir, "documents"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )

    kernel, _, _ = _make_kernels(BPE_ROUNDS)
    return (
        lex.groupBy(F.lit(0).alias("g"))
        .applyInPandas(
            kernel, "round int, l string, r string, merged string, cnt long"
        )
        .orderBy("round")
    )


BPE_TOKENIZE_ORACLE = (
    _BPE_CHAIN
    + f"""
SELECT symbol, CAST(SUM(freq) AS BIGINT) AS n_tokens FROM (
    SELECT freq, parts[i] AS symbol FROM (
        SELECT freq, parts, unnest(generate_series(1, len(parts))) AS i
        FROM (SELECT freq, string_split(trim(seg, ' '), ' ') AS parts
              FROM r{BPE_ROUNDS})
    )
) GROUP BY symbol
ORDER BY n_tokens DESC, symbol
"""
)


@register("bpe_tokenize_corpus", BPE_TOKENIZE_ORACLE)
def q_bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned merges: post-merge token
    counts [(symbol, n_tokens)] — the "use the trained tokenizer" half
    (VERDICT_r04 item 3 'done' criterion). Same kernel, same rounds;
    the output explodes each word type's final segmentation weighted by
    corpus frequency, so n_tokens is the real token count of the
    retokenized corpus."""
    lex = (
        tokenized(load_table(spark, sf_dir, "documents"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )

    _, kernel, _ = _make_kernels(BPE_ROUNDS)
    return (
        lex.groupBy(F.lit(0).alias("g"))
        .applyInPandas(kernel, "symbol string, n_tokens long")
        .orderBy(F.desc("n_tokens"), "symbol")
    )


BPE_COMPRESSION_ORACLE = (
    _BPE_CHAIN
    + f"""
, wsyms AS (
    SELECT word, CAST(len(string_split(trim(seg, ' '), ' ')) AS BIGINT)
               AS n_syms,
           CAST(length(word) AS BIGINT) AS n_chars
    FROM r{BPE_ROUNDS}
),
sw AS (
    SELECT d.source, t.word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM toks t JOIN documents d ON d.doc_id = t.id
    GROUP BY 1, 2
)
SELECT sw.source,
       CAST(SUM(sw.freq * w.n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(sw.freq * w.n_syms) AS BIGINT) AS n_tokens,
       CAST(SUM(sw.freq * w.n_chars) AS DOUBLE)
           / SUM(sw.freq * w.n_syms) AS chars_per_token
FROM sw JOIN wsyms w USING (word)
GROUP BY sw.source
ORDER BY sw.source
"""
)


@register("bpe_compression_by_source", BPE_COMPRESSION_ORACLE)
def q_bpe_compression_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility scorecard: chars-per-token of the TRAINED
    12-round BPE, per source — the "which slice tokenizes badly" table
    every tokenizer change ships with (fertility/compression is the
    standard eval, and it reuses the learned merges rather than
    retraining per source).

    Scale: one (source, word) aggregate over the token stream + the
    31-row trained segmentation table broadcast back; integer
    char/token masses, ONE double division per source."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenized(docs)
    lex = toks.groupBy("word").agg(F.count("*").cast("long").alias("freq"))
    _, _, kernel = _make_kernels(BPE_ROUNDS)
    wsyms = (
        lex.groupBy(F.lit(0).alias("g"))
        .applyInPandas(kernel, "word string, n_syms long")
        .withColumn("n_chars", F.length("word").cast("long"))
    )
    sw = (
        toks.join(
            docs.select(F.col("doc_id").alias("id"), "source"), "id"
        )
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    joined = sw.join(F.broadcast(wsyms), "word")
    return (
        joined.groupBy("source")
        .agg(
            F.sum(F.col("freq") * F.col("n_chars")).cast("long").alias("n_chars"),
            F.sum(F.col("freq") * F.col("n_syms")).cast("long").alias("n_tokens"),
            (
                F.sum(F.col("freq") * F.col("n_chars")).cast("double")
                / F.sum(F.col("freq") * F.col("n_syms"))
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )
