"""Unigram-LM (SentencePiece-family) tokenizer training.

bpe_queries trains the merge-based tokenizer family; this module trains
the OTHER major subword family: the unigram language model (Kudo 2018,
SentencePiece's default). Pieces carry probabilities; a word's
tokenization is the Viterbi segmentation minimizing total surprisal
Σ -log2 p(piece); training alternates Viterbi (hard-E) with count
re-estimation (M) on the weighted lexicon.

Distribution shape — the same Spark-first insight as BPE: training
operates on the WEIGHTED LEXICON (word type, corpus frequency), which
is vocabulary-bounded at ANY corpus size, so after ONE distributed
groupBy(word) the entire EM loop is constant-size dataflow. The clever
bit that keeps it oracle-checkable with NO recursion and NO kernel:
with max piece length 3 and word length <= 8, a word has at most 81
segmentations, so Viterbi = enumerate-all-compositions + argmin — the
composition table is a Python-generated LITERAL shared verbatim by the
Spark DataFrame and the DuckDB VALUES clause.

Engine-exactness:
- piece surprisal = log2_scaled(T) - log2_scaled(c) via the integer
  log2 LUT (functions/intlog) — pure integer, identical both engines;
- the per-word argmin packs (total_cost, n_pieces, seg_id) into ONE
  integer (cost*8192 + n*512 + sid; sid <= 80 < 512, n <= 8 by construction)
  so MIN() is the full lexicographic tie-break;
- pieces absent from the current vocab (possible after round 1 drops
  unused pieces) cost INF = 10^11: dominant over any real total
  (<= 8 * 30 * 2^20 ~ 2.4e8) yet 8*INF*8192 stays far inside int64.

Reference tie-in: the lexicon aggregate is the reference's keyed
reduce (src/word_count.rs:90-118); the EM loop is new capability the
reference lacks (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.intlog import (
    LOG2_LUT,
    log2_scaled_sql,
)
from amorphous_mapreduce_spark.queries.dedup_queries import TOKS_CTE
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

ULM_ROUNDS = 2
_MAXP = 3  # max piece length
_MAXW = 8  # max word length supported by the composition table
_INF = 10**11


def _compositions() -> list[tuple[int, int, int, int, int, int]]:
    """(word_len, seg_id, n_pieces, piece_idx, start_1based, piece_len)
    for every composition of L<=_MAXW into pieces of length <=_MAXP.

    seg_id orders segmentations by (n_pieces, piece tuple) so the
    packed argmin's final tie-break is deterministic and documented.
    """
    rows = []
    for L in range(1, _MAXW + 1):
        segs = []
        for mask in range(1 << max(0, L - 1)):
            pieces, start = [], 0
            for b in range(L - 1):
                if (mask >> b) & 1:
                    pieces.append((start, b + 1 - start))
                    start = b + 1
            pieces.append((start, L - start))
            if all(p[1] <= _MAXP for p in pieces):
                segs.append(pieces)
        segs.sort(key=lambda ps: (len(ps), ps))
        for sid, pieces in enumerate(segs):
            for k, (st, ln) in enumerate(pieces):
                rows.append((L, sid, len(pieces), k, st + 1, ln))
    return rows


_COMP = _compositions()
_COMP_VALUES = ", ".join(f"({l}, {s}, {n}, {k}, {st}, {ln})" for l, s, n, k, st, ln in _COMP)

# substring-extraction grid for the seed counts: every (start, len<= _MAXP)
_GRID = [(st, ln) for st in range(1, _MAXW + 1) for ln in range(1, _MAXP + 1)]
_GRID_VALUES = ", ".join(f"({st}, {ln})" for st, ln in _GRID)


def _round_ctes(
    r: int, prev_counts: str, lexname: str = "lex", prefix: str = ""
) -> str:
    """One EM round: cost table from prev counts -> packed Viterbi
    argmin -> winning-piece re-count. MATERIALIZED (the kcore lesson).
    ``prefix``/``lexname`` let a composite oracle (tokenizer_parity)
    embed the chain beside another trainer's CTEs without collisions."""
    return f"""
, {prefix}tot{r} AS MATERIALIZED (
    SELECT CAST(SUM(c) AS BIGINT) AS t FROM {prev_counts}
), {prefix}costs{r} AS MATERIALIZED (
    SELECT v.piece,
           {log2_scaled_sql('tot.t')} - {log2_scaled_sql('v.c')} AS cost
    FROM {prev_counts} v CROSS JOIN {prefix}tot{r} tot
), {prefix}scored{r} AS MATERIALIZED (
    SELECT x.word, x.wfreq, x.sid, x.np,
           SUM(COALESCE(cs.cost, {_INF})) AS total
    FROM (SELECT l.word, l.wfreq, c.sid, c.np,
                 substr(l.word, c.st, c.ln) AS piece
          FROM {lexname} l JOIN comp c ON c.wl = length(l.word)) x
         LEFT JOIN {prefix}costs{r} cs ON cs.piece = x.piece
    GROUP BY x.word, x.wfreq, x.sid, x.np
), {prefix}best{r} AS MATERIALIZED (
    SELECT word, wfreq,
           MIN(total * 8192 + np * 512 + sid) AS pack
    FROM {prefix}scored{r} GROUP BY word, wfreq
), {prefix}counts{r} AS MATERIALIZED (
    SELECT substr(b.word, c.st, c.ln) AS piece,
           CAST(SUM(b.wfreq) AS BIGINT) AS c,
           CAST(COUNT(DISTINCT b.word) AS BIGINT) AS n_types
    FROM {prefix}best{r} b
         JOIN comp c ON c.wl = length(b.word)
                    AND c.sid = (b.pack % 512)
                    AND c.np = ((b.pack % 8192) // 512)
    GROUP BY substr(b.word, c.st, c.ln)
)"""


def _ulm_chain(lexname: str, prefix: str) -> str:
    """comp/grid literals + seed counts + ULM_ROUNDS EM rounds reading
    (word, wfreq) from ``lexname``; all round CTEs carry ``prefix``.
    Returns the CTE fragment (leading comma) and the final counts name
    via f"{prefix}counts{ULM_ROUNDS}"."""
    sql = f""",
comp(wl, sid, np, k, st, ln) AS MATERIALIZED (
    SELECT * FROM (VALUES {_COMP_VALUES})
),
grid(st, ln) AS (SELECT * FROM (VALUES {_GRID_VALUES})),
{prefix}counts0 AS MATERIALIZED (
    SELECT substr(word, g.st, g.ln) AS piece,
           CAST(SUM(wfreq) AS BIGINT) AS c
    FROM {lexname} JOIN grid g ON g.st + g.ln - 1 <= length(word)
    GROUP BY substr(word, g.st, g.ln)
)"""
    prev = f"{prefix}counts0"
    for r in range(1, ULM_ROUNDS + 1):
        sql += _round_ctes(r, prev, lexname=lexname, prefix=prefix)
        prev = f"{prefix}counts{r}"
    return sql


def _ulm_oracle() -> str:
    sql = (
        "WITH "
        + TOKS_CTE.strip().lstrip(",")
        + f"""
, lex AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wfreq
    FROM toks WHERE length(word) <= {_MAXW} GROUP BY word
)"""
        + _ulm_chain("lex", "")
    )
    prev = f"counts{ULM_ROUNDS}"
    sql += f"""
SELECT p.piece,
       p.c AS weighted_count,
       p.n_types,
       CAST((1000000 * p.c) // t.t AS BIGINT) AS weight_ppm
FROM {prev} p CROSS JOIN
     (SELECT CAST(SUM(c) AS BIGINT) AS t FROM {prev}) t
ORDER BY p.piece
"""
    return sql


@register("unigram_lm_tokenizer", _ulm_oracle())
def q_unigram_lm_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (2 hard-EM rounds) on the weighted
    lexicon: seed piece counts from every substring occurrence (len<=3),
    then alternate integer-surprisal Viterbi segmentation with count
    re-estimation; emit the final piece table (weighted count, #word
    types using the piece, normalized weight in ppm).

    See the module docstring for the composition-table construction and
    the engine-exactness argument. The data-sized work is ONE token
    groupBy; the EM loop state is vocabulary-bounded, so it runs inside
    ONE grouped kernel (the bpe_train_merges pattern — a pure-dataflow
    unroll was oracle-identical but paid ~60 tiny shuffle stages; the
    kernel replays the exact same integer arithmetic: Python
    c.bit_length()-1 == length(bin(c))-1, non-negative // == div, the
    same LUT, the same packed tie-break).
    """
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    lex = (
        tokenized(docs)
        .filter(F.length("word") <= _MAXW)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )

    comp_by_len: dict[int, list[tuple[int, int, list[tuple[int, int]]]]] = {}
    for wl, sid, np_, k, st, ln in _COMP:
        segs = comp_by_len.setdefault(wl, [])
        if not segs or segs[-1][0] != sid:
            segs.append((sid, np_, []))
        segs[-1][2].append((st - 1, ln))
    lut = list(LOG2_LUT)
    inf, rounds, maxp = _INF, ULM_ROUNDS, _MAXP

    def kernel(pdf):
        import pandas as pd

        def log2s(c):
            e = c.bit_length() - 1
            idx = (c * 256) // (1 << e) - 256
            return e * 1048576 + lut[idx]

        words = [(w, int(f)) for w, f in zip(pdf["word"], pdf["wfreq"])]
        counts: dict[str, int] = {}
        for w, fr in words:
            for st in range(len(w)):
                for ln in range(1, min(maxp, len(w) - st) + 1):
                    p = w[st : st + ln]
                    counts[p] = counts.get(p, 0) + fr
        ntypes: dict[str, int] = {}
        for _ in range(rounds):
            lt = log2s(sum(counts.values()))
            cost = {p: lt - log2s(c) for p, c in counts.items()}
            newc: dict[str, int] = {}
            newt: dict[str, set] = {}
            for w, fr in words:
                best = None
                for sid, np_, pieces in comp_by_len[len(w)]:
                    total = sum(
                        cost.get(w[st : st + ln], inf) for st, ln in pieces
                    )
                    pack = total * 8192 + np_ * 512 + sid
                    if best is None or pack < best[0]:
                        best = (pack, pieces)
                for st, ln in best[1]:
                    p = w[st : st + ln]
                    newc[p] = newc.get(p, 0) + fr
                    newt.setdefault(p, set()).add(w)
            counts = newc
            ntypes = {p: len(s) for p, s in newt.items()}
        t = sum(counts.values())
        out = sorted(counts)
        return pd.DataFrame(
            {
                "piece": out,
                "weighted_count": [counts[p] for p in out],
                "n_types": [ntypes[p] for p in out],
                "weight_ppm": [(1000000 * counts[p]) // t for p in out],
            }
        )

    return (
        lex.groupBy(F.lit(0).alias("g"))
        .applyInPandas(
            kernel,
            "piece string, weighted_count long, n_types long, weight_ppm long",
        )
        .orderBy("piece")
    )


# --- BPE vs unigram-LM tokenizer bake-off -------------------------------------

from amorphous_mapreduce_spark.queries.bpe_queries import (  # noqa: E402
    _BPE_CHAIN,
    _make_kernels,
    BPE_ROUNDS,
)

TOKENIZER_PARITY_ORACLE = (
    _BPE_CHAIN
    + f""",
ulex AS MATERIALIZED (
    SELECT word, CAST(freq AS BIGINT) AS wfreq
    FROM lex WHERE length(word) <= {_MAXW}
)"""
    + _ulm_chain("ulex", "u")
    + f""",
scal AS (
    SELECT
        (SELECT CAST(SUM(wfreq) AS BIGINT) FROM ulex) AS total_words,
        (SELECT CAST(SUM(wfreq * length(word)) AS BIGINT) FROM ulex)
            AS total_chars,
        (SELECT CAST(COALESCE(SUM(freq), 0) AS BIGINT)
         FROM lex WHERE length(word) > {_MAXW}) AS words_excluded,
        (SELECT CAST(SUM(freq * len(string_split(trim(seg, ' '), ' ')))
                     AS BIGINT)
         FROM r{BPE_ROUNDS} WHERE length(word) <= {_MAXW}) AS bpe_tokens,
        (SELECT CAST(SUM(c) AS BIGINT) FROM ucounts{ULM_ROUNDS})
            AS ulm_tokens
)
SELECT total_words, total_chars, words_excluded, bpe_tokens, ulm_tokens,
       CAST((1000 * bpe_tokens) // total_chars AS BIGINT)
           AS bpe_tokens_per_kchar,
       CAST((1000 * ulm_tokens) // total_chars AS BIGINT)
           AS ulm_tokens_per_kchar
FROM scal
"""
)


@register("tokenizer_parity", TOKENIZER_PARITY_ORACLE)
def q_tokenizer_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-vs-unigram-LM bake-off on the SAME weighted lexicon: corpus
    token counts under the 12-merge BPE tokenizer and the 2-round
    unigram-LM tokenizer, plus tokens-per-1000-chars for each — the
    compression comparison a tokenizer selection actually runs (both
    trainers already exist; this query proves they compose, and its
    oracle embeds BOTH unrolled training chains in ONE WITH clause via
    the prefix-parameterized CTE builders).

    Exactness: both token totals are integer sums over each trainer's
    final segmentation (BPE: symbols of r12's segs weighted by freq;
    ULM: Σ weighted piece counts = one piece per winning-segmentation
    slot per word instance); ratios are integer floor-divisions.

    Scale: one lexicon groupBy feeds both bounded-state kernels; the
    comparison is a cross of four 1-row aggregates.
    """
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    lex = (
        tokenized(load_table(spark, sf_dir, "documents"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .persist()
    )
    stats = lex.agg(
        F.sum(F.when(F.length("word") <= _MAXW, F.col("freq")).otherwise(0))
        .cast("long")
        .alias("total_words"),
        F.sum(
            F.when(
                F.length("word") <= _MAXW,
                F.col("freq") * F.length("word").cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("total_chars"),
        F.sum(F.when(F.length("word") > _MAXW, F.col("freq")).otherwise(0))
        .cast("long")
        .alias("words_excluded"),
    )
    _, _, ws_kernel = _make_kernels(BPE_ROUNDS)
    # The BPE kernel trains on the FULL lexicon (matching the oracle's
    # _BPE_CHAIN, whose r12 segments every word); the token total is then
    # restricted to the <=_MAXW words POST-kernel so both tokenizers are
    # scored on the same corpus. Filtering before the kernel would train
    # different merges whenever a >_MAXW-char word carries weight.
    bpe_tokens = (
        lex.groupBy(F.lit(0).alias("g"))
        .applyInPandas(ws_kernel, "word string, n_syms long")
        .join(lex.select("word", "freq"), "word")
        .filter(F.length("word") <= _MAXW)
        .agg(
            F.sum(F.col("n_syms") * F.col("freq"))
            .cast("long")
            .alias("bpe_tokens")
        )
    )
    ulm = q_unigram_lm_tokenizer(spark, sf_dir)
    ulm_tokens = ulm.agg(
        F.sum("weighted_count").cast("long").alias("ulm_tokens")
    )
    return (
        stats.crossJoin(F.broadcast(bpe_tokens))
        .crossJoin(F.broadcast(ulm_tokens))
        .select(
            "total_words",
            "total_chars",
            "words_excluded",
            "bpe_tokens",
            "ulm_tokens",
            F.expr("(1000 * bpe_tokens) div total_chars").alias(
                "bpe_tokens_per_kchar"
            ),
            F.expr("(1000 * ulm_tokens) div total_chars").alias(
                "ulm_tokens_per_kchar"
            ),
        )
    )
