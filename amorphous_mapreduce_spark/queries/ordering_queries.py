"""Training-corpus document ordering (SPLiCe-style context chaining).

Long-context training works better when adjacent documents in a packed
context are RELATED (SPLiCe / in-context-pretraining recipes): order
each shard's documents as a greedy nearest-neighbor chain. Here the
similarity proxy is SimHash Hamming distance (integer, cross-engine
exact via the md5-derived fingerprints the dedup family already
replays), shards are hash-assigned, and the manifest emits the first
CHAIN_LEN = 8 chain positions per shard.

Distribution shape: fingerprints are one aggregate over the token
stream; the greedy chain is bounded state PER SHARD inside one grouped
kernel (shard population is corpus/n_shards — at 100 TB you scale
n_shards with the corpus, keeping the per-shard quadratic scan
constant; same posture as semdedup_manifest's cells). Oracle: the
chain is unrolled into 8 MATERIALIZED CTE steps — per step, anti-join
the already-picked set, then a per-shard (hamming, id) argmin via one
rank window over shard-bounded frames. A greedy sequential algorithm
with a data-dependent horizon can't be a single SQL expression; fixing
the horizon at 8 makes it unrollable, the BPE-oracle trick.

Reference tie-in: chain hops are VecOp reductions over the shard frame
(src/op.rs:66-106); ordering/packing is engine-new (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.hashing import hex_hash64
from amorphous_mapreduce_spark.operators.dedup import simhash
from amorphous_mapreduce_spark.queries.dedup_queries import SIMHASH_CTE
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

N_SHARDS = 64
CHAIN_LEN = 8

_MEMBERS_CTE = (
    SIMHASH_CTE
    + f"""
, members AS MATERIALIZED (
    SELECT CAST('0x' || substr(md5('ordshard_' || CAST(id AS VARCHAR)), 1, 15)
               AS BIGINT) % {N_SHARDS} AS shard,
           id, simhash AS sh
    FROM fp
)"""
)


def _step_ctes(k: int) -> str:
    """Step k (2..CHAIN_LEN): argmin-Hamming unvisited member per shard."""
    prior = " UNION ALL ".join(
        f"SELECT shard, id FROM c{j}" for j in range(1, k)
    )
    return f"""
picked{k - 1} AS MATERIALIZED ({prior}),
cand{k} AS MATERIALIZED (
    SELECT m.shard, m.id, m.sh,
           bit_count(xor(m.sh, p.sh)) AS ham,
           ROW_NUMBER() OVER (
               PARTITION BY m.shard
               ORDER BY bit_count(xor(m.sh, p.sh)), m.id
           ) AS rn
    FROM members m
    JOIN c{k - 1} p ON p.shard = m.shard
    LEFT JOIN picked{k - 1} v ON v.shard = m.shard AND v.id = m.id
    WHERE v.id IS NULL
),
c{k} AS MATERIALIZED (
    SELECT shard, {k} AS pos, id, sh, CAST(ham AS BIGINT) AS ham
    FROM cand{k} WHERE rn = 1
)"""


CHAIN_ORACLE = (
    _MEMBERS_CTE
    + """,
c1 AS MATERIALIZED (
    SELECT m.shard, 1 AS pos, m.id, m.sh, CAST(0 AS BIGINT) AS ham
    FROM members m
    JOIN (SELECT shard, MIN(id) AS id FROM members GROUP BY shard) s
      ON s.shard = m.shard AND s.id = m.id
),"""
    + ",".join(_step_ctes(k) for k in range(2, CHAIN_LEN + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT shard, pos, id AS doc_id, ham AS hop_hamming FROM c{k}"
        for k in range(1, CHAIN_LEN + 1)
    )
    + "\nORDER BY shard, pos\n"
)


@register("context_chain_manifest", CHAIN_ORACLE)
def q_context_chain_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy similar-document chain per shard (first 8 positions): the
    packing order for long-context training. Start = lowest doc_id in
    the shard; each hop appends the unvisited member with the smallest
    SimHash Hamming distance to the current document (ties by id).

    Determinism: fingerprints, Hamming distances, and tie-breaks are
    all integers; the kernel and the 8-step unrolled oracle implement
    the identical greedy rule. Scale: one fingerprint aggregate + one
    shard shuffle; per-shard state is the member fingerprint list
    (corpus/n_shards, bounded by sharding policy)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash(docs)
    members = fp.select(
        F.pmod(
            hex_hash64(F.concat(F.lit("ordshard_"), F.col("id").cast("string"))),
            F.lit(N_SHARDS),
        ).alias("shard"),
        "id",
        F.col("simhash").alias("sh"),
    )
    chain_len = CHAIN_LEN

    def kernel(pdf):
        import pandas as pd

        ids = list(pdf["id"])
        shs = dict(zip(pdf["id"], (int(s) for s in pdf["sh"])))
        shard = int(pdf["shard"].iloc[0])
        cur = min(ids)
        visited = {cur}
        rows = [(shard, 1, cur, 0)]
        for pos in range(2, min(chain_len, len(ids)) + 1):
            best = min(
                (
                    (bin(shs[cur] ^ shs[i]).count("1"), i)
                    for i in ids
                    if i not in visited
                ),
            )
            cur = best[1]
            visited.add(cur)
            rows.append((shard, pos, cur, best[0]))
        return pd.DataFrame(
            rows, columns=["shard", "pos", "doc_id", "hop_hamming"]
        )

    return (
        members.groupBy("shard")
        .applyInPandas(
            kernel, "shard long, pos int, doc_id long, hop_hamming long"
        )
        .orderBy("shard", "pos")
    )
