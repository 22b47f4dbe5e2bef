"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only state is the reducers' scoreboard accumulating across
waves (src/word_count.rs:121-126); the streaming-native generalisation is
a keyed state store surviving micro-batches. ``streaming_exact_dedup``
keeps first-seen content hashes across batches — cross-batch exact dedup,
the streaming form of operators.dedup.exact_dedup.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from amorphous_mapreduce_spark.operators.dedup import normalize_text

DEDUP_OUT = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("doc_id", LongType()),
    ]
)
DEDUP_STATE = StructType([StructField("seen", LongType())])


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """First occurrence per content hash across ALL micro-batches:
    [content_hash, doc_id].

    Keyed state (one long per distinct content) marks hashes already
    emitted; duplicates in later batches are dropped. State is per-key in
    the state store — partitioned, checkpointable, no driver memory.
    """
    hashed = docs.select(
        F.md5(normalize_text(text_col)).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
    )

    def dedup_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # already emitted this content hash in a prior batch
        best: int | None = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((1,))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})

    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType=DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
