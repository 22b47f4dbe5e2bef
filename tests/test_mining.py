"""Corpus-mining battery invariants (queries/mining_queries.py) —
semantic properties the oracle hash can't express, cross-checked by
brute force at sf0.001."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F
from itertools import combinations

# Registry first: importing a query module directly would re-enter the
# registry's module sweep mid-initialisation (circular import).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.queries.mining_queries import (
    BPE_TOP_K,
    LEAK_MAX_SOURCES,
    PMI_MIN_COUNT,
    PMI_TOP_K,
)
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _norm_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def _doc_tokens(spark):
    docs = load_table(spark, SF, "documents").toPandas()
    return {r.doc_id: _norm_tokens(r.text) for r in docs.itertuples()}, docs


def test_pmi_bigrams_matches_bruteforce(spark):
    out = QUERIES["pmi_bigrams"](spark, SF).toPandas()
    toks, _ = _doc_tokens(spark)
    bc: Counter = Counter()
    for ws in toks.values():
        bc.update(zip(ws, ws[1:]))
    n = sum(bc.values())
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (a, b), c in bc.items():
        c1[a] += c
        c2[b] += c
    scored = [
        (float(c * n) / float(c1[a] * c2[b]), f"{a} {b}", c)
        for (a, b), c in bc.items()
        if c >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = scored[:PMI_TOP_K]
    got = sorted(
        zip(out.lift, out.bigram, out.cnt), key=lambda t: (-t[0], t[1])
    )
    assert [(g[1], g[2]) for g in got] == [(w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[0] == w[0]  # IEEE-exact: int64->double division


def test_bpe_pairs_match_bruteforce(spark):
    out = QUERIES["bpe_merge_pairs"](spark, SF).toPandas()
    toks, _ = _doc_tokens(spark)
    pc: Counter = Counter()
    for ws in toks.values():
        for w in ws:
            pc.update(w[i : i + 2] for i in range(len(w) - 1))
    want = sorted(pc.items(), key=lambda t: (-t[1], t[0]))[:BPE_TOP_K]
    got = sorted(zip(out.pair, out.cnt), key=lambda t: (-t[1], t[0]))
    assert got == want


def test_streaks_are_maximal_runs(spark):
    out = QUERIES["user_activity_streaks"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    days = {
        uid: sorted({ts.value // 1000 // 86400000000 for ts in g.ts})
        for uid, g in ev.groupby("user_id")
    }
    assert set(out.user_id) == set(days)
    for r in out.itertuples():
        ds = days[r.user_id]
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert r.n_active_days == len(ds)
        assert r.n_streaks == len(runs)
        assert r.longest_streak == max(runs)


def test_cross_source_leakage_matches_bruteforce(spark):
    out = QUERIES["cross_source_leakage"](spark, SF).toPandas()
    toks, docs = _doc_tokens(spark)
    src = dict(zip(docs.doc_id, docs.source))
    gram_sources: dict[str, set] = {}
    for did, ws in toks.items():
        for i in range(len(ws) - 5):
            gram_sources.setdefault(" ".join(ws[i : i + 6]), set()).add(src[did])
    pairs: Counter = Counter()
    for sources in gram_sources.values():
        if 2 <= len(sources) <= LEAK_MAX_SOURCES:
            for a, b in combinations(sorted(sources), 2):
                pairs[(a, b)] += 1
    got = {(r.src_a, r.src_b): r.n_shared_grams for r in out.itertuples()}
    assert got == dict(pairs)


def test_negative_sampling_weight_is_exact_f075(spark):
    out = QUERIES["negative_sampling_weights"](spark, SF).toPandas()
    import math

    for r in out.itertuples():
        assert r.ns_weight == math.sqrt(r.f * math.sqrt(r.f))
        assert abs(r.ns_weight - r.f**0.75) < 1e-9 * r.ns_weight


def test_dedup_span_manifest_merges_intervals(spark):
    from amorphous_mapreduce_spark.operators.spans import (
        dedup_span_manifest,
    )

    passages = spark.createDataFrame(
        [
            # doc 7: [0,12) and [8,20) overlap -> one island [0,20)=20;
            # [30,42) separate
            (1, 7, 0, 0, 12),
            (2, 7, 0, 8, 12),
            (3, 7, 0, 30, 12),
            # doc 9: adjacent half-open [5,17)+[17,29) merge to 24
            (1, 9, 0, 5, 12),
            (2, 9, 0, 17, 12),
        ],
        "id1 long, id2 long, start1 long, start2 long, span_tokens long",
    )
    got = {
        r.id: (r.n_trim_spans, r.tokens_to_trim)
        for r in dedup_span_manifest(passages).collect()
    }
    assert got == {7: (2, 32), 9: (1, 24)}


def test_manifest_covers_every_later_copy(spark):
    """Every id2 of a passage appears in the manifest with at least the
    longest single passage's tokens."""
    from amorphous_mapreduce_spark.operators.spans import duplicate_passages

    from amorphous_mapreduce_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    passages = duplicate_passages(docs).persist()
    manifest = QUERIES["dedup_span_manifest"](spark, SF).toPandas()
    got = dict(zip(manifest.id, manifest.tokens_to_trim))
    for r in passages.groupBy("id2").agg(
        F.max("span_tokens").alias("mx")
    ).collect():
        assert got.get(r.id2, 0) >= r.mx
    passages.unpersist()


def test_curriculum_positions_and_budget(spark):
    out = (
        QUERIES["curriculum_manifest"](spark, SF)
        .toPandas()
        .sort_values("position")
        .reset_index(drop=True)
    )
    # positions are 1..N, budget is the running token total in order
    assert list(out.position) == list(range(1, len(out) + 1))
    assert list(out.quality) == sorted(out.quality, reverse=True)
    toks, _ = _doc_tokens(spark)
    run = 0
    for r in out.itertuples():
        run += len(toks[r.id])
        assert r.cum_tokens == run


def test_kwic_contexts_match_source_tokens(spark):
    out = QUERIES["keyword_in_context"](spark, SF).toPandas()
    toks, _ = _doc_tokens(spark)
    assert len(out) > 0
    for r in out.itertuples():
        ws = toks[r.id]
        assert ws[r.pos] == r.kw == "spark"
        assert r.left_ctx == " ".join(ws[max(0, r.pos - 2) : r.pos])
        assert r.right_ctx == " ".join(ws[r.pos + 1 : r.pos + 3])


def test_label_centroid_drift_zero_for_identical_halves(spark):
    """A frame where even and odd ids carry identical vectors per label
    has zero drift; a shifted half has positive drift."""
    from amorphous_mapreduce_spark.queries.eval_queries import (
        q_label_centroid_drift,
    )

    rows = []
    for lbl in (0, 1):
        for i in range(4):
            vec = [0.1 * (lbl + 1), -0.2]
            if lbl == 1 and i % 2 == 1:
                vec = [vec[0] + 0.5, vec[1]]
            rows.append((lbl * 100 + i, vec, lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    import os, tempfile

    d = tempfile.mkdtemp()
    emb.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = {r.label: r.drift_l1_scaled for r in
           q_label_centroid_drift(spark, d).collect()}
    assert out[0] == 0
    assert out[1] > 0


def test_cusum_detects_planted_shift(spark):
    """A level shift mid-stream scores much higher than a stationary
    stream of the same values shuffled evenly."""
    import os, tempfile
    from datetime import datetime, timedelta

    from amorphous_mapreduce_spark.queries_registry import QUERIES as Q

    base = datetime(2024, 1, 1)
    rows = []
    # user 1: stationary alternation; user 2: 10.0 then shift to 20.0
    for i in range(40):
        ts = base + timedelta(minutes=i)
        rows.append((1000 + i, ts, 1, "t", 10.0 if i % 2 == 0 else 20.0, "{}"))
        rows.append((2000 + i, ts, 2, "t", 10.0 if i < 20 else 20.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r.max_abs_cusum_scaled
           for r in Q["user_value_cusum"](spark, d).collect()}
    # scaled stat: stationary bounded by n*max_step; shifted ~ n * n/4 * step
    assert out[2] > 10 * out[1]
    # exact closed form for the planted shift: max at i=20,
    # |n*S_20 - 20*T| = |40*200 - 20*600| = 4000
    assert out[2] == 4000.0


def test_source_divergence_flags_planted_outlier(spark):
    """A source whose vocabulary is disjoint from the rest dominates the
    scaled-L1 divergence (per token)."""
    import os, tempfile

    from amorphous_mapreduce_spark.queries.mining_queries import (
        q_source_unigram_divergence,
    )

    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta", "en", "normal_a", 22))
        rows.append((100 + i, "alpha beta gamma epsilon", "en", "normal_b", 24))
    for i in range(10):
        rows.append((200 + i, "zeta eta theta iota", "xx", "weird", 19))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.src: r.l1_scaled / r.n_tokens
           for r in q_source_unigram_divergence(spark, d).collect()}
    assert out["weird"] > 2 * max(out["normal_a"], out["normal_b"])


def test_spearman_bounds_and_bruteforce(spark):
    out = QUERIES["quality_length_rank_corr"](spark, SF).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert -1.0 <= r.spearman <= 1.0
    # brute force with the same tie-break
    from amorphous_mapreduce_spark.operators.text_analysis import doc_stats
    from amorphous_mapreduce_spark.sources import load_table

    stats = doc_stats(load_table(spark, SF, "documents")).toPandas()
    by_q = sorted(stats.itertuples(), key=lambda t: (t.quality, t.id))
    by_l = sorted(stats.itertuples(), key=lambda t: (t.n_tokens, t.id))
    rq = {t.id: i + 1 for i, t in enumerate(by_q)}
    rl = {t.id: i + 1 for i, t in enumerate(by_l)}
    sum_d2 = sum((rq[i] - rl[i]) ** 2 for i in rq)
    assert r.sum_d2 == sum_d2
    n = len(rq)
    assert r.spearman == 1.0 - (6.0 * sum_d2) / (n * (n * n - 1))


def test_dow_hour_profile_covers_week_and_sums(spark):
    out = QUERIES["events_dow_hour_profile"](spark, SF).toPandas()
    assert set(out.dow) <= set(range(7)) and set(out.hour_utc) <= set(range(24))
    ev = load_table(spark, SF, "events").toPandas()
    assert out.n_events.sum() == len(ev)
    # dow formula sanity: epoch day 0 is Thursday=4 under 0=Sunday
    import pandas as pd

    days = (ev.ts.astype("int64") // 1000 // 86400000000 + 4) % 7
    got = out.groupby("dow").n_events.sum().to_dict()
    assert got == days.value_counts().to_dict()


def test_trending_terms_drift_identity(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["trending_terms"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    drifts = [abs(r.drift_cross) for r in rows]
    assert drifts == sorted(drifts, reverse=True)
    for r in rows:
        assert r.c0 + r.c1 > 0


def test_cents_digits_partition_counts(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES
    from amorphous_mapreduce_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["cents_digit_uniformity"](spark, sf).collect()
    total = sum(r.observed for r in rows)
    assert total == load_table(spark, sf, "orders").count()
    assert sum(r.dev_cross for r in rows) == 0  # deviations sum to zero
    for r in rows:
        assert 0 <= r.digit <= 9
        assert r.chi2_term_scaled >= 0


def test_hapax_bounds(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["hapax_ratio_by_source"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_types <= r.n_tokens
        assert 0.0 <= r.hapax_type_share <= 1.0
        assert 0.0 < r.type_token_ratio <= 1.0
