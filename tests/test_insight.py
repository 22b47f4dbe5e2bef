"""Insight battery invariants (queries/insight_queries.py) — semantic
properties cross-checked by brute force at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

# Registry first (circular-import gotcha: query modules must load via
# the registry sweep).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE
from amorphous_mapreduce_spark.operators.dedup import containment_pairs
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _log2s(c: int) -> int:
    e = c.bit_length() - 1
    return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]


def test_intlog_matches_math_log2():
    for c in [1, 2, 3, 255, 256, 257, 1000, 12345, 10**9]:
        approx = _log2s(c) / LOG2_SCALE
        assert abs(approx - math.log2(c)) < 0.006
        assert _log2s(c) <= math.log2(c) * LOG2_SCALE + 1  # truncating


def test_l_diversity_bruteforce(spark):
    out = QUERIES["l_diversity_audit"](spark, SF).toPandas()
    cust = load_table(spark, SF, "customer").toPandas()
    cls: Counter = Counter()
    for r in cust.itertuples():
        band = math.floor(round(r.c_acctbal, 2) / 200)
        cls[(r.c_nationkey, band, r.c_mktsegment)] += 1
    grp: dict = {}
    for (nk, band, seg), c in cls.items():
        grp.setdefault((nk, band), []).append(c)
    by_l: dict = {}
    for counts in grp.values():
        n = sum(counts)
        ent = (n * _log2s(n) - sum(c * _log2s(c) for c in counts)) // n
        d = by_l.setdefault(len(counts), [0, 0, []])
        d[0] += 1
        d[1] += n
        d[2].append(ent)
    assert len(out) == len(by_l)
    for r in out.itertuples():
        ng, nr, ents = by_l[r.l_value]
        assert (r.n_groups, r.n_rows) == (ng, nr)
        assert r.min_ent_scaled == min(ents)
        assert r.max_ent_scaled == max(ents)
        # entropy l-diversity never exceeds log2(distinct l)
        assert r.max_ent_scaled <= _log2s(r.l_value) + 1 if r.l_value > 1 else True


def test_association_rules_bruteforce(spark):
    out = QUERIES["brand_association_rules"](spark, SF).toPandas()
    li = load_table(spark, SF, "lineitem").toPandas()
    part = load_table(spark, SF, "part").toPandas()
    brand = dict(zip(part.p_partkey, part.p_brand))
    baskets: dict = {}
    for r in li.itertuples():
        baskets.setdefault(r.l_orderkey, set()).add(brand[r.l_partkey])
    n = len(baskets)
    cnt_b: Counter = Counter()
    cnt_ab: Counter = Counter()
    for bs in baskets.values():
        for b in bs:
            cnt_b[b] += 1
        for a in bs:
            for c in bs:
                if a != c:
                    cnt_ab[(a, c)] += 1
    want = {
        (a, c): v for (a, c), v in cnt_ab.items() if v * 1000 >= n * 5
    }
    got = {(r.antecedent, r.consequent): r for r in out.itertuples()}
    assert set(got) == set(want)
    for (a, c), v in want.items():
        r = got[(a, c)]
        assert r.cnt_ab == v and r.n_baskets == n
        assert r.cnt_ante == cnt_b[a] and r.cnt_cons == cnt_b[c]
        assert r.confidence == v / cnt_b[a]
        assert r.lift == (v * n) / (cnt_b[a] * cnt_b[c])


def test_containment_detects_embedded_passage(spark):
    # A short doc fully embedded in a long one: containment ~1 from the
    # short side even though Jaccard is low.
    long_words = " ".join(f"w{i}" for i in range(100))
    short_words = " ".join(f"w{i}" for i in range(40, 52))
    docs = spark.createDataFrame(
        [(1, long_words), (2, short_words), (3, "unrelated text entirely here")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, threshold=0.9).toPandas()
    pairs = {(r.qid, r.nid): r for r in out.itertuples()}
    assert (2, 1) in pairs  # short contained in long
    assert pairs[(2, 1)].containment == 1.0
    assert (1, 2) not in pairs  # long NOT contained in short
    assert not any(3 in p for p in pairs)


def test_mi_lang_source_bounds_and_bruteforce(spark):
    out = QUERIES["mi_lang_source"](spark, SF).toPandas().iloc[0]
    docs = load_table(spark, SF, "documents").toPandas()
    n = len(docs)
    cells = Counter(zip(docs.lang, docs.source))
    cl = Counter(docs.lang)
    cs = Counter(docs.source)
    mi_num = sum(
        c * (_log2s(c * n) - _log2s(cl[l] * cs[s]))
        for (l, s), c in cells.items()
    )
    assert out.mi_num == mi_num
    assert out.n_docs == n
    # MI within LUT slack of [0, min(H(L), H(S))]
    assert out.mi_bits >= -0.01
    assert out.mi_bits <= min(out.ent_lang_bits, out.ent_source_bits) + 0.01


def test_seasonal_dow_bruteforce(spark):
    out = QUERIES["seasonal_dow_decomposition"](spark, SF).toPandas()
    assert set(out.dow) <= set(range(7))
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT epoch_us(o_orderdate)//86400000000 AS d,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))*100
                            AS BIGINT)) AS BIGINT) AS rev
            FROM '{SF}/orders.parquet' GROUP BY 1"""
    ).fetchdf()
    rev = dict(zip(daily.d, daily.rev))
    by_dow: dict = {}
    for d, v in rev.items():
        window = [rev[d + o] for o in range(-3, 4) if d + o in rev]
        if len(window) != 7:
            continue
        acc = by_dow.setdefault((d + 4) % 7, [0, 0, 0])
        acc[0] += 1
        acc[1] += 7 * v - sum(window)
        acc[2] += v
    assert len(out) == len(by_dow)
    for r in out.itertuples():
        n, detr, tot = by_dow[r.dow]
        assert (r.n_days, r.detr_sum) == (n, detr)
        assert r.seasonal_cents == detr / (7 * n)
        assert r.mean_daily_cents == tot / n


def test_nelson_aalen_monotone_and_bruteforce(spark):
    out = (
        QUERIES["nelson_aalen_hazard"](spark, SF)
        .toPandas()
        .sort_values("month_idx", ignore_index=True)
    )
    con = duckdb.connect()
    last = con.execute(
        f"""SELECT MAX(year(o_orderdate)*12 + month(o_orderdate) - 1) AS w
            FROM '{SF}/orders.parquet' GROUP BY o_custkey"""
    ).fetchdf()
    deaths = Counter(last.w)
    months = sorted(deaths)
    alive = sum(deaths.values())
    cum = 0
    rows = {}
    for m in months:
        haz = (deaths[m] * 1048576) // alive
        cum += haz
        rows[m] = (deaths[m], alive, haz, cum)
        alive -= deaths[m]
    assert len(out) == len(months)
    for r in out.itertuples():
        assert rows[r.month_idx] == (
            r.deaths,
            r.n_risk,
            r.haz_scaled,
            r.cumhaz_scaled,
        )
    # cumulative hazard is nondecreasing
    assert out.cumhaz_scaled.is_monotonic_increasing
