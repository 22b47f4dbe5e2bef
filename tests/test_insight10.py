"""Batch-11 invariants: DDSketch quantiles, Brier calibration bins —
verified against numpy / pandas replays at sf0.001."""

from __future__ import annotations

import math

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_ddsketch_guarantee_and_exact_pick(spark):
    import numpy as np

    out = (
        QUERIES["ddsketch_price_quantiles"](spark, SF)
        .toPandas()
        .set_index("q_label")
    )
    li = load_table(spark, SF, "lineitem").select("l_extendedprice").toPandas()
    cents = np.sort(
        np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    )
    n = len(cents)
    for q_label, qn, qd in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        r = out.loc[q_label]
        rank = -(-qn * n // qd)  # ceil(qn*n/qd)
        assert r.n_rows == n
        assert r.rank_pick == rank
        # the in-plan 'exact' order statistic IS the rank-th smallest
        assert r.exact_cents == cents[rank - 1]
        # DDSketch guarantee holds and is self-audited
        assert r.within_alpha
        assert abs(r.est_cents - r.exact_cents) / r.exact_cents <= 0.05
        # bucket spec: the chosen bucket is where the intlog index puts
        # the exact value (monotone bucketing)
        assert r.merge_ok
        # est is the mid-bucket point of a 2^(1/8) grid: within one
        # gamma step of the true log2
        assert abs(math.log2(r.est_cents) - math.log2(r.exact_cents)) <= 0.25


def test_brier_calibration_pandas_replay(spark):
    import pandas as pd

    out = QUERIES["brier_calibration_bins"](spark, SF).toPandas()
    li = load_table(spark, SF, "lineitem").toPandas()
    od = load_table(spark, SF, "orders").toPandas()
    pt = load_table(spark, SF, "part").toPandas()
    df = li.merge(od, left_on="l_orderkey", right_on="o_orderkey").merge(
        pt, left_on="l_partkey", right_on="p_partkey"
    )
    df["y"] = (df.l_returnflag == "R").astype(int)
    pivot = pd.Timestamp("1995-06-01")
    dt = pd.to_datetime(df.o_orderdate)
    df["is_train"] = dt < pivot
    tr = df[df.is_train]
    S = 1 << 20
    rates = ((S * tr.groupby("p_brand").y.sum()) // tr.groupby("p_brand").y.count())
    g_q = (S * tr.y.sum()) // len(tr)
    te = df[~df.is_train].copy()
    te["p_q"] = te.p_brand.map(rates).fillna(g_q).astype(int)
    te["bin"] = ((te.p_q * 100) // S).clip(upper=99)
    rows = {}
    for b, grp in te.groupby("bin"):
        e = grp.p_q - grp.y * S
        rows[b] = (
            len(grp),
            int(grp.y.sum()),
            int(grp.p_q.sum()),
            int((e.astype(object) ** 2).sum()),
        )
    assert len(out) == len(rows)
    for r in out.itertuples():
        n, nret, spq, sq = rows[r.bin]
        assert (r.n_rows, r.n_returned, r.sum_pq) == (n, nret, spq)
        assert r.sq_hi * (1 << 30) + r.sq_lo == sq
        assert r.mean_pred == spq / (n * float(S))
        assert r.obs_rate == nret / n
        assert r.brier_bin == (
            (sq // (1 << 30)) * float(1 << 30) + (sq % (1 << 30))
        ) / (n * float(1 << 40))
        # calibration sanity: predictions and outcomes live in [0, 1]
        assert 0.0 <= r.mean_pred <= 1.0 and 0.0 <= r.obs_rate <= 1.0
