"""Batch-12 invariants: log-log elasticity, zone-map skipping —
verified against exact-integer Python replays at sf0.001."""

from __future__ import annotations

from collections import defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"

P53 = 9007199254740992


def _ilog(c: int) -> int:
    from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE

    e = c.bit_length() - 1
    return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]


def _recon(v: int) -> float:
    q = int(v / P53) if v < 0 else v // P53  # truncate toward zero
    r = v - q * P53
    return float(q) * float(P53) + float(r)


def test_elasticity_exact_integer_replay(spark):
    out = (
        QUERIES["price_elasticity_loglog"](spark, SF)
        .toPandas()
        .set_index("brand")
    )
    li = load_table(spark, SF, "lineitem").toPandas()
    pt = load_table(spark, SF, "part").toPandas()
    df = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    mom = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n sx sy sxx sxy syy
    for price, qty, brand in zip(df.l_extendedprice, df.l_quantity, df.p_brand):
        from decimal import Decimal

        cents = int(Decimal(str(price)).quantize(Decimal("0.01")) * 100)
        x, y = _ilog(cents), _ilog(int(qty))
        m = mom[brand]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * x
        m[4] += x * y
        m[5] += y * y
    for brand, (n, sx, sy, sxx, sxy, syy) in mom.items():
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        deny = n * syy - sy * sy
        r = out.loc[brand]
        assert r.n == n
        numd, dend, denyd = _recon(num), _recon(den), _recon(deny)
        assert r.elasticity == numd / dend
        assert r.r2 == numd * numd / (dend * denyd)
        # synthetic TPC-H demand is price-independent: tiny elasticity
        assert abs(r.elasticity) < 0.5 and 0 <= r.r2 < 0.05


def test_zone_map_soundness_and_replay(spark):
    import numpy as np

    out = QUERIES["zone_map_skipping"](spark, SF).toPandas().set_index("pred_id")
    li = load_table(spark, SF, "lineitem").toPandas()
    okey = li.l_orderkey.to_numpy()
    day = (
        (np.array(li.l_shipdate, dtype="datetime64[D]")
         - np.datetime64("1970-01-01", "D")).astype(np.int64)
    )
    cents = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    maxk = int(okey.max())
    w = max(1, (maxk + 63) // 64)
    shard = okey // w
    preds = {
        "okey_mid_decile": (okey, maxk * 10 // 100, maxk * 12 // 100),
        "okey_top_tail": (okey, maxk * 90 // 100, maxk),
        "ship_30d_window": (day, 9131, 9161),
        "ship_before_93": (day, 0, 8400),
        "price_top_band": (cents, 9_000_000, 11_000_000),
        "price_floor": (cents, 0, 100_000),
    }
    shards = np.unique(shard)
    for pid, (col, lo, hi) in preds.items():
        r = out.loc[pid]
        n_skipped = rows_skipped = 0
        for s in shards:
            m = shard == s
            if col[m].max() < lo or col[m].min() > hi:
                n_skipped += 1
                rows_skipped += int(m.sum())
                # SOUNDNESS: a skipped shard contains no matching row
                assert not ((col[m] >= lo) & (col[m] <= hi)).any()
        assert r.n_shards == len(shards)
        assert r.n_skipped == n_skipped
        assert r.rows_skipped == rows_skipped
        assert r.n_matches == int(((col >= lo) & (col <= hi)).sum())
    # layout story: the clustered column out-skips the unclustered one
    # at far higher selectivity (2% of rows vs 1%)
    assert out.loc["okey_mid_decile"].skip_frac > 0.8
    assert (
        out.loc["okey_mid_decile"].skip_frac
        > out.loc["ship_30d_window"].skip_frac
    )
