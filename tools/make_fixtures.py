"""Deterministic fixture-rung generator (VERDICT_r04 next-round item 1).

The driver ships sf0.001/0.01/0.1 under /root/testdata (read-only).  The
100 TB scale argument needs MORE than one measured decade, so this tool
synthesizes additional rungs (sf1 = 10x sf0.1, ~170 MB) locally under the
repo, following the distributions measured from the driver fixtures
(FIXTURES.md section B; every distribution below was read off the sf0.1
parquet with DuckDB before writing this):

- star schema: dense int keys; uniform categorical dims (5 segments,
  3 order statuses, 5 priorities, 25 brands, 6 types, adj+noun p_name);
  o_orderdate uniform daily 1995-01-01..2001-08-01; l_shipdate uniform
  daily 1995-01-02..2001-11-04 (independent of orderdate, as measured);
  l_extendedprice uniform(900, 105000) independent of quantity (measured
  corr 0.001); lineitem = N draws of a uniform l_orderkey, so lines/order
  is Binomial(N, 1/orders) ~ Poisson(4) with ~e^-4 childless orders —
  exactly the measured shape.
- events: ts uniform micros over 2024-01-01..2024-01-31 (NTZ micros, the
  current driver layout — load_table's NTZ->LTZ self-heal applies),
  user_id uniform over 10x the sf0.1 user pool, value ~ Exponential(50)
  rounded to cents (measured median 34.77 = 50*ln2), props = {"k": 0..99}.
- documents: 10..100 words uniform over the exact 31-word driver vocab;
  with p = 233/5000 a doc is a NEAR-DUP of a random earlier doc
  (text = earlier + " dup", the construction observed verbatim in the
  driver data; birthday collisions on the source doc reproduce the ~8
  exact-dup groups per 5000); lang ~ (en .40, de/es/fr/zh .15);
  source = src{doc_id % 20} (exact driver rule).
- embeddings: 64-dim unit-normalized gaussian float32 (measured norms
  1.0 +- 1e-7, zero label clustering), label uniform 0..9.

Usage: python tools/make_fixtures.py <scale-vs-sf0.1> <out_dir>
       python tools/make_fixtures.py 10 fixtures/sf1

Seeded (numpy PCG64, seed 20260815 + per-table offsets) — re-running
reproduces byte-identical tables, so the parquet itself stays out of git
(see .gitignore) and anyone can rebuild the rung from this file.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

# sf0.1 row counts (the baseline the scale multiplier applies to).
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "events_users": 1_500,
    "documents": 5_000,
    "embeddings": 2_000,
}

EPOCH_1995 = np.datetime64("1995-01-01")
ORDERDATE_DAYS = int(
    (np.datetime64("2001-08-01") - EPOCH_1995) / np.timedelta64(1, "D")
)  # 2404
SHIPDATE_DAYS = int(
    (np.datetime64("2001-11-04") - EPOCH_1995) / np.timedelta64(1, "D")
)  # 2499
EVENTS_T0_US = (
    (np.datetime64("2024-01-01") - np.datetime64("1970-01-01"))
    / np.timedelta64(1, "us")
).astype("int64")
EVENTS_SPAN_US = 30 * 86_400 * 1_000_000


def _rng(table: str) -> np.random.Generator:
    return np.random.default_rng(
        [SEED, sum(ord(c) for c in table), len(table)]
    )


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_us(days: np.ndarray) -> pa.Array:
    micros = days.astype("int64") * 86_400_000_000 + EPOCH_1995.astype(
        "datetime64[us]"
    ).astype("int64")
    return pa.array(micros, type=pa.timestamp("us"))


def make_region_nation(out_dir: str) -> None:
    _write(
        out_dir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), type=pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), type=pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
            }
        ),
    )


def make_customer(out_dir: str, n: int) -> None:
    r = _rng("customer")
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": pa.array(
                    r.integers(0, 25, n, dtype=np.int32), type=pa.int32()
                ),
                "c_acctbal": np.round(r.uniform(-999.99, 9999.99, n), 2),
                "c_mktsegment": np.array(SEGMENTS)[r.integers(0, 5, n)],
            }
        ),
    )


def make_supplier(out_dir: str, n: int) -> None:
    r = _rng("supplier")
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": pa.array(
                    r.integers(0, 25, n, dtype=np.int32), type=pa.int32()
                ),
                "s_acctbal": np.round(r.uniform(-999.99, 9999.99, n), 2),
            }
        ),
    )


def make_part(out_dir: str, n: int) -> None:
    r = _rng("part")
    adj = np.array(ADJ)[r.integers(0, len(ADJ), n)]
    noun = np.array(NOUN)[r.integers(0, len(NOUN), n)]
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
                "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
                "p_brand": [f"Brand#{i}" for i in r.integers(1, 26, n)],
                "p_type": np.array(PTYPES)[r.integers(0, len(PTYPES), n)],
                "p_size": pa.array(
                    r.integers(1, 51, n, dtype=np.int32), type=pa.int32()
                ),
                "p_retailprice": np.round(r.uniform(900.0, 999.9, n), 2),
            }
        ),
    )


def make_orders(out_dir: str, n: int, n_cust: int) -> None:
    r = _rng("orders")
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(r.integers(0, n_cust, n, dtype=np.int64)),
                "o_orderstatus": np.array(STATUSES)[r.integers(0, 3, n)],
                "o_totalprice": np.round(r.uniform(1000.0, 500_000.0, n), 2),
                "o_orderdate": _ts_us(r.integers(0, ORDERDATE_DAYS + 1, n)),
                "o_orderpriority": np.array(PRIORITIES)[r.integers(0, 5, n)],
            }
        ),
    )


def make_lineitem(out_dir: str, n: int, n_orders: int, n_part: int, n_supp: int) -> None:
    r = _rng("lineitem")
    okey = np.sort(r.integers(0, n_orders, n, dtype=np.int64))
    # linenumber = 1-based rank within each order (okey is sorted).
    starts = np.flatnonzero(np.r_[True, okey[1:] != okey[:-1]])
    linenumber = (np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n])) + 1).astype(
        np.int32
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okey),
                "l_partkey": pa.array(r.integers(0, n_part, n, dtype=np.int64)),
                "l_suppkey": pa.array(r.integers(0, n_supp, n, dtype=np.int64)),
                "l_linenumber": pa.array(linenumber, type=pa.int32()),
                "l_quantity": r.integers(1, 51, n).astype(np.float64),
                "l_extendedprice": np.round(r.uniform(900.0, 105_000.0, n), 2),
                "l_discount": r.integers(0, 11, n) / 100.0,
                "l_tax": r.integers(0, 9, n) / 100.0,
                "l_returnflag": np.array(["A", "N", "R"])[r.integers(0, 3, n)],
                "l_linestatus": np.array(["F", "O"])[r.integers(0, 2, n)],
                "l_shipdate": _ts_us(r.integers(1, SHIPDATE_DAYS + 1, n)),
            }
        ),
    )


def make_events(out_dir: str, n: int, n_users: int) -> None:
    r = _rng("events")
    micros = EVENTS_T0_US + r.integers(0, EVENTS_SPAN_US, n, dtype=np.int64)
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(micros, type=pa.timestamp("us")),
                "user_id": pa.array(r.integers(0, n_users, n, dtype=np.int64)),
                "event_type": np.array(EVENT_TYPES)[r.integers(0, 5, n)],
                "value": np.round(r.exponential(50.0, n), 2),
                "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, n)],
            }
        ),
    )


def make_documents(out_dir: str, n: int) -> None:
    r = _rng("documents")
    vocab = np.array(VOCAB)
    dup_p = 233.0 / 5000.0
    texts: list[str] = []
    for i in range(n):
        if i > 0 and r.random() < dup_p:
            texts.append(texts[int(r.integers(0, i))] + " dup")
        else:
            k = int(r.integers(10, 101))
            texts.append(" ".join(vocab[r.integers(0, len(vocab), k)]))
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": texts,
                "lang": np.array(LANGS)[r.choice(5, n, p=LANG_P)],
                "source": [f"src{i % 20}" for i in range(n)],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
    )


def make_embeddings(out_dir: str, n: int) -> None:
    r = _rng("embeddings")
    m = r.standard_normal((n, 64))
    m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1)), 64
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(
                    r.integers(0, 10, n, dtype=np.int32), type=pa.int32()
                ),
            }
        ),
    )


def main() -> int:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "fixtures/sf1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isabs(out_dir):
        out_dir = os.path.join(repo, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    s = lambda k: int(round(BASE[k] * scale))  # noqa: E731
    print(f"generating scale={scale} (vs sf0.1) into {out_dir}")
    make_region_nation(out_dir)
    make_customer(out_dir, s("customer"))
    make_supplier(out_dir, s("supplier"))
    make_part(out_dir, s("part"))
    make_orders(out_dir, s("orders"), s("customer"))
    make_lineitem(out_dir, s("lineitem"), s("orders"), s("part"), s("supplier"))
    make_events(out_dir, s("events"), s("events_users"))
    make_documents(out_dir, s("documents"))
    make_embeddings(out_dir, s("embeddings"))
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
