"""Local mimic of the driver's t2 correctness gate.

For every ``queries()`` entry with an ``oracle_sql()`` counterpart, run the
Spark DataFrame and the DuckDB SQL at the same sf_dir and compare:
row count, schema (column names), and an order-insensitive value
comparison (columns sorted by name, rows sorted, exact equality).

Every check is appended to CHECKS.jsonl at the repo root (query, sf dir,
rows, status, timings, UTC timestamp) — a committed audit trail so any
query the per-round driver sample never lands on still has a local
verification record (round-2 verdict item 9).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def dtype_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtypes differ between Spark and the oracle.

    The driver hashes values in a width-insensitive way (int32 vs int64
    both hashed green in CORRECTNESS_r01) but IS sensitive to DuckDB
    returning HUGEINT (pandas object dtype) where Spark returns int64 —
    the class of bug canon()'s stringification masked (VERDICT r1 "What's
    wrong" 1-2). So compare dtype KINDS: int≡uint widths collapse,
    datetime units collapse, but object-vs-numeric / float-vs-int /
    bool-vs-int mismatches fail.
    """
    bad = []
    for c in sdf.columns:
        ka, kb = sdf[c].dtype.kind, odf[c].dtype.kind
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        if ka != kb:
            bad.append(f"{c}: spark {sdf[c].dtype} vs oracle {odf[c].dtype}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from amorphous_mapreduce_spark import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    checks = open(os.path.join(REPO, "CHECKS.jsonl"), "a")

    def record(name: str, status: str, rows: int, ts: float, td: float) -> None:
        checks.write(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "status": status,
                    "rows": rows,
                    "spark_s": round(ts, 2),
                    "duck_s": round(td, 2),
                    "ts": datetime.datetime.now(datetime.timezone.utc)
                    .isoformat(timespec="seconds"),
                }
            )
            + "\n"
        )
        checks.flush()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s spark) [no oracle]")
            record(name, "rows-only", len(sdf), t_spark, 0.0)
            continue
        t0 = time.time()
        odf = con.sql(oracles[name]).df()
        t_duck = time.time() - t0
        status = "OK"
        if len(sdf) != len(odf):
            status = f"ROWCOUNT {len(sdf)} vs {len(odf)}"
        elif sorted(sdf.columns) != sorted(odf.columns):
            status = f"SCHEMA {sorted(sdf.columns)} vs {sorted(odf.columns)}"
        elif dtype_mismatches(
            sdf.reindex(sorted(sdf.columns), axis=1),
            odf.reindex(sorted(odf.columns), axis=1),
        ):
            status = "DTYPE " + "; ".join(
                dtype_mismatches(
                    sdf.reindex(sorted(sdf.columns), axis=1),
                    odf.reindex(sorted(odf.columns), axis=1),
                )
            )
        else:
            a, b = canon(sdf), canon(odf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status = "VALUES " + str(ex).split("\n")[0]
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                for c in bad_cols[:3]:
                    i = neq[c].idxmax()
                    status += f" | {c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}"
        ok = status == "OK"
        if not ok:
            failures.append(name)
        print(f"  {name}: {status} ({len(sdf)} rows, spark {t_spark:.1f}s, duck {t_duck:.1f}s)")
        record(name, status, len(sdf), t_spark, t_duck)

    n = len(only & set(qs)) if only else len(qs)
    print(f"\n{n - len(failures)}/{n} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
