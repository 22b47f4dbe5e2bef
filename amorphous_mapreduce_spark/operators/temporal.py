"""Temporal joins Spark lacks as builtins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops (the
preferred strategy per SURVEY.md §2.4 custom-operator ladder), not pandas
cogroups:

- **as-of join**: union both sides tagged, one window sort per key with a
  forward-carried last-observation — O(n log n) in each key's rows, one
  shuffle on the key, no per-key driver loops, no pandas. This is the
  scalable formulation (the per-key sort happens inside Spark's window
  exec, spilling as needed).
- **range join**: interval containment via time-bucketing — intervals
  explode to the buckets they cover, events join on their bucket
  (equi-join!), then the exact containment predicate filters. Turns an
  inequality join (nested loop at scale) into a hash join with bounded
  fanout = interval_span/bucket + 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``by`` key: the latest with ``right.on <= left.on`` (backward,
    default) or the earliest with ``right.on >= left.on`` (forward).

    Returns left columns + ``asof_<on>`` + ``asof_<c>`` for each
    ``right_cols``. Left rows with no matching right row keep NULLs
    (left-outer as-of semantics). At equal timestamps the right row is
    considered visible (<=/>=), matching DuckDB's ASOF JOIN. With
    ``tolerance_us``, matches farther than that many microseconds from
    the left timestamp are nulled out (pandas merge_asof ``tolerance``
    semantics) — the mask is applied AFTER the carry, so it is one
    scalar comparison per row, not a second join.

    Duplicate right (by, on) pairs resolve deterministically: backward
    carries the greatest payload tuple, forward the smallest (each is
    the payload adjacent to the left row in the total window order).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(by),
        F.col(on),
        *[F.col(c) for c in right_cols],
    ).withColumn("_side", F.lit(0))
    # Align schemas: left payload columns are NULL on right rows & v.v.
    for c in lcols:
        if c not in (by, on) and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = l.unionByName(r.select(*l.columns))
    # Right rows sort before left rows at identical (on) so they are
    # visible to them (ASOF's <=). Among right rows with the SAME
    # (by, on) the payload struct ascending makes the ordering total, so
    # F.last deterministically carries the greatest payload tuple —
    # without it the carried right row is arbitrary run-to-run.
    fwd = direction == "forward"
    order_exprs = [
        F.col(on).desc() if fwd else F.col(on).asc(),
        F.col("_side").asc(),
    ]
    if right_cols:
        payload = F.when(
            F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols])
        )
        # Walking the window order, F.last carries the right row closest
        # to the left row; ordering the same-(by, on) payloads so the
        # carried one is greatest (backward) / smallest (forward).
        order_exprs.append(payload.desc_nulls_first() if fwd else payload.asc_nulls_first())
    w = (
        Window.partitionBy(by)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in unioned.columns],
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias(f"asof_{on}"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    out_cols = lcols + [f"asof_{on}"] + [f"asof_{c}" for c in right_cols]
    result = carried.filter(F.col("_side") == 1).select(*out_cols)
    if tolerance_us is not None:
        gap = (
            F.unix_micros(F.col(f"asof_{on}")) - F.unix_micros(F.col(on))
            if fwd
            else F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"asof_{on}"))
        )
        in_tol = F.col(f"asof_{on}").isNotNull() & (gap <= F.lit(tolerance_us))
        result = result.select(
            *lcols,
            *[
                F.when(in_tol, F.col(c)).alias(c)
                for c in [f"asof_{on}"] + [f"asof_{c}" for c in right_cols]
            ],
        )
    return result


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "1 hour",
) -> DataFrame:
    """Rows of ``events`` matched to every interval containing them
    (start <= ts < end), via bucketed equi-join.

    ``bucket`` should be >= the typical interval length so fanout stays
    near 1; the containment filter guarantees exactness regardless.
    """
    n_secs = {"1 hour": 3600, "1 day": 86400, "15 minutes": 900, "1 minute": 60}[
        bucket
    ]
    ev = events.withColumn(
        "_b", (F.unix_timestamp(F.col(ts_col)) / n_secs).cast("long")
    )
    iv = intervals.withColumn(
        "_bs", (F.unix_timestamp(F.col(start_col)) / n_secs).cast("long")
    ).withColumn(
        # end is exclusive: a zero-length tail bucket is still generated,
        # the containment filter discards spurious matches.
        "_be",
        (F.unix_timestamp(F.col(end_col)) / n_secs).cast("long"),
    )
    iv_exploded = iv.withColumn("_b", F.explode(F.sequence("_bs", "_be"))).drop(
        "_bs", "_be"
    )
    return (
        ev.join(iv_exploded, "_b")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_b")
    )


def gap_fill_daily(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style gap-filled daily rollup with forward fill:
    [event_type, day, n_events, filled_sum].

    Every (key, day) cell of the corpus's day span exists in the output;
    days with no events carry n_events = 0 and the last observed daily
    sum (NULL before the first observation). The time spine is built
    from a 1-row MIN/MAX bounds aggregate crossed onto the distinct key
    set — never a per-row expansion of the raw events — so spine size is
    |keys| x |days| regardless of event volume. The forward-fill window
    partitions on the bounded key, ordering only each key's |days| rows.

    Daily sums accumulate in DECIMAL before the double cast (CLAUDE.md
    float-agg convention) and the fill only *copies* values, so outputs
    are engine-exact.
    """
    # persisted: bounds, the key set, and the spine join all read this
    # (bounded |keys| x |days|) rollup — without the cache the events
    # aggregation would run three times
    daily = (
        events.groupBy(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.col(key_col).alias("k"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("_sum"),
        )
        .persist()
    )
    bounds = daily.agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
    keys = daily.select("k").distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["k", "day"], "left")
        .select(
            F.col("k").alias(key_col),
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str = "user_id",
    right_cols: tuple[str, ...] = (),
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof direction=
    'nearest'): each left row gets the right row minimizing |right.on −
    left.on| within the same ``by`` key, preferring the BACKWARD match
    on exact distance ties. ``on`` must be an integer column (e.g.
    epoch microseconds) so the distance is exact integer arithmetic.

    Same scale shape as asof_join: ONE shuffle on the key, two ordered
    carries inside the same window partition (ascending for the
    backward candidate, descending for the forward candidate), then a
    scalar chooser — never a row-pair blowup. Duplicate right (by, on)
    rows resolve like asof_join: the backward carry keeps the greatest
    payload tuple, the forward carry the smallest.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(by), F.col(on), *[F.col(c) for c in right_cols]
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (by, on) and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = l.unionByName(r.select(*l.columns))

    payload = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols])
    )
    w_b = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), payload.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("_side").asc(), payload.desc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(w, name_prefix):
        cols = [
            F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True)
            .over(w)
            .alias(f"{name_prefix}_{on}")
        ]
        cols += [
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"{name_prefix}_{c}")
            for c in right_cols
        ]
        return cols

    # All window columns in ONE select (window-after-filter recompute
    # gotcha), then the scalar chooser.
    carried = unioned.select(
        *unioned.columns, *carry(w_b, "_b"), *carry(w_f, "_f")
    ).filter(F.col("_side") == 1)

    d_b = F.col(on) - F.col(f"_b_{on}")
    d_f = F.col(f"_f_{on}") - F.col(on)
    b_ok = F.col(f"_b_{on}").isNotNull() & (
        F.lit(True) if tolerance_us is None else (d_b <= F.lit(tolerance_us))
    )
    f_ok = F.col(f"_f_{on}").isNotNull() & (
        F.lit(True) if tolerance_us is None else (d_f <= F.lit(tolerance_us))
    )
    take_b = b_ok & (~f_ok | (d_b <= d_f))
    take_f = f_ok & ~take_b

    out_cols = [F.col(c) for c in lcols]
    out_cols.append(
        F.when(take_b, F.col(f"_b_{on}"))
        .when(take_f, F.col(f"_f_{on}"))
        .alias(f"asof_{on}")
    )
    for c in right_cols:
        out_cols.append(
            F.when(take_b, F.col(f"_b_{c}"))
            .when(take_f, F.col(f"_f_{c}"))
            .alias(f"asof_{c}")
        )
    return carried.select(*out_cols)
