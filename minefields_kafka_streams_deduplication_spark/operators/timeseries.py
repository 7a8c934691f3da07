"""Timeseries operators (round-3 widening): OHLC bars, time-weighted
averages, LOCF gap-filling, and the forward as-of join — the
kdb/TimescaleDB-shaped surface an event-analytics engine needs beyond
plain windows. No Kafka Streams analog ([R] the DSL stops at windowed
aggregates); these are the batch-checkable forms, each with a DuckDB
oracle.

All four are single-shuffle plans: one hash exchange on the entity key
(plus the window sort within it) — the 100 TB shape for per-entity
ordered processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dec6, load_table, round4f
from ..registry import query


@query(
    "ohlc_bars_hourly",
    oracle="""
WITH ranked AS (
  SELECT user_id, date_trunc('hour', ts) AS bar_ts, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, bar_ts,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_ticks
FROM ranked
GROUP BY user_id, bar_ts
""",
)
def ohlc_bars_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (entity, hour) the first/max/min/last
    value — the canonical tick→bar compression. Spark-first form:
    `min_by`/`max_by` on the (ts, event_id) struct picks open/close in
    the same aggregate as high/low — one pass, one shuffle, no window
    sort (the oracle's row_number form is the SQL-engine equivalent).

    open/close are RAW stored values (no arithmetic), so they're
    tie-free to compare; high/low are exact order statistics."""
    ev = load_table(spark, sf_dir, "events")
    order_key = F.struct("ts", "event_id")
    return (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bar_ts"))
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )


@query(
    "time_weighted_avg_daily",
    oracle="""
WITH seg AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id, day,
       count(*) AS n_events,
       floor(CAST(sum(CAST(value AS DECIMAL(18,6)) * dur_us) AS DOUBLE)
             / sum(dur_us) * 10000 + 0.5) / 10000 AS twa
FROM seg
WHERE dur_us IS NOT NULL AND dur_us > 0
GROUP BY user_id, day
""",
)
def time_weighted_avg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregular samples (the TimescaleDB
    `time_weight` shape): each observation is weighted by how long it
    was the latest value — sum(value_i * Δt_i) / sum(Δt_i) with
    Δt_i = gap to the next observation inside the (user, day) segment.
    The last observation of a day carries no weight (no successor),
    matching left-closed step interpolation.

    Determinism: Δt is exact integer microseconds and values snap to
    DECIMAL(18,6), so the weighted sum is order-free; the final
    quotient rounds via the floor form (catalog.round4f rationale).
    One shuffle on (user, day); LEAD is a partition-local sort."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seg = ev.select(
        "user_id",
        day.cast("date").alias("day"),
        "value",
        (F.lead(us).over(w) - us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return seg.groupBy("user_id", "day").agg(
        F.count("*").alias("n_events"),
        round4f(
            F.sum(dec6("value") * F.col("dur_us")).cast("double")
            / F.sum("dur_us")
        ).alias("twa"),
    )


@query(
    "gap_fill_locf_hourly",
    oracle="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT b.user_id, g.h AS hour_ts
  FROM bounds b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(h)
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
         max(CASE WHEN rn = 1 THEN value END) AS last_value
  FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) t
  GROUP BY user_id, date_trunc('hour', ts)
)
SELECT g.user_id, g.hour_ts,
       last_value(h.last_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
       h.last_value IS NOT NULL AS observed
FROM grid g LEFT JOIN hourly h USING (user_id, hour_ts)
""",
)
def gap_fill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward (the
    TimescaleDB `time_bucket_gapfill` + `locf` shape): materialize a
    dense hourly grid per entity between its first and last
    observation, then carry the latest hourly close forward across
    empty hours.

    Scale shape: the grid is generated with `sequence()` per entity
    (rows ∝ entities × hours — bounded by the time range, not event
    count), the hourly closes are a `max_by` aggregate, and LOCF is a
    partition-local `last(ignorenulls)` running window. One shuffle on
    the entity key. The carried value is a RAW stored value — tie-free
    across engines."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts"),
    )
    hourly = ev.groupBy("user_id", hour.alias("hour_ts")).agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value")
    )
    joined = grid.join(hourly, ["user_id", "hour_ts"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_ts",
        F.last("last_value", ignorenulls=True).over(w).alias("value_locf"),
        F.col("last_value").isNotNull().alias("observed"),
    )


ASOF_FWD_TOLERANCE_DAYS = 7


@query(
    "join_asof_forward_order",
    oracle=f"""
SELECT e.event_id, e.user_id, e.ts,
       (SELECT min(o.o_orderdate) FROM orders o
        WHERE o.o_custkey = e.user_id
          AND o.o_orderdate >= e.ts
          AND o.o_orderdate <= e.ts + INTERVAL {ASOF_FWD_TOLERANCE_DAYS} DAYS
       ) AS next_order_date
FROM events e
WHERE e.event_type = 'purchase'
""",
)
def join_asof_forward_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (pandas `merge_asof
    direction='forward'`): for each purchase event, the FIRST order of
    the same customer at-or-after the event, null if none lands within
    the tolerance. Completes the as-of matrix (backward form:
    join_asof_latest_order_before_event).

    Spark-first: union both tables as one time-ordered stream per user
    (orders sort after same-instant events) and take
    `first(order-time, ignorenulls)` over the strictly-following
    window frame — a single shuffle + sort, no join node, no
    per-event subquery. The correlated-subquery oracle is the
    SQL-engine equivalent (min over the future window)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id"),
            F.col("user_id").alias("uid"),
            F.col("ts").alias("t"),
            F.lit(0).alias("kind"),
            F.lit(None).cast("timestamp").alias("o_ts"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("kind"),
        F.col("o_orderdate").alias("o_ts"),
    )
    merged = ev.unionByName(orders)
    # Events sort before same-instant orders (kind 0 < 1), so the
    # strictly-following frame still sees an order at the exact event
    # time — matching the oracle's o_orderdate >= e.ts.
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.first("o_ts", ignorenulls=True).over(w)
    tol = F.col("t") + F.expr(f"INTERVAL {ASOF_FWD_TOLERANCE_DAYS} DAYS")
    return (
        merged.withColumn("_next", nxt)
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("t").alias("ts"),
            F.when(F.col("_next") <= tol, F.col("_next")).alias("next_order_date"),
        )
    )


EWMA_ALPHA = 0.2


@query(
    "ewma_user_value",
    oracle="""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
r AS (
  SELECT user_id, event_id, value, rn, value AS y FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.value, s.rn,
         0.2 * s.value + 0.8 * r.y
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT event_id, user_id, value,
       floor(y * 10000 + 0.5) / 10000 AS ewma
FROM r
""",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of `value` per user in
    event-time order — the standard smoothing/trend signal
    (y_i = α·x_i + (1−α)·y_{i-1}, adjust=False seed y_0 = x_0).

    ORACLE-BACKED as of r12 (VERDICT r11 #4): the recursion IS
    SQL-expressible as a recursive CTE stepping one row-number level
    per iteration (DuckDB's working table holds each level's frontier,
    so an iteration is one equi-join per level — depth = the longest
    per-user sequence, never the row count). Float agreement is by
    CONSTRUCTION, not luck: the kernel below evaluates literally
    ``α·x + β·y`` (two IEEE-double multiplies + one add, β = 1−α = 0.8
    exactly) — the same three ops, same order, same 0.2/0.8 doubles as
    the CTE's ``0.2*value + 0.8*y`` — replacing pandas'
    ``ewm(adjust=False)``, whose running-weight division form drifts
    from the direct recursion at the ulp level. Both sides round
    through the shared floor(·10⁴+0.5) form as final defense.

    Implementation: one hash shuffle on user_id into an Arrow-batched
    ``applyInPandas``; the per-group recursion is a Python loop over
    the group's numpy column (inherently sequential — no vector form
    without the underflowing power-sum rewrite). State is nothing (the
    kernel sees the whole key group); the streaming twin of this shape
    would carry (y, ts) per key like anomaly_stream_zscore carries
    Welford triples.
    """
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "value"
    )
    alpha = EWMA_ALPHA
    beta = 1.0 - EWMA_ALPHA

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        vals = pdf["value"].to_numpy(dtype=np.float64)
        out = np.empty(len(vals), dtype=np.float64)
        y = 0.0
        for i in range(len(vals)):
            x = float(vals[i])
            y = x if i == 0 else alpha * x + beta * y
            out[i] = y
        pdf = pdf.assign(ewma=out)
        return pdf[["event_id", "user_id", "value", "ewma"]]

    raw = ev.groupBy("user_id").applyInPandas(
        kernel, "event_id LONG, user_id LONG, value DOUBLE, ewma DOUBLE"
    )
    return raw.select(
        "event_id", "user_id", "value", round4f(F.col("ewma")).alias("ewma")
    )


@query(
    "scd2_user_value_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, value, ts, event_id,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_value
  FROM events
),
changes AS (
  SELECT user_id, value, ts, event_id FROM ordered
  WHERE prev_value IS NULL OR value <> prev_value
)
SELECT user_id, value, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM changes
""",
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history build — the warehouse
    twin of the KTable changelog ([R] a KTable materializes only the
    LATEST value per key; SCD2 retains every distinct state with its
    validity interval, which is what the versioned store's as-of read
    serves point-wise). From the event changelog: collapse consecutive
    equal values per key (change detection via LAG), then each change
    opens an interval [valid_from, valid_to) closed by the next change
    (LEAD), the open interval flagged ``is_current``.

    Values are RAW stored doubles (no arithmetic), so cross-engine
    equality of the change predicate is bit-exact; timestamps pass
    through untouched.

    Plan: ONE hash exchange on user_id shared by both windows (the
    LEAD runs on the filtered change set under the same partitioning,
    so Catalyst reuses the exchange — no second shuffle). At 100 TB
    this is the per-entity ordered-processing shape: state per task is
    one partition's sort run, and the output is bounded by the number
    of VALUE CHANGES, not events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "value", "ts", "event_id",
        F.lag("value").over(w).alias("prev_value"),
    )
    changes = ordered.filter(
        F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value"))
    )
    valid_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )
