"""Window functions, sort/limit, set ops (SURVEY.md §2.7).

No Kafka Streams analog (SQL-parity surface) except that ranking/lag
over per-key ordered history is what a KS Processor with a key-value
store would hand-roll. All single-shuffle operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dec6, load_table, round4f
from .windows import SESSION_GAP_MINUTES
from ..registry import query


def _global_row_number(
    df: DataFrame,
    order_cols: list,
    with_total: bool = True,
    driver_offsets: bool = False,
) -> DataFrame:
    """Two-phase global row_number — the scale-safe replacement for an
    unpartitioned ``Window.orderBy`` (which moves ALL rows to one
    partition; VERDICT r1 flagged it).

    Phase 1: ``repartitionByRange`` on the sort key gives globally
    ordered partition ranges; a partition-local window computes local
    row numbers in parallel. Phase 2: per-partition counts (one row per
    partition — bounded by cluster size, not data size) turn into
    cumulative offsets via a tiny self-join (no window, so no
    single-partition WindowExec at any scale), broadcast back, and
    ``global_rn = local_rn + offset``. Total row count rides along as
    ``_n`` for ntile / percent_rank / cume_dist arithmetic.

    The range exchange feeding both the ranked rows and the counts is
    deduplicated by ReuseExchange, so the input is shuffled once.

    Deliberately NOT localCheckpoint-ed (r8 A/B probe): checkpointing
    `part` here pins one materialization for the broadcast branches
    (offsets/total re-execute their subplan otherwise), but it also
    breaks whole-stage pipelines and materializes the FULL ranked
    frame — rfm_segments at 1000× measured 202.4 s checkpointed vs
    71.4 s not, same box. When the caller's UPSTREAM is the expensive
    part (a 100M-row scan + aggregate), the caller should checkpoint
    its own small input frame instead (spend_decile_migration does);
    range-boundary determinism across in-job re-executions comes from
    RangePartitioner's fixed-seed sketch over identical input.
    """
    part = df.repartitionByRange(*order_cols).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = part.withColumn("_lrn", F.row_number().over(w))
    if driver_offsets:
        # Driver-side offsets (r12, VERDICT r11 #2): the per-partition
        # counts are BOUNDED BY PARTITION COUNT (cluster-sized, never
        # data-sized), so collecting them is the same class of bounded
        # collect the repo already allows for bucket-id lists. The
        # cumulative offsets and the total then fold into LITERALS —
        # phase 2 becomes pure projection: no offsets self-join, no
        # broadcast exchange, no SinglePartition total reduction. Costs
        # one extra job over the ranged frame (no cross-job stage
        # reuse), which A/B-measured cheaper than the three broadcast
        # branches for small post-agg inputs (rank_users_by_spend
        # min-of-5: 0.93 vs 1.14 s at sf0.1); heavy-upstream callers
        # (rfm at 1000×) keep the join form, where the extra job would
        # re-execute an expensive scan. Determinism across the two
        # jobs: RangePartitioner's fixed-seed sketch over identical
        # input yields identical boundaries (same property the
        # broadcast branches already relied on).
        cnt = {
            r["_pid"]: r["_c"]
            for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
        }
        n_parts = (max(cnt) + 1) if cnt else 0
        offs, acc = [], 0
        for pid in range(n_parts):
            offs.append(acc)
            acc += cnt.get(pid, 0)
        off_arr = F.array(*[F.lit(o) for o in offs]) if offs else F.array(F.lit(0))
        ranked = local.withColumn(
            "_rn",
            (F.col("_lrn") + F.element_at(off_arr, F.col("_pid") + 1)).cast("long"),
        )
        if not with_total:
            return ranked
        return ranked.withColumn("_n", F.lit(acc).cast("long"))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    c2 = counts.select(F.col("_pid").alias("_pid2"), F.col("_cnt").alias("_cnt2"))
    offsets = (
        counts.join(c2, F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_cnt2"), F.lit(0)).alias("_offset"))
    )
    ranked = local.join(F.broadcast(offsets), "_pid").withColumn(
        "_rn", (F.col("_lrn") + F.col("_offset")).cast("long")
    )
    if not with_total:
        # Callers that only need _rn (contiguous ids, sharding) skip the
        # scalar total — its reduction is the one SinglePartition
        # exchange in this plan, and their plan tests pin its absence.
        return ranked
    total = counts.agg(F.sum("_cnt").alias("_n"))
    return ranked.crossJoin(F.broadcast(total))


@query(
    "rank_users_by_spend",
    oracle="""
SELECT user_id,
       CAST(round(spend, 4) AS DOUBLE) AS spend,
       row_number() OVER (ORDER BY spend DESC, user_id) AS spend_rank,
       ntile(10) OVER (ORDER BY spend DESC, user_id) AS spend_decile
FROM (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS spend
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id
) t
""",
)
def rank_users_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: ranking functions over an aggregate, via two-phase global
    rank (`_global_row_number`) — distributed at any scale, no
    single-partition WindowExec. ntile(10) is computed arithmetically
    from (global_rn, n) with the standard SQL bucket split: the first
    n mod 10 buckets get floor(n/10)+1 rows."""
    spend = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec6("value")).alias("spend"))
    )
    ranked = _global_row_number(
        spend, [F.desc("spend"), F.asc("user_id")], driver_offsets=True
    )
    rn, n = F.col("_rn"), F.col("_n")
    base = F.floor(n / 10).cast("long")
    rem = (n % 10).cast("long")
    big = rem * (base + 1)  # rows living in the (base+1)-sized buckets
    decile = F.when(rn <= big, F.ceil(rn / (base + 1))).otherwise(
        rem + F.ceil((rn - big) / F.greatest(base, F.lit(1)))
    )
    return ranked.select(
        "user_id",
        F.round("spend", 4).cast("double").alias("spend"),
        rn.cast("int").alias("spend_rank"),
        decile.cast("int").alias("spend_decile"),
    )


@query(
    "rank_distribution_functions",
    oracle="""
SELECT user_id,
       CAST(round(spend, 4) AS DOUBLE) AS spend,
       floor(percent_rank() OVER (ORDER BY spend, user_id) * 10000 + 0.5) / 10000
         AS spend_pct_rank,
       floor(cume_dist() OVER (ORDER BY spend, user_id) * 10000 + 0.5) / 10000
         AS spend_cume_dist
FROM (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS spend
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
) t
""",
)
def rank_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1b: distribution window functions via two-phase global rank.
    The ORDER BY key (spend, user_id) is unique per row, so
    rank == row_number, percent_rank == (rn-1)/(n-1) and
    cume_dist == rn/n — exact integer ratios, engine-stable, computed
    without a single-partition window."""
    spend = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec6("value")).alias("spend"))
    )
    ranked = _global_row_number(
        spend, [F.asc("spend"), F.asc("user_id")], driver_offsets=True
    )
    rn, n = F.col("_rn"), F.col("_n")
    pct = F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0))
    return ranked.select(
        "user_id",
        F.round("spend", 4).cast("double").alias("spend"),
        round4f(pct).alias("spend_pct_rank"),
        round4f(rn / n).alias("spend_cume_dist"),
    )


@query(
    "first_last_event_per_user",
    oracle="""
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       first_value(ts) OVER w AS first_ts,
       last_value(ts) OVER w AS last_ts
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def first_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2b: first_value / last_value with an unbounded frame — each
    user's entry and exit event (deterministic tiebreak on event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.first("ts").over(w).alias("first_ts"),
        F.last("ts").over(w).alias("last_ts"),
    ).distinct()


@query(
    "lead_next_event_gap",
    oracle="""
SELECT event_id, user_id,
       lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id,
       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) AS gap_to_next_us
FROM events
""",
)
def lead_next_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2c: LEAD — forward-looking twin of lag_time_between_events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.lead(us).over(w) - us).alias("gap_to_next_us"),
    )


@query(
    "lag_time_between_events",
    oracle="""
SELECT event_id, user_id, ts,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
""",
)
def lag_time_between_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: LAG — inter-event gap per user in exact microseconds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id", "user_id", "ts", (us - F.lag(us).over(w)).alias("gap_us")
    )


@query(
    "running_total_by_user",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(round(sum(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  4) AS DOUBLE) AS running_value
FROM events
""",
)
def running_total_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: frame-spec aggregate — running total per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum(dec6("value")).over(w), 4).cast("double").alias("running_value"),
    )


TOPK = 20


@query(
    "topk_products_by_revenue",
    oracle=f"""
SELECT p.p_partkey, p.p_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name
ORDER BY revenue DESC, p_partkey
LIMIT {TOPK}
""",
)
def topk_products_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: global top-k — orderBy().limit() compiles to
    TakeOrderedAndProject (per-partition heap + driver merge of k rows;
    no global sort shuffle). Ordering on the ROUNDED measure with a key
    tiebreak keeps the cut deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Aggregate the fact table FIRST (shuffle carries one row per part,
    # not one per lineitem), then broadcast-join the dimension — the
    # join-order that survives a 100× fact-table scale-up.
    revenue_by_part = (
        li.groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return (
        revenue_by_part.join(F.broadcast(part), revenue_by_part.l_partkey == part.p_partkey)
        .select("p_partkey", "p_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(TOPK)
    )


@query(
    "set_intersect_buyers_viewers",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'view'
""",
)
def set_intersect_buyers_viewers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6b: INTERSECT (distinct) — users who both viewed and bought."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    return buyers.intersect(viewers)


@query(
    "set_except_all_view_surplus",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_except_all_view_surplus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6c: EXCEPT ALL (multiset difference) — one surviving row per
    view a user made beyond their purchase count; duplicates carry
    meaning, unlike the distinct EXCEPT."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.exceptAll(purchases)


@query(
    "set_except_inactive_users",
    oracle="""
SELECT DISTINCT user_id FROM events
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_except_inactive_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6: EXCEPT (distinct) — users who never purchased."""
    ev = load_table(spark, sf_dir, "events")
    all_users = ev.select("user_id").distinct()
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return all_users.subtract(purchasers)


# ---------------------------------------------------------------------------
# Rolling time-range distinct aggregation.
# ---------------------------------------------------------------------------

ROLLING_DAYS = 7


@query(
    "rolling_distinct_users_7d",
    oracle=f"""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day AS day, count(DISTINCT u.user_id) AS users_7d
FROM days d JOIN du u ON u.day BETWEEN d.day - {ROLLING_DAYS - 1} AND d.day
GROUP BY d.day
""",
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 widening: trailing-7-day distinct active users per day — the
    rolling-retention metric COUNT(DISTINCT) OVER a RANGE frame cannot
    express in Spark (distinct aggregates are unsupported in windows).

    Scale shape: instead of a range join (days x events theta-join),
    dedup to (day, user) pairs first — bounded by active-users x days —
    then each pair fans out to the <=7 report days it contributes to
    via a JVM-side sequence explode, and one groupBy(day) counts
    distinct users. Shuffles on day; fan-out is a constant factor, and
    the final semi-join keeps only days that actually occur (a trailing
    window must not invent empty report days past the horizon).
    """
    du = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    fanned = du.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), ROLLING_DAYS - 1)
            )
        ).alias("day"),
        "user_id",
    )
    return (
        fanned.join(du.select("day").distinct(), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


@query(
    "third_event_per_user",
    oracle="""
SELECT DISTINCT user_id,
       nth_value(event_id, 3) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS third_event_id
FROM events
""",
)
def third_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 widening: nth_value — the n-th event in each user's ordered
    history (NULL for users with fewer). Deterministic order: (ts,
    event_id). Single shuffle on user_id; frame must be the full
    partition or nth_value degrades to a running variant.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id", F.nth_value("event_id", 3).over(w).alias("third_event_id")
        )
        .distinct()
    )


@query(
    "agg_mode_median_by_type",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY event_type, user_id
),
m AS (
  SELECT event_type, user_id AS mode_user,
         row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS rn
  FROM c
)
SELECT e.event_type,
       max(m.mode_user) AS mode_user,
       round(median(e.value), 4) AS median_value
FROM events e JOIN m ON e.event_type = m.event_type AND m.rn = 1
GROUP BY e.event_type
""",
)
def agg_mode_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family widening: deterministic MODE (most frequent user per
    event type, ties → smallest user_id — built-in mode() is
    tie-nondeterministic, so we spell it out) and exact interpolated
    MEDIAN. Mode rides a two-level map-side-combinable count +
    max_by(user, (n, -user)); median is one percentile pass. Both
    shuffle bounded by group cardinality.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    mode = counts.groupBy("event_type").agg(
        F.max_by("user_id", F.struct(F.col("n"), (-F.col("user_id")).alias("nu"))).alias(
            "mode_user"
        )
    )
    med = ev.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("median_value")
    )
    return mode.join(med, "event_type").select(
        "event_type", "mode_user", "median_value"
    )


# ---------------------------------------------------------------------------
# Sequential funnel analysis (view -> click -> purchase).
# ---------------------------------------------------------------------------


@query(
    "funnel_view_click_purchase",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
),
steps AS (
  SELECT 1 AS step_no, '1_view' AS step, count(*) AS n_users FROM v
  UNION ALL
  SELECT 2, '2_click_after_view', count(*) FROM c
  UNION ALL
  SELECT 3, '3_purchase_after_click', count(*) FROM p
)
SELECT step_no, step, n_users,
       floor(CAST(n_users AS DOUBLE)
             / nullif(lag(n_users) OVER (ORDER BY step_no), 0)
             * 10000 + 0.5) / 10000 AS conv_from_prev
FROM steps
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel — for each user, the first 'view',
    the first 'click' STRICTLY AFTER that view, and the first 'purchase'
    strictly after that click; reports users reaching each step and the
    step-over-step conversion rate. The order constraint is what makes
    this a funnel rather than three set intersections (a click before
    the first view does not count).

    Scale shape: each step is a groupBy(user_id) min over a
    predicate-pruned scan (event_type pushed to parquet), then an
    equi-join to the previous step's (user_id, ts) frame — all three
    steps hash-partition on user_id, so AQE/ReuseExchange co-locates
    the chain with ONE logical partitioning and the join inputs are
    one-row-per-user frames, never raw events. The 3-row funnel summary
    uses an unpartitioned lag, which is safe because the frame is
    exactly n_steps rows (bounded by funnel definition, not data).
    """
    ev = load_table(spark, sf_dir, "events")

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _step(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(no).alias("step_no"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )

    steps = (
        _step(v, 1, "1_view")
        .unionByName(_step(c, 2, "2_click_after_view"))
        .unionByName(_step(p, 3, "3_purchase_after_click"))
    )
    w = Window.orderBy("step_no")
    conv = F.col("n_users").cast("double") / F.nullif(
        F.lag("n_users").over(w), F.lit(0)
    )
    return steps.select(
        "step_no", "step", "n_users", round4f(conv).alias("conv_from_prev")
    )


@query(
    "cohort_weekly_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(datediff('day', f.cohort_week,
                       CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT)
           AS week_offset
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
),
counts AS (
  SELECT cohort_week, week_offset, count(*) AS n_active
  FROM activity GROUP BY cohort_week, week_offset
)
SELECT cohort_week, week_offset, n_active,
       floor(CAST(n_active AS DOUBLE)
             / first_value(n_active) OVER (PARTITION BY cohort_week ORDER BY week_offset)
             * 10000 + 0.5) / 10000 AS retention
FROM counts
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — users grouped by first-seen week, with
    the share still active N weeks later: the canonical product-health
    rollup (and, for a training-data pipeline, the crawl-freshness view
    of how much of each ingest cohort is still contributing events).

    week_offset is integer weeks between Monday-truncated dates, so the
    whole matrix is integer arithmetic — no float-determinism exposure
    except the final ratio, which uses the floor-rounded quotient form.
    The offset-0 row is every cohort's own size (a user's first event is
    by construction in their cohort week), so the denominator comes from
    first_value over the cohort partition — no self-join.

    Scale shape: one user_id shuffle for first-seen, one join back on
    user_id (co-partitioned with the aggregate), then the DISTINCT and
    count collapse to (cohort, offset) — output is weeks x offsets, thousands
    of rows at any corpus size. The retention window partitions by
    cohort_week (bounded by calendar weeks), never a single partition.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    counts = activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return counts.select(
        "cohort_week",
        "week_offset",
        "n_active",
        round4f(
            F.col("n_active").cast("double") / F.first("n_active").over(w)
        ).alias("retention"),
    )


ZSCORE_MIN_EVENTS = 10
ZSCORE_THRESHOLD = 3.0


@query(
    "anomaly_value_zscore",
    oracle=f"""
WITH stats AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              AS DOUBLE) AS s2
  FROM events GROUP BY user_id
),
scored AS (
  SELECT e.event_id, e.user_id, e.value,
         (e.value - s.s1 / s.n)
           / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS z
  FROM events e JOIN stats s ON e.user_id = s.user_id
  WHERE s.n >= {ZSCORE_MIN_EVENTS}
    AND (s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1) > 0
)
SELECT event_id, user_id, value,
       floor(z * 10000 + 0.5) / 10000 AS zscore
FROM scored
WHERE abs(z) > {ZSCORE_THRESHOLD}
""",
)
def anomaly_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring/outlier detection: events whose value deviates more
    than {threshold} sigma from the SAME USER's own distribution (per-key
    baselines, not a global cutoff — a whale user's normal purchase is
    not an anomaly, a bot's sudden spike is). Users with fewer than
    ZSCORE_MIN_EVENTS events or zero variance are skipped: no baseline,
    no verdict.

    Float determinism: per-user sum and sum-of-squares go through exact
    DECIMAL(18,6) (order-free), are cast to double ONCE, and everything
    after (mean, variance, sqrt, z) is the identical IEEE expression on
    both engines — sqrt is correctly rounded per IEEE-754, so no 1-ulp
    divergence anywhere; the published z uses the floor-rounded form.

    Scale shape: one hash aggregate on user_id, stats joined back on the
    same partitioning (co-located; AQE reuses the exchange), flagged
    rows only in the output. At 100 TB the stats side is one row per
    user — orders of magnitude smaller than events — and could be
    broadcast outright below the driver's hint threshold.
    """
    ev = load_table(spark, sf_dir, "events")
    d = dec6("value")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(var)
    return (
        ev.join(stats, "user_id")
        .filter((F.col("n") >= ZSCORE_MIN_EVENTS) & (var > 0))
        .filter(F.abs(z) > ZSCORE_THRESHOLD)
        .select("event_id", "user_id", "value", round4f(z).alias("zscore"))
    )


MAU_DAYS = 28


@query(
    "dau_mau_stickiness",
    oracle=f"""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
mau AS (
  SELECT d.day AS day, count(DISTINCT u.user_id) AS mau
  FROM days d JOIN du u ON u.day BETWEEN d.day - {MAU_DAYS - 1} AND d.day
  GROUP BY d.day
)
SELECT dau.day AS day,
       CAST(dau AS BIGINT) AS dau,
       CAST(mau AS BIGINT) AS mau,
       floor(CAST(dau AS DOUBLE) / mau * 10000 + 0.5) / 10000 AS stickiness
FROM dau JOIN mau USING (day)
ORDER BY day
""",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-engagement stickiness: per day, DAU, trailing-28-day
    MAU, and DAU/MAU — the classic retention-health ratio next to the
    cohort grid (`cohort_weekly_retention`) and the 7-day rolling
    actives.

    Scale shape: same fan-out discipline as rolling_distinct_users_7d —
    dedup to (day, user) first (active-users × days bounded), explode
    each pair to the ≤28 report days it serves, one groupBy(day)
    distinct count; the days×events theta-join the oracle writes never
    appears. DAU rides the same (day, user) frame for free; the ratio
    is floor-form."""
    du = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .cache()
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    fanned = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), MAU_DAYS - 1))
        ).alias("day"),
        "user_id",
    )
    mau = (
        fanned.join(du.select("day").distinct(), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            round4f(F.col("dau").cast("double") / F.col("mau")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@query("dau_mau_stickiness_hll")  # rows-only: HLL estimates are sketch-specific
def dau_mau_stickiness_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB production form of `dau_mau_stickiness` (r7, VERDICT
    r6 #7): ONE mergeable HLL sketch per day, unioned over the trailing
    28-day window. The exact form's fan-out is (day, user) pairs × 28
    — linear but with a 28× constant on active-user volume (100× probe
    15.1 s); here the 28× fan-out applies to DAYS × sketch-bytes, so
    the per-window union work is calendar-bounded no matter how many
    users exist. Relative error vs the exact query is pinned < 5% in
    tests (HLL lgConfigK=12 ≈ 1.6% std error) — the estimate trades a
    bounded bias for shuffle volume, the standard sketch contract
    (same discipline as agg_hll_mergeable_daily, which pins weekly
    roll-ups of the identical sketch column)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk")).cache()
    days = daily.select("day")
    dau = daily.select("day", F.hll_sketch_estimate("sk").alias("dau_est"))
    fanned = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), MAU_DAYS - 1))
        ).alias("day"),
        "sk",
    )
    mau = (
        fanned.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("mau_est"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau_est",
            "mau_est",
            round4f(
                F.col("dau_est").cast("double") / F.col("mau_est")
            ).alias("stickiness_est"),
        )
        .orderBy("day")
    )


CHURN_IDLE_DAYS = 7


@query(
    "cohort_churn_rate",
    oracle=f"""
WITH span AS (SELECT max(ts) AS tmax FROM events),
ul AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY user_id
)
SELECT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN last_ts <= tmax - INTERVAL {CHURN_IDLE_DAYS} DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS churned_users,
       floor(CAST(sum(CASE WHEN last_ts <= tmax - INTERVAL {CHURN_IDLE_DAYS} DAY
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000 AS churn_rate
FROM ul, span
GROUP BY 1
ORDER BY 1
""",
)
def cohort_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn by signup cohort — the complement of
    `cohort_weekly_retention`: a user counts as churned when their LAST
    event is at least {CHURN_IDLE_DAYS} days before the corpus horizon
    (the observable-inactivity definition that avoids right-censoring
    newer users less than older ones within the same cohort snapshot).

    Scale shape: one key-bounded (first_ts, last_ts) aggregate, the
    horizon as a broadcast scalar, cohort-week-bounded output."""
    ev = load_table(spark, sf_dir, "events")
    span = F.broadcast(ev.agg(F.max("ts").alias("tmax")))
    ul = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    churned = F.sum(
        F.when(
            F.col("last_ts")
            <= F.col("tmax") - F.expr(f"INTERVAL {CHURN_IDLE_DAYS} DAYS"),
            1,
        ).otherwise(0)
    ).cast("long")
    return (
        ul.crossJoin(span)
        .groupBy(F.to_date(F.date_trunc("week", "first_ts")).alias("cohort_week"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            churned.alias("churned_users"),
        )
        .select(
            "cohort_week",
            "n_users",
            "churned_users",
            round4f(
                F.col("churned_users").cast("double") / F.col("n_users")
            ).alias("churn_rate"),
        )
        .orderBy("cohort_week")
    )


PARETO_SHARE = 0.8


@query(
    "revenue_pareto_point",
    oracle=f"""
WITH spend AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS s
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
pv AS (SELECT s, count(*) AS nu, sum(s) AS tot FROM spend GROUP BY s),
g AS (SELECT sum(nu) AS total_users, sum(tot) AS grand FROM pv),
c AS (
  SELECT s,
         sum(nu) OVER (ORDER BY s DESC) AS cu,
         sum(tot) OVER (ORDER BY s DESC) AS ct
  FROM pv
)
SELECT CAST(g.total_users AS BIGINT) AS total_users,
       CAST(min(c.cu) AS BIGINT) AS users_to_share,
       floor(CAST(min(c.cu) AS DOUBLE) / g.total_users * 10000 + 0.5) / 10000
         AS user_frac
FROM c, g
WHERE CAST(c.ct AS DOUBLE) >= {PARETO_SHARE} * CAST(g.grand AS DOUBLE)
GROUP BY g.total_users
""",
)
def revenue_pareto_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 point): the smallest number of
    top-spending users whose cumulative purchase value reaches
    {PARETO_SHARE:.0%} of total revenue, and the user fraction that is
    — the Lorenz-curve summary a mixture/curation budget reads.

    Scale shape: per-user spends collapse to DISTINCT spend values
    (value-bounded) and the descending cumulative sums run on the
    checkpointed two-phase CDF (the KS-drift discipline — one
    materialized range partitioning, no data-sized window). The
    crossing point is computed per VALUE GROUP in both engines, so
    ties at the boundary cannot split differently. DECIMAL sums keep
    the cumulative arithmetic exact until the final share comparison,
    which both engines evaluate on identical doubles."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec6("value")).alias("s"))
    )
    pv = spend.groupBy("s").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("s").alias("tot")
    )
    part = (
        pv.repartitionByRange(F.desc("s"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lu", F.sum("nu").over(w)).withColumn(
        "_lt", F.sum("tot").over(w)
    )
    counts = local.groupBy("_pid").agg(
        F.max("_lu").alias("_tu"), F.max("_lt").alias("_tt")
    )
    c2 = counts.select(
        F.col("_pid").alias("_pid2"),
        F.col("_tu").alias("_tu2"),
        F.col("_tt").alias("_tt2"),
    )
    offsets = (
        counts.join(c2, F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum("_tu2"), F.lit(0)).alias("_ou"),
            F.coalesce(F.sum("_tt2"), F.lit(0)).alias("_ot"),
        )
    )
    g = F.broadcast(
        counts.agg(
            F.sum("_tu").alias("total_users"), F.sum("_tt").alias("grand")
        )
    )
    cum = (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            (F.col("_lu") + F.col("_ou")).alias("cu"),
            (F.col("_lt") + F.col("_ot")).alias("ct"),
        )
        .crossJoin(g)
    )
    hit = cum.where(
        F.col("ct").cast("double")
        >= F.lit(PARETO_SHARE) * F.col("grand").cast("double")
    )
    return hit.groupBy("total_users").agg(
        F.min("cu").cast("long").alias("users_to_share"),
    ).select(
        F.col("total_users").cast("long").alias("total_users"),
        "users_to_share",
        round4f(
            F.col("users_to_share").cast("double") / F.col("total_users")
        ).alias("user_frac"),
    )


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
outs AS (SELECT prev_type, sum(n) AS n_out FROM trans GROUP BY prev_type)
SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
       floor(CAST(t.n AS DOUBLE) / o.n_out * 10000 + 0.5) / 10000 AS p
FROM trans t JOIN outs o USING (prev_type)
ORDER BY prev_type, next_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral Markov matrix: per user-journey step, the
    count and conditional probability of each (prev → next) event-type
    transition — the session-model statistic behind funnel diagnosis
    and synthetic-journey generation.

    Scale shape: ONE per-user window (partitioned on the natural key,
    never global), then two type-cardinality-bounded aggregates; the
    probability denominator joins back on the tiny per-type frame.
    The ≤|types|²-row transition frame is localCheckpoint-ed (r8 probe
    sweep for the revenue_mom_growth shape): the denominator rides to
    the join as a BROADCAST, and a BroadcastExchange subplan re-executes
    its whole child otherwise — un-pinned, the 100M-row lag-window
    pipeline ran TWICE (1000×: 202.0 → 139.6 s, same loaded box)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    outs = trans.groupBy("prev_type").agg(F.sum("n").alias("n_out"))
    return (
        trans.join(F.broadcast(outs), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            round4f(F.col("n").cast("double") / F.col("n_out")).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "weekly_active_growth",
    oracle="""
WITH wau AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM events GROUP BY 1
)
SELECT c.week, c.wau, p.wau AS prev_wau,
       floor(CAST(c.wau - p.wau AS DOUBLE) / p.wau * 10000 + 0.5) / 10000
         AS wow_growth
FROM wau c JOIN wau p ON c.week = p.week + INTERVAL 7 DAY
ORDER BY c.week
""",
)
def weekly_active_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week active-user growth — the top-line product metric
    beside DAU/MAU stickiness. First week drops (no predecessor), the
    ratio is floor-form.

    Scale shape: one distinct-count shuffle keyed (week, user), then a
    SELF-JOIN on week-minus-7-days over the calendar-bounded weekly
    frame — no window over a single partition (the lag() formulation
    would plan exactly that), so the growth step never funnels data
    through one task no matter the corpus size."""
    ev = load_table(spark, sf_dir, "events")
    wau = (
        ev.select(F.date_trunc("week", "ts").cast("date").alias("week"), "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        # lazy checkpoint: without it the self-join's broadcast side
        # re-executes the whole distinct-count pass (the r8 probe on
        # revenue_mom_growth measured the identical shape at 2x cost)
        .localCheckpoint(eager=False)
    )
    prev = wau.select(
        F.date_add("week", 7).alias("week"), F.col("wau").alias("prev_wau")
    )
    return (
        wau.join(prev, "week")
        .select(
            "week",
            "wau",
            "prev_wau",
            round4f(
                (F.col("wau") - F.col("prev_wau")).cast("double")
                / F.col("prev_wau")
            ).alias("wow_growth"),
        )
        .orderBy("week")
    )


def _grouped_value_cdf(collapsed: DataFrame, group: str, value: str) -> DataFrame:
    """(group, value, c) -> same frame + ``cum`` (running count within
    group in value order) via the checkpointed two-phase
    range-partitioned cumsum — the drift_report_ks_by_type /
    events_winsorized_stats skeleton. Parallelism follows the VALUE
    range split, never the group cardinality (a Window.partitionBy
    (group) would cap the whole query at #groups tasks); the
    localCheckpoint pins one materialized partitioning so the local
    cumsum and the offset counts cannot resample range boundaries
    independently (the r6 ReuseExchange hazard)."""
    part = (
        collapsed.repartitionByRange(group, value)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy(group, "_pid")
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lc", F.sum("c").over(w))
    counts = local.groupBy(group, "_pid").agg(F.max("_lc").alias("_t"))
    c2 = counts.select(
        F.col(group).alias("_g2"),
        F.col("_pid").alias("_pid2"),
        F.col("_t").alias("_tb"),
    )
    offsets = (
        counts.join(
            c2,
            (F.col("_g2") == F.col(group)) & (F.col("_pid2") < F.col("_pid")),
            "left",
        )
        .groupBy(group, "_pid")
        .agg(F.coalesce(F.sum("_tb"), F.lit(0)).alias("_o"))
    )
    return (
        local.join(F.broadcast(offsets), [group, "_pid"])
        .withColumn("cum", (F.col("_lc") + F.col("_o")).cast("long"))
        .drop("_pid", "_lc", "_o")
    )


@query(
    "inter_event_gap_stats",
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_us
  FROM events
),
r AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(max(cnt) AS BIGINT) AS n_gaps,
       CAST(sum(gap_us) // max(cnt) AS BIGINT) AS avg_gap_us,
       CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN gap_us END) AS BIGINT)
         AS median_gap_us
FROM r
GROUP BY event_type
ORDER BY event_type
""",
)
def inter_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics over each user's
    timeline: count, integer-division mean, and the discrete median
    (lower median — the smallest gap whose cumulative count reaches
    (n+1) DIV 2, identical to the oracle's row_number cut, with no
    interpolation arithmetic to diverge). All outputs exact µs ints.

    Scale shape: one per-user window for the lag (keyed shuffle), then
    the median via the value-collapsed grouped CDF
    (`_grouped_value_cdf`) — gaps collapse to (type, gap_us, c) first
    and the cumsum is range-partitioned on the VALUE, so parallelism
    never caps at event-type cardinality (the naive per-type rank
    window ran 24.9 s at the 100× probe on 5 tasks; this is the
    drift_report_ks_by_type shape instead)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        ev.select(
            "event_type",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    collapsed = g.groupBy("event_type", "gap_us").agg(
        F.count(F.lit(1)).alias("c")
    )
    # EVERYTHING downstream derives from the cdf frame: it is the
    # localCheckpoint-ed one (inside _grouped_value_cdf), so the
    # lag-window + collapse pipeline runs exactly once — computing
    # totals from `collapsed` instead re-ran that 100M-row pipeline
    # TWICE more (measured: ~85 s/pass at the 1000× probe, ~3× the
    # necessary cost).
    cdf = _grouped_value_cdf(collapsed, "event_type", "gap_us")
    totals = cdf.groupBy("event_type").agg(
        F.sum("c").alias("n_gaps"),
        F.sum(F.col("gap_us") * F.col("c")).alias("s"),
    )
    med = (
        cdf.join(F.broadcast(totals.select("event_type", "n_gaps")), "event_type")
        .where(F.col("cum") >= F.expr("(n_gaps + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("gap_us").alias("median_gap_us"))
    )
    return (
        totals.join(med, "event_type")
        .select(
            "event_type",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.expr("s div n_gaps").cast("long").alias("avg_gap_us"),
            F.col("median_gap_us").cast("long").alias("median_gap_us"),
        )
        .orderBy("event_type")
    )


@query(
    "attribution_last_touch",
    oracle="""
WITH tl AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_id
  FROM events
)
SELECT user_id, event_id AS purchase_id, last_view_id
FROM tl
WHERE event_type = 'purchase'
ORDER BY user_id, purchase_id
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is attributed to the same
    user's most recent PRIOR 'view' event (NULL when none exists) — the
    funnel join (funnel_view_click_purchase) answers 'did a path
    exist'; this answers 'which exact touchpoint gets credit', the
    marketing-attribution primitive.

    Scale shape: ONE per-user ordered window with an ignore-nulls
    last_value over the preceding frame — no self-join of views ×
    purchases (the theta-join formulation is quadratic per user). The
    deterministic (ts, event_id) order makes the credited view unique,
    so the output hashes identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "event_type",
            last_view.alias("last_view_id"),
        )
        .where(F.col("event_type") == "purchase")
        .select("user_id", "purchase_id", "last_view_id")
        # no trailing global sort (order-insensitive driver hash; an
        # event-level orderBy would be a second data-sized exchange)
    )


def _ntile_from_rank(rn, n, k: int):
    """SQL NTILE(k) from a (global rank, total) pair: n = k·q + r →
    the first r buckets take q+1 rows. Lets a two-phase global rank
    (`_global_row_number`) stand in for the single-partition window
    NTILE plans, with identical bucket assignment."""
    base = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    big = rem * (base + 1)
    return F.when(rn <= big, F.ceil(rn / (base + 1))).otherwise(
        rem + F.ceil((rn - big) / F.greatest(base, F.lit(1)))
    )


@query(
    "rfm_segments",
    oracle="""
WITH p AS (
  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
         count(*) AS freq,
         sum(CAST(value AS DECIMAL(18,6))) AS money
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
mx AS (SELECT max(last_day) AS d FROM p),
b AS (
  SELECT ntile(4) OVER (ORDER BY date_diff('day', last_day, mx.d), user_id)
           AS r_bucket,
         ntile(4) OVER (ORDER BY freq, user_id) AS f_bucket,
         ntile(4) OVER (ORDER BY money, user_id) AS m_bucket
  FROM p, mx
)
SELECT r_bucket, f_bucket, m_bucket, CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY r_bucket, f_bucket, m_bucket
ORDER BY r_bucket, f_bucket, m_bucket
""",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation —
    the classic customer-value grid, emitted as segment population
    counts (≤64 rows). Every quartile is assigned by NTILE(4) over the
    deterministic (metric, user_id) order, so bucket boundaries are
    identical on both engines.

    Scale shape: one per-user purchase aggregate, then THREE two-phase
    global ranks (`_global_row_number` — range-partitioned, no
    single-partition NTILE window at any scale) joined back on
    user_id; the segment rollup is 64-cell bounded. The oracle keeps
    the window formulation, which is the equivalence check."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # The per-user frame is consumed ~10x: the max-recency broadcast,
    # the crossJoin, and THREE rank pipelines each with two broadcast
    # offset/total branches — every broadcast subplan re-executes its
    # child, so un-pinned this re-ran the 100M-event scan + aggregate
    # per consumer (r8 probe: 95.6 → 35.1 s at 1000× on the same loaded box; the r7
    # quiet-box row was 33.7 s un-pinned — the caller-level checkpoint rule:
    # pin the small expensive frame, not the helper's full ranked frame).
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(dec6("value")).alias("money"),
        )
        .localCheckpoint(eager=False)
    )
    mx = F.broadcast(base.agg(F.max("last_day").alias("_maxd")))
    base = base.crossJoin(mx).withColumn(
        "rec_days", F.datediff("_maxd", "last_day")
    )

    def bucket(col: str, alias: str) -> DataFrame:
        ranked = _global_row_number(
            base.select("user_id", col), [F.asc(col), F.asc("user_id")]
        )
        return ranked.select(
            "user_id",
            _ntile_from_rank(F.col("_rn"), F.col("_n"), 4)
            .cast("int")
            .alias(alias),
        )

    seg = (
        bucket("rec_days", "r_bucket")
        .join(bucket("freq", "f_bucket"), "user_id")
        .join(bucket("money", "m_bucket"), "user_id")
    )
    return (
        seg.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


# bounce_rate_daily serves from the shared session_frame, so its gap IS
# the session gap — defined as an alias (not a copy) so editing either
# constant can't silently desynchronize the oracle from the frame.
from .windows import SESSION_GAP_MINUTES as BOUNCE_GAP_MIN  # noqa: E402


@query(
    "bounce_rate_daily",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {BOUNCE_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
per_sess AS (
  SELECT user_id, sid, min(ts) AS start_ts, count(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT CAST(start_ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000 AS bounce_rate
FROM per_sess
GROUP BY CAST(start_ts AS DATE)
ORDER BY day
""",
)
def bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate over gap-sessionized activity: sessions split
    where a user's inter-event gap exceeds {BOUNCE_GAP_MIN} minutes
    (the lag-flag-cumsum sessionization — the SQL-parity twin of the
    native session_window queries, which DuckDB cannot express); a
    single-event session is a bounce. The engagement-quality metric
    next to DAU/MAU and churn.

    Scale shape (r9, sessionize-once): the per-session frame comes
    from the persisted shared `session_frame` (BOUNCE_GAP_MIN ==
    SESSION_GAP_MINUTES, same lag-flag semantics — the per-user sort
    is paid once per fixture); the daily rollup is calendar-bounded.
    No global window anywhere."""
    from .windows import session_frame

    per_sess = session_frame(spark, sf_dir).select(
        F.col("session_start").alias("start_ts"), "n_events"
    )
    bounce = (F.col("n_events") == 1).cast("int")
    return (
        per_sess.groupBy(F.col("start_ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(bounce).cast("long").alias("n_bounces"),
            round4f(
                F.sum(bounce).cast("double") / F.count(F.lit(1))
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


@query(
    "inter_event_gap_stats_bucketed",
    # r13 oracle promotion (VERDICT r12 #8): "bucket-granular median"
    # is approximate relative to the EXACT median but fully
    # deterministic integer arithmetic — every output value (count,
    # integer-division mean, bucket-midpoint median) is engine-exact,
    # so DuckDB can mirror the computation bit-for-bit.
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
g2 AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
hist AS (
  SELECT event_type, gap_us // 1000000 AS sec, count(*) AS c, sum(gap_us) AS s
  FROM g2 GROUP BY 1, 2
),
cdf AS (
  SELECT event_type, sec, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY sec) AS cum
  FROM hist
),
totals AS (SELECT event_type, sum(c) AS n_gaps, sum(s) AS s FROM hist GROUP BY 1),
med AS (
  SELECT cdf.event_type, min(sec) * 1000000 + 500000 AS m
  FROM cdf JOIN totals USING (event_type)
  WHERE cum >= (n_gaps + 1) // 2
  GROUP BY 1
)
SELECT t.event_type, CAST(t.n_gaps AS BIGINT) AS n_gaps,
       CAST(t.s // t.n_gaps AS BIGINT) AS avg_gap_us,
       CAST(med.m AS BIGINT) AS median_gap_us_approx
FROM totals t JOIN med USING (event_type)
ORDER BY event_type
""",
)
def inter_event_gap_stats_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-scale twin of `inter_event_gap_stats` (the same
    trade the HLL DAU/MAU makes): gaps quantize to 1-SECOND buckets
    before the CDF, so the cumulative pass runs over at most
    max-gap-in-seconds rows per type instead of every distinct µs gap
    — the exact form's 1000× probe spent 253 s mostly cumsum-ing ~50M
    near-unique µs values. Count and mean stay EXACT (they ride the
    same bucket aggregate as exact integer sums); only the median is
    bucket-granular, reported as the bucket midpoint with error
    bounded by the bucket width (pinned <= 1 s vs the exact query in
    tests)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        ev.select(
            "event_type",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    hist = g.groupBy(
        "event_type", F.expr("gap_us div 1000000").alias("sec")
    ).agg(F.count(F.lit(1)).alias("c"), F.sum("gap_us").alias("s"))
    # totals derive from the checkpointed cdf frame (which carries the
    # extra s column through) — same single-pass discipline as the
    # exact query above.
    cdf = _grouped_value_cdf(hist, "event_type", "sec")
    totals = cdf.groupBy("event_type").agg(
        F.sum("c").alias("n_gaps"), F.sum("s").alias("s")
    )
    med = (
        cdf.join(F.broadcast(totals.select("event_type", "n_gaps")), "event_type")
        .where(F.col("cum") >= F.expr("(n_gaps + 1) div 2"))
        .groupBy("event_type")
        .agg(
            (F.min("sec") * 1_000_000 + 500_000).alias("median_gap_us_approx")
        )
    )
    return (
        totals.join(med, "event_type")
        .select(
            "event_type",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.expr("s div n_gaps").cast("long").alias("avg_gap_us"),
            F.col("median_gap_us_approx").cast("long").alias(
                "median_gap_us_approx"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "streak_longest_daily",
    oracle="""
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
isl AS (
  SELECT user_id,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS anchor
  FROM days
),
s AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id ORDER BY user_id
""",
)
def streak_longest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern [R the KS equivalent is a custom
    stateful Processor over a per-key store]: subtracting each active
    day's per-user row_number from the day itself collapses every
    consecutive run onto one anchor date, so streaks become a plain
    GROUP BY. Engagement/retention's standard companion metric.

    Scale shape: the distinct day grid is one hash aggregate; the
    row_number window partitions by user_id (key-cardinality
    parallelism, never single-partition); streak and per-user rollups
    are two more hash aggregates over user-day rows. All exact
    integers — nothing to round."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.sum("len").cast("long").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


@query(
    "activity_gini_by_type",
    oracle="""
WITH counts AS (
  SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY cnt) AS i
  FROM counts
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       FLOOR((2.0 * sum(i * cnt) / (count(*) * sum(cnt))
              - (count(*) + 1.0) / count(*)) * 10000 + 0.5) / 10000 AS gini
FROM ranked GROUP BY event_type ORDER BY event_type
""",
)
def activity_gini_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts within each event
    type — the engagement-inequality measure (0 = everyone equally
    active, →1 = all activity from one user). Formula: with per-user
    counts x_(1..n) ascending, G = 2·Σi·x_i/(n·Σx) − (n+1)/n.

    Scale shape: the rank-weighted sum needs a per-type ORDERED rank —
    the Window.partitionBy(5-value type) trap. Instead the counts are
    VALUE-COLLAPSED (distinct count value → #users at it) and run
    through the shared `_grouped_value_cdf`; a run of c tied users
    ending at cumulative position `cum` contributes
    value·c·(2·cum−c+1)/2 to Σi·x_i exactly (ties commute), so every
    term stays integer-exact and parallelism follows the value split.
    Only the final division is floating — round4f'd; its operands are
    exact sub-2^53 longs, so both engines divide identical doubles."""
    from ..catalog import round4f

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    collapsed = counts.groupBy(
        "event_type", F.col("cnt").alias("value")
    ).agg(F.count(F.lit(1)).alias("c"))
    cdf = _grouped_value_cdf(collapsed, "event_type", "value")
    terms = cdf.select(
        "event_type",
        F.expr("value * c * (2 * cum - c + 1) DIV 2").alias("w"),
        (F.col("value") * F.col("c")).alias("vx"),
        "c",
        "cum",
    )
    agg = terms.groupBy("event_type").agg(
        F.sum("w").alias("_W"),
        F.sum("vx").alias("_T"),
        F.max("cum").alias("_n"),
    )
    gini = (
        F.lit(2.0) * F.col("_W") / (F.col("_n") * F.col("_T"))
        - (F.col("_n") + F.lit(1.0)) / F.col("_n")
    )
    return agg.select(
        "event_type",
        F.col("_n").cast("long").alias("n_users"),
        F.col("_T").cast("long").alias("total_events"),
        round4f(gini).alias("gini"),
    ).orderBy("event_type")


@query(
    "cohort_time_to_first_purchase",
    oracle="""
WITH u AS (
  SELECT user_id, min(ts) AS first_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY user_id
)
SELECT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(fp) AS BIGINT) AS n_purchasers,
       CAST(sum(date_diff('day', CAST(first_ts AS DATE), CAST(fp AS DATE)))
            AS BIGINT) AS sum_days_to_first_purchase
FROM u GROUP BY cohort_week ORDER BY cohort_week
""",
)
def cohort_time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation latency by signup cohort: users grouped by the ISO
    week of their FIRST event, with how many ever purchased and the
    total whole-day lag from first touch to first purchase — the
    conversion-velocity readout next to cohort_weekly_retention's
    did-they-return one.

    Scale shape: ONE per-user hash aggregate (min + conditional min —
    map-side combinable), then a calendar-bounded cohort rollup. The
    lag is kept as an exact integer SUM (with the purchaser count
    alongside, the mean is one client-side division away) so nothing
    floats."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fp"),
    )
    return (
        per_user.groupBy(
            F.date_trunc("week", "first_ts").cast("date").alias("cohort_week")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count("fp").cast("long").alias("n_purchasers"),
            F.sum(
                F.datediff(F.to_date("fp"), F.to_date("first_ts"))
            ).cast("long").alias("sum_days_to_first_purchase"),
        )
        .orderBy("cohort_week")
    )


@query(
    "power_user_concentration",
    oracle="""
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
r AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, user_id) AS rn,
         count(*) OVER () AS n
  FROM c
)
SELECT CAST(max(n) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN rn <= ceil(n / 100.0) THEN 1 ELSE 0 END)
            AS BIGINT) AS top1pct_users,
       CAST(sum(CASE WHEN rn <= ceil(n / 100.0) THEN cnt ELSE 0 END)
            AS BIGINT) AS top1pct_events,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       FLOOR(CAST(sum(CASE WHEN rn <= ceil(n / 100.0) THEN cnt ELSE 0 END)
                  AS DOUBLE) / sum(cnt) * 10000 + 0.5) / 10000
         AS events_share
FROM r
""",
)
def power_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is activity in the top 1% of users — the
    whale-share number next to revenue_pareto_point's 80/20 answer
    (that one asks 'how many users make 80%'; this asks 'how much do
    the top ceil(n/100) make').

    Scale shape: per-user counts (one hash aggregate), then the
    two-phase `_global_row_number` rank by (count desc, user_id) — no
    single-partition window — and one bounded final aggregate. Counts
    and sums stay integer-exact; only the published share divides,
    through round4f on identical sub-2^53 operands."""
    from ..catalog import round4f

    ev = load_table(spark, sf_dir, "events")
    # caller-level pin (r8 broadcast-reexecution sweep): the rank's
    # offset/total broadcast branches would each re-run the full
    # events scan + aggregate otherwise
    counts = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    ranked = _global_row_number(counts, [F.desc("cnt"), F.asc("user_id")])
    cond = F.col("_rn") <= F.ceil(F.col("_n") / 100.0)
    agg = ranked.agg(
        F.max("_n").cast("long").alias("n_users"),
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("top1pct_users"),
        F.sum(F.when(cond, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("top1pct_events"),
        F.sum("cnt").cast("long").alias("total_events"),
    )
    return agg.select(
        "n_users",
        "top1pct_users",
        "top1pct_events",
        "total_events",
        round4f(
            F.col("top1pct_events").cast("double") / F.col("total_events")
        ).alias("events_share"),
    )


@query(
    "event_type_user_jaccard",
    oracle="""
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
tc AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b,
       CAST(i.n_both AS BIGINT) AS n_both,
       CAST(ta.n_users + tb.n_users - i.n_both AS BIGINT) AS n_union,
       FLOOR(CAST(i.n_both AS DOUBLE) / (ta.n_users + tb.n_users - i.n_both)
             * 10000 + 0.5) / 10000 AS jaccard
FROM inter i
JOIN tc ta ON ta.event_type = i.type_a
JOIN tc tb ON tb.event_type = i.type_b
ORDER BY i.type_a, i.type_b
""",
)
def event_type_user_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types as a Jaccard matrix (upper
    triangle): |users doing A ∩ users doing B| / |union| — the
    set-similarity rollup behind "do purchasers also error?" questions
    (set_intersect_buyers_viewers answers ONE pair as a row set; this
    scores every pair).

    Scale shape: the distinct (type, user) grid is one hash aggregate;
    the intersection is a USER-keyed self-join of that grid (each user
    contributes ≤|types|² pair rows — bounded fan-out, never a global
    pair join); totals re-aggregate the grid and broadcast. Counts
    exact; the single division is floor-form round4f over exact
    longs."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    # The per-type totals ride to the pair frame as BROADCASTS; without
    # the checkpoint each broadcast subplan re-executed the full
    # distinct-grid aggregate over raw events (r8 probe: 133.1 → 94.2 s
    # at 1000× on the same loaded box — the a/b join sides already
    # share the grid's exchange via ReuseExchange, only the totals
    # branch re-scanned).
    tc = (
        tu.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .localCheckpoint(eager=False)
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tc.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("na"))
    tb = tc.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("nb"))
    union = F.col("na") + F.col("nb") - F.col("n_both")
    return (
        inter.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            union.cast("long").alias("n_union"),
            round4f(F.col("n_both").cast("double") / union).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "customer_spend_percentile_by_nation",
    oracle="""
WITH s AS (
  SELECT c.c_custkey AS custkey, n.n_name AS nation,
         sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS spend
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT custkey, nation, CAST(spend AS DOUBLE) AS spend,
       FLOOR(percent_rank() OVER (PARTITION BY nation ORDER BY spend)
             * 10000 + 0.5) / 10000 AS spend_percentile
FROM s ORDER BY nation, custkey
""",
)
def customer_spend_percentile_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Each customer's spend percentile WITHIN their nation — the
    per-group percent_rank the oracle writes as a window. 25 nations is
    exactly the Window.partitionBy(low-cardinality) trap (25 tasks
    regardless of customer count), so the rank comes from the shared
    `_grouped_value_cdf` instead: percent_rank = (rank−1)/(n−1) with
    rank() ties-share-min semantics, and for a value run of c customers
    ending at cumulative position cum, rank−1 = cum−c exactly — the
    percentile joins back to customers BY VALUE, windows never appear,
    and parallelism follows the spend-value split.

    Scale shape: the spend rollup is the orders⋈customer FK join (dim
    nation broadcasts); the CDF runs over distinct (nation, spend)
    values; the percentile rejoin is value-keyed. All counts exact;
    the one division is floor-form round4f (percent_rank of a 1-row
    group is 0 by SQL convention, guarded)."""
    from ..catalog import dec6, round4f

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(dec6(F.col("o_totalprice"))).alias("spend_dec"))
    )
    collapsed = spend.groupBy(
        "nation", F.col("spend_dec").alias("value")
    ).agg(F.count(F.lit(1)).alias("c"))
    cdf = _grouped_value_cdf(collapsed, "nation", "value")
    totals = cdf.groupBy("nation").agg(F.max("cum").alias("n"))
    pct = (
        cdf.join(F.broadcast(totals), "nation")
        .select(
            F.col("nation").alias("p_nation"),
            F.col("value").alias("p_value"),
            F.when(
                F.col("n") > 1,
                round4f(
                    (F.col("cum") - F.col("c")).cast("double")
                    / (F.col("n") - 1)
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("spend_percentile"),
        )
    )
    return (
        spend.join(
            pct,
            (F.col("nation") == F.col("p_nation"))
            & (F.col("spend_dec") == F.col("p_value")),
        )
        .select(
            "custkey",
            "nation",
            F.col("spend_dec").cast("double").alias("spend"),
            "spend_percentile",
        )
        .orderBy("nation", "custkey")
    )


def _global_running_sum(df: DataFrame, order_col: str, val_col: str) -> DataFrame:
    """(order, val) -> same frame + ``run_sum`` (prefix sum of ``val``
    in ``order_col`` order) — the two-phase range-partitioned cumsum,
    SIGNED-VALUE variant of `_grouped_value_cdf`: per-partition totals
    come from ``sum(val)`` rather than ``max`` of the local running sum
    (a max-based total is only correct when every increment is
    non-negative; interval +1/−1 deltas are not).

    PRECONDITION: ``order_col`` values must be UNIQUE (one row per
    key). With duplicate keys the per-partition window orders ties
    arbitrarily, so each tied row's intermediate prefix sum is
    nondeterministic (only the last row of a tie-group is stable).
    Pre-aggregate to unique keys first — mirroring
    `_grouped_value_cdf`'s (group, value, c) contract — as
    `concurrent_sessions_hourly` does with its per-hour rollup.

    Parallelism follows
    the range split of ``order_col``; the localCheckpoint pins one
    materialized partitioning for the local-cumsum and totals branches
    (the r6 ReuseExchange-resampling hazard)."""
    part = (
        df.repartitionByRange(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lc", F.sum(val_col).over(w))
    totals = part.groupBy("_pid").agg(F.sum(val_col).alias("_t"))
    t2 = totals.select(F.col("_pid").alias("_pid2"), F.col("_t").alias("_tb"))
    offsets = (
        totals.join(t2, F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_tb"), F.lit(0)).alias("_o"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("run_sum", (F.col("_lc") + F.col("_o")).cast("long"))
        .drop("_pid", "_lc", "_o")
    )


@query(
    "new_vs_returning_daily",
    oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
fu AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY 1)
SELECT du.day,
       CAST(sum(CASE WHEN du.day = fu.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(sum(CASE WHEN du.day > fu.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM du JOIN fu ON du.user_id = fu.user_id
GROUP BY 1 ORDER BY 1
""",
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the acquisition-vs-retention
    decomposition of DAU (a user is "new" exactly on their first active
    day). [R the first-touch KTable a KS app keeps per key to classify
    each event against its earliest-seen timestamp.]

    Scale shape: the (day, user) grid is ONE distinct aggregate; the
    first-active-day comes from a user-keyed window over the grid
    (high-cardinality partition key — never the low-cardinality trap),
    so the classification never rescans raw events; the day rollup is
    calendar-bounded. All-integer output."""
    ev = load_table(spark, sf_dir, "events")
    grid = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    first = F.min("day").over(Window.partitionBy("user_id"))
    flagged = grid.withColumn("first_day", first)
    return (
        flagged.groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


@query(
    "revenue_mom_growth",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM orders GROUP BY 1
)
SELECT c.month,
       CAST(round(c.rev, 4) AS DOUBLE) AS revenue,
       CAST(round(p.rev, 4) AS DOUBLE) AS prev_revenue,
       floor(CAST(c.rev - p.rev AS DOUBLE) / CAST(p.rev AS DOUBLE)
             * 10000 + 0.5) / 10000 AS mom_growth
FROM m c JOIN m p ON c.month = CAST(p.month + INTERVAL 1 MONTH AS DATE)
ORDER BY c.month
""",
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — weekly_active_growth's pattern
    on the money stream: the previous month attaches via a month-
    shifted SELF-JOIN over the calendar-bounded monthly frame, never a
    lag() window (which would plan Exchange SinglePartition at any data
    size). First month drops (no predecessor).

    Determinism: monthly revenue is an exact DECIMAL(18,6) sum; the
    growth ratio divides the two decimals cast to double in the same
    order on both engines, then floor-form rounds.

    The monthly frame is localCheckpoint-ed (lazy): the self-join's
    broadcast side would otherwise RE-EXECUTE the full scan + decimal
    rollup (BroadcastExchange does not reuse the probe side's shuffle)
    — the r8 1000× probe measured the double pass at 53 s vs 14.5 s
    checkpointed on 15M orders, and at 100 TB it doubles the scan."""
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(F.sum(dec6("o_totalprice")).alias("rev"))
        .localCheckpoint(eager=False)
    )
    prev = rev.select(
        F.add_months("month", 1).alias("month"), F.col("rev").alias("prev")
    )
    return (
        rev.join(prev, "month")
        .select(
            "month",
            F.round("rev", 4).cast("double").alias("revenue"),
            F.round("prev", 4).cast("double").alias("prev_revenue"),
            round4f(
                (F.col("rev") - F.col("prev")).cast("double")
                / F.col("prev").cast("double")
            ).alias("mom_growth"),
        )
        .orderBy("month")
    )


@query(
    "customer_lifespan_buckets",
    oracle="""
WITH u AS (
  SELECT o_custkey,
         datediff('day', min(CAST(o_orderdate AS DATE)),
                  max(CAST(o_orderdate AS DATE))) AS span_days,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CASE WHEN span_days < 365 THEN '0_lt_1y'
            WHEN span_days < 730 THEN '1_1_2y'
            WHEN span_days < 1460 THEN '2_2_4y'
            ELSE '3_ge_4y' END AS lifespan_bucket,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM u GROUP BY 1 ORDER BY 1
""",
)
def customer_lifespan_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-span histogram: days between first and last
    order, bucketed into tenure bands — the lifecycle-stage rollup
    behind churn/LTV segmentation (cohort_churn_rate slices ONE
    boundary; this maps the whole tenure distribution).

    Scale shape: ONE customer-keyed hash aggregate (min, max, count) —
    the span is computed per customer inside the aggregate, then a
    4-bucket bounded rollup. All-integer; bucket labels are shared
    literals with the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    u = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.max(F.col("o_orderdate").cast("date")),
            F.min(F.col("o_orderdate").cast("date")),
        ).alias("span_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bucket = (
        F.when(F.col("span_days") < 365, "0_lt_1y")
        .when(F.col("span_days") < 730, "1_1_2y")
        .when(F.col("span_days") < 1460, "2_2_4y")
        .otherwise("3_ge_4y")
    )
    return (
        u.groupBy(bucket.alias("lifespan_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("lifespan_bucket")
    )


BASKET_PAIRS_TOP_K = 20


@query(
    "basket_part_pairs_top",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
FROM pairs ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_PAIRS_TOP_K}
""",
)
def basket_part_pairs_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the part pairs most often ordered
    together (the support counts feeding association rules). [R the
    pair-count KTable a KS app builds by re-keying each basket to its
    item pairs.]

    Scale shape: the ONLY self-join is keyed on l_orderkey, and the
    per-order distinct-part collapse runs first, so pair fan-out per
    order is C(k,2) of its DISTINCT parts (k ≤ 7 in TPC-H-shaped data —
    bounded, never a global pair grid); the distinct's exchange is
    REUSED by both join sides (one shuffle, two sorts); the pair count
    is map-side combined on (part_a, part_b) and the final top-k plans
    TakeOrderedAndProject, not a global sort. The tempting alternative
    — `collect_set` baskets + a higher-order pair-expansion expression
    (one aggregate, no join) — MEASURED WORSE at the r8 1000× probe
    (164.7 s vs 68.5 s on 60M lineitem: per-group array allocation +
    nested-lambda eval dominate), so the self-join form is the one
    that ships."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(BASKET_PAIRS_TOP_K)
    )


def _ntile_from_rank(rn, n, k: int):
    """SQL NTILE(k) computed arithmetically from a unique global rank
    and the total row count (the rank_users_by_spend formula): the
    first n mod k buckets get floor(n/k)+1 rows."""
    base = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    big = rem * (base + 1)
    return F.when(rn <= big, F.ceil(rn / (base + 1))).otherwise(
        rem + F.ceil((rn - big) / F.greatest(base, F.lit(1)))
    )


@query(
    "spend_decile_migration",
    oracle="""
WITH h1 AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS spend
  FROM events WHERE event_type = 'purchase' AND day(ts) <= 15
  GROUP BY 1
),
h2 AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS spend
  FROM events WHERE event_type = 'purchase' AND day(ts) > 15
  GROUP BY 1
),
d1 AS (SELECT user_id, ntile(10) OVER (ORDER BY spend DESC, user_id) AS dec1 FROM h1),
d2 AS (SELECT user_id, ntile(10) OVER (ORDER BY spend DESC, user_id) AS dec2 FROM h2)
SELECT d1.dec1 AS decile_h1, d2.dec2 AS decile_h2,
       CAST(count(*) AS BIGINT) AS n_users
FROM d1 JOIN d2 ON d1.user_id = d2.user_id
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def spend_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-migration matrix: each purchaser's spend decile in the
    first half of the month vs the second half — the churn-risk /
    upsell grid behind "are my top-decile customers sliding?". Users
    active in only one half drop (inner join), mirroring the retention
    convention.

    Scale shape: ONE scan — both halves' spends come from conditional
    decimal sums in the SAME user-keyed aggregate (a per-half filter +
    aggregate would read the events twice; the checkpointed two-column
    frame feeds both rank pipelines). Then two two-phase global ranks
    (`_global_row_number` — range exchange + broadcast offsets, never a
    single-partition NTILE window), deciles derived arithmetically from
    (rank, n), a user-keyed join of two user-sized frames and a
    ≤100-row bounded rollup. Spend is an exact decimal sum; everything
    published is integer."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    spend = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.dayofmonth("ts") <= 15, dec6("value"))).alias("s1"),
            F.sum(F.when(F.dayofmonth("ts") > 15, dec6("value"))).alias("s2"),
        )
        .localCheckpoint(eager=False)
    )
    halves = []
    for flag, col in (("h1", "s1"), ("h2", "s2")):
        half = spend.where(F.col(col).isNotNull()).select(
            "user_id", F.col(col).alias("spend")
        )
        ranked = _global_row_number(half, [F.desc("spend"), F.asc("user_id")])
        halves.append(
            ranked.select(
                "user_id",
                _ntile_from_rank(F.col("_rn"), F.col("_n"), 10)
                .cast("int")
                .alias(f"decile_{flag}"),
            )
        )
    return (
        halves[0]
        .join(halves[1], "user_id")
        .groupBy("decile_h1", "decile_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("decile_h1", "decile_h2")
    )


@query(
    "clv_quartiles_by_nation",
    oracle="""
WITH clv AS (
  SELECT c_nationkey, c_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS v
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT c_nationkey, v,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM clv
)
SELECT n_name AS nation,
       CAST(max(n) AS BIGINT) AS n_customers,
       CAST(min(CASE WHEN 4 * rn >= n THEN v END) AS DOUBLE) AS clv_q1,
       CAST(min(CASE WHEN 2 * rn >= n THEN v END) AS DOUBLE) AS clv_median,
       CAST(min(CASE WHEN 4 * rn >= 3 * n THEN v END) AS DOUBLE) AS clv_q3
FROM r JOIN nation ON n_nationkey = c_nationkey
GROUP BY 1 ORDER BY 1
""",
)
def clv_quartiles_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value quartiles per nation — the
    market-segmentation spread statistic beside
    customer_spend_percentile_by_nation's per-customer ranks. CLV is
    an exact DECIMAL(18,6) sum per customer (no float summation
    order); the quartiles are DISCRETE lower statistics (smallest
    value whose cumulative count reaches n/4, n/2, 3n/4 — integer
    rational compares, nothing interpolates).

    Scale shape: the customer-orders FK join and the per-customer
    rollup are one shuffle each; quartiles come from the shared
    `_grouped_value_cdf` (range-partitioned on the value split —
    never a per-nation rank window at 25-group cardinality)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    clv = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum(dec6("o_totalprice")).alias("v"))
    )
    collapsed = clv.groupBy("c_nationkey", "v").agg(F.count(F.lit(1)).alias("c"))
    cdf = _grouped_value_cdf(collapsed, "c_nationkey", "v")
    tot = cdf.groupBy("c_nationkey").agg(F.max("cum").alias("n"))
    q = (
        cdf.join(F.broadcast(tot), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(
            F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("v"))).alias("q1"),
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("v"))).alias("q2"),
            F.min(F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("v"))).alias(
                "q3"
            ),
        )
        .join(tot, "c_nationkey")
    )
    return (
        q.join(F.broadcast(nation), q.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").cast("long").alias("n_customers"),
            F.col("q1").cast("double").alias("clv_q1"),
            F.col("q2").cast("double").alias("clv_median"),
            F.col("q3").cast("double").alias("clv_q3"),
        )
        .orderBy("nation")
    )


@query(
    "inter_purchase_days_median_by_nation",
    oracle="""
WITH gaps AS (
  SELECT c_nationkey,
         datediff('day',
                  lag(CAST(o_orderdate AS DATE)) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                  CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders JOIN customer ON o_custkey = c_custkey
),
g AS (SELECT c_nationkey, gap_days FROM gaps WHERE gap_days IS NOT NULL),
r AS (
  SELECT c_nationkey, gap_days,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY gap_days) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM g
)
SELECT n_name AS nation,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN 2 * rn >= n THEN gap_days END) AS BIGINT)
         AS median_gap_days
FROM r JOIN nation ON n_nationkey = c_nationkey
GROUP BY 1 ORDER BY 1
""",
)
def inter_purchase_days_median_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median days between a customer's consecutive orders, per nation
    — purchase-frequency geography (the orders-table sibling of
    inter_event_gap_stats). Gaps are exact integer day differences;
    the median is the discrete lower statistic from the shared CDF.

    Scale shape: ONE customer-keyed window computes the lag (the
    standard per-key sort); gaps VALUE-COLLAPSE to (nation, days)
    before the CDF, so the cumulative pass runs over a
    calendar-bounded value table, never the orders."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_nationkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    collapsed = gaps.groupBy("c_nationkey", "gap_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    cdf = _grouped_value_cdf(collapsed, "c_nationkey", "gap_days")
    tot = cdf.groupBy("c_nationkey").agg(F.max("cum").alias("n"))
    med = (
        cdf.join(F.broadcast(tot), "c_nationkey")
        .where(2 * F.col("cum") >= F.col("n"))
        .groupBy("c_nationkey")
        .agg(F.min("gap_days").alias("median_gap_days"))
        .join(tot, "c_nationkey")
    )
    return (
        med.join(F.broadcast(nation), med.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").cast("long").alias("n_gaps"),
            F.col("median_gap_days").cast("long").alias("median_gap_days"),
        )
        .orderBy("nation")
    )


@query(
    "events_hourly_seasonality",
    oracle="""
SELECT CAST(EXTRACT(dow FROM ts) + 1 AS INTEGER) AS dow,
       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day traffic grid (events + distinct
    users) — the load-seasonality heatmap behind capacity planning and
    anomaly baselines (events_by_weekday's 7 rows become the 168-cell
    grid). Spark's dayofweek (1=Sunday) mirrors DuckDB's dow+1.

    Scale shape: one hash aggregate to the fixed 168-cell grid; the
    distinct-user count is the standard two-level aggregate (partial
    distinct per partition) — shuffle volume is grid × users-per-cell
    digests, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


@query(
    "weekday_hour_peak_load",
    oracle="""
WITH g AS (
  SELECT CAST(EXTRACT(dow FROM ts) + 1 AS INTEGER) AS dow,
         CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT dow, hour AS peak_hour, n_events AS peak_events
FROM (SELECT g.*, row_number() OVER (PARTITION BY dow
                                     ORDER BY n_events DESC, hour DESC) AS rn
      FROM g) t
WHERE rn = 1 ORDER BY dow
""",
)
def weekday_hour_peak_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak hour per weekday — the argmax slice of the seasonality
    grid (ties break to the LATEST hour via lexicographic struct max,
    mirrored in the oracle's ORDER BY ... hour DESC).

    Scale shape: the grid aggregate collapses events map-side to 168
    rows; the per-dow argmax is a max(struct) hash aggregate over that
    grid — no window over data-sized input anywhere."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return (
        g.groupBy("dow")
        .agg(F.max(F.struct("n_events", "hour")).alias("p"))
        .select(
            "dow",
            F.col("p.hour").alias("peak_hour"),
            F.col("p.n_events").alias("peak_events"),
        )
        .orderBy("dow")
    )


@query(
    "user_funnel_depth_distribution",
    oracle="""
WITH d AS (
  SELECT user_id,
         max(CASE event_type WHEN 'purchase' THEN 3 WHEN 'click' THEN 2
             WHEN 'view' THEN 1 ELSE 0 END) AS depth
  FROM events GROUP BY 1
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY 1 ORDER BY 1
""",
)
def user_funnel_depth_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How deep each user ever got in the view → click → purchase
    funnel, as a user-count histogram — the lifetime complement of
    funnel_view_click_purchase's strictly-ordered single-pass funnel.
    Depth is an exact integer max.

    Scale shape: two chained map-side-combined hash aggregates (user
    rollup, then the 4-bucket histogram); no window, no join."""
    ev = load_table(spark, sf_dir, "events")
    depth = F.max(
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "view", 1)
        .otherwise(0)
    )
    d = ev.groupBy("user_id").agg(depth.alias("depth"))
    return (
        d.groupBy("depth")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("depth")
    )


@query(
    "first_day_conversion_by_cohort",
    oracle="""
WITH f AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
  FROM events GROUP BY 1
),
c AS (
  SELECT f.user_id, f.cohort_day,
         max(CASE WHEN e.event_type = 'purchase'
                   AND CAST(e.ts AS DATE) = f.cohort_day
              THEN 1 ELSE 0 END) AS converted
  FROM f JOIN events e ON e.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT cohort_day,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       floor(CAST(sum(converted) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
         AS conversion_rate
FROM c GROUP BY 1 ORDER BY 1
""",
)
def first_day_conversion_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0 activation: of each daily signup cohort (first-ever event
    date), the share who purchased ON that first day — the activation
    twin of cohort_time_to_first_purchase's latency curve. Flags are
    exact integer maxes; one floor-form division per cohort.

    Scale shape: ONE user-keyed aggregate computes first_ts AND the
    earliest same-day purchase flag together (min(ts) and the
    conditional min compare within one pass — no self-join back to
    events: converted == min purchase ts falls on the min-ts date),
    then a calendar-bounded cohort rollup."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase_ts"),
    )
    # converted on day 0 <=> SOME purchase fell on the first day; with
    # only min/max purchase timestamps that is: the earliest purchase
    # is on day 0 (any later purchase can't precede it).
    converted = F.when(
        F.col("first_purchase_ts").cast("date") == F.col("first_ts").cast("date"),
        1,
    ).otherwise(0)
    c = per_user.select(
        F.col("first_ts").cast("date").alias("cohort_day"),
        converted.alias("converted"),
    )
    return (
        c.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .select(
            "cohort_day",
            "n_users",
            "n_converted",
            round4f(
                F.col("n_converted").cast("double") / F.col("n_users")
            ).alias("conversion_rate"),
        )
        .orderBy("cohort_day")
    )


@query(
    "value_percentiles_by_type",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       min(CASE WHEN 4 * rn >= n THEN value END) AS p25,
       min(CASE WHEN 2 * rn >= n THEN value END) AS p50,
       min(CASE WHEN 4 * rn >= 3 * n THEN value END) AS p75,
       min(CASE WHEN 20 * rn >= 19 * n THEN value END) AS p95
FROM r GROUP BY 1 ORDER BY 1
""",
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type value percentiles (p25/p50/p75/p95) — the exact
    oracle twin of the rows-only `agg_approx_quantiles_by_type`
    (approx_percentile is engine-specific by design; this pins the
    true quantiles). Discrete lower statistics picked by integer
    rational compares; the values themselves are parquet doubles
    compared bit-identically on both engines, never arithmetic.

    Scale shape: the fixture's values quantize to cents, so the
    (type, value) VALUE COLLAPSE is domain-bounded (~49K distinct per
    type at ANY row count) and the shared `_grouped_value_cdf` runs
    over that bounded table — never a per-type rank window over rows
    (the inter_event_gap trap this family documents)."""
    ev = load_table(spark, sf_dir, "events")
    collapsed = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cdf = _grouped_value_cdf(collapsed, "event_type", "v")
    tot = cdf.groupBy("event_type").agg(F.max("cum").alias("n"))
    j = cdf.join(F.broadcast(tot), "event_type")
    pct = j.groupBy("event_type").agg(
        F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("v"))).alias("p25"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("v"))).alias("p50"),
        F.min(F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("v"))).alias(
            "p75"
        ),
        F.min(F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("v"))).alias(
            "p95"
        ),
    )
    return (
        tot.join(pct, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            "p25", "p50", "p75", "p95",
        )
        .orderBy("event_type")
    )


@query(
    "event_disorder_profile",
    oracle="""
WITH arr AS (
  SELECT event_type,
         epoch_us(max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           - epoch_us(ts) AS behind_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE behind_us > 0) AS BIGINT) AS n_disordered,
       floor(CAST(count(*) FILTER (WHERE behind_us > 0) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000 AS disorder_rate,
       CAST(greatest(0, coalesce(max(behind_us), 0)) // 1000000 AS BIGINT) AS max_disorder_sec
FROM arr
GROUP BY event_type
ORDER BY event_type
""",
)
def event_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-disorder profile per event type: treating event_id as
    the per-user arrival sequence, how many events arrive with an
    event time BEHIND the running maximum, and by how much at worst —
    the measurement that SIZES a watermark/allowed-lateness budget
    (streaming/session_incremental.ALLOWED_LATENESS_US) before
    deploying a stateful stream [R the KS grace-period sizing
    question: out-of-order records beyond grace are dropped, so grace
    is chosen FROM the observed disorder distribution].

    Scale shape: one user-keyed exchange feeds the running-max window
    (the sessionization sort shape); everything after is a hash
    aggregate over the event-type grid. Integer µs differences floored
    to whole seconds — exact across engines; the rate uses the floor
    rounding form."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    behind = F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts"))
    arr = ev.select("event_type", behind.alias("behind_us"))
    disordered = F.when(F.col("behind_us") > 0, 1)
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count(disordered).cast("long").alias("n_disordered"),
            round4f(
                F.count(disordered).cast("double") / F.count(F.lit(1))
            ).alias("disorder_rate"),
            # Clamp to >= 0 (ADVICE r10): max(behind_us) over a fully
            # in-order type is NEGATIVE (closest slack to the running
            # max), and a negative "max disorder" misreads for the
            # watermark-sizing purpose — in-order types report 0.
            F.greatest(
                F.lit(0), F.coalesce(F.max("behind_us"), F.lit(0))
            ).alias("_max_behind_us"),
        )
        .select(
            "event_type",
            "n_events",
            "n_disordered",
            "disorder_rate",
            # integer µs → whole seconds: `div`, never a double detour
            F.expr("CAST(_max_behind_us div 1000000 AS BIGINT)").alias(
                "max_disorder_sec"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "customer_reorder_interval_buckets",
    oracle="""
WITH iv AS (
  SELECT date_diff('day',
                   CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
)
SELECT CAST(gap_days // 7 AS BIGINT) AS gap_weeks,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM iv WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
)
def customer_reorder_interval_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-cadence histogram: days between a customer's consecutive
    orders, bucketed into whole weeks — the purchase-frequency
    distribution behind replenishment forecasting and the empirical
    input to choosing a churn cutoff (`cohort_churn_rate` assumes one;
    this measures where the mass actually sits).

    Scale shape: one customer-keyed exchange feeds the LAG window (the
    sessionization sort shape — customer-bounded partitions), then the
    histogram is a map-side-combined aggregate over the week grid.
    Exact integer day arithmetic; the (date, key) window tiebreak makes
    same-day order chains engine-deterministic (gap 0 regardless of
    permutation). [R the KS cadence question: inter-arrival times per
    key feed the punctuation/gap sizing]."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate")).over(w).cast("date"),
    )
    return (
        orders.select(gap.alias("gap_days"))
        .where(F.col("gap_days").isNotNull())
        .select(F.expr("CAST(gap_days div 7 AS BIGINT)").alias("gap_weeks"))
        .groupBy("gap_weeks")
        .agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
        .orderBy("gap_weeks")
    )


@query(
    "event_type_burstiness",
    oracle="""
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       floor(CAST(sum(n) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
         AS mean_per_hour,
       floor(CAST(sum(n * n) * count(*) - sum(n) * sum(n) AS DOUBLE)
             / CAST(sum(n) * count(*) AS DOUBLE) * 10000 + 0.5) / 10000
         AS fano
FROM hc GROUP BY 1 ORDER BY 1
""",
)
def event_type_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type: the Fano factor
    (variance / mean) of the hourly arrival counts over the type's
    OBSERVED hours — 1 for Poisson arrivals, >> 1 for bursty traffic.
    This is the capacity-planning twin of `event_disorder_profile`:
    disorder sizes the watermark, burstiness sizes the per-trigger
    state/throughput headroom a streaming deployment must absorb
    [R the KS capacity question behind max.task.idle/buffer sizing].

    Determinism: hourly counts are integers, so S1 = Σn and S2 = Σn²
    are EXACT; fano = (S2·H − S1²) / (S1·H) is one integer-exact
    numerator/denominator pair and ONE double division through the
    floor form. S1/S2 fold in DECIMAL(38,0) (r12, ADVICE r11): the
    64-bit long form silently WRAPPED once S2·H passed 2⁶³ (~1e9
    events per type at the 720-hour grid) while the DuckDB oracle kept
    computing in 128-bit hugeint — a wrong finite value, not an error.
    Decimal headroom is 38 digits (S2·H safe past ~1e17 events/type),
    and past THAT the arithmetic surfaces as null/overflow error
    instead of a plausible wrong number.

    Scale shape: rows VALUE-COLLAPSE to the (type, hour) count grid
    first (one map-side-combined exchange, grid-bounded ≤ types ×
    hours), then the per-type fold is over hour rows only."""
    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("decimal(38,0)")
    s1 = F.sum(nd)
    s2 = F.sum(nd * nd)
    hrs = F.count(F.lit(1))
    hd = hrs.cast("decimal(38,0)")
    return (
        hc.groupBy("event_type")
        .agg(
            hrs.cast("long").alias("n_hours"),
            round4f(s1.cast("double") / hrs).alias("mean_per_hour"),
            round4f(
                (s2 * hd - s1 * s1).cast("double")
                / (s1 * hd).cast("double")
            ).alias("fano"),
        )
        .orderBy("event_type")
    )


@query(
    "session_transition_matrix",
    oracle=f"""
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER w AS prev_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
  AND gap_us <= {SESSION_GAP_MINUTES} * 60 * CAST(1000000 AS BIGINT)
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def session_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type transition matrix: for every ordered
    type pair (from, to), how many consecutive same-user event pairs
    inside one session (gap ≤ the SESSION_GAP_MINUTES boundary — the
    sessionizer's convention: > gap splits, ≤ gap chains) step from one
    to the other. `event_transition_matrix` counts EVERY consecutive
    pair regardless of dwell time; this variant drops the cross-session
    steps (overnight "transitions" that carry no intent), the matrix a
    funnel-leak triage or next-event model should actually train on.

    Scale shape: ONE user-keyed exchange feeds the LAG window (the
    sessionization sort shape, reused verbatim), then the matrix is a
    map-side-combined aggregate bounded by the type grid (≤ types²
    rows). Exact integer µs gap arithmetic; the (ts, event_id) window
    tiebreak makes simultaneous-event chains engine-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
            gap_us.alias("gap_us"),
        )
        .where(
            F.col("from_type").isNotNull()
            & (F.col("gap_us") <= SESSION_GAP_MINUTES * 60 * 1_000_000)
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )
