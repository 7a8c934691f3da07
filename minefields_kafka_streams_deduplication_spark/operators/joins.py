"""Join operators (SURVEY.md §2.4).

Kafka Streams anchors [R]: KStream#join/#leftJoin/#outerJoin (stream-
stream windowed via JoinWindows; stream-table; stream-globalTable). Our
surface adds the full relational join set needed for SQL parity.

Scale notes: Catalyst picks broadcast vs sort-merge vs shuffled-hash per
side statistics; we pin `broadcast()` only where the dimension is known
small (GlobalKTable analog). The interval join keys on user_id first
(equi part) so it is a shuffle on user_id + a range predicate, NOT a
cartesian. The as-of join is equi-join + window-rank; at 100 TB you
bucket both sides by the key to make it shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "join_orders_customer",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus,
       c.c_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: equi inner join (KStream#join(KTable) analog)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "o_orderstatus", "c_custkey", "c_name", "c_mktsegment")


@query(
    "join_left_customer_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
""",
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join (KStream#leftJoin analog)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_semi_customers_with_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3a: left-semi — existence filter, never duplicates the left side."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_anti_customers_no_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3b: left-anti — absence filter."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


INTERVAL_JOIN_MINUTES = 10


@query(
    "join_interval_view_purchase",
    oracle=f"""
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL {INTERVAL_JOIN_MINUTES} MINUTE
""",
)
def join_interval_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: stream-stream windowed join — the KS JoinWindows op
    [R KStream#join(KStream, joiner, JoinWindows.ofTimeDifference...)]:
    view→purchase pairs for the same user within 10 minutes.

    The equi key (user_id) drives the shuffle; the time predicate is a
    post-join filter within each key group, so this stays a sort-merge
    join, not a cartesian. The streaming twin (two watermarked inputs,
    same predicate) is `streaming.windows.stream_stream_interval_join`.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        (v.user_id == p.p_user_id)
        & (p.p_ts >= v.v_ts)
        & (p.p_ts <= F.col("v_ts") + F.expr(f"INTERVAL {INTERVAL_JOIN_MINUTES} MINUTES")),
        "inner",
    )
    return joined.select(
        "view_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )


@query(
    "join_broadcast_nation",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def join_broadcast_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: GlobalKTable enrichment [R KStream#join(GlobalKTable)] —
    dimension broadcast pinned with an explicit hint. At 100 TB this is
    THE pattern for fact-dim joins: zero shuffle on the fact side."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_fk_orders_nation",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, n.n_name
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
""",
)
def join_fk_orders_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key table join [R KTable#join(KTable, foreignKeyExtractor)
    — KS needs a two-hop subscription topology for this; in Spark it is
    just two equi joins, with the key-extraction step being the first
    join's projection]. Enriches each order with its customer's nation.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "o_totalprice", "n_name")
    )


SKEW_SALT_BUCKETS = 8


@query(
    "join_salted_orders_customer",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_salted_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join — the manual fallback when one join key is so
    hot that even AQE's skew splitting can't balance it: the fact side
    gets a random salt, the (smaller) build side is replicated across
    all salt values, and the join keys on (key, salt) so the hot key
    spreads over SKEW_SALT_BUCKETS reducers. Result is provably
    identical to the plain join (the oracle is the UNSALTED query).

    Salt must be deterministic per row for retry-safety — derived from
    o_orderkey, never rand().
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    salted_fact = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(SKEW_SALT_BUCKETS))
    )
    replicated_dim = customer.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SKEW_SALT_BUCKETS)]))
    )
    return salted_fact.join(
        replicated_dim,
        (salted_fact.o_custkey == replicated_dim.c_custkey)
        & (salted_fact.salt == replicated_dim.salt),
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_mktsegment")


@query(
    "join_asof_latest_order_before_event",
    oracle="""
SELECT event_id, user_id, ts, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) t
WHERE rn = 1
""",
)
def join_asof_latest_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: as-of join — for each event, the latest order of that
    customer at or before the event time (KS versioned-KTable lookup
    analog [R Stores.persistentVersionedKeyValueStore]).

    Spark has no native as-of. The naive plan (equi-join on the key +
    range predicate + per-event rank) materializes |events| × |orders
    per key| intermediate rows — quadratic in key hotness. This is the
    scalable sort-based formulation instead: UNION both sides tagged by
    kind, one sort per key over the merged timeline, and carry the most
    recent order forward with last(..., ignorenulls) — one shuffle, one
    sort, zero row blowup, the classic 100 TB as-of shape.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),  # events sort AFTER orders at equal t (<= semantics)
        "event_id",
        "ts",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    merged = orders.unionByName(ev)
    # Within equal (key, t, kind): later orders win ⇒ sort by orderkey so
    # last() picks the max — matching the rank-desc tiebreak in the oracle.
    w = (
        Window.partitionBy("key")
        .orderBy("t", "kind", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "kind",
        "event_id",
        F.col("key").alias("user_id"),
        "ts",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("o_orderdate"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("o_totalprice"),
    )
    return carried.filter(
        (F.col("kind") == 1) & F.col("o_orderkey").isNotNull()
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate", "o_totalprice")
