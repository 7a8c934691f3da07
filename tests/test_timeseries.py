"""Timeseries operator semantics on hand-built fixtures (the oracles
pin fixture-scale equality; these pin the semantics on adversarial
minimal cases)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from minefields_kafka_streams_deduplication_spark.operators import timeseries as ts_ops

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
EV_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, "purchase", v) for i, (m, u, v) in enumerate(rows)],
        EV_SCHEMA,
    )


def test_ohlc_open_close_ordering(spark, monkeypatch):
    """open = first tick by (ts, event_id), close = last — including a
    same-timestamp tie broken by event_id."""
    rows = [(0, 7, 5.0), (0, 7, 6.0), (30, 7, 1.0), (59, 7, 3.0)]
    monkeypatch.setattr(ts_ops, "load_table", lambda s, d, n: _ev(spark, rows))
    out = ts_ops.ohlc_bars_hourly(spark, "x").collect()
    assert len(out) == 1
    bar = out[0]
    assert bar.open == 5.0  # event_id 0 wins the same-ts tie
    assert bar.close == 3.0
    assert bar.high == 6.0 and bar.low == 1.0 and bar.n_ticks == 4


def test_twa_weights_by_duration(spark, monkeypatch):
    """value 10 held for 30 min then value 0 for 30 min -> TWA 5; the
    final sample carries no weight."""
    rows = [(0, 7, 10.0), (30, 7, 0.0), (60, 7, 99.0)]
    monkeypatch.setattr(ts_ops, "load_table", lambda s, d, n: _ev(spark, rows))
    out = ts_ops.time_weighted_avg_daily(spark, "x").collect()
    assert len(out) == 1
    assert out[0].twa == 5.0
    assert out[0].n_events == 2  # the last sample has no successor


def test_locf_fills_empty_hours(spark, monkeypatch):
    """An entity with ticks at hour 0 and hour 3 gets a dense 4-hour
    grid; hours 1-2 carry hour 0's close forward and are unobserved."""
    rows = [(0, 7, 1.0), (10, 7, 2.0), (185, 7, 9.0)]
    monkeypatch.setattr(ts_ops, "load_table", lambda s, d, n: _ev(spark, rows))
    out = {
        r.hour_ts: (r.value_locf, r.observed)
        for r in ts_ops.gap_fill_locf_hourly(spark, "x").collect()
    }
    h = lambda k: T0.replace(minute=0) + dt.timedelta(hours=k)
    assert set(out) == {h(0), h(1), h(2), h(3)}
    assert out[h(0)] == (2.0, True)  # hour close = last tick in hour
    assert out[h(1)] == (2.0, False)
    assert out[h(2)] == (2.0, False)
    assert out[h(3)] == (9.0, True)


def test_asof_forward_tolerance_and_boundary(spark, monkeypatch):
    """Same-instant order matches (>=); an order past the tolerance
    yields null; the earliest qualifying order wins."""
    orders_schema = "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE"
    ev = _ev(spark, [(0, 7, 1.0), (0, 8, 1.0), (0, 9, 1.0)])
    d = lambda days, minutes=0: T0 + dt.timedelta(days=days, minutes=minutes)
    orders = spark.createDataFrame(
        [
            (1, 7, d(0), 10.0),      # exact same instant -> matches user 7
            (2, 7, d(2), 10.0),      # later order exists but first wins
            (3, 8, d(8), 10.0),      # past 7-day tolerance -> null for user 8
        ],
        orders_schema,
    )
    tables = {"events": ev, "orders": orders}
    monkeypatch.setattr(ts_ops, "load_table", lambda s, dd, n: tables[n])
    out = {r.user_id: r.next_order_date for r in ts_ops.join_asof_forward_order(spark, "x").collect()}
    assert out[7] == d(0)
    assert out[8] is None
    assert out[9] is None  # no orders at all


def test_ewma_matches_recursion_replay(spark, sf_dir):
    """The Arrow kernel must equal the textbook recursion
    y_i = a*x_i + (1-a)*y_{i-1} replayed in pure Python over the
    ts-ordered events of every user — EXACTLY, after the query's own
    floor(·10⁴+0.5) rounding (the r12 oracle promotion made the kernel
    the literal two-multiply-one-add recursion, bit-identical to this
    replay, so the comparison is equality, not tolerance)."""
    import math

    import minefields_kafka_streams_deduplication_spark as engine
    from minefields_kafka_streams_deduplication_spark.catalog import load_table
    from minefields_kafka_streams_deduplication_spark.operators.timeseries import (
        EWMA_ALPHA,
    )

    got = {
        r.event_id: r.ewma
        for r in engine.get_queries()["ewma_user_value"](spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_id", "unix_micros(ts) AS ts_us", "user_id", "value")
        .collect()
    )
    state: dict = {}
    want = {}
    for r in sorted(ev, key=lambda r: (r.ts_us, r.event_id)):
        y = state.get(r.user_id)
        y = r.value if y is None else EWMA_ALPHA * r.value + (1 - EWMA_ALPHA) * y
        state[r.user_id] = y
        want[r.event_id] = math.floor(y * 10000 + 0.5) / 10000
    assert set(got) == set(want)
    for eid, y in want.items():
        assert got[eid] == y, eid


def test_scd2_collapses_equal_runs_and_chains_intervals(spark, monkeypatch):
    """Consecutive equal values collapse into one validity interval; a
    value that RETURNS after an intervening change opens a NEW interval
    (5,5,7,5 -> three rows); intervals chain end-to-start and exactly
    the last one is current."""
    rows = [(0, 7, 5.0), (10, 7, 5.0), (20, 7, 7.0), (30, 7, 5.0)]
    monkeypatch.setattr(ts_ops, "load_table", lambda s, d, n: _ev(spark, rows))
    out = sorted(
        ts_ops.scd2_user_value_history(spark, "x").collect(),
        key=lambda r: r.valid_from,
    )
    assert [r.value for r in out] == [5.0, 7.0, 5.0]
    assert [r.is_current for r in out] == [0, 0, 1]
    # intervals chain: each valid_to is the next valid_from; last open
    assert out[0].valid_to == out[1].valid_from
    assert out[1].valid_to == out[2].valid_from
    assert out[2].valid_to is None
    assert out[0].valid_from == T0  # first change = first event


def test_scd2_fixture_invariants(spark, sf_dir):
    """On the real fixture: exactly one current row per user, no
    consecutive equal values, and intervals per user tile the span."""
    out = ts_ops.scd2_user_value_history(spark, sf_dir)
    per_user = out.groupBy("user_id").agg(
        F.sum("is_current").alias("n_current"),
        F.count("*").alias("n_rows"),
    )
    assert per_user.filter(F.col("n_current") != 1).count() == 0
    # no adjacent interval shares its value (change detection worked)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    adj = out.withColumn("nxt_v", F.lead("value").over(w)).withColumn(
        "nxt_from", F.lead("valid_from").over(w)
    )
    assert adj.filter(F.col("nxt_v") == F.col("value")).count() == 0
    # chaining: valid_to == next interval's valid_from everywhere
    assert (
        adj.filter(F.col("nxt_from").isNotNull())
        .filter(F.col("valid_to") != F.col("nxt_from"))
        .count()
        == 0
    )
