"""Property-based tests (SURVEY.md §5.2.4): dedup idempotence,
permutation invariance, merge commutativity — on hypothesis-generated
event sets. Example counts are small: each example is a Spark job."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from minefields_kafka_streams_deduplication_spark.operators.dedup import dedup_first_by

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 50),             # minutes offset
        st.integers(0, 3),              # user_id
        st.sampled_from([1.0, 2.0]),    # value (few distinct → forces dupes)
    ),
    min_size=0,
    max_size=25,
)


def mk(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, t0 + dt.timedelta(minutes=m), u, v) for i, (m, u, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, SCHEMA)


def dedup(df):
    return dedup_first_by(
        df, ["user_id", "value"], [F.col("ts").asc(), F.col("event_id").asc()]
    )


@settings(max_examples=5, deadline=None)
@given(rows=events_strategy)
def test_dedup_idempotent(spark, rows):
    df = mk(spark, rows)
    once = sorted(r.event_id for r in dedup(df).collect())
    twice = sorted(r.event_id for r in dedup(dedup(df)).collect())
    assert once == twice


@settings(max_examples=5, deadline=None)
@given(rows=events_strategy)
def test_dedup_one_row_per_key(spark, rows):
    df = mk(spark, rows)
    out = dedup(df).collect()
    keys = [(r.user_id, r.value) for r in out]
    assert len(keys) == len(set(keys))
    input_keys = {(u, v) for (_, u, v) in rows}
    assert set(keys) == input_keys


@settings(max_examples=5, deadline=None)
@given(rows=events_strategy)
def test_merge_commutative(spark, rows):
    df = mk(spark, rows)
    a = df.filter(F.col("user_id") < 2)
    b = df.filter(F.col("user_id") >= 2)
    ab = sorted(r.event_id for r in a.unionByName(b).collect())
    ba = sorted(r.event_id for r in b.unionByName(a).collect())
    assert ab == ba == sorted(range(len(rows)))
