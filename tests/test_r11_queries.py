"""Round-11 oracle-query semantics on hand fixtures — the model pin
each new query carries alongside its DuckDB oracle (standing gate,
VERDICT r9 #8 / r10 #3: every new operator lands with a
hand-verifiable expected-rows test in the same round)."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


# ---------------------------------------------------------------------------
# dedup_prefix_digest (operators/dedup.py)
# ---------------------------------------------------------------------------


def test_dedup_prefix_digest_hand_fixture(spark, monkeypatch):
    """Two docs sharing a 64-char prefix (different tails) group
    together across sources; a short exact-duplicate text groups by its
    full text; singletons are excluded."""
    from minefields_kafka_streams_deduplication_spark.operators import dedup

    pre = "A" * 64
    docs = spark.createDataFrame(
        [
            (1, "web", pre + "tail one"),
            (2, "books", pre + "another tail"),
            (3, "web", "short text"),
            (4, "web", "short text"),
            (5, "web", "unique loner document"),
        ],
        "doc_id LONG, source STRING, text STRING",
    )
    monkeypatch.setattr(dedup, "load_table", lambda s, d, n: docs)
    got = {
        r.keep_doc_id: (r.n_docs, r.n_sources)
        for r in dedup.dedup_prefix_digest(spark, "x").collect()
    }
    # group of 1+2 (shared 64-prefix, two sources), group of 3+4
    assert got == {1: (2, 2), 3: (2, 1)}


# ---------------------------------------------------------------------------
# supplier_revenue_hhi_by_nation (operators/aggregations.py)
# ---------------------------------------------------------------------------


def test_supplier_hhi_hand_fixture(spark, monkeypatch):
    """Nation DUO: suppliers with revenue 300 and 100 → HHI =
    (300² + 100²)/400² = 0.625; nation MONO: one supplier → HHI 1.0."""
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    li = spark.createDataFrame(
        [
            (1, 10, 300.0, 0.0),
            (2, 11, 50.0, 0.0),
            (3, 11, 50.0, 0.0),
            (4, 20, 77.0, 0.0),
        ],
        "l_orderkey LONG, l_suppkey LONG, l_extendedprice DOUBLE,"
        " l_discount DOUBLE",
    )
    sup = spark.createDataFrame(
        [(10, 0), (11, 0), (20, 1)], "s_suppkey LONG, s_nationkey INT"
    )
    nat = spark.createDataFrame(
        [(0, "DUO"), (1, "MONO")], "n_nationkey INT, n_name STRING"
    )
    tables = {"lineitem": li, "supplier": sup, "nation": nat}
    monkeypatch.setattr(
        aggregations, "load_table", lambda s, d, n: tables[n]
    )
    got = {
        r.n_name: (r.n_suppliers, r.hhi)
        for r in aggregations.supplier_revenue_hhi_by_nation(
            spark, "x"
        ).collect()
    }
    assert got == {"DUO": (2, 0.625), "MONO": (1, 1.0)}


# ---------------------------------------------------------------------------
# customer_reorder_interval_buckets (operators/analytic.py)
# ---------------------------------------------------------------------------


def test_reorder_interval_buckets_hand_fixture(spark, monkeypatch):
    """Customer ordering on days 0/3/10/31 → gaps 3, 7, 21 days →
    weeks 0, 1, 3; a one-order customer contributes no interval."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 1, t0),
            (2, 1, t0 + dt.timedelta(days=3)),
            (3, 1, t0 + dt.timedelta(days=10)),
            (4, 1, t0 + dt.timedelta(days=31)),
            (5, 2, t0),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP",
    )
    monkeypatch.setattr(analytic, "load_table", lambda s, d, n: orders)
    got = {
        r.gap_weeks: r.n_intervals
        for r in analytic.customer_reorder_interval_buckets(
            spark, "x"
        ).collect()
    }
    assert got == {0: 1, 1: 1, 3: 1}


@settings(max_examples=5, deadline=None)
@given(
    custs=st.lists(
        st.lists(st.integers(0, 120), min_size=1, max_size=10),
        min_size=1,
        max_size=4,
    )
)
def test_reorder_interval_buckets_matches_reference(spark, custs):
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(2024, 1, 1)
    rows, k = [], 0
    for c, days in enumerate(custs):
        for d in days:
            rows.append((k, c, t0 + dt.timedelta(days=d)))
            k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP"
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: orders
    try:
        got = {
            r.gap_weeks: r.n_intervals
            for r in analytic.customer_reorder_interval_buckets(
                spark, "x"
            ).collect()
        }
    finally:
        analytic.load_table = orig
    want: dict[int, int] = {}
    # brute force: per customer, sort by (date, orderkey), diff, //7
    by_c: dict[int, list[tuple]] = {}
    for i, (okey, c, d) in enumerate(rows):
        by_c.setdefault(c, []).append((d, okey))
    for seq in by_c.values():
        seq.sort()
        for (d0, _), (d1, _) in zip(seq, seq[1:]):
            w = (d1 - d0).days // 7
            want[w] = want.get(w, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# event_type_burstiness (operators/analytic.py)
# ---------------------------------------------------------------------------


def test_event_type_burstiness_hand_fixture(spark, monkeypatch):
    """Type 'a': hourly counts [1, 3] → mean 2.0, Fano = pop-var/mean =
    1/2 = 0.5; type 'b': a single 5-event hour → variance 0 → Fano 0."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    h1 = dt.datetime(2024, 1, 1, 1, 0)
    rows = [(1, t0, "a")]
    rows += [(2 + i, h1 + dt.timedelta(minutes=i), "a") for i in range(3)]
    rows += [(10 + i, t0 + dt.timedelta(minutes=i), "b") for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING"
    )
    monkeypatch.setattr(analytic, "load_table", lambda s, d, n: ev)
    got = {
        r.event_type: (r.n_hours, r.mean_per_hour, r.fano)
        for r in analytic.event_type_burstiness(spark, "x").collect()
    }
    assert got == {"a": (2, 2.0, 0.5), "b": (1, 5.0, 0.0)}


@settings(max_examples=5, deadline=None)
@given(
    hours=st.lists(st.integers(1, 9), min_size=1, max_size=8)
)
def test_event_type_burstiness_matches_reference(spark, hours):
    """Random hourly count vector, one type — Fano from brute-force
    population variance over observed hours."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(2024, 1, 1)
    rows, k = [], 0
    for hi, n in enumerate(hours):
        for j in range(n):
            rows.append(
                (k, t0 + dt.timedelta(hours=hi, minutes=j), "e")
            )
            k += 1
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING"
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: ev
    try:
        row = analytic.event_type_burstiness(spark, "x").collect()[0]
    finally:
        analytic.load_table = orig
    H, S1, S2 = len(hours), sum(hours), sum(n * n for n in hours)
    assert row.n_hours == H
    assert row.mean_per_hour == math.floor(S1 / H * 10000 + 0.5) / 10000
    assert row.fano == math.floor(
        (S2 * H - S1 * S1) / (S1 * H) * 10000 + 0.5
    ) / 10000


# ---------------------------------------------------------------------------
# token_cooccurrence_topk (functions/text.py)
# ---------------------------------------------------------------------------


def test_token_cooccurrence_hand_fixture(spark, monkeypatch):
    """Three docs over vocabulary {x, y, z} (all within the top-30
    cut): (x,y) co-occur in 2 docs, (x,z) in 2, (y,z) in 1; repeated
    tokens within one doc count once (presence semantics)."""
    from minefields_kafka_streams_deduplication_spark.functions import text

    docs = spark.createDataFrame(
        [
            (1, "x y x"),
            (2, "x y z"),
            (3, "x z"),
        ],
        "doc_id LONG, text STRING",
    )
    monkeypatch.setattr(text, "load_table", lambda s, d, n: docs)
    got = {
        (r.token_a, r.token_b): r.n_docs
        for r in text.token_cooccurrence_topk(spark, "x").collect()
    }
    assert got == {("x", "y"): 2, ("x", "z"): 2, ("y", "z"): 1}


def test_token_cooccurrence_top_cut_is_deterministic(spark, monkeypatch):
    """With a vocabulary larger than the cut, only pairs of HEAD tokens
    (df DESC, token ASC) appear: 31 distinct rare tokens + 2 common
    ones — the rare token excluded by the tiebreak never pairs."""
    from minefields_kafka_streams_deduplication_spark.functions import text

    # 31 singleton tokens r00..r30 (df=1 each) + 'aa bb' in 5 docs
    rows = [(i, f"r{i:02d}") for i in range(31)]
    rows += [(100 + i, "aa bb") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    monkeypatch.setattr(text, "load_table", lambda s, d, n: docs)
    got = {
        (r.token_a, r.token_b): r.n_docs
        for r in text.token_cooccurrence_topk(spark, "x").collect()
    }
    # head set = {aa, bb} (df 5) + the 28 lexicographically-first rare
    # tokens (df-1 tie broken by token asc): r00..r27. Singleton docs
    # contribute no pairs, so the only co-occurring pair is (aa, bb).
    assert got == {("aa", "bb"): 5}


# ---------------------------------------------------------------------------
# session_transition_matrix (operators/analytic.py)
# ---------------------------------------------------------------------------


def test_session_transition_matrix_hand_fixture(spark, monkeypatch):
    """User 1: view→click (5 min, chained), click→buy (40 min — SPLIT,
    not counted), buy→view (30 min EXACTLY — chained, the sessionizer's
    ≤-gap convention); user 2: single event, no transitions."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(2024, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    ev = spark.createDataFrame(
        [
            (1, 1, at(0), "view"),
            (1, 2, at(5), "click"),
            (1, 3, at(45), "buy"),    # 40 min gap: session split
            (1, 4, at(75), "view"),   # exactly 30 min: chained
            (2, 1, at(0), "view"),
        ],
        "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING",
    )
    monkeypatch.setattr(analytic, "load_table", lambda s, d, n: ev)
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in analytic.session_transition_matrix(spark, "x").collect()
    }
    assert got == {("view", "click"): 1, ("buy", "view"): 1}


@settings(max_examples=5, deadline=None)
@given(
    users=st.lists(
        st.lists(
            st.tuples(st.integers(0, 200), st.sampled_from(["a", "b", "c"])),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_session_transition_matrix_matches_reference(spark, users):
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u, evs in enumerate(users):
        for i, (m, ty) in enumerate(evs):
            rows.append((u, i, t0 + dt.timedelta(minutes=m), ty))
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING"
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: ev
    try:
        got = {
            (r.from_type, r.to_type): r.n_transitions
            for r in analytic.session_transition_matrix(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig
    want: dict = {}
    for u, evs in enumerate(users):
        seq = sorted(
            [(m, i, ty) for i, (m, ty) in enumerate(evs)],
            key=lambda x: (x[0], x[1]),
        )
        for (m0, _, t0_), (m1, _, t1_) in zip(seq, seq[1:]):
            if (m1 - m0) <= 30:
                k = (t0_, t1_)
                want[k] = want.get(k, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# user_max_gap_histogram (operators/windows.py)
# ---------------------------------------------------------------------------


def test_user_max_gap_histogram_hand_fixture(spark, monkeypatch):
    """User 1's gaps are 5 and 25 min → max 25 → bucket 2; user 2's
    single gap is exactly 10 min → floor-div bucket 1; user 3 has one
    event → excluded."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    ev = spark.createDataFrame(
        [
            (1, 1, _ts(0)),
            (1, 2, _ts(5)),
            (1, 3, _ts(30)),
            (2, 1, _ts(0)),
            (2, 2, _ts(10)),
            (3, 1, _ts(0)),
        ],
        "user_id LONG, event_id LONG, ts TIMESTAMP",
    )
    monkeypatch.setattr(windows, "load_table", lambda s, d, n: ev)
    got = {
        r.gap_bucket: r.n_users
        for r in windows.user_max_gap_histogram(spark, "x").collect()
    }
    assert got == {2: 1, 1: 1}


@settings(max_examples=5, deadline=None)
@given(
    users=st.lists(
        st.lists(st.integers(0, 300), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    )
)
def test_user_max_gap_histogram_matches_reference(spark, users):
    from minefields_kafka_streams_deduplication_spark.operators import windows

    rows = []
    for u, mins in enumerate(users):
        for i, m in enumerate(mins):
            rows.append((u, i, _ts(m)))
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts TIMESTAMP"
    )
    orig = windows.load_table
    windows.load_table = lambda s, d, n: ev
    try:
        got = {
            r.gap_bucket: r.n_users
            for r in windows.user_max_gap_histogram(spark, "x").collect()
        }
    finally:
        windows.load_table = orig
    want: dict[int, int] = {}
    for mins in users:
        seq = sorted(
            (m, i) for i, m in enumerate(mins)
        )  # (ts, event_id) order
        gaps = [b[0] - a[0] for a, b in zip(seq, seq[1:])]
        if not gaps:
            continue
        b = max(gaps) // 10
        want[b] = want.get(b, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# mktsegment_revenue_share_by_month (operators/aggregations.py)
# ---------------------------------------------------------------------------


def test_mktsegment_revenue_share_hand_fixture(spark, monkeypatch):
    """One month, two segments: AUTO 300 of 400 total → share 0.75;
    HOUSE 100 → 0.25. A second month with only AUTO → share 1.0."""
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    orders = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 5), 200.0),
            (2, 1, dt.datetime(2024, 1, 20), 100.0),
            (3, 2, dt.datetime(2024, 1, 9), 100.0),
            (4, 1, dt.datetime(2024, 2, 1), 50.0),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP,"
        " o_totalprice DOUBLE",
    )
    cust = spark.createDataFrame(
        [(1, "AUTO"), (2, "HOUSE")], "c_custkey LONG, c_mktsegment STRING"
    )
    tables = {"orders": orders, "customer": cust}
    monkeypatch.setattr(
        aggregations, "load_table", lambda s, d, n: tables[n]
    )
    got = {
        (r.month, r.mktsegment): (r.n_orders, r.revenue, r.month_share)
        for r in aggregations.mktsegment_revenue_share_by_month(
            spark, "x"
        ).collect()
    }
    jan, feb = dt.date(2024, 1, 1), dt.date(2024, 2, 1)
    assert got == {
        (jan, "AUTO"): (2, 300.0, 0.75),
        (jan, "HOUSE"): (1, 100.0, 0.25),
        (feb, "AUTO"): (1, 50.0, 1.0),
    }


# ---------------------------------------------------------------------------
# brand_return_rate (operators/aggregations.py)
# ---------------------------------------------------------------------------


def test_brand_return_rate_hand_fixture(spark, monkeypatch):
    """Brand A: 1 of 4 lines returned → 0.25, revenue from the
    discounted prices; brand B: no returns → 0.0."""
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    li = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.0, "R"),
            (2, 10, 100.0, 0.5, "N"),
            (3, 11, 200.0, 0.0, "N"),
            (4, 11, 100.0, 0.0, "A"),
            (5, 20, 40.0, 0.0, "N"),
        ],
        "l_orderkey LONG, l_partkey LONG, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_returnflag STRING",
    )
    part = spark.createDataFrame(
        [(10, "BRAND#A"), (11, "BRAND#A"), (20, "BRAND#B")],
        "p_partkey LONG, p_brand STRING",
    )
    tables = {"lineitem": li, "part": part}
    monkeypatch.setattr(
        aggregations, "load_table", lambda s, d, n: tables[n]
    )
    got = {
        r.p_brand: (r.n_lines, r.n_returned, r.return_rate, r.revenue)
        for r in aggregations.brand_return_rate(spark, "x").collect()
    }
    # brand A revenue: 100 + 50 + 200 + 100 = 450
    assert got == {
        "BRAND#A": (4, 1, 0.25, 450.0),
        "BRAND#B": (1, 0, 0.0, 40.0),
    }


# ---------------------------------------------------------------------------
# neardup_jaccard_histogram (functions/neardup.py)
# ---------------------------------------------------------------------------


def test_neardup_jaccard_histogram_hand_fixture(spark, monkeypatch):
    """Weighted copy-collapse arithmetic: 3 copies of T1 and 2 copies
    of T2 (T1 with its last token changed) → C(3,2)+C(2,2)=4 exact
    pairs in bucket 20, and 3×2=6 cross pairs at jaccard 47/49 — the
    changed LAST token lives in exactly ONE 3-gram window, so 47 of 48
    shingles stay common (bucket 19); a 2-copy SHORT doc (<3 tokens,
    no shingles) emits no pair — the reference-formulation corner."""
    from minefields_kafka_streams_deduplication_spark.functions import neardup

    t1 = " ".join(f"w{i}" for i in range(50))
    t2 = " ".join(f"w{i}" for i in range(49)) + " CHANGED"
    rows = [(1, t1), (2, t1), (3, t1), (4, t2), (5, t2), (6, "a b"), (7, "a b")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    monkeypatch.setattr(neardup, "load_table", lambda s, d, n: docs)
    got = {
        r.jaccard_bucket: r.n_pairs
        for r in neardup.neardup_jaccard_histogram(spark, "x").collect()
    }
    # T1 vs T2: 48 shingles each, one differing edge window →
    # j = 47/49 ≈ 0.959 → bucket 19
    assert got == {19: 6, 20: 4}
