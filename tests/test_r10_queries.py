"""Round-10 oracle-query semantics on hand fixtures — the model pin
each new query carries alongside its DuckDB oracle (the model checks
the SEMANTICS on inputs with hand-verifiable answers; the oracle checks
the engine on driver data). VERDICT r10 #3: the five r10 oracles landed
with only the driver row + strict check; the fixtures here make them
regression-proof — in particular `dedup_cross_source_matrix`, whose
sf0.01 driver row is vacuous (0 rows on both sides), is pinned
NON-vacuously with known cross-source duplicate digests.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


# ---------------------------------------------------------------------------
# dedup_cross_source_matrix (operators/dedup.py)
# ---------------------------------------------------------------------------


def _mk_docs(spark, rows):
    """rows: list of (doc_id, source, text)."""
    return spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING"
    )


def test_dedup_cross_source_matrix_hand_fixture(spark, monkeypatch):
    """Known cross-source duplicates: 'x' shared by A+B, 'y' by all
    three, 'z' only in A; an exact dup of 'x' WITHIN A must not
    double-count (distinct digests per source)."""
    from minefields_kafka_streams_deduplication_spark.operators import dedup

    docs = _mk_docs(
        spark,
        [
            (1, "A", "x"),
            (2, "A", "x"),  # within-source dup: collapses
            (3, "A", "y"),
            (4, "A", "z"),
            (5, "B", "x"),
            (6, "B", "y"),
            (7, "C", "y"),
        ],
    )
    monkeypatch.setattr(dedup, "load_table", lambda s, d, n: docs)
    got = {
        (r.source_a, r.source_b): r.n_shared_digests
        for r in dedup.dedup_cross_source_matrix(spark, "x").collect()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from(["t0", "t1", "t2", "t3", "t4"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_cross_source_matrix_matches_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.operators import dedup

    docs = _mk_docs(spark, [(i, s, t) for i, (s, t) in enumerate(rows)])
    orig = dedup.load_table
    dedup.load_table = lambda s, d, n: docs
    try:
        got = {
            (r.source_a, r.source_b): r.n_shared_digests
            for r in dedup.dedup_cross_source_matrix(spark, "x").collect()
        }
    finally:
        dedup.load_table = orig
    by_src: dict[str, set[str]] = {}
    for s, t in rows:
        by_src.setdefault(s, set()).add(t)
    want = {}
    srcs = sorted(by_src)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            n = len(by_src[sa] & by_src[sb])
            if n:
                want[(sa, sb)] = n
    assert got == want


# ---------------------------------------------------------------------------
# event_disorder_profile (operators/analytic.py)
# ---------------------------------------------------------------------------


def test_event_disorder_profile_hand_fixture(spark, monkeypatch):
    """Hand-built disorder: user 1 ('view') arrives 0s,100s,50s,200s by
    event_id — one event 50s behind the running max; user 2 ('click')
    is fully in-order, which must report max_disorder_sec == 0 (the
    ADVICE r10 clamp: the pre-fix form reported the NEGATIVE closest
    slack for in-order types)."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    def sec(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            (1, 1, sec(0), "view"),
            (1, 2, sec(100), "view"),
            (1, 3, sec(50), "view"),   # 50s behind the running max (100)
            (1, 4, sec(200), "view"),
            (2, 1, sec(0), "click"),
            (2, 2, sec(10), "click"),
            (2, 3, sec(20), "click"),
        ],
        "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING",
    )
    monkeypatch.setattr(analytic, "load_table", lambda s, d, n: ev)
    got = {
        r.event_type: (
            r.n_events,
            r.n_disordered,
            r.disorder_rate,
            r.max_disorder_sec,
        )
        for r in analytic.event_disorder_profile(spark, "x").collect()
    }
    assert got["view"] == (4, 1, 0.25, 50)
    assert got["click"] == (3, 0, 0.0, 0)  # clamped, not -10


@settings(max_examples=5, deadline=None)
@given(
    users=st.lists(
        st.lists(st.integers(0, 500), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_event_disorder_profile_matches_reference(spark, users):
    """Per-user random arrival sequences (ts offsets in seconds, arrival
    order = list order = event_id order), single shared event type —
    counts/max computed by a brute-force running max."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    def sec(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    rows = []
    for u, offs in enumerate(users):
        for i, o in enumerate(offs):
            rows.append((u, i, sec(o), "e"))
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING"
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: ev
    try:
        row = analytic.event_disorder_profile(spark, "x").collect()[0]
    finally:
        analytic.load_table = orig
    n = sum(len(o) for o in users)
    n_dis = 0
    max_behind = 0  # clamped floor
    for offs in users:
        run = None
        for o in offs:
            if run is not None and run - o > 0:
                n_dis += 1
                max_behind = max(max_behind, run - o)
            run = o if run is None else max(run, o)
    assert row.n_events == n
    assert row.n_disordered == n_dis
    assert row.disorder_rate == math.floor(n_dis / n * 10000 + 0.5) / 10000
    assert row.max_disorder_sec == max_behind  # whole seconds already


# ---------------------------------------------------------------------------
# token_first_seen_by_source (functions/text.py)
# ---------------------------------------------------------------------------


def test_token_first_seen_by_source_hand_fixture(spark, monkeypatch):
    """Two-source vocabulary: source a (doc 1) introduces apple+banana;
    source b re-uses both and introduces cherry → a: 2 distinct / 2
    first-seen (novelty 1.0), b: 3 distinct / 1 first-seen (0.3333)."""
    from minefields_kafka_streams_deduplication_spark.functions import text

    docs = _mk_docs(
        spark,
        [
            (1, "a", "apple banana"),
            (2, "b", "banana cherry"),
            (3, "b", "apple"),
        ],
    )
    monkeypatch.setattr(text, "load_table", lambda s, d, n: docs)
    got = {
        r.source: (r.n_distinct_tokens, r.n_first_seen, r.novelty_share)
        for r in text.token_first_seen_by_source(spark, "x").collect()
    }
    assert got == {"a": (2, 2, 1.0), "b": (3, 1, 0.3333)}


def test_token_first_seen_tiebreak_is_min_doc_id(spark, monkeypatch):
    """A token appearing in BOTH sources' docs attributes to the source
    of the LOWEST doc_id (ingestion-order keep-first), independent of
    row order."""
    from minefields_kafka_streams_deduplication_spark.functions import text

    docs = _mk_docs(
        spark,
        [
            (9, "a", "shared"),
            (2, "b", "shared"),  # lower doc_id wins → b
        ],
    )
    monkeypatch.setattr(text, "load_table", lambda s, d, n: docs)
    got = {
        r.source: r.n_first_seen
        for r in text.token_first_seen_by_source(spark, "x").collect()
    }
    assert got == {"a": 0, "b": 1}


# ---------------------------------------------------------------------------
# order_lines_span_days_histogram (operators/aggregations.py)
# ---------------------------------------------------------------------------


def test_order_lines_span_days_histogram_hand_fixture(spark, monkeypatch):
    """Order 1 ships lines on Jan 1 and Jan 5 (span 4), orders 2 and 3
    ship everything same-day (span 0) → histogram {0: 2, 4: 1}."""
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    li = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1)),
            (1, dt.date(2024, 1, 3)),
            (1, dt.date(2024, 1, 5)),
            (2, dt.date(2024, 2, 1)),
            (3, dt.date(2024, 3, 1)),
            (3, dt.date(2024, 3, 1)),
        ],
        "l_orderkey LONG, l_shipdate DATE",
    )
    monkeypatch.setattr(aggregations, "load_table", lambda s, d, n: li)
    got = {
        r.span_days: r.n_orders
        for r in aggregations.order_lines_span_days_histogram(
            spark, "x"
        ).collect()
    }
    assert got == {0: 2, 4: 1}


@settings(max_examples=5, deadline=None)
@given(
    lines=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 90)),
        min_size=1,
        max_size=40,
    )
)
def test_order_lines_span_days_matches_reference(spark, lines):
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    t0 = dt.date(2024, 1, 1)
    li = spark.createDataFrame(
        [(k, t0 + dt.timedelta(days=d)) for k, d in lines],
        "l_orderkey LONG, l_shipdate DATE",
    )
    orig = aggregations.load_table
    aggregations.load_table = lambda s, d, n: li
    try:
        got = {
            r.span_days: r.n_orders
            for r in aggregations.order_lines_span_days_histogram(
                spark, "x"
            ).collect()
        }
    finally:
        aggregations.load_table = orig
    per_order: dict[int, tuple[int, int]] = {}
    for k, d in lines:
        lo, hi = per_order.get(k, (d, d))
        per_order[k] = (min(lo, d), max(hi, d))
    want: dict[int, int] = {}
    for lo, hi in per_order.values():
        want[hi - lo] = want.get(hi - lo, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# session_gap_sensitivity (operators/windows.py)
# ---------------------------------------------------------------------------


def test_session_gap_sensitivity_hand_fixture(spark, monkeypatch):
    """User 1's inter-event gaps are 10/20/40/110 minutes; user 2 has a
    single event. Sessions = first-events + gaps > g:
    g=15 → 2 + |{20,40,110}| = 5; g=30 → 2 + |{40,110}| = 4;
    g=60 → 2 + |{110}| = 3."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    ev = spark.createDataFrame(
        [
            (1, 1, _ts(0)),
            (1, 2, _ts(10)),
            (1, 3, _ts(30)),
            (1, 4, _ts(70)),
            (1, 5, _ts(180)),
            (2, 1, _ts(0)),
        ],
        "user_id LONG, event_id LONG, ts TIMESTAMP",
    )
    monkeypatch.setattr(windows, "load_table", lambda s, d, n: ev)
    got = {
        r.gap_minutes: r.n_sessions
        for r in windows.session_gap_sensitivity(spark, "x").collect()
    }
    assert got == {15: 5, 30: 4, 60: 3}


def test_session_gap_boundary_is_strict(spark, monkeypatch):
    """A gap of EXACTLY g minutes does NOT split (new session iff
    gap > g) — the same boundary convention as the sessionizer."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 2, _ts(15)), (1, 3, _ts(45))],
        "user_id LONG, event_id LONG, ts TIMESTAMP",
    )
    monkeypatch.setattr(windows, "load_table", lambda s, d, n: ev)
    got = {
        r.gap_minutes: r.n_sessions
        for r in windows.session_gap_sensitivity(spark, "x").collect()
    }
    # gaps are 15 and 30 min: g=15 keeps the first pair together (15 is
    # not > 15) and splits on 30 → 2; g=30 keeps both → 1; g=60 → 1
    assert got == {15: 2, 30: 1, 60: 1}
