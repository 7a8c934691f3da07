"""Round-9 oracle-query semantics on hand fixtures and generated data —
the brute-force model pin each new query carries alongside its DuckDB
oracle (the model checks the SEMANTICS; the oracle checks the engine)."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# orders/lineitem family
# ---------------------------------------------------------------------------

orders_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),            # custkey
        st.integers(0, 600),          # order day offset
        st.floats(1.0, 500000.0, allow_nan=False, width=32),
        st.sampled_from(["O", "F", "P"]),
    ),
    min_size=1,
    max_size=40,
)


def mk_orders(spark, rows):
    t0 = dt.date(2024, 1, 1)
    data = [
        (i, u, t0 + dt.timedelta(days=d), float(p), s)
        for i, (u, d, p, s) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "o_orderkey LONG, o_custkey LONG, o_orderdate DATE, "
        "o_totalprice DOUBLE, o_orderstatus STRING",
    )


@settings(max_examples=5, deadline=None)
@given(rows=orders_strategy)
def test_order_value_buckets_match_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    df = mk_orders(spark, rows)
    orig = aggregations.load_table
    aggregations.load_table = lambda s, d, n: df
    try:
        got = {
            r.bucket: (r.n_orders, r.total_value)
            for r in aggregations.order_value_buckets(spark, "x").collect()
        }
    finally:
        aggregations.load_table = orig
    want: dict = {}
    for _u, _d, p, _s in rows:
        b = int(math.floor(float(p))) // 25000
        n, tot = want.get(b, (0, 0.0))
        want[b] = (n + 1, tot + float(p))
    assert set(got) == set(want)
    for b, (n, tot) in want.items():
        assert got[b][0] == n
        assert got[b][1] == round(round(tot, 6), 4) or abs(got[b][1] - tot) < 1e-3


@settings(max_examples=5, deadline=None)
@given(rows=orders_strategy)
def test_monthly_status_mix_matches_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    df = mk_orders(spark, rows)
    orig = aggregations.load_table
    aggregations.load_table = lambda s, d, n: df
    try:
        got = {
            (r.month, r.o_orderstatus): (r.n_orders, r.share)
            for r in aggregations.monthly_order_status_mix(spark, "x").collect()
        }
    finally:
        aggregations.load_table = orig
    counts: dict = {}
    months: dict = {}
    t0 = dt.date(2024, 1, 1)
    for _u, d, _p, s in rows:
        day = t0 + dt.timedelta(days=d)
        m = day.replace(day=1)
        counts[(m, s)] = counts.get((m, s), 0) + 1
        months[m] = months.get(m, 0) + 1
    assert set(got) == set(counts)
    for k, n in counts.items():
        assert got[k][0] == n
        assert got[k][1] == math.floor(n / months[k[0]] * 10000 + 0.5) / 10000
    # shares within a month sum to ~1 (floor rounding slack)
    for m, tot in months.items():
        ssum = sum(v[1] for k, v in got.items() if k[0] == m)
        assert abs(ssum - 1.0) < 0.001 * len(counts)


def test_clv_quartiles_hand_fixture(spark, monkeypatch):
    """Discrete lower quartiles on a known value set: values 10..80 for
    one nation → q1 = 20 (cum 2 of 8), median = 40, q3 = 60."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    orders = spark.createDataFrame(
        [(i, i, float(10 * (i + 1))) for i in range(8)],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE",
    )
    cust = spark.createDataFrame(
        [(i, 0) for i in range(8)], "c_custkey LONG, c_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(0, "ZERO")], "n_nationkey INT, n_name STRING"
    )
    tables = {"orders": orders, "customer": cust, "nation": nation}
    monkeypatch.setattr(analytic, "load_table", lambda s, d, n: tables[n])
    row = analytic.clv_quartiles_by_nation(spark, "x").collect()[0]
    assert (row.nation, row.n_customers) == ("ZERO", 8)
    assert (row.clv_q1, row.clv_median, row.clv_q3) == (20.0, 40.0, 60.0)


def test_inter_purchase_median_hand_fixture(spark, monkeypatch):
    """Gaps for one customer ordering on days 0, 3, 9, 10 → gaps
    {3, 6, 1}, median 3; a single-order customer contributes none."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 7, t0),
            (2, 7, t0 + dt.timedelta(days=3)),
            (3, 7, t0 + dt.timedelta(days=9)),
            (4, 7, t0 + dt.timedelta(days=10)),
            (5, 8, t0),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderdate DATE",
    )
    cust = spark.createDataFrame(
        [(7, 0), (8, 0)], "c_custkey LONG, c_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(0, "ZERO")], "n_nationkey INT, n_name STRING"
    )
    tables = {"orders": orders, "customer": cust, "nation": nation}
    monkeypatch.setattr(analytic, "load_table", lambda s, d, n: tables[n])
    row = analytic.inter_purchase_days_median_by_nation(spark, "x").collect()[0]
    assert (row.nation, row.n_gaps, row.median_gap_days) == ("ZERO", 3, 3)


# ---------------------------------------------------------------------------
# events seasonality
# ---------------------------------------------------------------------------

typed_events = st.lists(
    st.tuples(
        st.integers(0, 60 * 24 * 20),
        st.integers(0, 3),
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=40,
)


def _mk_events(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, t0 + dt.timedelta(minutes=m), u, ty, 1.0, "{}")
        for i, (m, u, ty) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )


@settings(max_examples=5, deadline=None)
@given(rows=typed_events)
def test_hourly_seasonality_and_peak_match_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = _mk_events(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        grid = {
            (r.dow, r.hour): (r.n_events, r.n_users)
            for r in analytic.events_hourly_seasonality(spark, "x").collect()
        }
        peaks = {
            r.dow: (r.peak_hour, r.peak_events)
            for r in analytic.weekday_hour_peak_load(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig
    t0 = dt.datetime(2024, 1, 1)
    want: dict = {}
    users: dict = {}
    for m, u, _ty in rows:
        ts = t0 + dt.timedelta(minutes=m)
        # Spark dayofweek: Sunday=1 ... Saturday=7; Python weekday Mon=0
        dow = (ts.weekday() + 1) % 7 + 1
        k = (dow, ts.hour)
        want[k] = want.get(k, 0) + 1
        users.setdefault(k, set()).add(u)
    assert grid == {k: (n, len(users[k])) for k, n in want.items()}
    for dow in {k[0] for k in want}:
        cells = [(n, h) for (d, h), n in want.items() if d == dow]
        best = max(cells)  # ties -> latest hour, the documented rule
        assert peaks[dow] == (best[1], best[0])


# ---------------------------------------------------------------------------
# session durations (shared frame consumer)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(rows=typed_events)
def test_session_duration_percentiles_match_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.operators import windows

    df = _mk_events(spark, rows)
    orig_frame = windows.session_frame
    windows.session_frame = lambda s, d: windows.build_session_frame(df)
    try:
        got = {
            r.day: (r.n_sessions, r.p50_duration_sec, r.p90_duration_sec)
            for r in windows.session_duration_percentiles(spark, "x").collect()
        }
    finally:
        windows.session_frame = orig_frame
    t0 = dt.datetime(2024, 1, 1)
    by_user: dict = {}
    for i, (m, u, _ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), i))
    durs_by_day: dict = {}
    for _u, evs in by_user.items():
        evs.sort()
        cur: list = []
        sessions = []
        prev = None
        for t, _i in evs:
            if prev is None or (t - prev).total_seconds() > 1800:
                cur = []
                sessions.append(cur)
            cur.append(t)
            prev = t
        for s in sessions:
            d = int((max(s) - min(s)).total_seconds())
            durs_by_day.setdefault(min(s).date(), []).append(d)
    want = {}
    for day, ds in durs_by_day.items():
        ds.sort()
        n = len(ds)
        p50 = next(v for i, v in enumerate(ds, 1) if 2 * i >= n)
        p90 = next(v for i, v in enumerate(ds, 1) if 10 * i >= 9 * n)
        want[day] = (n, p50, p90)
    assert got == want


# ---------------------------------------------------------------------------
# text family
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.text(
            alphabet="ab .,!0123 the and of",
            min_size=0,
            max_size=40,
        ),
    ),
    min_size=1,
    max_size=20,
)


def _mk_docs(spark, rows):
    data = [
        (i, txt, lang, f"src{i % 3}", len(txt))
        for i, (lang, txt) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
    )


@settings(max_examples=5, deadline=None)
@given(rows=docs_strategy)
def test_token_length_histogram_matches_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.functions import text as text_ops

    df = _mk_docs(spark, rows)
    orig = text_ops.load_table
    text_ops.load_table = lambda s, d, n: df
    try:
        got = {
            (r.lang, r.token_len): r.n_tokens
            for r in text_ops.token_length_histogram(spark, "x").collect()
        }
    finally:
        text_ops.load_table = orig
    want: dict = {}
    for lang, txt in rows:
        for tok in txt.lower().split(" "):
            if tok:
                k = (lang, len(tok))
                want[k] = want.get(k, 0) + 1
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=docs_strategy)
def test_stopword_density_histogram_matches_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.functions import text as text_ops

    df = _mk_docs(spark, rows)
    orig = text_ops.load_table
    text_ops.load_table = lambda s, d, n: df
    try:
        got = {
            (r.lang, r.density_decile): r.n_docs
            for r in text_ops.stopword_density_histogram(spark, "x").collect()
        }
    finally:
        text_ops.load_table = orig
    stop = set(text_ops.QUALITY_STOPWORDS)
    want: dict = {}
    for lang, txt in rows:
        toks = txt.lower().split(" ")
        if not toks:
            continue
        s = sum(1 for t in toks if t in stop)
        k = (lang, (10 * s) // len(toks))
        want[k] = want.get(k, 0) + 1
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=docs_strategy)
def test_char_class_profile_matches_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.functions import text as text_ops

    df = _mk_docs(spark, rows)
    orig = text_ops.load_table
    text_ops.load_table = lambda s, d, n: df
    try:
        out = {
            r.lang: r for r in text_ops.char_class_profile_by_lang(spark, "x").collect()
        }
    finally:
        text_ops.load_table = orig
    agg: dict = {}
    for lang, txt in rows:
        c, d_, sp, pu = (
            len(txt),
            sum(ch.isdigit() for ch in txt),
            txt.count(" "),
            sum(ch in ".,!?;:" for ch in txt),
        )
        n, tc, td, tsp, tp = agg.get(lang, (0, 0, 0, 0, 0))
        agg[lang] = (n + 1, tc + c, td + d_, tsp + sp, tp + pu)
    for lang, (n, tc, td, tsp, tp) in agg.items():
        if tc == 0:
            # all-empty texts: ratios divide by zero -> NULL on both
            # engines; the row still reports the counts
            assert out[lang].n_docs == n and out[lang].total_chars == 0
            continue
        r = out[lang]
        assert (r.n_docs, r.total_chars) == (n, tc)
        assert r.digit_ratio == math.floor(td / tc * 10000 + 0.5) / 10000
        assert r.space_ratio == math.floor(tsp / tc * 10000 + 0.5) / 10000
        assert r.punct_ratio == math.floor(tp / tc * 10000 + 0.5) / 10000


# ---------------------------------------------------------------------------
# lineitem family (hand fixtures — the join shapes)
# ---------------------------------------------------------------------------

def test_shipping_delay_and_discount_curve_hand_fixture(spark, monkeypatch):
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    t0 = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(days=5))],
        "o_orderkey LONG, o_orderdate DATE",
    )
    li = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(days=3), 100.0, 0.05),
            (1, t0 + dt.timedelta(days=7), 200.0, 0.00),
            (2, t0 + dt.timedelta(days=5), 300.0, 0.05),
        ],
        "l_orderkey LONG, l_shipdate DATE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE",
    )
    tables = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(aggregations, "load_table", lambda s, d, n: tables[n])
    delays = {
        r.delay_days: r.n_items
        for r in aggregations.shipping_delay_histogram(spark, "x").collect()
    }
    assert delays == {3: 1, 7: 1, 0: 1}

    curve = {
        r.l_discount: (r.n_items, r.revenue, r.revenue_share)
        for r in aggregations.discount_revenue_curve(spark, "x").collect()
    }
    # revenue: 0.05 -> 95 + 285 = 380; 0.0 -> 200; total 580
    assert curve[0.05][0] == 2 and curve[0.0][0] == 1
    assert curve[0.05][1] == 380.0 and curve[0.0][1] == 200.0
    assert curve[0.05][2] == math.floor(380 / 580 * 10000 + 0.5) / 10000
    assert curve[0.0][2] == math.floor(200 / 580 * 10000 + 0.5) / 10000


# ---------------------------------------------------------------------------
# batch 2: funnel depth, day-0 conversion, confusion matrix, baskets
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(rows=typed_events)
def test_funnel_depth_and_day0_conversion_match_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = _mk_events(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        depths = {
            r.depth: r.n_users
            for r in analytic.user_funnel_depth_distribution(spark, "x").collect()
        }
        conv = {
            r.cohort_day: (r.n_users, r.n_converted, r.conversion_rate)
            for r in analytic.first_day_conversion_by_cohort(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig
    t0 = dt.datetime(2024, 1, 1)
    rank = {"purchase": 3, "click": 2, "view": 1}
    by_user: dict = {}
    for m, u, ty in rows:
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), ty))
    want_d: dict = {}
    cohorts: dict = {}
    for u, evs in by_user.items():
        d = max(rank.get(ty, 0) for _t, ty in evs)
        want_d[d] = want_d.get(d, 0) + 1
        first = min(t for t, _ty in evs)
        converted = any(
            ty == "purchase" and t.date() == first.date() for t, ty in evs
        )
        n, c = cohorts.get(first.date(), (0, 0))
        cohorts[first.date()] = (n + 1, c + converted)
    assert depths == want_d
    assert set(conv) == set(cohorts)
    for day, (n, c) in cohorts.items():
        assert conv[day][:2] == (n, c)
        assert conv[day][2] == math.floor(c / n * 10000 + 0.5) / 10000


def test_confusion_matrix_diagonal_consistency(spark, sf_dir):
    """The confusion matrix is exactly the grouped scorer: cell sums
    equal the per-doc scorer's counts, and every fixture doc appears
    in exactly one cell."""
    import minefields_kafka_streams_deduplication_spark as engine

    qs = engine.get_queries()
    matrix = {
        (r.lang, r.predicted_lang): r.n_docs
        for r in qs["lang_confusion_matrix"](spark, sf_dir).collect()
    }
    scored = qs["lang_id_stopwords"](spark, sf_dir).collect()
    want: dict = {}
    for r in scored:
        k = (r.lang, r.predicted_lang)
        want[k] = want.get(k, 0) + 1
    assert matrix == want
    assert sum(matrix.values()) == len(scored)


def test_basket_and_part_type_hand_fixture(spark, monkeypatch):
    from minefields_kafka_streams_deduplication_spark.operators import aggregations

    li = spark.createDataFrame(
        [
            (1, 100, 100.0, 0.0, "N"),
            (1, 101, 200.0, 0.5, "R"),
            (2, 100, 50.0, 0.0, "N"),
        ],
        "l_orderkey LONG, l_partkey LONG, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_returnflag STRING",
    )
    part = spark.createDataFrame(
        [(100, "A"), (101, "B")], "p_partkey LONG, p_type STRING"
    )
    t0 = dt.date(2024, 1, 15)
    orders = spark.createDataFrame(
        [(1, t0), (2, dt.date(2024, 2, 1))], "o_orderkey LONG, o_orderdate DATE"
    )
    tables = {"lineitem": li, "part": part, "orders": orders}
    monkeypatch.setattr(aggregations, "load_table", lambda s, d, n: tables[n])

    baskets = {
        r.basket_size: r.n_orders
        for r in aggregations.basket_size_distribution(spark, "x").collect()
    }
    assert baskets == {2: 1, 1: 1}

    top = [
        (r.p_type, r.n_items, r.revenue)
        for r in aggregations.part_type_revenue_topk(spark, "x").collect()
    ]
    # A: 100 + 50 = 150; B: 200*0.5 = 100 -> A first
    assert top == [("A", 2, 150.0), ("B", 1, 100.0)]

    rates = {
        str(r.month): (r.n_items, r.n_returned, r.return_rate)
        for r in aggregations.returned_rate_by_month(spark, "x").collect()
    }
    assert rates == {
        "2024-01-01": (2, 1, 0.5),
        "2024-02-01": (1, 0, 0.0),
    }


@settings(max_examples=5, deadline=None)
@given(rows=docs_strategy)
def test_token_budget_and_dedup_savings_match_reference(spark, rows):
    from minefields_kafka_streams_deduplication_spark.functions import (
        pipeline as pipe,
    )

    df = _mk_docs(spark, rows)
    orig = pipe.load_table
    pipe.load_table = lambda s, d, n: df
    try:
        budget = {
            r.source: (r.n_docs, r.total_tokens, r.token_share)
            for r in pipe.corpus_token_budget_by_source(spark, "x").collect()
        }
        savings = {
            r.source: (r.n_docs, r.n_distinct, r.dup_docs, r.chars_saved)
            for r in pipe.dedup_savings_by_source(spark, "x").collect()
        }
    finally:
        pipe.load_table = orig

    toks: dict = {}
    groups: dict = {}
    for i, (lang, txt) in enumerate(rows):
        src = f"src{i % 3}"
        n, t = toks.get(src, (0, 0))
        toks[src] = (n + 1, t + len(txt.lower().split(" ")))
        k = (src, txt.lower(), len(txt))
        groups[k] = groups.get(k, 0) + 1
    total = sum(t for _n, t in toks.values())
    assert set(budget) == set(toks)
    for src, (n, t) in toks.items():
        assert budget[src][:2] == (n, t)
        assert budget[src][2] == math.floor(t / total * 10000 + 0.5) / 10000
    want: dict = {}
    for (src, _txt, nc), w in groups.items():
        n, d, dup, saved = want.get(src, (0, 0, 0, 0))
        want[src] = (n + w, d + 1, dup + w - 1, saved + (w - 1) * nc)
    assert savings == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events)
def test_value_percentiles_match_reference(spark, rows):
    """Exact per-type percentiles equal the brute-force sorted pick at
    each rational threshold."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    # vary values so percentiles are non-trivial
    df = _mk_events(spark, rows)
    df = df.withColumn("value", (F.col("event_id") % 7).cast("double"))
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            r.event_type: (r.n_events, r.p25, r.p50, r.p75, r.p95)
            for r in analytic.value_percentiles_by_type(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig
    vals: dict = {}
    for i, (_m, _u, ty) in enumerate(rows):
        vals.setdefault(ty, []).append(float(i % 7))
    want = {}
    for ty, vs in vals.items():
        vs.sort()
        n = len(vs)

        def pick(num, den):
            return next(v for i, v in enumerate(vs, 1) if den * i >= num * n)

        want[ty] = (n, pick(1, 4), pick(1, 2), pick(3, 4), pick(19, 20))
    assert got == want
