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


docs_strategy = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(token_lists=docs_strategy)
def test_scrub_invariants_on_random_corpora(spark, token_lists):
    """Invariants of the repeated-span scrub on arbitrary corpora:
    (1) kept text is a subsequence of the original tokens,
    (2) n_removed_tokens accounting is exact,
    (3) every doc comes back exactly once,
    (4) idempotence on span-free docs: if nothing was removed anywhere,
        output text equals input text."""
    from minefields_kafka_streams_deduplication_spark.functions.neardup import (
        scrub_repeated_spans_df,
    )

    rows = [
        (i, " ".join(toks), "en", "s", len(" ".join(toks)))
        for i, toks in enumerate(token_lists)
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    out = {r.doc_id: r for r in scrub_repeated_spans_df(df).collect()}
    assert set(out) == {i for i, _ in enumerate(token_lists)}
    for i, toks in enumerate(token_lists):
        orig = [t for t in " ".join(toks).lower().split(" ") if t != ""]
        kept = [t for t in out[i].scrubbed_text.split(" ") if t != ""]
        assert out[i].n_removed_tokens == len(orig) - len(kept)
        it = iter(orig)
        assert all(any(t == o for o in it) for t in kept), (orig, kept)


SESSION_GAP = dt.timedelta(minutes=30)


def _reference_sessions(rows, *, new_session_at_exact_gap):
    """Brute-force sessionization model: per user, time-ordered events
    split where the gap exceeds 30 minutes. The new_session_at_exact_gap
    knob is retained to DOCUMENT the falsified hypothesis: Spark's
    session_window merges touching windows (exact gap == same session),
    so both engine forms use the > boundary and passing True here
    describes a semantics Spark does not have. Returns {(user,
    start_minute_offset, n_events, total_value)}."""
    t0 = dt.datetime(2024, 1, 1)
    by_user = {}
    for i, (m, u, v) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), i, v))
    out = set()
    for u, evs in by_user.items():
        evs.sort()
        cur = []
        for ts, i, v in evs:
            if cur:
                gap = ts - cur[-1][0]
                is_new = (
                    gap >= SESSION_GAP if new_session_at_exact_gap else gap > SESSION_GAP
                )
            else:
                is_new = True
            if is_new and cur:
                out.add((u, cur[0][0], len(cur), round(sum(x[2] for x in cur), 4)))
                cur = []
            cur.append((ts, i, v))
        if cur:
            out.add((u, cur[0][0], len(cur), round(sum(x[2] for x in cur), 4)))
    return out


@settings(max_examples=5, deadline=None)
@given(rows=events_strategy)
def test_sessionization_both_forms_match_reference(spark, rows):
    """W3 property: both sessionization forms share the inclusive-gap
    boundary (new session only at gap > 30 min — Spark's session_window
    merges touching windows, same as KS SessionWindows) and must match
    the brute-force model on random event sets. Minute-granularity
    offsets make exact-gap pairs common: this property falsified the
    earlier claim that the native form split at gap >= 30."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    df = mk(spark, rows)
    orig = windows.load_table
    orig_frame = windows.session_frame
    windows.load_table = lambda s, d, n: df
    # the sql form serves from the persisted shared frame (r9) —
    # inject an in-memory build over the generated events instead
    windows.session_frame = lambda s, d: windows.build_session_frame(
        df.withColumn("event_type", F.lit("x"))
    )
    try:
        native = {
            (r.user_id, r.session_start, r.n_events, round(r.total_value, 4))
            for r in windows.window_session_native(spark, "ignored").collect()
        }
        sql_form = {
            (r.user_id, r.session_start, r.n_events, round(r.total_value, 4))
            for r in windows.window_session_sql(spark, "ignored")
            .select("user_id", "session_start", "n_events", "total_value")
            .collect()
        }
    finally:
        windows.load_table = orig
        windows.session_frame = orig_frame
    assert native == _reference_sessions(rows, new_session_at_exact_gap=False)
    assert sql_form == _reference_sessions(rows, new_session_at_exact_gap=False)


@settings(max_examples=5, deadline=None)
@given(rows=events_strategy)
def test_time_weighted_avg_matches_reference(spark, rows):
    """Timeseries property: the TWA equals the brute-force
    duration-weighted mean on random irregular event sets (same-day
    fixture; duplicate timestamps contribute zero-length segments and
    are excluded on both sides)."""
    from minefields_kafka_streams_deduplication_spark.operators import timeseries as ts_ops

    df = mk(spark, rows).withColumn("event_type", F.lit("x"))
    orig = ts_ops.load_table
    ts_ops.load_table = lambda s, d, n: df
    try:
        got = {
            (r.user_id, r.day): (r.n_events, r.twa)
            for r in ts_ops.time_weighted_avg_daily(spark, "x").collect()
        }
    finally:
        ts_ops.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    by_user = {}
    for i, (m, u, v) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), i, v))
    expected = {}
    for u, evs in by_user.items():
        evs.sort()
        num = den = 0.0
        n_seg = 0
        for (ts1, _, v), (ts2, _, _) in zip(evs, evs[1:]):
            dur = (ts2 - ts1).total_seconds() * 1e6
            if dur > 0:
                num += v * dur
                den += dur
                n_seg += 1
        if n_seg:
            q = num / den
            expected[(u, t0.date())] = (n_seg, (q * 10000 + 0.5) // 1 / 10000)
    assert got == expected


typed_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 60 * 24 * 20),   # minutes offset over ~3 weeks
        st.integers(0, 3),              # user_id
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=0,
    max_size=30,
)


def mk_typed(spark, rows):
    t0 = dt.datetime(2024, 1, 1)  # a Monday — cohort weeks align
    data = [
        (i, t0 + dt.timedelta(minutes=m), u, ty, 1.0, "{}")
        for i, (m, u, ty) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    )


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_funnel_matches_reference(spark, rows):
    """Funnel property: step counts equal the brute-force
    min-chaining model (first view, first click strictly after it,
    first purchase strictly after that) on random event sets."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            r.step: r.n_users
            for r in analytic.funnel_view_click_purchase(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    by_user = {}
    for i, (m, u, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), ty))
    v = c = p = 0
    for u, evs in by_user.items():
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        if t1 is None:
            continue
        v += 1
        t2 = min((t for t, ty in evs if ty == "click" and t > t1), default=None)
        if t2 is None:
            continue
        c += 1
        t3 = min((t for t, ty in evs if ty == "purchase" and t > t2), default=None)
        if t3 is not None:
            p += 1
    assert got.get("1_view", 0) == v
    assert got.get("2_click_after_view", 0) == (c if v else 0)
    assert got.get("3_purchase_after_click", 0) == (p if v else 0)


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_interval_join_matches_reference(spark, rows):
    """Interval-join property: the (view, purchase) pair set equals the
    brute-force window filter v.ts <= p.ts <= v.ts + 10min per user."""
    from minefields_kafka_streams_deduplication_spark.operators import joins

    df = mk_typed(spark, rows)
    orig = joins.load_table
    joins.load_table = lambda s, d, n: df
    try:
        got = {
            (r.view_id, r.purchase_id)
            for r in joins.join_interval_view_purchase(spark, "x").collect()
        }
    finally:
        joins.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    ten = dt.timedelta(minutes=10)
    evs = [
        (i, t0 + dt.timedelta(minutes=m), u, ty) for i, (m, u, ty) in enumerate(rows)
    ]
    want = {
        (vi, pi)
        for vi, vt, vu, vty in evs
        if vty == "view"
        for pi, pt, pu, pty in evs
        if pty == "purchase" and pu == vu and vt <= pt <= vt + ten
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_cohort_retention_matches_reference(spark, rows):
    """Cohort property: the (cohort_week, offset) -> n_active matrix
    equals the brute-force first-seen-week model."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            (str(r.cohort_week), r.week_offset): r.n_active
            for r in analytic.cohort_weekly_retention(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    by_user = {}
    for i, (m, u, ty) in enumerate(rows):
        ts = t0 + dt.timedelta(minutes=m)
        by_user.setdefault(u, []).append(ts)
    want: dict = {}
    for u, tss in by_user.items():
        wk = lambda ts: (ts - dt.timedelta(days=ts.weekday())).date()
        cohort = wk(min(tss))
        offsets = {(wk(ts) - cohort).days // 7 for ts in tss}
        for off in offsets:
            key = (str(cohort), off)
            want[key] = want.get(key, 0) + 1
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_tombstone_table_matches_reference(spark, rows):
    """Tombstone-KTable property: the materialized table equals the
    brute-force model (latest record per key by (ts, event_id); key
    absent iff that record is an 'error' tombstone) on random typed
    event sets — exercises delete-last, delete-then-reinsert, and
    same-ts tiebreaks."""
    from minefields_kafka_streams_deduplication_spark.operators import scan

    df = mk_typed(spark, rows)
    orig = scan.load_table
    scan.load_table = lambda s, d, n: df
    try:
        got = {
            r.user_id: (r.event_id, r.event_type)
            for r in scan.latest_by_key_tombstoned(spark, "x").collect()
        }
    finally:
        scan.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    winners: dict = {}
    for i, (m, u, ty) in enumerate(rows):
        key = (t0 + dt.timedelta(minutes=m), i)
        if u not in winners or key > winners[u][0]:
            winners[u] = (key, i, ty)
    want = {
        u: (eid, ty) for u, (_, eid, ty) in winners.items() if ty != "error"
    }
    assert got == want


store_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 50),   # minutes offset (duplicate ts across rows likely)
        st.integers(0, 6),    # user_id (small domain → multi-version keys)
        st.sampled_from([1.0, 2.0]),
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(rows=store_events_strategy)
def test_interactive_store_matches_latest_per_key_model(spark, rows, tmp_path_factory):
    """[R ReadOnlyKeyValueStore] get/range/all against a reference
    model: for ANY event set, every verb must serve exactly the
    latest-(ts, event_id) row per key. Covers ts ties (event_id
    tiebreak), absent keys, and empty stores."""
    from minefields_kafka_streams_deduplication_spark.sources.state_store import (
        build_keyed_store,
        store_all,
        store_get,
        store_range,
    )

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (u, i, t0 + dt.timedelta(minutes=m), "view", v)
        for i, (m, u, v) in enumerate(rows)
    ]
    schema = "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    model: dict = {}
    for u, i, ts, _t, v in data:
        cur = model.get(u)
        if cur is None or (ts, i) > (cur[0], cur[1]):
            model[u] = (ts, i, v)
    root = str(tmp_path_factory.mktemp("iq_prop"))
    build_keyed_store(spark.createDataFrame(data, schema), root)
    got_all = {r.user_id: (r.ts, r.event_id, r.value)
               for r in store_all(spark, root).collect()}
    assert got_all == model
    probe = list(model) + [99]  # 99 never generated: absent-key probe
    got = {r.user_id: (r.ts, r.event_id, r.value)
           for r in store_get(spark, root, probe).collect()}
    assert got == model
    got_rng = {r.user_id for r in store_range(spark, root, 2, 4).collect()}
    assert got_rng == {u for u in model if 2 <= u <= 4}


docs_tokens_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
    min_size=0,
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(token_lists=docs_tokens_strategy)
def test_bpe_pair_counts_match_counter_model(spark, token_lists):
    """Adjacent-pair counting against a collections.Counter model on
    arbitrary token lists (including empty and 1-token docs, which
    contribute no pairs)."""
    from collections import Counter

    from pyspark.sql import functions as F

    model = Counter(
        f"{toks[i]} {toks[i+1]}"
        for toks in token_lists
        for i in range(len(toks) - 1)
    )
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id LONG, text STRING",
    )
    toks = docs.select(F.split(F.lower("text"), " ").alias("tokens")).where(
        F.size("tokens") >= 2
    )
    n = F.size("tokens")
    zipped = F.arrays_zip(
        F.slice("tokens", 1, n - 1), F.expr("slice(tokens, 2, size(tokens) - 1)")
    )
    got = Counter(
        {
            r.pair: r.n
            for r in toks.select(F.explode(zipped).alias("p"))
            .select(F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    )
    # A doc of "" splits to [''] (size 1) -> filtered; single tokens too.
    assert got == Counter({k: v for k, v in model.items() if v}), (got, model)


@settings(max_examples=5, deadline=None)
@given(rows=store_events_strategy, as_of_min=st.integers(-1, 55))
def test_versioned_store_as_of_matches_model(spark, rows, as_of_min, tmp_path_factory):
    """[R ReadOnlyVersionedKeyValueStore#get(key, asOf)] against a
    reference model: for ANY event set and ANY as-of point (before,
    inside, and after the version history), the as-of read serves
    exactly the latest-(ts, event_id) version at or before the
    timestamp — and nothing for keys whose history starts later."""
    from minefields_kafka_streams_deduplication_spark.sources.state_store import (
        build_versioned_store,
        versioned_store_get,
    )

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (u, i, t0 + dt.timedelta(minutes=m), "view", v)
        for i, (m, u, v) in enumerate(rows)
    ]
    schema = "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    as_of = t0 + dt.timedelta(minutes=as_of_min)
    model: dict = {}
    for u, i, ts, _t, v in data:
        if ts > as_of:
            continue
        cur = model.get(u)
        if cur is None or (ts, i) > (cur[0], cur[1]):
            model[u] = (ts, i, v)
    root = str(tmp_path_factory.mktemp("iq_vprop"))
    build_versioned_store(spark.createDataFrame(data, schema), root)
    probe = list({u for _m, u, _v in rows}) + [99]  # 99: absent-key probe
    got = {
        r.user_id: (r.ts, r.event_id, r.value)
        for r in versioned_store_get(
            spark, root, probe, as_of.strftime("%Y-%m-%d %H:%M:%S")
        ).collect()
    }
    assert got == model


corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=5, deadline=None)
@given(texts=corpus_strategy)
def test_bpe_train_matches_model_on_random_corpora(spark, texts):
    """bpe_train_merges against the pure-Python greedy trainer on
    ARBITRARY small-alphabet corpora — the 3-letter alphabet forces
    dense pair collisions, overlap chains (aaaa...), ties, and merged
    tokens that immediately re-pair in later rounds."""
    from tests.test_text import _ref_bpe_train
    from minefields_kafka_streams_deduplication_spark.functions.text import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    assert bpe_train_merges(docs, n_merges=3) == _ref_bpe_train(texts, 3)


def test_winsorized_quantiles_match_python_reference(spark, monkeypatch):
    """Hypothesis pin for the checkpointed per-group CDF quantiles in
    events_winsorized_stats: on arbitrary random value multisets
    (duplicates, negatives, single-row groups) the selected p01/p99,
    clip counts and winsorized sum must equal a direct pure-Python
    evaluation of the same definition (value at rank ceil(p*n) under
    (value, event_id) order == smallest value with CDF >= index)."""
    import datetime as dt
    import math

    from hypothesis import given, settings, strategies as st

    from minefields_kafka_streams_deduplication_spark.operators import aggregations as ag

    vals = st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    )

    @given(vals, vals)
    @settings(max_examples=12, deadline=None)
    def run(va, vb):
        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for et, vs in (("a", va), ("b", vb)):
            for v in vs:
                rows.append((eid, t0, 1, et, float(v) / 4))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
        )
        monkeypatch.setattr(ag, "load_table", lambda s, d, n: df)
        got = {r.event_type: r for r in ag.events_winsorized_stats(spark, "x").collect()}
        monkeypatch.undo()

        for et, vs in (("a", va), ("b", vb)):
            xs = sorted(float(v) / 4 for v in vs)
            n = len(xs)
            lo = xs[math.ceil(ag.WINSOR_LO * n) - 1]
            hi = xs[math.ceil(ag.WINSOR_HI * n) - 1]
            clipped = sum(1 for x in xs if x < lo or x > hi)
            wsum = round(sum(min(max(x, lo), hi) for x in xs), 4)
            r = got[et]
            assert r.p01 == lo and r.p99 == hi, (et, r, lo, hi)
            assert r.n_clipped == clipped and r.n_events == n
            assert abs(r.winsorized_sum - wsum) < 1e-9, (r.winsorized_sum, wsum)

    run()


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_scrub_keep_first_every_repeat_survives_intact(spark, data):
    """The r7 run-level attribution guarantee (VERDICT r6 #5): every
    n-token window occurring in more than one document survives
    CONTIGUOUSLY in at least one scrubbed output — the keeper's merged
    run is kept whole, so overlapping repeats with different keepers
    can no longer fragment every copy. Corpora are built from a shared
    phrase pool plus doc-unique filler so cross-doc repeats (including
    straddling/overlapping ones) actually occur."""
    from minefields_kafka_streams_deduplication_spark.functions.neardup import (
        SCRUB_SPAN_TOKENS,
        scrub_repeated_spans_df,
    )

    n = SCRUB_SPAN_TOKENS
    vocab = [f"p{i}" for i in range(6)]
    phrases = data.draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=n, max_size=n + 4),
            min_size=1,
            max_size=3,
        )
    )
    n_docs = data.draw(st.integers(min_value=2, max_value=6))
    docs = []
    for d in range(n_docs):
        parts: list = []
        for s in range(data.draw(st.integers(min_value=1, max_value=3))):
            if data.draw(st.booleans()):
                parts += phrases[
                    data.draw(st.integers(min_value=0, max_value=len(phrases) - 1))
                ]
            else:
                parts += [
                    f"u{d}x{s}x{j}"
                    for j in range(data.draw(st.integers(min_value=0, max_value=4)))
                ]
        docs.append(parts)
    rows = [
        (i, " ".join(toks), "en", "s", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    out = {r.doc_id: r for r in scrub_repeated_spans_df(df).collect()}
    kept = {
        d: [t for t in out[d].scrubbed_text.split(" ") if t != ""]
        for d in out
    }
    from collections import defaultdict

    wins: dict = defaultdict(set)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - n + 1):
            wins[tuple(toks[i : i + n])].add(d)
    for w, holders in wins.items():
        if len(holders) < 2:
            continue
        survives = any(
            any(tuple(kt[i : i + n]) == w for i in range(len(kt) - n + 1))
            for kt in kept.values()
        )
        assert survives, (w, docs, {d: kept[d] for d in kept})


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),        # group
            st.integers(min_value=-50, max_value=50),  # value
            st.integers(min_value=1, max_value=9),     # count
        ),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_value_cdf_matches_model(spark, rows):
    """`_grouped_value_cdf` (the shared skeleton under the grouped
    quantile/median/bucketed queries) must equal a pure-Python
    group-sorted cumulative sum on arbitrary collapsed frames —
    including duplicate (group, value) input rows, negative values,
    and single-row groups. The helper's range partitioning, local
    cumsum and offsets join are all invisible at the contract level."""
    from minefields_kafka_streams_deduplication_spark.operators.analytic import (
        _grouped_value_cdf,
    )

    # collapse duplicates the way callers do (the helper's contract is
    # a (group, value)-unique collapsed frame)
    agg: dict = {}
    for g, v, c in rows:
        agg[(g, v)] = agg.get((g, v), 0) + c
    df = spark.createDataFrame(
        [(g, v, c) for (g, v), c in agg.items()], "g STRING, v LONG, c LONG"
    )
    got = {
        (r.g, r.v): r.cum for r in _grouped_value_cdf(df, "g", "v").collect()
    }
    model: dict = {}
    for g in {g for g, _ in agg}:
        run = 0
        for v in sorted(v for gg, v in agg if gg == g):
            run += agg[(g, v)]
            model[(g, v)] = run
    assert got == model


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_streak_matches_reference(spark, rows):
    """Gaps-and-islands property (r8): per-user longest consecutive-day
    streak and active-day count equal the brute-force day-set walk."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            r.user_id: (r.longest_streak, r.n_active_days)
            for r in analytic.streak_longest_daily(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    days_by_user: dict = {}
    for m, u, _ty in rows:
        days_by_user.setdefault(u, set()).add(
            (t0 + dt.timedelta(minutes=m)).date()
        )
    want = {}
    for u, days in days_by_user.items():
        best = run = 0
        prev = None
        for d in sorted(days):
            run = run + 1 if prev is not None and (d - prev).days == 1 else 1
            best = max(best, run)
            prev = d
        want[u] = (best, len(days))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_gini_matches_reference(spark, rows):
    """The CDF-run Gini (r8) equals the textbook sorted-rank formula
    computed in pure Python per event type (round4f'd identically)."""
    import math

    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            r.event_type: (r.n_users, r.total_events, r.gini)
            for r in analytic.activity_gini_by_type(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    counts: dict = {}
    for _m, u, ty in rows:
        counts.setdefault(ty, {}).setdefault(u, 0)
        counts[ty][u] += 1
    want = {}
    for ty, per_user in counts.items():
        xs = sorted(per_user.values())
        n, tot = len(xs), sum(xs)
        g = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
            n + 1.0
        ) / n
        want[ty] = (n, tot, math.floor(g * 10000 + 0.5) / 10000.0)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_session_paths_match_reference(spark, rows):
    """Session-path mining (r8): the path multiset equals a brute-force
    30-minute-gap sessionizer taking each session's first 3 types."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    df = mk_typed(spark, rows)
    orig_frame = windows.session_frame
    windows.session_frame = lambda s, d: windows.build_session_frame(df)
    try:
        got = {
            (r.path, r.n_sessions)
            for r in windows.session_path_topk(spark, "x").collect()
        }
    finally:
        windows.session_frame = orig_frame

    t0 = dt.datetime(2024, 1, 1)
    by_user: dict = {}
    for i, (m, u, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), i, ty))
    paths: dict = {}
    for u, evs in by_user.items():
        evs.sort()
        sessions: list = []
        prev = None
        for t, _i, ty in evs:
            if prev is None or (t - prev).total_seconds() > 1800:
                sessions.append([])
            sessions[-1].append(ty)
            prev = t
        for s in sessions:
            p = ">".join(s[:3])
            paths[p] = paths.get(p, 0) + 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    # ties at the cut can differ only if the model's 20th and 21st
    # counts tie on count AND the engine picked the other; both sort
    # (count desc, path asc) so the sets must match exactly
    assert got == set(top)


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_power_user_concentration_matches_reference(spark, rows):
    """Top-1% concentration (r8) equals the brute-force sort-and-slice
    (ceil(n/100) users by count desc, user_id asc)."""
    import math

    from minefields_kafka_streams_deduplication_spark.operators import analytic

    if not rows:
        return  # empty corpus: the aggregate row is all-null, not graded
    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        r = analytic.power_user_concentration(spark, "x").collect()[0]
    finally:
        analytic.load_table = orig

    counts: dict = {}
    for _m, u, _ty in rows:
        counts[u] = counts.get(u, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    k = math.ceil(len(ordered) / 100.0)
    top = ordered[:k]
    tot = sum(counts.values())
    te = sum(c for _u, c in top)
    assert (r.n_users, r.top1pct_users, r.top1pct_events, r.total_events) == (
        len(ordered), k, te, tot
    )
    assert r.events_share == math.floor(te / tot * 10000 + 0.5) / 10000.0


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_type_user_jaccard_matches_reference(spark, rows):
    """Audience-overlap Jaccard (r8) equals brute-force set arithmetic
    per ordered type pair."""
    import math

    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            (r.type_a, r.type_b): (r.n_both, r.n_union, r.jaccard)
            for r in analytic.event_type_user_jaccard(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    sets: dict = {}
    for _m, u, ty in rows:
        sets.setdefault(ty, set()).add(u)
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                i = len(sets[a] & sets[b])
                un = len(sets[a] | sets[b])
                want[(a, b)] = (i, un, math.floor(i / un * 10000 + 0.5) / 10000.0)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_median_session_length_matches_reference(spark, rows):
    """Per-day discrete session-length median (r8) equals the
    brute-force sessionizer + sorted-middle pick."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    df = mk_typed(spark, rows)
    orig_frame = windows.session_frame
    windows.session_frame = lambda s, d: windows.build_session_frame(df)
    try:
        got = {
            r.day: (r.n_sessions, r.median_session_events)
            for r in windows.median_session_length_by_day(spark, "x").collect()
        }
    finally:
        windows.session_frame = orig_frame

    t0 = dt.datetime(2024, 1, 1)
    by_user: dict = {}
    for i, (m, u, _ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), i))
    lengths_by_day: dict = {}
    for u, evs in by_user.items():
        evs.sort()
        cur: list = []
        prev = None
        sessions = []
        for t, _i in evs:
            if prev is None or (t - prev).total_seconds() > 1800:
                cur = []
                sessions.append(cur)
            cur.append(t)
            prev = t
        for s in sessions:
            lengths_by_day.setdefault(min(s).date(), []).append(len(s))
    want = {}
    for day, ls in lengths_by_day.items():
        ls.sort()
        n = len(ls)
        want[day] = (n, ls[(n + 1) // 2 - 1])
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.sampled_from(["web", "wiki"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_chi2_cells_match_reference(spark, cells):
    """The per-cell chi-square grid (r8) equals the textbook
    O/E/(O−E)²/E computation in pure Python, including the floor-form
    rounding, on random (lang, source) corpora."""
    import math

    from minefields_kafka_streams_deduplication_spark.functions import pipeline as pl

    df = spark.createDataFrame(
        [(i, "t", lang, src, 1) for i, (lang, src) in enumerate(cells)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT",
    )
    orig = pl.load_table
    pl.load_table = lambda s, d, n: df
    try:
        got = {
            (r.lang, r.source): (r.observed, r.expected, r.chi2_contrib)
            for r in pl.lang_source_chi2_cells(spark, "x").collect()
        }
    finally:
        pl.load_table = orig

    obs: dict = {}
    for lang, src in cells:
        obs[(lang, src)] = obs.get((lang, src), 0) + 1
    n = len(cells)
    rt: dict = {}
    ct: dict = {}
    for (lang, src), o in obs.items():
        rt[lang] = rt.get(lang, 0) + o
        ct[src] = ct.get(src, 0) + o

    def r4(x):
        return math.floor(x * 10000 + 0.5) / 10000.0

    want = {}
    for (lang, src), o in obs.items():
        e = rt[lang] * ct[src] / n
        want[(lang, src)] = (o, r4(e), r4((o - e) * (o - e) / e))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 12),          # custkey
            st.sampled_from(["A", "B", "C"]),  # nation
            st.integers(1, 5),           # per-order price (ties likely)
            st.integers(1, 3),           # orders per customer
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    )
)
def test_spend_percentile_matches_reference(spark, rows):
    """Grouped percent_rank from the value CDF (r8) equals the textbook
    (rank−1)/(n−1) with ties-share-min — including single-customer
    nations (percentile 0) and tied spends."""
    import math

    from minefields_kafka_streams_deduplication_spark.operators import analytic

    orders = spark.createDataFrame(
        [
            (1000 * ck + i, ck, float(price), "1996-01-01", "O", "1-URGENT")
            for ck, _n, price, cnt in rows
            for i in range(cnt)
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, o_orderdate STRING, o_orderstatus STRING, o_orderpriority STRING",
    )
    customer = spark.createDataFrame(
        [(ck, f"c{ck}", {"A": 0, "B": 1, "C": 2}[n], 0.0, "m") for ck, n, _p, _c in rows],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 1), (2, "C", 2)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    tables = {"orders": orders, "customer": customer, "nation": nation}
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: tables[n]
    try:
        got = {
            r.custkey: (r.nation, r.spend, r.spend_percentile)
            for r in analytic.customer_spend_percentile_by_nation(
                spark, "x"
            ).collect()
        }
    finally:
        analytic.load_table = orig

    spend = {ck: (n, float(price * cnt)) for ck, n, price, cnt in rows}
    by_nation: dict = {}
    for ck, (n, s) in spend.items():
        by_nation.setdefault(n, []).append((ck, s))
    want = {}
    for n, members in by_nation.items():
        vals = sorted(s for _ck, s in members)
        total = len(members)
        for ck, s in members:
            if total == 1:
                p = 0.0
            else:
                rank = vals.index(s) + 1  # ties share the MIN rank
                p = math.floor((rank - 1) / (total - 1) * 10000 + 0.5) / 10000.0
            want[ck] = (n, s, p)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-5, 5)),  # (order key, signed val)
        min_size=1,
        max_size=30,
    )
)
def test_global_running_sum_matches_reference(spark, rows):
    """`_global_running_sum` (r8, the SIGNED cumsum variant) equals the
    plain Python prefix sum for arbitrary positive/negative values —
    the case `_grouped_value_cdf`'s max-based partition totals would
    get wrong."""
    from minefields_kafka_streams_deduplication_spark.operators.analytic import (
        _global_running_sum,
    )

    agg: dict = {}
    for k, v in rows:
        agg[k] = agg.get(k, 0) + v
    df = spark.createDataFrame(list(agg.items()), "k LONG, v LONG")
    got = {r.k: r.run_sum for r in _global_running_sum(df, "k", "v").collect()}
    run = 0
    want = {}
    for k in sorted(agg):
        run += agg[k]
        want[k] = run
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_new_vs_returning_matches_reference(spark, rows):
    """Daily new/returning split (r8) equals the brute-force first-day
    classification over each user's active-day set."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = mk_typed(spark, rows)
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            r.day: (r.new_users, r.returning_users)
            for r in analytic.new_vs_returning_daily(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    t0 = dt.datetime(2024, 1, 1)
    days_by_user: dict = {}
    for m, u, _ty in rows:
        days_by_user.setdefault(u, set()).add((t0 + dt.timedelta(minutes=m)).date())
    want: dict = {}
    for u, days in days_by_user.items():
        first = min(days)
        for d in days:
            new, ret = want.get(d, (0, 0))
            if d == first:
                want[d] = (new + 1, ret)
            else:
                want[d] = (new, ret + 1)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=typed_events_strategy)
def test_concurrent_sessions_match_reference(spark, rows):
    """The delta-cumsum interval-stabbing count (r8) equals brute force:
    for every hour bucket, the number of 30-min-gap sessions whose
    [start hour, end hour] range covers it — evaluated on the sparse
    delta grid the query publishes."""
    from minefields_kafka_streams_deduplication_spark.operators import windows

    df = mk_typed(spark, rows)
    orig_frame = windows.session_frame
    windows.session_frame = lambda s, d: windows.build_session_frame(df)
    try:
        got = {
            r.hour: r.n_active
            for r in windows.concurrent_sessions_hourly(spark, "x").collect()
        }
    finally:
        windows.session_frame = orig_frame

    t0 = dt.datetime(2024, 1, 1)
    by_user: dict = {}
    for i, (m, u, _ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t0 + dt.timedelta(minutes=m), i))
    sessions = []  # (start, end)
    for u, evs in by_user.items():
        evs.sort()
        cur = None
        for ts, _i in evs:
            if cur is None or (ts - cur[1]).total_seconds() > 1800:
                if cur:
                    sessions.append(cur)
                cur = (ts, ts)
            else:
                cur = (cur[0], ts)
        if cur:
            sessions.append(cur)

    def hour(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    grid = set()
    for s, e in sessions:
        grid.add(hour(s))
        grid.add(hour(e) + dt.timedelta(hours=1))
    want = {
        h: sum(1 for s, e in sessions if hour(s) <= h <= hour(e))
        for h in grid
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 8),        # custkey
            st.integers(0, 2000),     # order day offset
            st.integers(1, 99),       # totalprice
        ),
        min_size=1,
        max_size=25,
    )
)
def test_customer_lifespan_buckets_matches_reference(spark, rows):
    """Tenure-bucket histogram (r8) equals the brute-force span walk,
    including the exact 365/730/1460-day boundaries."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    t0 = dt.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [
            (i, ck, "O", float(p), t0 + dt.timedelta(days=d), "1-URGENT")
            for i, (ck, d, p) in enumerate(rows)
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: orders
    try:
        got = {
            r.lifespan_bucket: (r.n_customers, r.n_orders)
            for r in analytic.customer_lifespan_buckets(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    per_cust: dict = {}
    for ck, d, _p in rows:
        lo, hi, n = per_cust.get(ck, (d, d, 0))
        per_cust[ck] = (min(lo, d), max(hi, d), n + 1)
    want: dict = {}
    for ck, (lo, hi, n) in per_cust.items():
        span = hi - lo
        b = (
            "0_lt_1y" if span < 365
            else "1_1_2y" if span < 730
            else "2_2_4y" if span < 1460
            else "3_ge_4y"
        )
        c, o = want.get(b, (0, 0))
        want[b] = (c + 1, o + n)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 5)),  # (orderkey, partkey)
        min_size=1,
        max_size=40,
    )
)
def test_basket_pairs_match_reference(spark, rows):
    """Market-basket pair supports (r8) equal the brute-force
    distinct-parts-per-order pair count, with the (n desc, a, b)
    tie-break and top-k cut."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    li = spark.createDataFrame(
        [
            (ok, pk, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
             dt.datetime(1996, 1, 1))
            for i, (ok, pk) in enumerate(rows)
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
        "l_shipdate TIMESTAMP",
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: li
    try:
        got = [
            (r.part_a, r.part_b, r.n_orders)
            for r in analytic.basket_part_pairs_top(spark, "x").collect()
        ]
    finally:
        analytic.load_table = orig

    baskets: dict = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    counts: dict = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    want = sorted(
        ((a, b, n) for (a, b), n in counts.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:20]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 11), st.integers(1, 99)),  # (month idx, price)
        min_size=1,
        max_size=25,
    )
)
def test_revenue_mom_growth_matches_reference(spark, rows):
    """MoM growth via the month-shifted self-join (r8) equals the
    brute-force consecutive-month walk (gap months produce NO row —
    the join semantics, same as weekly_active_growth)."""
    import math

    from minefields_kafka_streams_deduplication_spark.operators import analytic

    orders = spark.createDataFrame(
        [
            (i, 1, "O", float(p), dt.datetime(1995, 1 + m, 1), "1-URGENT")
            for i, (m, p) in enumerate(rows)
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: orders
    try:
        got = {
            r.month: (r.revenue, r.prev_revenue, r.mom_growth)
            for r in analytic.revenue_mom_growth(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    rev: dict = {}
    for m, p in rows:
        rev[m] = rev.get(m, 0) + p  # integer prices: decimal sum is exact
    want = {}
    for m, r in rev.items():
        if m - 1 in rev:
            prev = rev[m - 1]
            g = math.floor((r - prev) / prev * 10000 + 0.5) / 10000.0
            want[dt.date(1995, 1 + m, 1)] = (float(r), float(prev), g)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.integers(1, 30),   # n_chars
            st.integers(1, 6),    # n tokens
        ),
        min_size=1,
        max_size=20,
    )
)
def test_length_token_corr_matches_reference(spark, docs):
    """Pearson-from-sufficient-statistics (r8) equals the textbook
    two-pass formula, including the zero-variance guard (all-equal
    lengths or token counts → 0.0)."""
    import math

    from minefields_kafka_streams_deduplication_spark.functions import text as tx

    df = spark.createDataFrame(
        [
            (i, " ".join("w" for _ in range(nt)), lang, "s", nc)
            for i, (lang, nc, nt) in enumerate(docs)
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    orig = tx.load_table
    tx.load_table = lambda s, d, n: df
    try:
        got = {
            r.lang: (r.n_docs, r.chars_tokens_corr)
            for r in tx.doc_length_token_corr(spark, "x").collect()
        }
    finally:
        tx.load_table = orig

    by_lang: dict = {}
    for lang, nc, nt in docs:
        by_lang.setdefault(lang, []).append((nc, nt))
    want = {}
    for lang, pts in by_lang.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        if varx * vary > 0:
            r = (n * sxy - sx * sy) / math.sqrt(varx * vary)
            r = math.floor(r * 10000 + 0.5) / 10000.0
        else:
            r = 0.0
        want[lang] = (n, r)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 2),  # label
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=32),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_centroid_distances_match_reference(spark, vecs):
    """Label-centroid pair distances (r8) equal the pure-Python walk:
    6-dp floor-form quantization of each float32 component, exact
    integer cell sums, round4f centroids, 6-dp HALF_UP snap of each
    squared gap, exact decimal sum, floor-form sqrt rounding."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from minefields_kafka_streams_deduplication_spark.functions import vectors as vx

    df = spark.createDataFrame(
        [(i, v, lab) for i, (lab, v) in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    orig = vx.load_table
    vx.load_table = lambda s, d, n: df
    try:
        got = {
            (r.label_a, r.label_b): r.centroid_dist
            for r in vx.label_centroid_distances(spark, "x").collect()
        }
    finally:
        vx.load_table = orig

    def f32(x):
        import struct

        return struct.unpack("f", struct.pack("f", x))[0]

    def r4(x):
        return math.floor(x * 10000 + 0.5) / 10000.0

    cells: dict = {}
    for lab, v in vecs:
        for d, x in enumerate(v):
            s, n = cells.get((lab, d), (0, 0))
            cells[(lab, d)] = (s + math.floor(f32(x) * 1_000_000 + 0.5), n + 1)
    cent = {k: r4(s / 1_000_000 / n) for k, (s, n) in cells.items()}
    labels = sorted({lab for lab, _ in vecs})
    want = {}
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            ss = Decimal(0)
            for d in range(3):
                gap = (cent[(a, d)] - cent[(b, d)]) ** 2
                ss += Decimal(gap).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            want[(a, b)] = r4(math.sqrt(float(ss)))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(token_lists=docs_strategy)
def test_tokens_mad_matches_reference(spark, token_lists):
    """Tokens-per-doc MAD (r8) equals the brute-force double lower
    median, with duplicate texts carrying their full weight through
    the copy collapse."""
    from minefields_kafka_streams_deduplication_spark.functions import text as tx

    # duplicate every other doc so the collapse path is exercised
    texts = []
    for i, toks in enumerate(token_lists):
        t = " ".join(toks)
        texts.append(t)
        if i % 2 == 0:
            texts.append(t)
    df = spark.createDataFrame(
        [(i, t, "en" if i % 3 else "de", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    orig = tx.load_table
    tx.load_table = lambda s, d, n: df
    try:
        got = {
            r.lang: (r.n_docs, r.median_tokens, r.mad_tokens)
            for r in tx.tokens_mad_by_lang(spark, "x").collect()
        }
    finally:
        tx.load_table = orig

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    by_lang: dict = {}
    for i, t in enumerate(texts):
        # split(" ") semantics: "" -> [""] -> 1 token, same as the engine
        by_lang.setdefault("en" if i % 3 else "de", []).append(
            len(t.split(" "))
        )
    want = {}
    for lang, vs in by_lang.items():
        med = lower_median(vs)
        want[lang] = (len(vs), med, lower_median([abs(v - med) for v in vs]))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 28),   # day of month
            st.integers(0, 9),    # user
            st.integers(1, 5),    # purchase value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_spend_decile_migration_matches_reference(spark, rows):
    """Decile-migration matrix (r8): the two-phase-rank NTILE(10)
    equals SQL ntile on each half, and the matrix equals the
    brute-force join of the two decile maps."""
    from minefields_kafka_streams_deduplication_spark.operators import analytic

    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 12, 0), u, "purchase", float(v), "{}")
            for i, (d, u, v) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    orig = analytic.load_table
    analytic.load_table = lambda s, d, n: df
    try:
        got = {
            (r.decile_h1, r.decile_h2): r.n_users
            for r in analytic.spend_decile_migration(spark, "x").collect()
        }
    finally:
        analytic.load_table = orig

    def deciles(spend: dict) -> dict:
        order = sorted(spend, key=lambda u: (-spend[u], u))
        n = len(order)
        base, rem = divmod(n, 10)
        out = {}
        for rank, u in enumerate(order, start=1):
            big = rem * (base + 1)
            if rank <= big:
                out[u] = -(-rank // (base + 1))
            else:
                out[u] = rem + (-(-(rank - big) // max(base, 1)))
        return out

    h1: dict = {}
    h2: dict = {}
    for d, u, v in rows:
        tgt = h1 if d <= 15 else h2
        tgt[u] = tgt.get(u, 0) + v
    d1, d2 = deciles(h1), deciles(h2)
    want: dict = {}
    for u in set(d1) & set(d2):
        k = (d1[u], d2[u])
        want[k] = want.get(k, 0) + 1
    assert got == want
