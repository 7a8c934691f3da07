"""SnapshotStateTable (sources/snapshots.py): manifest-based atomic
commits, time travel, file reuse, torn-commit invisibility, expiry GC,
and idempotent replay — the table-format discipline the upsert sink's
docstring deferred to "a real table format"."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from minefields_kafka_streams_deduplication_spark.sources.snapshots import SnapshotStateTable

SCHEMA = "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
T0 = dt.datetime(2024, 1, 1)


def ev(spark, rows):
    return spark.createDataFrame(
        [(u, e, T0 + dt.timedelta(minutes=m), "t", v) for (u, e, m, v) in rows],
        SCHEMA,
    )


def snap(table, version=None):
    return {
        r.user_id: (r.event_id, r.value)
        for r in table.read(version).collect()
    }


def test_commit_read_and_time_travel(spark, tmp_path):
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    assert t.commit(ev(spark, [(1, 10, 0, 1.0), (2, 20, 1, 2.0)])) == 1
    assert t.commit(ev(spark, [(1, 11, 5, 9.0), (3, 30, 6, 3.0)])) == 2
    assert t.commit(ev(spark, [(2, 21, 9, 8.0)])) == 3
    # every historical snapshot remains exactly readable
    assert snap(t, 1) == {1: (10, 1.0), 2: (20, 2.0)}
    assert snap(t, 2) == {1: (11, 9.0), 2: (20, 2.0), 3: (30, 3.0)}
    assert snap(t, 3) == {1: (11, 9.0), 2: (21, 8.0), 3: (30, 3.0)}
    assert snap(t) == snap(t, 3)  # default = latest
    assert t.versions() == [1, 2, 3]


def test_untouched_buckets_inherited_by_reference(spark, tmp_path):
    """A commit must not rewrite buckets its batch never touched: their
    manifest paths — and the files behind them — are inherited."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(u, u * 10, 0, 1.0) for u in range(1, 9)]))
    p1 = t.bucket_paths(1)
    t.commit(ev(spark, [(1, 999, 5, 7.0)]))  # touches key 1's bucket only
    p2 = t.bucket_paths(2)
    changed = {b for b in p2 if p2[b] != p1.get(b)}
    assert len(changed) == 1  # exactly key 1's bucket moved
    untouched = [b for b in p1 if b not in changed]
    assert untouched and all(p2[b] == p1[b] for b in untouched)
    # inherited paths still point at the ORIGINAL commit's files
    assert all("c000001" in p2[b] for b in untouched)


def test_torn_manifest_invisible(spark, tmp_path):
    """A crashed publication (manifest .tmp present, rename never ran)
    must not surface as a version — readers keep resolving the last
    complete snapshot."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(1, 10, 0, 1.0)]))
    tmp = t._manifest_path(2) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": 2, "buckets": {}}, fh)
    assert t.versions() == [1]
    assert t.latest_version() == 1
    assert snap(t) == {1: (10, 1.0)}


def test_expire_gc_keeps_referenced_files(spark, tmp_path):
    """expire(keep_last) removes only commit dirs no KEPT manifest
    references: old versions become unreadable, the kept snapshot is
    byte-identical, and inherited (still-referenced) old commit dirs
    survive the GC."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(u, u * 10, 0, 1.0) for u in range(1, 9)]))
    t.commit(ev(spark, [(1, 999, 5, 7.0)]))
    before = snap(t, 2)
    deleted = t.expire(keep_last=1)
    # v2 inherits most buckets from commit 1, so commit 1 must SURVIVE
    assert deleted == []
    assert t.versions() == [2]
    assert snap(t, 2) == before
    with pytest.raises(FileNotFoundError):
        t.read(1).collect()

    # now overwrite every bucket so commit 1+2 become unreferenced
    t.commit(ev(spark, [(u, u * 10 + 1, 9, 2.0) for u in range(1, 9)]))
    final = snap(t, 3)
    deleted = t.expire(keep_last=1)
    assert any("c000001" in d for d in deleted)
    assert snap(t, 3) == final


def test_replay_is_idempotent_in_content(spark, tmp_path):
    """Latest-per-key is an idempotent fold: re-committing an
    already-applied batch produces a NEW version with IDENTICAL
    content (at-least-once delivery → exactly-once state)."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    batch = [(1, 10, 0, 1.0), (2, 20, 1, 2.0)]
    t.commit(ev(spark, batch))
    t.commit(ev(spark, batch))
    assert snap(t, 1) == snap(t, 2)


def test_snapshot_diff_query_matches_incremental_build(spark, sf_dir):
    """The registered query's v2 snapshot (two incremental commits)
    must equal the one-shot latest_by_key over all events — the fold
    algebra across commits."""
    import minefields_kafka_streams_deduplication_spark as engine

    diff = engine.get_queries()["store_snapshot_diff"](spark, sf_dir)
    v2 = {r.user_id: r.v2_event_id for r in diff.collect()}
    direct = {
        r.user_id: r.event_id
        for r in engine.get_queries()["latest_by_key"](spark, sf_dir).collect()
    }
    assert v2 == direct


def test_reader_isolation_under_concurrent_commit(spark, tmp_path):
    """Snapshot isolation the overwrite sink cannot give: a reader that
    pinned snapshot v1 keeps seeing EXACTLY v1 even when a later commit
    rewrites the same keys' buckets before the read materializes —
    data files are immutable and the reader's plan references only
    v1's manifest paths."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(1, 10, 0, 1.0), (2, 20, 1, 2.0)]))
    pinned = t.read(1)  # lazy plan built against manifest v1
    t.commit(ev(spark, [(1, 11, 5, 9.0), (2, 21, 6, 8.0)]))  # same buckets
    got = {r.user_id: r.event_id for r in pinned.collect()}  # materialize AFTER
    assert got == {1: 10, 2: 20}, got
    assert {r.user_id: r.event_id for r in t.read(2).collect()} == {1: 11, 2: 21}


def test_streaming_commits_build_versioned_view(spark, sf_dir, tmp_path):
    """foreachBatch → commit: a streaming materialized view WITH time
    travel. One snapshot version per non-empty micro-batch; the final
    snapshot equals the batch latest-per-key; every intermediate
    snapshot stays readable."""
    from minefields_kafka_streams_deduplication_spark.streaming.punctuate import (
        stage_events_ordered,
    )
    from minefields_kafka_streams_deduplication_spark.catalog import load_table

    ev_fix = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    stage = str(tmp_path / "stage")
    stage_events_ordered(ev_fix, stage, n_slices=3)
    t = SnapshotStateTable(spark, str(tmp_path / "s"))

    def fold(batch_df, batch_id):
        if not batch_df.isEmpty():
            t.commit(batch_df)

    q = (
        spark.readStream.schema(
            "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert t.versions() == [1, 2, 3]
    import minefields_kafka_streams_deduplication_spark as engine

    direct = {
        r.user_id: r.event_id
        for r in engine.get_queries()["latest_by_key"](spark, sf_dir).collect()
    }
    assert {r.user_id: r.event_id for r in t.read().collect()} == direct
    # intermediate snapshot: a strict prefix of the stream — its keys'
    # winners must match latest-per-key over slices 1-2 only
    n1, n2 = t.read(1).count(), t.read(2).count()
    assert 0 < n1 <= n2 <= len(direct)


def test_snapshot_history_matches_dict_model_hypothesis(spark, tmp_path):
    """Model-based Hypothesis pin: an arbitrary sequence of commits
    must leave EVERY historical snapshot equal to a pure-Python
    dict-fold replay of the batch prefix (latest-per-key by
    (ts, event_id)) — commits, inheritance and manifest routing all
    collapse to the fold algebra."""
    import shutil

    from hypothesis import given, settings, strategies as st

    batch = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),    # user_id
            st.integers(min_value=0, max_value=500),  # event_id
            st.integers(min_value=0, max_value=100),  # ts minutes
            st.integers(min_value=0, max_value=9),    # value
        ),
        min_size=1,
        max_size=6,
    )

    @given(st.lists(batch, min_size=1, max_size=4))
    @settings(max_examples=10, deadline=None)
    def run(batches):
        root = str(tmp_path / f"s{abs(hash(str(batches))) % 10**9}")
        shutil.rmtree(root, ignore_errors=True)
        t = SnapshotStateTable(spark, root)
        model: dict = {}
        states = []
        for rows in batches:
            t.commit(ev(spark, [(u, e, m, float(v)) for u, e, m, v in rows]))
            for u, e, m, v in rows:
                cur = model.get(u)
                cand = (T0 + dt.timedelta(minutes=m), e, float(v))
                if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                    model[u] = cand
            states.append({u: (e, v) for u, (ts_, e, v) in model.items()})
        for ver, want in enumerate(states, start=1):
            assert snap(t, ver) == want, (ver, snap(t, ver), want)
        shutil.rmtree(root, ignore_errors=True)

    run()


def test_snapshot_interleaved_writers_match_dict_model_hypothesis(spark, tmp_path):
    """Model-based pin for the CAS path (r8): batches are dealt to TWO
    writer instances on the same root, and a drawn subset of writer-A
    commits is made to CONFLICT — the next batch (writer B's) commits
    inside A's _pre_publish seam, so A stages against a stale head,
    loses the CAS, and rebases. Whatever the interleaving, history must
    equal the dict-fold replay in PUBLICATION order (B's batch folds
    before the conflicted A batch) — linear versions, no lost update."""
    import shutil

    from hypothesis import given, settings, strategies as st

    batch = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=4,
    )

    @given(
        st.lists(batch, min_size=2, max_size=4),
        st.lists(st.booleans(), min_size=4, max_size=4),
    )
    @settings(max_examples=8, deadline=None)
    def run(batches, conflicts):
        root = str(tmp_path / f"i{abs(hash(str((batches, conflicts)))) % 10**9}")
        shutil.rmtree(root, ignore_errors=True)
        a = SnapshotStateTable(spark, root)
        b = SnapshotStateTable(spark, root)
        model: dict = {}
        states = []

        def fold(rows):
            for u, e, m, v in rows:
                cur = model.get(u)
                cand = (T0 + dt.timedelta(minutes=m), e, float(v))
                if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                    model[u] = cand
            states.append({u: (e, v) for u, (ts_, e, v) in model.items()})

        i = 0
        while i < len(batches):
            rows = batches[i]
            df = ev(spark, [(u, e, m, float(v)) for u, e, m, v in rows])
            nxt = batches[i + 1] if i + 1 < len(batches) else None
            if conflicts[i % len(conflicts)] and nxt is not None:
                fired = []

                def rival(nxt=nxt):
                    if not fired:
                        fired.append(1)
                        b.commit(
                            ev(spark, [(u, e, m, float(v)) for u, e, m, v in nxt])
                        )

                a.commit(df, _pre_publish=rival)
                fold(nxt)   # B published first
                fold(rows)  # then A's rebased fold
                i += 2
            else:
                a.commit(df)
                fold(rows)
                i += 1
        assert a.versions() == list(range(1, len(states) + 1))
        for ver, want in enumerate(states, start=1):
            assert snap(a, ver) == want, (ver, snap(a, ver), want)
        shutil.rmtree(root, ignore_errors=True)

    run()


def test_expire_keep_last_zero_rejected(spark, tmp_path):
    """expire(0) would slice vs[-0:] == everything — i.e. silently keep
    every snapshot while reading as 'drop all'. It must be rejected
    (ADVICE r6)."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(1, 10, 0, 1.0)]))
    with pytest.raises(ValueError):
        t.expire(keep_last=0)
    with pytest.raises(ValueError):
        t.expire(keep_last=-3)
    assert t.versions() == [1]  # untouched


def test_orphan_commit_dir_from_torn_commit_is_cleaned(spark, tmp_path):
    """Crash AFTER the data write, BEFORE the manifest publish leaves an
    unreferenced commits/c<N>-<token> directory. Staging dirs are
    writer-unique (r8 CAS rework), so the orphan wedges NOTHING — the
    next commit takes version 2 under its own token — and expire() GCs
    the orphan, since no kept manifest references it."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(1, 10, 0, 1.0)]))
    # simulate the torn second commit: data dir exists, no manifest v2
    orphan = os.path.join(t.root, "commits", "c000002-deadbeef")
    os.makedirs(os.path.join(orphan, "bucket=0"))
    with open(os.path.join(orphan, "bucket=0", "junk.parquet"), "w") as fh:
        fh.write("torn")
    assert t.latest_version() == 1
    v = t.commit(ev(spark, [(2, 20, 1, 2.0)]))  # the replayed commit
    assert v == 2
    assert snap(t, 2) == {1: (10, 1.0), 2: (20, 2.0)}
    assert t.expire(keep_last=2) == [orphan]
    assert not os.path.exists(orphan)
    assert snap(t, 2) == {1: (10, 1.0), 2: (20, 2.0)}


def test_two_writer_conflict_loser_rebases_and_retries(spark, tmp_path):
    """VERDICT r7 #5 — the concurrent-writer CAS. Writer A stages its
    data against head v1; BEFORE A publishes, writer B commits fully
    (winning version 2). A's create-if-absent manifest link must fail,
    and A must rebase: re-read head v2, RE-FOLD its batch against B's
    rows (user 1 moved under B — a blind re-publish of A's stale fold
    would resurrect the old value), and publish as v3. History stays
    linear, no update lost, A's losing staging dir is GC-able."""
    root = str(tmp_path / "s")
    a = SnapshotStateTable(spark, root)
    b = SnapshotStateTable(spark, root)
    a.commit(ev(spark, [(1, 10, 0, 1.0), (2, 20, 0, 2.0)]))  # head v1

    fired = []

    def rival():
        if fired:
            return  # one-shot: A's retry proceeds uncontended
        fired.append(1)
        # B updates user 1 and adds user 3 while A's publish is in flight
        assert b.commit(ev(spark, [(1, 11, 5, 1.5), (3, 30, 5, 3.0)])) == 2

    # A updates user 2 and adds user 4
    v = a.commit(ev(spark, [(2, 21, 3, 2.5), (4, 40, 3, 4.0)]), _pre_publish=rival)
    assert v == 3
    assert a.versions() == [1, 2, 3]  # linear history, no gap, no fork
    # final state folds BOTH writers' batches
    assert snap(a, 3) == {
        1: (11, 1.5),
        2: (21, 2.5),
        3: (30, 3.0),
        4: (40, 4.0),
    }
    # intermediate snapshots intact (time travel across the race)
    assert snap(a, 2) == {1: (11, 1.5), 2: (20, 2.0), 3: (30, 3.0)}
    assert snap(a, 1) == {1: (10, 1.0), 2: (20, 2.0)}
    # A cleaned its losing staging dir eagerly on CAS loss: exactly one
    # commit dir per published version remains, nothing for expire to GC
    import glob as _glob

    assert len(_glob.glob(os.path.join(root, "commits", "c*"))) == 3
    assert a.expire(keep_last=3) == []
    assert snap(a, 3)[4] == (40, 4.0)  # kept snapshots unbroken


def test_writer_contention_exceeding_retries_raises(spark, tmp_path):
    """Losing the CAS max_retries+1 times raises loudly instead of
    spinning — and the table is left uncorrupted (the rival's commits
    all landed; the loser's staging dirs are unreferenced)."""
    root = str(tmp_path / "s")
    a = SnapshotStateTable(spark, root)
    b = SnapshotStateTable(spark, root)
    a.commit(ev(spark, [(1, 10, 0, 1.0)]))

    def rival():
        b.commit(ev(spark, [(5, 50, 9, 5.0)]))

    with pytest.raises(RuntimeError, match="CAS"):
        # the seam fires on EVERY attempt: A can never win
        a.commit(ev(spark, [(2, 20, 1, 2.0)]), max_retries=1, _pre_publish=rival)
    # rival's two wins are the only published versions; loser left no junk
    assert a.versions() == [1, 2, 3]
    vals = snap(a)
    assert vals[5] == (50, 5.0) and 2 not in vals


def test_batch_id_replay_returns_same_version(spark, tmp_path):
    """The foreachBatch EOS discipline: a re-delivered micro-batch
    (same batch_id) maps to the ALREADY-PUBLISHED version — no new
    snapshot, no double fold — while the next batch_id commits
    normally. This is what merges the EOS sink's idempotency with time
    travel (VERDICT r6 #4)."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    assert t.commit(ev(spark, [(1, 10, 0, 1.0)]), batch_id=0) == 1
    assert t.commit(ev(spark, [(2, 20, 1, 2.0)]), batch_id=1) == 2
    before = snap(t, 2)
    # replay of batch 1 (at-least-once delivery after a crash)
    assert t.commit(ev(spark, [(2, 20, 1, 2.0)]), batch_id=1) == 2
    # stale replay of batch 0 likewise recognized
    assert t.commit(ev(spark, [(1, 10, 0, 1.0)]), batch_id=0) == 2
    assert t.versions() == [1, 2]
    assert snap(t, 2) == before
    # progress resumes normally
    assert t.commit(ev(spark, [(3, 30, 2, 3.0)]), batch_id=2) == 3
    assert snap(t, 3) == {1: (10, 1.0), 2: (20, 2.0), 3: (30, 3.0)}


def test_stream_eos_snapshot_query_parity_and_versions(spark, sf_dir, tmp_path):
    """store_snapshot_stream_eos end to end: one version per micro-batch
    (3 staged slices -> 3 versions), final snapshot == latest_by_key,
    and the batch-id watermark is recorded in the manifest chain."""
    import json as _json

    import minefields_kafka_streams_deduplication_spark as engine
    from minefields_kafka_streams_deduplication_spark.catalog import load_table
    from minefields_kafka_streams_deduplication_spark.sources.snapshots import (
        run_stream_into_snapshots,
    )
    from minefields_kafka_streams_deduplication_spark.streaming.punctuate import (
        stage_events_ordered,
    )

    ev_fix = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    stage = str(tmp_path / "stage")
    stage_events_ordered(ev_fix, stage, n_slices=3)
    t = run_stream_into_snapshots(spark, stage, str(tmp_path / "root"))
    assert t.versions() == [1, 2, 3]
    with open(t._manifest_path(3)) as fh:
        m = _json.load(fh)
    assert m["last_batch_id"] == 2  # batch ids 0,1,2 folded in order
    direct = {
        r.user_id: r.event_id
        for r in engine.get_queries()["latest_by_key"](spark, sf_dir).collect()
    }
    got = {r.user_id: r.event_id for r in t.read().collect()}
    assert got == direct


def test_point_lookup_routes_to_one_bucket(spark, tmp_path):
    """get(key[, version]) — the time-travel point read: correct value
    at every version, empty typed frame for an absent key, and the
    scan's input is ONE bucket directory (driver-side hash routing),
    not the manifest's full path set."""
    t = SnapshotStateTable(spark, str(tmp_path / "s"))
    t.commit(ev(spark, [(1, 10, 0, 1.0), (2, 20, 0, 2.0)]))
    t.commit(ev(spark, [(1, 11, 5, 1.5)]))

    assert [(r.event_id, r.value) for r in t.get(1).collect()] == [(11, 1.5)]
    assert [(r.event_id, r.value) for r in t.get(1, version=1).collect()] == [
        (10, 1.0)
    ]
    assert [(r.event_id, r.value) for r in t.get(2).collect()] == [(20, 2.0)]
    missing = t.get(999)
    assert missing.count() == 0
    assert missing.schema == t.read().schema

    # physical routing: the lookup plan reads a single bucket path
    plan = t.get(1)._jdf.queryExecution().executedPlan().toString()
    import re

    paths = set(re.findall(r"bucket=\d+", plan))
    assert len(paths) == 1
