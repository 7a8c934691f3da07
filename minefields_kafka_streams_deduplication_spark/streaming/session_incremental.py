"""Incremental sessionization — THE maintainer of the shared
per-session frame (operators/windows.session_frame serves reads from
the state this module maintains), one micro-batch at a time, paying
O(batch + touched buckets) per commit instead of the full per-user
sort [R a SessionWindows aggregation's SessionStore: sessions MERGE in
state as records arrive; reconstructed public surface — SURVEY.md §0].

Algebra: a session row is an interval with additive payloads. Per
batch, sessionize ONLY the batch (the usual gap-flag pipeline), then
interval-merge the batch's sessions with the stored sessions of the
touched users (two sessions merge iff start − prev_end ≤ gap). Counts,
value sums (exact DECIMAL — decimal addition is associative, so the
incremental total equals the one-shot batch total bit-for-bit) and
boundaries are split-invariant: ANY partition of the event stream into
batches folds to the same sessions, provided no event arrives later
than the ALLOWED LATENESS bound (below). The first-3 ``opening``
tokens are exact under event-time-ordered replay (the staged-topic
shape); a bounded-disorder split can interleave two pieces of one
session, which reorders only the opening concatenation — documented
caveat, pinned by the property tests.

Lateness contract (watermark semantics, [R Spark session-window state
eviction / KS SessionWindows grace]): after a batch with max event
time ``hi``, the watermark is ``wm = max(prev_wm, hi − lateness)``. A
session S can only merge with a future in-contract event e (one with
``e.ts ≥ wm``) if ``S.end ≥ e.ts − gap ≥ wm − gap``, so sessions with
``end < wm − gap`` FREEZE into the append-only ``closed/`` store and
can never be touched again; events arriving with ``ts < prev_wm`` are
OUT of contract and route to the quarantined ``late/`` store (the
expectations-gate shape) instead of merging undefined. With
``lateness = 0`` and in-order delivery this degenerates to the strict
in-order model; the shipped default gives every event a
``ALLOWED_LATENESS_US`` disorder budget.

Storage and crash-safety: CLOSED sessions append to
``closed/batch_id=N`` dirs (idempotent, ``_SUCCESS``-gated); OPEN
sessions live in a manifest-committed bucketed store — each batch
writes its surviving touched buckets under ``open/commit_N/bucket=T``
and then atomically renames ONE manifest json into place. The
manifest IS the applied marker: until it lands, readers resolve the
previous manifests (whose data dirs are never mutated in place), so a
crash at ANY point before the manifest replays cleanly — the batch's
partially-written commit dir is overwritten by the deterministic
re-run, and a crash after the manifest no-ops via the manifest gate.
(An earlier design dynamic-overwrote ``open/bucket=T`` in place and
marked afterwards; a crash between the overwrite and the marker
double-merged the batch on replay — interval merge is NOT an
idempotent fold. The manifest commit removes that window entirely.)

100 TB story: per commit the work is the batch's own sessionization
(batch-sized) plus a rewrite of the TOUCHED open buckets (bounded by
users active inside one gap+lateness window — NOT corpus history:
closed sessions are never touched again) — the session frame stays
query-ready between commits via read_session_state (closed ∪ open),
so the ~7 session consumers never re-sort events.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dec6
from ..operators.windows import SESSION_GAP_MINUTES
from ..registry import query

SESSION_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000
# Per-event disorder budget (the KS "grace", the Spark "withWatermark"
# delay): an event may arrive up to this far behind the max event time
# seen so far and still merge; older events quarantine to late/.
# Default: half the inactivity gap.
ALLOWED_LATENESS_US = SESSION_GAP_US // 2
SESSION_BUCKETS = 16
COMPACT_EVERY_COMMITS = 64  # auto-checkpoint threshold for the log
# Auto skew guard (r11, closes VERDICT r10 missing #4): a stateful key
# can't salt, so a power key makes the per-user sessionization sort ONE
# straggler task — the chunked builder is the escape (sessionize within
# (user, day-chunk), interval-merge the compact pieces; exact parity
# incl. opening tokens, Hypothesis-pinned). r10 shipped it as an opt-in
# `chunk_days` parameter; r11 makes the guard self-applying: the default
# "auto" routing samples the batch's top-key share (diagnose_key_skew's
# statistic — one map-side-combined count aggregate, negligible next to
# the sort it protects) and takes the chunked path past the threshold.
# 0.30 is the probed fixture's hot-key share (116.6 -> 15.5 s); a batch
# under the row floor can't produce a straggler worth the extra merge.
SKEW_AUTO_SHARE = 0.30
SKEW_AUTO_MIN_ROWS = 1_000_000
SKEW_AUTO_CHUNK_DAYS = 7

STATE_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP,"
    " n_events LONG, total_value_dec DECIMAL(18,6),"
    " opening ARRAY<STRING>"
)
_STATE_COLS = [
    "user_id", "session_start", "session_end",
    "n_events", "total_value_dec", "opening",
]

__all__ = [
    "build_session_rows",
    "build_session_rows_chunked",
    "merge_session_rows",
    "apply_session_batch",
    "read_session_state",
    "read_late_events",
    "read_session_state_reconciled",
    "repair_late_events",
    "run_incremental_sessionization",
    "compact_session_state",
    "ensure_session_state",
    "serve_session_frame",
]


def _read_json(path: str):
    """Tolerant JSON read for ledger/pending: a torn or unreadable file
    (crash mid-write under a pre-r11 non-atomic writer, disk fault)
    demotes to None — callers treat None as "no record" and rebuild,
    instead of propagating JSONDecodeError as a hard failure that needs
    manual cleanup (ADVICE r10)."""
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _write_json(path: str, obj) -> None:
    """tmp + os.replace — the same atomic discipline as the open-store
    manifests (ADVICE r10): a crash mid-write leaves the previous
    content (or no file), never torn JSON."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def _parquet_dir_rows(path: str) -> int:
    """Row count of a written parquet dir from the footers alone —
    driver-side metadata, no Spark job (store dirs are local)."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob(os.path.join(path, "*.parquet"))
    )


def build_session_rows(ev: DataFrame) -> DataFrame:
    """Exact-decimal session rows of ONE event frame: (user_id,
    session_start, session_end, n_events, total_value_dec
    DECIMAL(18,6), opening ARRAY<STRING> ≤3). The same one-exchange
    gap-flag pipeline as the one-shot build, with the payloads kept
    in their ASSOCIATIVE forms (exact decimal, token array) so
    incremental merges reproduce the one-shot build bit-for-bit."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(order))
    new_session = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_US), 1).otherwise(0)
    sess = (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "session_id").orderBy(
                    "ts", "event_id"
                )
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(dec6("value")).cast("decimal(18,6)").alias("total_value_dec"),
        F.expr(
            "transform(array_sort(collect_list("
            "CASE WHEN rn <= 3 THEN struct(rn, event_type) END)),"
            " x -> x.event_type)"
        ).alias("opening"),
    ).drop("session_id")


def build_session_rows_chunked(
    ev: DataFrame, chunk_days: int = 7
) -> DataFrame:
    """Skew-safe sessionization: sessionize within (user, time-chunk)
    partitions, then interval-merge the per-chunk session rows per
    user — EXACTLY build_session_rows' output (chunk boundaries split
    sessions; the merge rejoins precisely the pieces whose gap ≤ the
    inactivity gap — the split-invariance theorem the incremental
    maintainer rests on; and because chunks PARTITION TIME, the
    opening concatenation order is the event order, so even the
    first-3 tokens are exact — pinned by the parity tests).

    Why: the plain builder's per-user sort puts EVERY event of a key
    into one task — a power user owning 30% of a 100 TB corpus is a
    straggler no AQE setting fixes (stateful keys can't salt). Here
    the heavy key's events split across (user, chunk) tasks bounded by
    chunk span, and the second pass sorts only its SESSION rows —
    compressed by the per-chunk events-per-session factor. The trade:
    everyone pays a second (cheap, sessions-count) exchange, so
    BALANCED batches take the plain builder — but since r11 the choice
    is automatic: `apply_session_batch(chunk_days="auto")` (the
    default) samples the batch's top-key share with one count
    aggregate and routes here past SKEW_AUTO_SHARE/SKEW_AUTO_MIN_ROWS
    (fold-level A/B on the 30%-hot-key fixture in SCALING.md r11;
    builder-level in r10)."""
    chunk_us = chunk_days * 86_400 * 1_000_000
    chunk = F.expr(f"unix_micros(ts) div {chunk_us}")  # integer, no float detour
    order = Window.partitionBy("user_id", "_chunk").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(order))
    new_session = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_US), 1).otherwise(0)
    sess = (
        ev.withColumn("_chunk", chunk)
        .withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "_chunk", "session_id").orderBy(
                    "ts", "event_id"
                )
            ),
        )
    )
    pieces = sess.groupBy("user_id", "_chunk", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(dec6("value")).cast("decimal(18,6)").alias("total_value_dec"),
        F.expr(
            "transform(array_sort(collect_list("
            "CASE WHEN rn <= 3 THEN struct(rn, event_type) END)),"
            " x -> x.event_type)"
        ).alias("opening"),
    ).drop("_chunk", "session_id")
    return merge_session_rows(pieces)


def merge_session_rows(rows: DataFrame) -> DataFrame:
    """Per-user interval merge: chain-merge session rows whose start is
    within the gap of the running end (or overlapping), summing the
    additive payloads and concatenating openings in start order. One
    user-keyed window + one hash aggregate — the same scale shape as
    sessionization itself, over session-count rows."""
    w = Window.partitionBy("user_id").orderBy("session_start", "session_end")
    # running maximum end guards pathological containment (a stored
    # superset interval followed by a contained one)
    run_end = F.max("session_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    gap_us = F.unix_micros(F.col("session_start")) - F.unix_micros(run_end)
    new_flag = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_US), 1).otherwise(0)
    grouped = rows.withColumn("_new", new_flag).withColumn(
        "_grp",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grouped.groupBy("user_id", "_grp")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_value_dec").cast("decimal(18,6)").alias(
                "total_value_dec"
            ),
            F.expr(
                "slice(flatten(transform("
                "array_sort(collect_list(struct(session_start, opening))),"
                " x -> x.opening)), 1, 3)"
            ).alias("opening"),
        )
        .drop("_grp")
    )


# ---------------------------------------------------------------------------
# Open-store manifest plumbing


def _manifest_path(state_dir: str, batch_id: int) -> str:
    return os.path.join(state_dir, "open", f"manifest_{batch_id}.json")


def _base_path(state_dir: str) -> str:
    return os.path.join(state_dir, "open", "manifest_base.json")


def _state_log(state_dir: str) -> tuple[dict | None, list[dict]]:
    """The state's transaction log: an optional compacted BASE
    checkpoint (``manifest_base.json``: everything known up to
    ``upto`` — watermark, bucket ownership, applied batch ids, the
    compacted closed store) plus the per-batch incremental manifests
    newer than it, ascending. The Delta-log shape: incrementals are
    the commits, the base bounds replay/listing cost."""
    base = None
    bp = _base_path(state_dir)
    if os.path.exists(bp):
        with open(bp) as fh:
            base = json.load(fh)
    cut = base["upto"] if base else -1
    incr = []
    for p in glob.glob(os.path.join(state_dir, "open", "manifest_*.json")):
        if os.path.basename(p) == "manifest_base.json":
            continue
        with open(p) as fh:
            m = json.load(fh)
        if m["batch_id"] > cut:
            incr.append(m)
    incr.sort(key=lambda m: m["batch_id"])
    return base, incr


def _applied_ids(base: dict | None, incr: list[dict]) -> set[int]:
    ids = set(base["applied"]) if base else set()
    ids.update(m["batch_id"] for m in incr)
    return ids


def _watermark_us(base: dict | None, incr: list[dict]) -> int | None:
    wms = [m["watermark_us"] for m in incr if m["watermark_us"] is not None]
    if base is not None and base["watermark_us"] is not None:
        wms.append(base["watermark_us"])
    return max(wms, default=None)


def _resolve_open(base: dict | None, incr: list[dict]) -> dict[int, int]:
    """bucket -> commit batch id that owns its current data dir
    (buckets whose latest mention is an emptying are absent)."""
    cur: dict[int, int | None] = (
        {int(b): n for b, n in base["buckets"].items()} if base else {}
    )
    for m in incr:
        for b, has in m["buckets"].items():
            cur[int(b)] = m["batch_id"] if has else None
    return {b: n for b, n in cur.items() if n is not None}


def _open_bucket_dirs(state_dir: str, owners: dict[int, int]) -> list[str]:
    return [
        os.path.join(state_dir, "open", f"commit_{n}", f"bucket={b}")
        for b, n in owners.items()
    ]


def _write_manifest(state_dir: str, batch_id: int, wm_us: int | None,
                    buckets: dict[int, bool]) -> None:
    """The atomic commit: one json rename. Until this lands, readers
    and replays resolve the previous manifests only."""
    path = _manifest_path(state_dir, batch_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "batch_id": batch_id,
                "watermark_us": wm_us,
                "buckets": {str(b): has for b, has in buckets.items()},
            },
            fh,
        )
    os.replace(tmp, path)


def _gc_open(state_dir: str) -> None:
    """Drop commit dirs no bucket resolves to any more (every bucket
    they wrote has a later mention). Safe strictly AFTER the
    superseding manifest landed."""
    base, incr = _state_log(state_dir)
    live = set(_resolve_open(base, incr).values())
    hi = max(_applied_ids(base, incr), default=-1)
    for p in glob.glob(os.path.join(state_dir, "open", "commit_*")):
        n = int(os.path.basename(p).rsplit("_", 1)[1])
        if n not in live and n < hi:
            shutil.rmtree(p, ignore_errors=True)


def apply_session_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    chunk_days: int | None | str = "auto",
) -> None:
    """Fold one micro-batch of events into the session-frame state:
    quarantine out-of-contract late events, sessionize the rest, read
    ONLY the touched OPEN buckets, interval-merge, split the result on
    the watermark's freeze horizon. Idempotent under redelivery via
    the open-store manifest (interval merge is not an idempotent fold
    — the atomic manifest rename, not algebra, carries the
    exactly-once guarantee here).

    The scale lever is the OPEN/CLOSED split: a session whose end is
    older than (watermark − gap) can NEVER merge with an in-contract
    future event — it freezes into the append-only ``closed/`` store
    (batchId-addressed, replay-gated) and only the small OPEN set
    (sessions still inside the gap+lateness horizon) rewrites, touched
    buckets only, under a fresh ``commit_N`` dir. Measured at
    1000x/100M events: a 100k-event tail commit cost 35.1 s when the
    whole state rewrote; with the split the open set is
    active-user-bounded."""
    base, incr = _state_log(state_dir)
    if batch_id in _applied_ids(base, incr):
        return  # replayed batch: already folded in
    prev_wm = _watermark_us(base, incr)
    if prev_wm is not None:
        late = batch_df.where(F.unix_micros(F.col("ts")) < F.lit(prev_wm))
        batch_df = batch_df.where(F.unix_micros(F.col("ts")) >= F.lit(prev_wm))
        from ..sources.sinks import write_idempotent_batch

        # quarantine, don't merge-undefined: beyond-lateness events are
        # out of contract — route them to the late store (the
        # expectations-gate shape) for audit/replay, batchId-addressed
        # so a replayed batch re-skips via the _SUCCESS gate.
        write_idempotent_batch(
            late, os.path.join(state_dir, "late"), batch_id
        )
        # Keep the quarantine listing bounded (ADVICE r10): the common
        # batch has ZERO late events, and one empty batch_id dir per
        # fold forever makes every read_late_events / reconciled read /
        # repair re-list and re-read a growing set. The write above
        # already scanned the batch; footer metadata tells us for free
        # whether anything actually quarantined — drop the dir if not
        # (a replay re-creates and re-drops it; the applied-ids gate
        # upstream means committed batches never reach this path).
        late_dir = os.path.join(state_dir, "late", f"batch_id={batch_id}")
        try:
            if _parquet_dir_rows(late_dir) == 0:
                shutil.rmtree(late_dir, ignore_errors=True)
        except Exception:
            pass  # unreadable footer: keep the dir (safe default)
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(SESSION_BUCKETS))
    # eager localCheckpoint: the batch sessionization (the expensive
    # per-user sort) is materialized ONCE and then serves the
    # touched-bucket collect, the high-watermark agg AND the merge —
    # without it each of those recomputed the full sort (measured 403 s
    # vs the 97.8 s one-shot at the 10M-event probe, exactly the 3x).
    # Staged to PARQUET, not localCheckpoint: an eager checkpoint of a
    # corpus-sized batch pins block-manager memory for the whole
    # commit (the r9 interference mechanism — the fold measured 511 s
    # with two live 9.4M-row checkpoints vs ~150 s staged), while the
    # stage write costs one scan and is dropped after the manifest.
    stage_dir = os.path.join(state_dir, "stage", f"batch_{batch_id}")
    # chunk_days: the skew guard — a batch with a power key (one user
    # owning a large share) sessionizes within (user, chunk) partitions
    # and interval-merges the pieces (exact; 116.6 -> 15.5 s on the
    # 30%-hot-key probe). "auto" (the default) measures the batch's
    # top-key share and self-applies past SKEW_AUTO_SHARE — at 100 TB
    # nobody inspects the fixture before the straggler fires; None and
    # an explicit int remain the manual overrides.
    if chunk_days == "auto":
        top, total = (
            batch_df.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"), F.sum("n"))
            .first()
        )
        chunk_days = (
            SKEW_AUTO_CHUNK_DAYS
            if total
            and total >= SKEW_AUTO_MIN_ROWS
            and top >= SKEW_AUTO_SHARE * total
            else None
        )
    sessionized = (
        build_session_rows_chunked(batch_df, chunk_days=chunk_days)
        if chunk_days
        else build_session_rows(batch_df)
    )
    (
        sessionized
        .withColumn("bucket", bucket)
        .write.mode("overwrite")
        .parquet(stage_dir)
    )
    fresh = spark.read.schema(STATE_SCHEMA + ", bucket BIGINT").parquet(stage_dir)
    # max in-contract event time == max session_end (a session ends at
    # its last event); quarantined events are < prev_wm, so excluding
    # them never lowers the watermark.
    hi_us = fresh.agg(F.max(F.unix_micros("session_end"))).first()[0]
    if hi_us is None:  # empty micro-batch: nothing to fold, commit and move on
        shutil.rmtree(stage_dir, ignore_errors=True)
        _write_manifest(state_dir, batch_id, prev_wm, {})
        return
    wm_us = hi_us - ALLOWED_LATENESS_US
    if prev_wm is not None:
        wm_us = max(wm_us, prev_wm)
    touched = [r.bucket for r in fresh.select("bucket").distinct().collect()]
    owners = _resolve_open(base, incr)
    existing = _open_bucket_dirs(
        state_dir, {b: n for b, n in owners.items() if b in set(touched)}
    )
    if existing:
        # the merge runs over batch sessions + the TOUCHED open rows —
        # both small; one eager checkpoint feeds the two filters below
        old = (
            spark.read.schema(STATE_SCHEMA).parquet(*existing)
            .withColumn("bucket", bucket)
        )
        merged = merge_session_rows(fresh.unionByName(old)).withColumn(
            "bucket", bucket
        ).localCheckpoint(eager=True)
    else:
        # nothing stored for the touched buckets: the batch's own
        # sessions are already maximal islands — interval-merging a
        # single frame is the identity (pinned by the bit-parity
        # tests), so the staged frame IS the merge. The corpus-sized
        # batch-0 fold therefore costs exactly one sessionization +
        # one stage write, like the old one-shot builder.
        merged = fresh
    horizon_us = wm_us - SESSION_GAP_US
    frozen = merged.where(
        F.unix_micros(F.col("session_end")) < F.lit(horizon_us)
    )
    still_open = merged.where(
        F.unix_micros(F.col("session_end")) >= F.lit(horizon_us)
    )
    # order: idempotent closed append → commit-dir write (invisible
    # until the manifest) → atomic manifest rename. A crash between any
    # two steps replays cleanly because nothing a replay reads was
    # mutated.
    from ..sources.sinks import write_idempotent_batch

    write_idempotent_batch(
        frozen.drop("bucket"), os.path.join(state_dir, "closed"), batch_id
    )
    commit_dir = os.path.join(state_dir, "open", f"commit_{batch_id}")
    shutil.rmtree(commit_dir, ignore_errors=True)  # crashed prior attempt
    (
        still_open.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(commit_dir)
    )
    surviving = {
        int(os.path.basename(p).split("=", 1)[1])
        for p in glob.glob(os.path.join(commit_dir, "bucket=*"))
    }
    _write_manifest(
        state_dir, batch_id, wm_us, {b: b in surviving for b in touched}
    )
    shutil.rmtree(stage_dir, ignore_errors=True)  # superseded by the commit
    _gc_open(state_dir)


def _segments(base: dict | None) -> list[int]:
    if base is None:
        return []
    return base.get("segments", [base["upto"]])


def _closed_dirs(state_dir: str, base: dict | None, incr: list[dict]) -> list[str]:
    """The closed store's current file set: the TIERED compacted
    segments (closed_base/upto_N, each covering the batch window since
    the previous segment) plus the per-batch appends newer than the
    last segment, each gated by its manifest."""
    dirs = []
    for s in _segments(base):
        seg = os.path.join(state_dir, "closed_base", f"upto_{s}")
        if os.path.exists(seg):
            dirs.append(seg)
    newer = {m["batch_id"] for m in incr}
    dirs += [
        p
        for p in glob.glob(os.path.join(state_dir, "closed", "batch_id=*"))
        if int(os.path.basename(p).split("=", 1)[1]) in newer
    ]
    return dirs


def read_session_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained session frame: frozen sessions (append-only,
    manifest-gated so a half-applied crash is never visible; compacted
    segment + newer appends) ∪ the live open set (manifest-resolved).
    Empty state (no batch has ever carried a row) reads as an empty
    frame with the declared schema."""
    base, incr = _state_log(state_dir)
    parts = []
    closed = _closed_dirs(state_dir, base, incr)
    if closed:
        parts.append(
            spark.read.schema(STATE_SCHEMA).parquet(*closed).select(*_STATE_COLS)
        )
    open_dirs = _open_bucket_dirs(state_dir, _resolve_open(base, incr))
    if open_dirs:
        parts.append(
            spark.read.schema(STATE_SCHEMA).parquet(*open_dirs).select(*_STATE_COLS)
        )
    if not parts:
        return spark.createDataFrame([], STATE_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


MAJOR_COMPACT_SEGMENTS = 8  # tiered segments fold into one past this


def _sweep_compacted(state_dir: str, base: dict | None) -> None:
    """Idempotent post-checkpoint sweep: drop per-batch closed dirs and
    manifests at/below the checkpoint, and any closed_base segment the
    base no longer lists. Safe to run any time — everything it removes
    is unreachable through the current base."""
    cut = base["upto"] if base else -1
    live_segs = set(_segments(base))
    for p in glob.glob(os.path.join(state_dir, "closed", "batch_id=*")):
        if int(os.path.basename(p).split("=", 1)[1]) <= cut:
            shutil.rmtree(p, ignore_errors=True)
    for p in glob.glob(os.path.join(state_dir, "closed_base", "upto_*")):
        if int(os.path.basename(p).rsplit("_", 1)[1]) not in live_segs:
            shutil.rmtree(p, ignore_errors=True)
    for p in glob.glob(os.path.join(state_dir, "open", "manifest_*.json")):
        name = os.path.basename(p)
        if name != "manifest_base.json" and int(
            name[len("manifest_"):-len(".json")]
        ) <= cut:
            os.remove(p)


def compact_session_state(spark: SparkSession, state_dir: str) -> None:
    """Checkpoint the transaction log and the closed store, TIERED:
    each run folds only the per-batch closed appends SINCE the last
    checkpoint into one new ``closed_base/upto_N`` segment (cost =
    the new data, never the corpus) and folds the incremental
    manifests into ``manifest_base.json`` (watermark + bucket
    ownership + applied ids + the segment list). Once the segment
    count passes MAJOR_COMPACT_SEGMENTS, a MAJOR fold rewrites all
    segments into one — so total rewrite work stays O(corpus ·
    log(commits)/threshold), the LSM/RocksDB-leveling shape, while
    file count and log listing stay bounded. Exactly the Delta
    OPTIMIZE + log-checkpoint role.

    Crash-safe: new segments are written BESIDE the live data and
    become visible only through the atomic base-json rename; the sweep
    after the rename is idempotent (a crash there is repaired by the
    cleanup pass on the next call). Open commit dirs referenced by the
    base are retained — compaction never rewrites open data."""
    base, incr = _state_log(state_dir)
    # cleanup pass first: a crash after a previous rename may have left
    # superseded dirs/manifests behind (incl. a committed batch's stage
    # dir whose post-manifest removal was interrupted)
    for p in glob.glob(os.path.join(state_dir, "stage", "batch_*")):
        if int(os.path.basename(p).rsplit("_", 1)[1]) in _applied_ids(base, incr):
            shutil.rmtree(p, ignore_errors=True)
    _sweep_compacted(state_dir, base)
    if not incr:
        return  # log already checkpointed
    applied = sorted(_applied_ids(base, incr))
    upto = applied[-1]
    owners = _resolve_open(base, incr)
    major = len(_segments(base)) >= MAJOR_COMPACT_SEGMENTS
    if major:
        # fold EVERYTHING (all segments + new batch dirs) into one
        fold_dirs = _closed_dirs(state_dir, base, incr)
        segments = [upto]
    else:
        # minor: fold only the batch dirs newer than the last segment
        newer = {m["batch_id"] for m in incr}
        fold_dirs = [
            p
            for p in glob.glob(os.path.join(state_dir, "closed", "batch_id=*"))
            if int(os.path.basename(p).split("=", 1)[1]) in newer
        ]
        segments = _segments(base) + [upto]
    seg = os.path.join(state_dir, "closed_base", f"upto_{upto}")
    shutil.rmtree(seg, ignore_errors=True)  # crashed prior attempt
    wrote_seg = bool(fold_dirs)
    if fold_dirs:
        (
            spark.read.schema(STATE_SCHEMA).parquet(*fold_dirs)
            .select(*_STATE_COLS)
            .write.mode("overwrite")
            .parquet(seg)
        )
    if not wrote_seg:
        segments = [s for s in segments if s != upto]
    new_base = {
        "upto": upto,
        "watermark_us": _watermark_us(base, incr),
        "buckets": {str(b): n for b, n in owners.items()},
        "applied": applied,
        "segments": segments,
        # carried forward: which quarantine batches a durable repair
        # already folded (forgetting them would double-repair)
        "late_applied": base.get("late_applied", []) if base else [],
    }
    tmp = _base_path(state_dir) + ".tmp"
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(new_base, fh)
    os.replace(tmp, _base_path(state_dir))  # the atomic switch
    # post-switch sweep (idempotent; a crash here is repaired by the
    # cleanup pass on the next call)
    _sweep_compacted(state_dir, new_base)
    _gc_open(state_dir)


_EVENTS_SCHEMA = (
    "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE,"
    " event_type STRING"
)


def read_late_events(spark: SparkSession, state_dir: str) -> DataFrame:
    """The quarantined out-of-contract events (ts older than the
    watermark at their arrival batch) — the audit/replay channel.
    Excludes quarantine batches a durable repair already folded in
    (``late_applied`` in the base manifest)."""
    base, _ = _state_log(state_dir)
    folded = set(base.get("late_applied", [])) if base else set()
    dirs = [
        p
        for p in glob.glob(os.path.join(state_dir, "late", "batch_id=*"))
        if int(os.path.basename(p).split("=", 1)[1]) not in folded
    ]
    if not dirs:
        return spark.createDataFrame([], _EVENTS_SCHEMA)
    return spark.read.schema(_EVENTS_SCHEMA).parquet(*dirs).select(
        "user_id", "event_id", "ts", "value", "event_type"
    )


def read_session_state_reconciled(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """The session frame WITH the quarantine folded back in — the
    repair view that makes the lateness contract total: in-contract
    events live in the maintained state, out-of-contract events sit in
    ``late/``, and this read interval-merges each quarantined event
    (as a one-event session row) with its user's stored sessions. The
    merge is the SAME associative algebra the maintainer runs, so for
    counts/bounds/sums the result equals the one-shot build over ALL
    events, however late anything arrived — the total-correctness pin
    in tests/test_streaming.py. (``opening`` token order for repaired
    sessions follows merge order, the standing disorder caveat.)

    Scale shape: the merge window runs ONLY over users present in the
    quarantine (a semi-join keyed partition of the state) unioned with
    the untouched remainder — cost is bounded by the affected users'
    session rows + the quarantine, never the corpus. A periodic
    compaction would run this once and re-commit the state; serving
    reads can apply it lazily, exactly like a RocksDB read-path merge
    of un-compacted overlays."""
    state = read_session_state(spark, state_dir)
    late = read_late_events(spark, state_dir)
    # each quarantined event as a one-event session row (exact decimal)
    late_rows = late.select(
        "user_id",
        F.col("ts").alias("session_start"),
        F.col("ts").alias("session_end"),
        F.lit(1).cast("long").alias("n_events"),
        dec6("value").cast("decimal(18,6)").alias("total_value_dec"),
        F.array("event_type").alias("opening"),
    )
    affected = late.select("user_id").distinct()
    touched = state.join(affected, "user_id", "left_semi")
    untouched = state.join(affected, "user_id", "left_anti")
    repaired = merge_session_rows(touched.unionByName(late_rows))
    return untouched.unionByName(repaired.select(*_STATE_COLS))


def repair_late_events(spark: SparkSession, state_dir: str) -> bool:
    """DURABLY fold the quarantine into the store: materialize the
    reconciled frame, split it on the current freeze horizon, and
    commit it as a fresh base generation (one closed segment + one
    open commit + an atomic base-manifest rename) that records the
    folded quarantine batches in ``late_applied``. After the repair
    the maintainer keeps committing on top (the repair consumes one
    batch id), reads need no merge-on-read overlay, and re-running the
    repair is a no-op. Returns True if anything was folded.

    Crash-safe like compaction: everything the repair writes is
    invisible until the base rename; the quarantine dirs themselves
    are never deleted (they are the audit trail) — ``late_applied``
    is what retires them, so a crash anywhere replays cleanly and can
    never double-fold. Cost is O(corpus sessions) — an explicit
    maintenance operation, like a major compaction; the lazy
    alternative stays available as read_session_state_reconciled."""
    base, incr = _state_log(state_dir)
    folded = set(base.get("late_applied", [])) if base else set()
    # retire physically-EMPTY un-folded quarantine dirs (pre-r11 folds
    # wrote one per batch even with zero late events — ADVICE r10):
    # they carry no audit content, and dropping them here keeps the
    # late/ listing bounded for every subsequent read
    for p in glob.glob(os.path.join(state_dir, "late", "batch_id=*")):
        if int(os.path.basename(p).split("=", 1)[1]) not in folded:
            try:
                if _parquet_dir_rows(p) == 0:
                    shutil.rmtree(p, ignore_errors=True)
            except Exception:
                pass  # unreadable footer: keep the dir (safe default)
    pending = sorted(
        int(os.path.basename(p).split("=", 1)[1])
        for p in glob.glob(os.path.join(state_dir, "late", "batch_id=*"))
        if int(os.path.basename(p).split("=", 1)[1]) not in folded
    )
    if not pending or read_late_events(spark, state_dir).isEmpty():
        return False
    rid = max(_applied_ids(base, incr), default=-1) + 1
    wm = _watermark_us(base, incr)  # late events never advance it
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(SESSION_BUCKETS))
    stage_dir = os.path.join(state_dir, "stage", f"batch_{rid}")
    (
        read_session_state_reconciled(spark, state_dir)
        .withColumn("bucket", bucket)
        .write.mode("overwrite")
        .parquet(stage_dir)
    )
    frame = spark.read.schema(STATE_SCHEMA + ", bucket BIGINT").parquet(stage_dir)
    horizon_us = (wm or 0) - SESSION_GAP_US
    seg = os.path.join(state_dir, "closed_base", f"upto_{rid}")
    shutil.rmtree(seg, ignore_errors=True)
    (
        frame.where(F.unix_micros(F.col("session_end")) < F.lit(horizon_us))
        .select(*_STATE_COLS)
        .write.mode("overwrite")
        .parquet(seg)
    )
    commit_dir = os.path.join(state_dir, "open", f"commit_{rid}")
    shutil.rmtree(commit_dir, ignore_errors=True)
    (
        frame.where(F.unix_micros(F.col("session_end")) >= F.lit(horizon_us))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(commit_dir)
    )
    surviving = {
        int(os.path.basename(p).split("=", 1)[1])
        for p in glob.glob(os.path.join(commit_dir, "bucket=*"))
    }
    new_base = {
        "upto": rid,
        "watermark_us": wm,
        "buckets": {str(b): rid for b in surviving},
        "applied": sorted(_applied_ids(base, incr) | {rid}),
        "segments": [rid],
        "late_applied": sorted(folded | set(pending)),
    }
    tmp = _base_path(state_dir) + ".tmp"
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(new_base, fh)
    os.replace(tmp, _base_path(state_dir))  # the atomic switch
    shutil.rmtree(stage_dir, ignore_errors=True)
    _sweep_compacted(state_dir, new_base)
    _gc_open(state_dir)
    return True


def run_incremental_sessionization(
    spark: SparkSession, stage_dir: str, state_dir: str, checkpoint: str
) -> None:
    """Replay ``stage_dir`` (one file per micro-batch) through
    :func:`apply_session_batch` — the streaming maintainer of the
    shared session frame."""
    schema = (
        "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE,"
        " event_type STRING"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: apply_session_batch(spark, state_dir, df, bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# The unified store: session_frame's serving path


def _events_files(events_path: str) -> list[str]:
    if os.path.isfile(events_path):
        return [events_path]
    return sorted(glob.glob(os.path.join(events_path, "*.parquet")))


def _session_root(events_path: str) -> str:
    """Stable (append-surviving) root for the unified session store:
    keyed on the events SOURCE PATH + gap + layout version — NOT on
    content identity, because an appended events source must fold the
    tail into the existing state (O(batch)), not rebuild. Content
    changes are detected by the ledger (below): any applied file that
    changed or vanished forces a full rebuild. The gap + version
    suffix means a SESSION_GAP_MINUTES or layout change can never
    serve a stale frame (ADVICE r9)."""
    import tempfile

    key = events_path.strip("/").replace("/", "_").replace(".", "-")
    return os.path.join(
        tempfile.gettempdir(),
        f"sessions_{key}_g{SESSION_GAP_MINUTES}_v3",
    )


def _sweep_legacy_roots(events_path: str, keep: str) -> None:
    """Delete superseded cache roots: the pre-r10 content-fingerprinted
    one-shot frames (``sessions_<dir>_<mtime>_<size>``) and staged
    incremental states (``sessinc_*``), plus stale unified roots with
    a different gap/version suffix."""
    import tempfile

    tmp = tempfile.gettempdir()
    old_key = os.path.dirname(events_path).strip("/").replace("/", "_")
    new_key = events_path.strip("/").replace("/", "_").replace(".", "-")
    pats = [
        f"sessions_{old_key}_*",
        f"sessinc_{old_key}_*",
        f"sessions_{new_key}_g*",
    ]
    for pat in pats:
        for p in glob.glob(os.path.join(tmp, pat)):
            if p != keep:
                shutil.rmtree(p, ignore_errors=True)


def ensure_session_state(spark: SparkSession, events_path: str) -> str:
    """Bring the unified session store up to date with the events
    source and return its state dir. First sight of a source folds
    everything as batch 0 (the one per-user sort — same cost as the
    old one-shot build); each APPENDED file set folds as one more
    batch through :func:`apply_session_batch` — O(batch + touched
    buckets), not a rebuild. A changed/removed applied file (fixture
    regeneration) wipes and rebuilds.

    Crash-safety: each fold stages its (batch_id, file list) in
    ``pending.json`` before applying and promotes it into
    ``ledger.json`` after — a crash mid-fold resumes the EXACT same
    batch composition (the manifest gate makes the re-apply a no-op if
    it had completed), so files appended between crash and resume
    can't silently join an already-committed batch id."""
    root = _session_root(events_path)
    state = os.path.join(root, "state")
    ledger_p = os.path.join(root, "ledger.json")
    pending_p = os.path.join(root, "pending.json")
    files = _events_files(events_path)
    cur = {p: [os.path.getsize(p), os.stat(p).st_mtime_ns] for p in files}

    # tolerant load (ADVICE r10): torn/unreadable ledger or pending
    # (crash mid-write under the pre-r11 plain writer) demotes to a
    # full rebuild instead of raising JSONDecodeError.
    ledger = _read_json(ledger_p) if os.path.exists(ledger_p) else None
    if ledger is not None:
        stale = any(
            p not in cur or cur[p] != sig for p, sig in ledger["files"].items()
        )
        if stale:
            ledger = None
    if ledger is not None and os.path.exists(pending_p):
        # a crashed fold: resume with the EXACT staged batch composition
        # — unless any staged file vanished OR its (size, mtime_ns)
        # signature differs from what was staged (source mutated under
        # the crash — ADVICE r10: an in-place rewrite after the crashed
        # fold's manifest landed would otherwise promote the NEW
        # signature over the OLD folded content, permanently blinding
        # the staleness check), which demotes to a full rebuild.
        pend = _read_json(pending_p)
        if (
            pend is None
            or not isinstance(pend.get("files"), dict)  # legacy list form
            or any(
                p not in cur or cur[p] != sig
                for p, sig in pend["files"].items()
            )
        ):
            ledger = None
    if ledger is None:
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        _sweep_legacy_roots(events_path, keep=root)
        ledger = {"files": {}, "n_batches": 0}

    def _fold(batch_files: list[str], batch_id: int) -> None:
        from ..catalog import normalize_events_ts

        batch = normalize_events_ts(spark.read.parquet(*batch_files)).select(
            "user_id", "event_id", "ts", "value", "event_type"
        )
        apply_session_batch(spark, state, batch, batch_id)

    if os.path.exists(pending_p):
        pend = _read_json(pending_p)
        staged = list(pend["files"])
        if pend["batch_id"] not in _applied_ids(*_state_log(state)):
            _fold(staged, pend["batch_id"])
        for p in staged:
            # promote the STAGED signature (verified == current above),
            # never a fresher stat — the staleness check must compare
            # against what was actually folded
            ledger["files"][p] = pend["files"][p]
        ledger["n_batches"] = max(ledger["n_batches"], pend["batch_id"] + 1)
        _write_json(ledger_p, ledger)
        os.remove(pending_p)

    new = [p for p in files if p not in ledger["files"]]
    if new:
        # next id clears BOTH the ledger's counter and any id the state
        # log already consumed (a durable late-repair allocates one) —
        # reusing an applied id would make the fold a silent no-op
        applied = _applied_ids(*_state_log(state))
        batch_id = max(ledger["n_batches"], max(applied, default=-1) + 1)
        # stage WITH each file's (size, mtime_ns) signature: resume
        # demotes to rebuild if any staged file was mutated in place
        # between crash and resume (ADVICE r10)
        _write_json(
            pending_p, {"batch_id": batch_id, "files": {p: cur[p] for p in new}}
        )
        _fold(new, batch_id)
        for p in new:
            ledger["files"][p] = cur[p]
        ledger["n_batches"] = batch_id + 1
        _write_json(ledger_p, ledger)
        os.remove(pending_p)
        # auto-checkpoint: a long-append source would otherwise grow
        # one closed dir + one manifest per fold — compact once the
        # incremental log passes the threshold (read/listing cost stays
        # bounded; correctness is unchanged, pinned by the compaction
        # tests)
        _, incr = _state_log(state)
        if len(incr) > COMPACT_EVERY_COMMITS:
            compact_session_state(spark, state)
    return state


def serve_session_frame(spark: SparkSession, state_dir: str) -> DataFrame:
    """The consumer-facing session frame over the maintained state:
    one scan of closed ∪ open with the one-shot frame's exact columns.
    ``session_id`` (the per-user session ordinal the one-shot running
    sum produced) is derived by a row_number over the SESSIONS-count
    frame — user-bounded partitions, and Catalyst prunes the whole
    Window node for the consumers that never select it (pinned in
    tests/test_operators.py), so only the two id-consuming queries pay
    it."""
    st = read_session_state(spark, state_dir)
    w = Window.partitionBy("user_id").orderBy("session_start")
    return st.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        F.col("n_events").cast("long").alias("n_events"),
        "session_start",
        "session_end",
        F.round(F.col("total_value_dec"), 4).cast("double").alias("total_value"),
        F.concat_ws(">", "opening").alias("opening_path"),
    )


@query("session_frame_incremental")  # rows-only: the maintained unified
# session store served directly; bit-exact parity with the one-shot
# batch build (incl. exact decimal sums), split-invariance of
# counts/bounds/sums under splits (incl. bounded-disorder shuffles),
# double-replay idempotence, crash-at-any-step replay and
# O(touched-bucket) rewrites are pinned in tests/test_streaming.py
def session_frame_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNIFIED session store — the same open/closed state that
    `apply_session_batch` maintains and every session consumer reads
    through `session_frame` (r10: one store, not a one-shot cache next
    to a parallel incremental artifact). Ordered for determinism;
    total_value rounds to the sessionize contract at read."""
    state = ensure_session_state(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    return (
        read_session_state(spark, state)
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.round(F.col("total_value_dec"), 4)
            .cast("double")
            .alias("total_value"),
            F.concat_ws(">", "opening").alias("opening_path"),
        )
        .orderBy("user_id", "session_start")
    )
