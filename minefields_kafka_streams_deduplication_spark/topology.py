"""Kafka Streams DSL facade — the migration surface (SURVEY.md §2).

A user of the reference writes topologies against the KS DSL
[R o.a.k.streams.StreamsBuilder / KStream / KGroupedStream /
TimeWindows]. This module gives that user the SAME verbs, 1:1, each
delegating to the engine's Spark-first operators — so a topology ports
line by line while the execution plan is pure Catalyst:

    b = StreamsBuilder(spark, sf_dir)
    (b.stream("events")
       .filter(F.col("event_type") == "purchase")
       .select_key("user_id")
       .group_by_key()
       .windowed_by("1 day")
       .aggregate(F.sum("value").alias("revenue"))
       .to_df())

Every verb returns a new wrapper over a lazy DataFrame — no execution
until an action, exactly like a KS topology before `start()`. The
wrappers add NO physical behavior of their own: the 100 TB story is the
wrapped plan's (see SCALING.md), which is the point of a facade.
"""

from __future__ import annotations

import functools
import operator
import tempfile

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import DEFAULT_SF_DIR, load_table


class _Describable:
    """[R Topology#describe / TopologyDescription]: every wrapper
    carries the chain of DSL verbs that produced it, and ``describe()``
    renders it KS-style — the introspection surface a KS porter uses to
    sanity-check a migrated topology. The node list is the DSL-level
    view; ``to_df().explain()`` remains the physical (Catalyst) view,
    which is the half KS cannot show."""

    _lineage: tuple[str, ...] = ()

    def describe(self) -> str:
        lines = ["Topology:"]
        for i, node in enumerate(self._lineage):
            lines.append(f"  {i:>3}: {node}")
        return "\n".join(lines)


def _nest(other: "_Describable") -> str:
    """Render another branch's lineage inline for join/merge nodes."""
    return "{" + " -> ".join(other._lineage) + "}"


class StreamsBuilder:
    """[R StreamsBuilder]: entry point; `stream` / `table` /
    `global_table` mirror the three KS source kinds."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
        self.spark = spark
        self.sf_dir = sf_dir

    def stream(self, name: str) -> "KStream":
        """[R StreamsBuilder#stream]: record stream (batch replay here;
        swap load_table for streaming.read_events_stream and every verb
        downstream is unchanged — unified API)."""
        return KStream(
            load_table(self.spark, self.sf_dir, name),
            lineage=(f"Source: {name} (topic: {name})",),
        )

    def stream_wire(self, name: str, on_error: str = "fail"):
        """[R StreamsBuilder#stream over raw topic bytes +
        default.deserialization.exception.handler] — the config-level
        serde error policy a KS porter sets once per app, as a source
        verb. The topic replay is the fixture serialized onto the wire
        (sources/kafka.serialize_event_payload); deserialization runs
        the engine's parsers:

        - ``on_error="fail"`` → [R LogAndFailExceptionHandler] (the KS
          default): one KStream whose first corrupt record fails the
          job loudly (`parse_event_payload_strict`).
        - ``on_error="continue"`` → [R LogAndContinueExceptionHandler]:
          one KStream of the good rows; corrupt records are skipped.
        - ``on_error="route"`` → the DLQ pattern: returns (good
          KStream, dead KStream) where dead keeps the ORIGINAL bytes +
          a reason — wire `dead.to(path)` for the dead-letter topic
          (the streaming form lives in streaming/dlq.py).
        """
        from .sources.kafka import (
            parse_event_payload_routed,
            parse_event_payload_strict,
            serialize_event_payload,
        )

        wire = serialize_event_payload(
            load_table(self.spark, self.sf_dir, name)
        ).select("key", "value")
        src = (f"Source: {name} (topic bytes, wire serde)",)
        if on_error == "fail":
            return KStream(
                parse_event_payload_strict(wire),
                lineage=src + ("Processor: deserialize[LogAndFail]",),
            )
        if on_error == "continue":
            good, _dead = parse_event_payload_routed(wire)
            return KStream(
                good, lineage=src + ("Processor: deserialize[LogAndContinue]",)
            )
        if on_error == "route":
            good, dead = parse_event_payload_routed(wire)
            return (
                KStream(
                    good,
                    lineage=src + ("Processor: deserialize[route→good]",),
                ),
                KStream(
                    dead,
                    lineage=src + ("Processor: deserialize[route→DLQ]",),
                ),
            )
        raise ValueError(
            f"on_error must be 'fail', 'continue' or 'route', got {on_error!r}"
        )

    def table(self, name: str, key: str, ts: str) -> "KTable":
        """[R StreamsBuilder#table]: changelog → latest row per key.
        Delegates to KStream.to_table so the deterministic timestamp
        tiebreak lives in exactly one place."""
        return KStream(
            load_table(self.spark, self.sf_dir, name),
            key,
            lineage=(f"Source: {name} (topic: {name}, table)",),
        ).to_table(ts)

    def global_table(self, name: str, key: str) -> "KTable":
        """[R StreamsBuilder#globalTable]: replicated dimension —
        broadcast, so joins against it never shuffle the stream side.
        SNAPSHOT form: the dimension is fixed at build time; for the
        continuously-updated store KS actually provides, use
        :meth:`global_table_live`."""
        return KTable(
            F.broadcast(load_table(self.spark, self.sf_dir, name)),
            key,
            lineage=(f"Source: {name} (globalTable, broadcast)",),
        )

    def global_table_live(self, dim_root: str, key: str) -> "LiveGlobalKTable":
        """[R StreamsBuilder#globalTable — the global store updates
        CONTINUOUSLY from its topic]: a versioned-snapshot-backed
        dimension handle. Publishers append full snapshots
        (``publish``); ``current()`` resolves the latest complete one
        as a broadcast KTable — call it inside ``foreachBatch`` so
        every micro-batch enriches against the freshest dimension
        (streaming/global_table.py has the full harness)."""
        return LiveGlobalKTable(self.spark, dim_root, key)


class LiveGlobalKTable:
    """Continuously-refreshed GlobalKTable facade over the versioned
    snapshot store. Not a lazy DataFrame wrapper: ``current()`` is
    deliberately re-invoked per micro-batch (the point of the live
    form); each call is one bounded parquet read."""

    def __init__(self, spark: SparkSession, root: str, key: str) -> None:
        self.spark = spark
        self.root = root
        self.key = key

    def publish(self, df: DataFrame) -> int:
        """Append the next snapshot version; atomic via _SUCCESS."""
        from .streaming.global_table import publish_dim_snapshot

        return publish_dim_snapshot(df, self.root)

    def current(self) -> "KTable":
        """The latest complete snapshot as a broadcast KTable (carries
        ``_dim_version``). The broadcast hint is the GlobalKTable
        contract: user-declared instance-memory-bounded."""
        from .streaming.global_table import read_dim_latest

        return KTable(
            F.broadcast(read_dim_latest(self.spark, self.root)),
            self.key,
            lineage=(f"Source: {self.root} (globalTable LIVE, broadcast)",),
        )


class KStream(_Describable):
    """[R KStream]: stateless verbs return KStream; `group_by_key`
    enters the stateful half."""

    def __init__(
        self,
        df: DataFrame,
        key: str | None = None,
        lineage: tuple[str, ...] = (),
    ) -> None:
        self.df = df
        self.key = key
        self._lineage = lineage or ("Source: <dataframe>",)

    def _with(self, df: DataFrame, op: str | None = None) -> "KStream":
        lin = self._lineage + ((f"Processor: {op}",) if op else ())
        return KStream(df, self.key, lin)

    # --- stateless (SURVEY §2.2) ---

    def filter(self, pred: Column) -> "KStream":  # [R KStream#filter]
        return self._with(self.df.filter(pred), "filter")

    def filter_not(self, pred: Column) -> "KStream":  # [R KStream#filterNot]
        return self._with(self.df.filter(~pred), "filterNot")

    def map_values(self, *cols: Column | str) -> "KStream":  # [R KStream#mapValues]
        keep = ([self.key] if self.key else []) + list(cols)
        return self._with(self.df.select(*keep), "mapValues")

    def select_key(self, key: str) -> "KStream":  # [R KStream#selectKey]
        return KStream(
            self.df, key, self._lineage + (f"Processor: selectKey({key})",)
        )

    def flat_map_values(self, col: Column, alias: str) -> "KStream":
        """[R KStream#flatMapValues]: 1 → 0..n via explode."""
        keep = [c for c in self.df.columns]
        return self._with(
            self.df.select(*keep, F.explode(col).alias(alias)), "flatMapValues"
        )

    def peek(self, name: str, *metrics: Column) -> tuple["KStream", object]:
        """[R KStream#peek]: execution-time metric tap (P7)."""
        from .operators.stateless import peek as _peek

        df, obs = _peek(self.df, name, *metrics)
        return self._with(df, f"peek({name})"), obs

    def merge(self, other: "KStream") -> "KStream":  # [R KStream#merge]
        return self._with(
            self.df.unionByName(other.df), f"merge {_nest(other)}"
        )

    def branch(self, **preds: Column) -> dict[str, "KStream"]:  # [R KStream#split]
        return {
            name: self._with(self.df.filter(p), f"branch[{name}]")
            for name, p in preds.items()
        }

    def repartition(self, n: int) -> "KStream":  # [R KStream#repartition]
        cols = [self.key] if self.key else []
        return self._with(
            self.df.repartition(n, *cols) if cols else self.df.repartition(n),
            f"repartition({n})",
        )

    # --- joins (SURVEY §2.4) ---

    def join_table(self, table: "KTable", on: Column, how: str = "inner") -> "KStream":
        """[R KStream#join(KTable) / #leftJoin(KTable)]."""
        return self._with(
            self.df.join(table.df, on, how), f"join[{how}] {_nest(table)}"
        )

    def join_windowed(
        self, other: "KStream", on: Column, this_ts: str, other_ts: str, within: str,
        how: str = "inner",
    ) -> "KStream":
        """[R KStream#join(KStream, JoinWindows.ofTimeDifference)]:
        time-bounded stream-stream join (|Δt| <= within)."""
        bound = (
            (F.col(other_ts) >= F.col(this_ts) - F.expr(f"INTERVAL {within}"))
            & (F.col(other_ts) <= F.col(this_ts) + F.expr(f"INTERVAL {within}"))
        )
        return self._with(
            self.df.join(other.df, on & bound, how),
            f"joinWindowed[{how}, within {within}] {_nest(other)}",
        )

    # --- stateful entry (SURVEY §2.5/§2.6) ---

    def group_by_key(self, *extra: str) -> "KGroupedStream":
        """[R KStream#groupByKey / #groupBy]."""
        keys = ([self.key] if self.key else []) + list(extra)
        if not keys:
            raise ValueError("group_by_key needs select_key() or explicit columns")
        return KGroupedStream(
            self.df,
            keys,
            lineage=self._lineage + (f"Processor: groupByKey({', '.join(keys)})",),
        )

    def process(self, fn: Callable, schema: str) -> "KStream":
        """[R KStream#process(ProcessorSupplier)]: the imperative escape
        hatch. KS hands each record to user code; the Spark-native analog
        hands user code ARROW BATCHES via mapInPandas — same power
        (arbitrary per-record logic, 1→0..n emission), but vectorized and
        parallel by partition instead of per-record callbacks. For KEYED
        state use group_by_key() + the engine's applyInPandasWithState
        dedup/windows, which is what a stateful Processor becomes."""
        return self._with(
            self.df.mapInPandas(fn, schema), f"process({fn.__name__})"
        )

    def to_table(self, ts: str = "ts", tiebreak: str | None = None) -> "KTable":
        """[R KStream#toTable]: stream → changelog view (latest per key).

        Ties on `ts` are broken by `tiebreak` (default: `event_id` when
        present) so the winner is deterministic run-to-run and agrees
        with the engine's `latest_by_key` (ADVICE r2: ORDER BY ts DESC
        alone picks an arbitrary row among equal timestamps)."""
        if not self.key:
            raise ValueError("to_table needs select_key() first")
        from pyspark.sql import Window

        if tiebreak is None and "event_id" in self.df.columns:
            tiebreak = "event_id"
        order = [F.desc(ts)] + ([F.desc(tiebreak)] if tiebreak else [])
        w = Window.partitionBy(self.key).orderBy(*order)
        latest = (
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return KTable(
            latest,
            self.key,
            self._lineage + ("Processor: toTable (latest per key)",),
            updates=self.df,
        )

    # --- sink (SURVEY §2.1 S4) ---

    def materialize_versioned(
        self, root: str | None = None, ts: str = "ts", tiebreak: str | None = None
    ) -> "object":
        """Versioned-store facade [R Stores#persistentVersionedKeyValueStore
        via Materialized]: write this (un-compacted) stream as the
        version-retaining bucketed layout — EVERY (key, ts) row kept,
        files sorted by (key, ts) — and return the
        ReadOnlyVersionedKeyValueStore serving ``get(key[, asOf])``.
        Same root contract as ``KTable.materialize``."""
        from pyspark.sql import functions as F

        from .sources.sinks import UPSERT_BUCKETS
        from .sources.state_store import ReadOnlyVersionedKeyValueStore

        if self.key is None:
            raise ValueError("materialize_versioned requires a keyed stream")
        root = root or tempfile.mkdtemp(prefix="kstream_vstore_")
        keyed = self.df.withColumn(
            "bucket", F.pmod(F.xxhash64(self.key), F.lit(UPSERT_BUCKETS))
        )
        (
            keyed.repartition("bucket")
            .sortWithinPartitions(self.key, ts)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(root)
        )
        return ReadOnlyVersionedKeyValueStore(
            self.df.sparkSession, root, self.key, ts_col=ts, tie_col=tiebreak
        )

    def to(self, path: str, fmt: str = "parquet", eos: bool = False):
        """[R KStream#to]. Plain form: write the stream's rows to
        ``path`` as ``fmt``. ``eos=True`` (r8, VERDICT r7 #8) is the
        exactly-once topic sink [R KS `processing.guarantee=
        exactly_once_v2`]: replay this stream through the engine's
        streaming EOS snapshot sink (sources/snapshots.py — real
        micro-batches via foreachBatch, one batchId-tagged snapshot
        version per batch, idempotent under at-least-once redelivery)
        and return the resulting ``SnapshotStateTable`` at ``path`` so
        the caller can read the final state AND time-travel the commit
        history — the IQ affordance ``materialize`` also provides.
        Requires the engine's keyed-event shape (clear error
        otherwise). KS returns void here; returning the store handle is
        this facade's documented deviation."""
        if not eos:
            self.df.write.format(fmt).mode("overwrite").save(path)
            self._lineage = self._lineage + (f"Sink: to[{path}, {fmt}]",)
            return None
        import shutil

        from .sources.snapshots import run_stream_into_snapshots
        from .streaming.punctuate import stage_events_ordered

        required = ["user_id", "event_id", "ts", "value", "event_type"]
        missing = [c for c in required if c not in self.df.columns]
        if missing:
            raise ValueError(
                f"to(eos=True) commits the keyed-event columns {required} "
                f"through the snapshot sink; the stream is missing {missing}"
            )
        stage = tempfile.mkdtemp(prefix="kstream_eos_stage_")
        try:
            stage_events_ordered(self.df.select(*required), stage, n_slices=3)
            table = run_stream_into_snapshots(self.df.sparkSession, stage, path)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        self._lineage = self._lineage + (
            f"Sink: to[{path}, exactly_once_v2 -> snapshot versions]",
        )
        return table

    def to_df(self) -> DataFrame:
        return self.df


class KGroupedStream(_Describable):
    """[R KGroupedStream]: count/reduce/aggregate, optionally windowed."""

    def __init__(
        self,
        df: DataFrame,
        keys: list[str],
        window: Column | None = None,
        lineage: tuple[str, ...] = (),
        grace: str | None = None,
        sliding: str | None = None,
        ts: str = "ts",
    ) -> None:
        self.df = df
        self.keys = keys
        self.window = window
        self._lineage = lineage
        self.grace = grace
        self._sliding = sliding
        self._ts = ts

    def windowed_by(
        self,
        size: str,
        slide: str | None = None,
        ts: str = "ts",
        grace: str | None = None,
    ) -> "KGroupedStream":
        """[R KGroupedStream#windowedBy(TimeWindows)]: tumbling (size)
        or hopping (size, slide) windows.

        ``grace`` [R TimeWindows.ofSizeAndGrace — r12, VERDICT r11
        missing #2]: the declared lateness bound. In the BATCH replay
        the facade replays the whole topic in event-time order, so no
        record is ever late and grace cannot change results — but the
        declaration is retained (lineage + attribute) and becomes the
        WATERMARK DELAY when the topology executes as a real stream
        (:meth:`count_final`), where a record arriving after its
        window's watermark closes is dropped exactly as KS drops past
        window-end + grace. Omitting grace = ofSizeWithNoGrace (zero
        delay on the streaming path)."""
        w = F.window(ts, size, slide) if slide else F.window(ts, size)
        kind = f"hopping {size}/{slide}" if slide else f"tumbling {size}"
        if grace:
            kind += f", grace {grace}"
        return KGroupedStream(
            self.df, self.keys, w.alias("__w"),
            self._lineage + (f"Processor: windowedBy({kind})",),
            grace=grace, ts=ts,
        )

    def session_windowed_by(
        self, gap: str, ts: str = "ts", grace: str | None = None
    ) -> "KGroupedStream":
        """[R KGroupedStream#windowedBy(SessionWindows)]; ``grace``
        [R SessionWindows.ofInactivityGapAndGrace] as in
        :meth:`windowed_by`."""
        kind = f"session gap {gap}" + (f", grace {grace}" if grace else "")
        return KGroupedStream(
            self.df, self.keys, F.session_window(ts, gap).alias("__w"),
            self._lineage + (f"Processor: windowedBy({kind})",),
            grace=grace, ts=ts,
        )

    def sliding_windowed_by(
        self, size: str, ts: str = "ts", grace: str | None = None
    ) -> "KGroupedStream":
        """[R KGroupedStream#windowedBy(SlidingWindows) — r12, VERDICT
        r11 missing #3]: event-anchored trailing windows — per distinct
        (key, record ts), aggregate everything from the same key in
        [ts − size, ts], both ends inclusive (the engine's
        window_sliding_event_anchored RANGE-frame convention; KS emits
        one window per Windowed<K> = (key, window), so records sharing
        (key, ts) collapse to one output row).

        Execution shape is the INTERVAL SELF-JOIN (equi-join on the key
        + time-range predicate — the J4 shape, never a cartesian): the
        generic form that accepts the same agg Columns as the grid
        windows verbatim. A count/sum-only topology could use the
        RANGE-frame window function instead (one shuffle, no join);
        the facade favors the form that keeps count/reduce/aggregate
        uniform."""
        kind = f"sliding {size}" + (f", grace {grace}" if grace else "")
        return KGroupedStream(
            self.df, self.keys, None,
            self._lineage + (f"Processor: windowedBy({kind})",),
            grace=grace, sliding=size, ts=ts,
        )

    def _group(self):
        cols = list(self.keys) + ([self.window] if self.window is not None else [])
        return self.df.groupBy(*cols)

    def _sliding_agg(self, *aggs: Column) -> DataFrame:
        """The SlidingWindows aggregate: anchors = distinct (keys, ts);
        frame rows join on key equality + trailing-interval predicate;
        one groupBy per anchor applies the caller's agg columns
        verbatim (they resolve against the frame side's original
        column names)."""
        ts = self._ts
        size = self._sliding
        anchors = self.df.select(
            *self.keys, F.col(ts).alias("__wend")
        ).distinct()
        frame = self.df
        for k in self.keys:
            frame = frame.withColumnRenamed(k, f"__fk_{k}")
        cond = [anchors[k] == frame[f"__fk_{k}"] for k in self.keys]
        cond.append(frame[ts] <= anchors["__wend"])
        cond.append(
            frame[ts] >= anchors["__wend"] - F.expr(f"INTERVAL {size}")
        )
        joined = anchors.join(frame, functools.reduce(operator.and_, cond))
        out = (
            joined.groupBy(*[anchors[k] for k in self.keys], anchors["__wend"])
            .agg(*aggs)
            .withColumn("window_start", F.col("__wend") - F.expr(f"INTERVAL {size}"))
            .withColumnRenamed("__wend", "window_end")
        )
        cols = [c for c in out.columns if c not in ("window_start", "window_end")]
        keyed = [c for c in cols if c in self.keys]
        rest = [c for c in cols if c not in self.keys]
        return out.select(*keyed, "window_start", "window_end", *rest)

    def count(self) -> "KTable":  # [R KGroupedStream#count]
        agg = F.count("*").alias("count")
        body = (
            self._sliding_agg(agg)
            if self._sliding
            else self._unwrap(self._group().agg(agg))
        )
        return KTable(
            body, self.keys[0], self._lineage + ("Processor: count",)
        )

    def reduce(self, agg: Column) -> "KTable":  # [R KGroupedStream#reduce]
        body = (
            self._sliding_agg(agg)
            if self._sliding
            else self._unwrap(self._group().agg(agg))
        )
        return KTable(
            body, self.keys[0], self._lineage + ("Processor: reduce",)
        )

    def aggregate(self, *aggs: Column) -> "KTable":  # [R KGroupedStream#aggregate]
        body = (
            self._sliding_agg(*aggs)
            if self._sliding
            else self._unwrap(self._group().agg(*aggs))
        )
        return KTable(
            body, self.keys[0], self._lineage + ("Processor: aggregate",)
        )

    def count_final(
        self, arrival: str | None = None, n_slices: int = 3
    ) -> DataFrame:
        """Execute the windowed COUNT through Structured Streaming with
        the declared ``grace`` as the watermark delay — append mode is
        KS suppression-until-close, and a record whose window's
        watermark has already passed when it arrives is DROPPED, which
        is exactly what [R TimeWindows.ofSizeAndGrace] declares. No
        grace ⇒ zero watermark delay [R ofSizeWithNoGrace]: any
        out-of-order record whose window closed in an earlier
        micro-batch is dropped; a grace covering the disorder admits it
        (pinned in tests/test_topology.py, batch/stream parity style).

        ``arrival`` orders the replay (the topic offset order — the
        thing lateness is measured against); default is event time,
        i.e. an in-order replay where grace never fires. Rows are
        staged as ``n_slices`` sequential files (oldest-mtime-first
        pickup, the punctuate stager's convention) and each file is one
        micro-batch."""
        if self.window is None:
            raise ValueError(
                "count_final needs windowed_by/session_windowed_by "
                "(sliding streams via streaming.windows_stream)"
            )
        import shutil
        import time as _time

        spark = self.df.sparkSession
        order = arrival or self._ts
        is_ts = dict(self.df.dtypes).get(order) == "timestamp"
        ocol = F.unix_micros(order) if is_ts else F.col(order)
        lo, hi = self.df.agg(F.min(ocol), F.max(ocol)).first()
        if lo is None:
            return self._unwrap(
                self._group().agg(F.count(F.lit(1)).alias("count"))
            ).limit(0)
        stage = tempfile.mkdtemp(prefix="kgrouped_grace_stage_")
        try:
            bounds = (
                [None]
                + [lo + (hi - lo) * i // n_slices for i in range(1, n_slices)]
                + [None]
            )
            for i in range(n_slices):
                part = self.df
                if bounds[i] is not None:
                    part = part.where(ocol >= bounds[i])
                if bounds[i + 1] is not None:
                    part = part.where(ocol < bounds[i + 1])
                part.coalesce(1).write.mode("append").parquet(stage)
                _time.sleep(0.05)  # distinct mtimes => deterministic order
            stream = (
                spark.readStream.schema(self.df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage)
            )
            agg = (
                stream.withWatermark(self._ts, self.grace or "0 seconds")
                .groupBy(*self.keys, self.window)
                .agg(F.count(F.lit(1)).alias("count"))
            )
            from .streaming.source import run_to_memory

            result = run_to_memory(self._unwrap(agg), "kgrouped_grace")
            self._lineage = self._lineage + (
                f"Processor: count [streamed, grace={self.grace or '0'}]",
            )
            return result
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    def schedule(
        self,
        interval_ms: int,
        slow_interval_ms: int | None = None,
        reschedule_after: int = 10**9,
        cancel_after: int = 10**9,
    ) -> "KStream":
        """[R ProcessorContext#schedule(interval, WALL_CLOCK_TIME,
        callback) returning a Cancellable]: per-key wall-clock
        punctuation snapshots over a STREAMING grouped frame, with the
        Cancellable lifecycle declared up front instead of called
        imperatively — ``reschedule_after`` firings switch the timer to
        ``slow_interval_ms`` (KS cancel-then-schedule-new, the backoff
        pattern) and ``cancel_after`` firings cancel it for good
        (rows keep accumulating in state, punctuations stop; pinned by
        the settle window in streaming/punctuate.run_cancellable).
        Emits (key, n, firing, emit_wall_us) per punctuation.

        The facade delegates to the engine's cancellable punctuator
        unchanged — the grouped key column is transported through the
        operator's canonical key name, so any single string-typed key
        works without touching the checkpointed state layout."""
        if self.df.isStreaming is False:
            raise ValueError("schedule() needs a streaming KStream source")
        if len(self.keys) != 1 or self.window is not None:
            raise ValueError("schedule() punctuates one un-windowed key")
        from .streaming.punctuate import punctuated_counts_cancellable

        key = self.keys[0]
        src = self.df
        if key != "event_type":
            # The punctuator counts rows per key; a pre-existing
            # non-key `event_type` column would collide with the key
            # transport rename (ambiguous reference inside the state
            # fn) and carries no information the operator reads — drop
            # it before renaming (r8, advisor-directed).
            if "event_type" in src.columns:
                src = src.drop("event_type")
            src = src.withColumnRenamed(key, "event_type")
        out = punctuated_counts_cancellable(
            src,
            interval_ms,
            slow_interval_ms if slow_interval_ms is not None else interval_ms,
            reschedule_after,
            cancel_after,
        )
        if key != "event_type":
            out = out.withColumnRenamed("event_type", key)
        lifecycle = (
            f"reschedule@{reschedule_after}->{slow_interval_ms}ms, "
            f"cancel@{cancel_after}"
        )
        return KStream(
            out,
            key,
            self._lineage
            + (
                f"Processor: schedule({interval_ms}ms, WALL_CLOCK_TIME) "
                f"[Cancellable: {lifecycle}]",
            ),
        )

    def _unwrap(self, df: DataFrame) -> DataFrame:
        if self.window is None:
            return df
        return df.select(
            *self.keys,
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *[c for c in df.columns if c not in self.keys and c != "__w"],
        )


class KTable(_Describable):
    """[R KTable]: a keyed changelog view. `to_stream` re-enters the
    stream verbs [R KTable#toStream]."""

    def __init__(
        self,
        df: DataFrame,
        key: str | list[str],
        lineage: tuple[str, ...] = (),
        updates: DataFrame | None = None,
    ) -> None:
        self.df = df
        self.key = key if isinstance(key, str) else key[0]
        self._lineage = lineage or ("Source: <table>",)
        # the UN-compacted changelog that produced this table, when the
        # producer had one (to_table keeps its stream; suppress keeps
        # the debounced emission history). Batch-replay KTables carry
        # only the compacted state in .df; verbs that need every update
        # (suppress untilTimeLimit) read this instead.
        self._updates = updates

    def updates(self) -> DataFrame | None:
        """The un-compacted update stream behind this table (None when
        the table was built directly from compacted state)."""
        return self._updates

    def filter(self, pred: Column) -> "KTable":  # [R KTable#filter]
        return KTable(
            self.df.filter(pred), self.key, self._lineage + ("Processor: filter",)
        )

    def map_values(self, *cols: Column | str) -> "KTable":  # [R KTable#mapValues]
        return KTable(
            self.df.select(self.key, *cols),
            self.key,
            self._lineage + ("Processor: mapValues",),
        )

    def join(self, other: "KTable", on: Column | str, how: str = "inner") -> "KTable":
        """[R KTable#join/#leftJoin/#outerJoin(KTable)]: table-table join —
        in KS both sides are materialized changelogs and the result
        updates on either side; in batch replay that is exactly a join of
        the two latest-per-key views (how='inner'|'left'|'full')."""
        return KTable(
            self.df.join(other.df, on, how),
            self.key,
            self._lineage + (f"Processor: tableJoin[{how}] {_nest(other)}",),
        )

    def fk_join(
        self, other: "KTable", fk: str, how: str = "inner"
    ) -> "KTable":
        """[R KTable#join(KTable, Function foreignKeyExtractor)]: the
        KS 2.4+ foreign-key table join (this side's fk column → other
        side's primary key). KS runs a two-hop subscription/response
        topology to keep it incrementally correct; Catalyst just joins
        on the extracted key — broadcast when the dimension side is
        small (the globalTable wrapper already carries the hint).

        The join condition uses frame-QUALIFIED columns and the
        dimension-side key is dropped afterwards, so chained fk_joins
        through tables sharing column names neither throw
        AMBIGUOUS_REFERENCE nor carry duplicate key columns (ADVICE r2).
        """
        joined = self.df.join(
            other.df, self.df[fk] == other.df[other.key], how
        ).drop(other.df[other.key])
        return KTable(
            joined,
            self.key,
            self._lineage + (f"Processor: fkJoin[{how}, fk={fk}] {_nest(other)}",),
        )

    def suppress(self, until_time_limit_ms: int | None = None) -> "KTable":
        """[R KTable#suppress]. Two modes, matching the two
        ``Suppressed`` factories:

        - No argument → ``Suppressed.untilWindowCloses``: emit only the
          FINAL result per window/key. In batch replay every result is
          already final, so this is the identity; on the streaming
          twins the same semantics is append output mode + watermark
          (streaming/windows_stream.py docstrings) — suppression is an
          OUTPUT-MODE property in Spark, not an operator.
        - ``until_time_limit_ms=N`` → ``Suppressed.untilTimeLimit``
          (r8, VERDICT r7 #8): debounce the table's UPDATE STREAM with
          an N-ms stream-time buffer per key, by actually driving the
          engine's streaming debounce (streaming/suppress.py — real
          micro-batches, transformWithState timers, fixpoint drain)
          over this table's changelog. The returned KTable holds the
          final emission per key (== latest-per-key by conservation,
          pinned); the full debounced emission history is on
          ``.updates()``. Requires the changelog the producer attached
          (``to_table`` keeps its stream) with the engine's keyed-event
          shape; raises a clear error otherwise."""
        if until_time_limit_ms is None:
            return self
        import shutil

        from .streaming.punctuate import stage_events_ordered
        from .streaming.suppress import _SENTINEL_KEY, run_suppressed

        if self._updates is None:
            raise ValueError(
                "suppress(until_time_limit_ms=...) debounces the table's "
                "update stream, but this KTable carries no changelog — "
                "build it with KStream.to_table() (which keeps its stream)"
            )
        required = ["user_id", "event_id", "ts", "value", "event_type"]
        missing = [c for c in required if c not in self._updates.columns]
        if missing:
            raise ValueError(
                f"suppress(until_time_limit_ms=...) needs the keyed-event "
                f"columns {required}; the changelog is missing {missing}"
            )
        spark = self.df.sparkSession
        stage = tempfile.mkdtemp(prefix="ktable_suppress_stage_")
        try:
            stage_events_ordered(
                self._updates.select(*required), stage, n_slices=3
            )
            hist = run_suppressed(
                spark, stage, limit_ms=until_time_limit_ms
            ).where(F.col("user_id") != _SENTINEL_KEY)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        final = (
            hist.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("last_value", "last_type", "last_ts_us"),
                    "last_ts_us",
                ).alias("b")
            )
            .select("user_id", "b.last_value", "b.last_type", "b.last_ts_us")
        )
        return KTable(
            final,
            "user_id",
            self._lineage
            + (
                f"Processor: suppress(untilTimeLimit[{until_time_limit_ms}ms])",
            ),
            updates=hist,
        )

    def group_by(self, *keys: str) -> "KGroupedStream":
        """[R KTable#groupBy -> KGroupedTable]: re-key the table and
        re-aggregate. KS needs an adder AND a subtractor here because a
        changelog UPDATE retracts the old value from the old group
        before adding to the new one; in batch replay the aggregation
        runs over the FINAL compacted table, so a plain aggregate is
        exactly the adder/subtractor fixpoint — the subtractor has
        nothing left to retract. (The streaming twin of this retraction
        machinery is table_changelog_stream's update mode.)"""
        if not keys:
            raise ValueError("group_by needs at least one key column")
        return KGroupedStream(
            self.df,
            list(keys),
            lineage=self._lineage
            + (f"Processor: groupBy({', '.join(keys)}) [KGroupedTable]",),
        )

    def to_stream(self) -> KStream:  # [R KTable#toStream]
        return KStream(
            self.df, self.key, self._lineage + ("Processor: toStream",)
        )

    def to_df(self) -> DataFrame:
        return self.df

    def materialize(self, root: str | None = None) -> "object":
        """Interactive Queries facade half [R KafkaStreams#store]:
        write this KTable as the bucketed serving layout and return the
        ReadOnlyKeyValueStore over it. KTable is compacted by
        construction (to_table / builder.table emit one row per key),
        so the writer needs no fold. With no ``root`` a fresh temp dir
        is used each call and is the CALLER's to remove — pass a stable
        root (as the upsert sink does) for a managed location."""
        from .sources.state_store import (
            ReadOnlyKeyValueStore,
            write_bucketed_state,
        )

        root = root or tempfile.mkdtemp(prefix="ktable_store_")
        write_bucketed_state(self.df, root, self.key)
        return ReadOnlyKeyValueStore(self.df.sparkSession, root, self.key)



# ---------------------------------------------------------------------------
# Testing surface — the TopologyTestDriver trio.
# ---------------------------------------------------------------------------


class TestInputTopic:
    """[R o.a.k.streams.TestInputTopic]: accumulate piped records for
    one source topic. ``pipe_input`` takes whole rows (tuples/dicts
    matching the declared schema) — the KS key/value split is a column
    in the row here, which is how every other verb addresses keys."""

    def __init__(self, name: str, schema: str) -> None:
        self.name = name
        self.schema = schema
        self.rows: list = []

    def pipe_input(self, *rows) -> "TestInputTopic":
        self.rows.extend(rows)
        return self


class TestOutputTopic:
    """[R o.a.k.streams.TestOutputTopic]: read a topology result.
    ``read_rows`` returns plain Row objects in a deterministic order
    (sorted by the given columns, else by all columns) — KS's
    read-in-emission-order has no analog in a batch replay, where the
    whole input is one 'batch' and only the final table is defined."""

    def __init__(self, df: DataFrame, order_by: list | None = None) -> None:
        self.df = df

        self._order = order_by

    def read_rows(self) -> list:
        df = self.df
        cols = self._order if self._order else df.columns
        return df.orderBy(*cols).collect()

    def read_key_values(self, key: str, value: str) -> dict:
        return {r[key]: r[value] for r in self.df.collect()}

    def to_df(self) -> DataFrame:
        return self.df


class TopologyTestDriver:
    """[R o.a.k.streams.TopologyTestDriver]: run a DSL topology against
    in-memory piped inputs instead of fixture/broker topics — the class
    a ported KS unit-test suite instantiates.

    Batch-replay contract (the one semantic shift from KS, documented
    here once): pipe ALL inputs first, then ``run``; outputs are the
    topology's FINAL results over that input set, not an incremental
    emission log. A KS test asserting final KTable contents ports
    as-is; one asserting intermediate emission ORDER is asserting the
    cache/commit schedule, which Suppressed/batch semantics make
    final-only anyway.

        driver = TopologyTestDriver(spark)
        events = driver.create_input_topic(
            "events", "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE"
        )
        events.pipe_input((1, 10, t1, 5.0), (1, 11, t2, 7.0))
        out = driver.run(lambda b: b.stream("events")
                                     .select_key("user_id")
                                     .group_by_key()
                                     .aggregate(F.sum("value").alias("total")))
        assert out.read_key_values("user_id", "total") == {1: 12.0}
    """

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._topics: dict[str, TestInputTopic] = {}

    def create_input_topic(self, name: str, schema: str) -> TestInputTopic:
        t = TestInputTopic(name, schema)
        self._topics[name] = t
        return t

    def _builder(self) -> "StreamsBuilder":
        driver = self

        class _TestBuilder(StreamsBuilder):
            def stream(self, name: str) -> KStream:
                t = driver._topics[name]
                return KStream(
                    driver.spark.createDataFrame(t.rows, t.schema),
                    lineage=(f"Source: {name} (test topic)",),
                )

            def table(self, name: str, key: str, ts: str) -> KTable:
                t = driver._topics[name]
                return KStream(
                    driver.spark.createDataFrame(t.rows, t.schema),
                    key,
                    lineage=(f"Source: {name} (test topic, table)",),
                ).to_table(ts)

            def global_table(self, name: str, key: str) -> KTable:
                t = driver._topics[name]
                return KTable(
                    F.broadcast(driver.spark.createDataFrame(t.rows, t.schema)),
                    key,
                    lineage=(f"Source: {name} (test topic, globalTable)",),
                )

        return _TestBuilder(self.spark)

    def run(self, topology, order_by: list | None = None) -> TestOutputTopic:
        """Build the topology against the piped topics and hand back its
        output. ``topology`` is a callable (builder) -> KStream | KTable
        | DataFrame."""
        out = topology(self._builder())
        df = out.to_df() if hasattr(out, "to_df") else out
        return TestOutputTopic(df, order_by)
