"""P7 observability — KStream#peek / #foreach analogs (SURVEY.md §2.2).

[R o.a.k.streams.kstream.KStream#peek]: a side-effect tap that sees every
record without changing the stream. The Spark-first form is
``df.observe``: metric expressions are evaluated DURING execution inside
the existing plan (CollectMetricsExec — zero extra scans, rows pass
through untouched), so the tap is free at any scale. Batch plans read
the metrics from an ``Observation`` after an action; streaming plans
surface them per micro-batch through a ``StreamingQueryListener``
(this module's :class:`MetricsTap`).

[R KStream#foreach] is the terminal side-effect form; its Spark analog
is ``writeStream.foreachBatch`` (used by `streaming.sinks`) — per-batch
DataFrame callbacks, not per-row Python, which would put the interpreter
on the row path.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observe_stream(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach named observed metrics to a streaming DataFrame.

    Streaming plans can't use the ``Observation`` helper (it is
    batch-only); the string-named form routes metric rows to every
    registered listener's ``onQueryProgress``.
    """
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(name, *metrics)


class MetricsTap(StreamingQueryListener):
    """Collects observed metrics per micro-batch, keyed by observation
    name. Thread-safe: listener callbacks fire on the streaming-query
    progress thread, readers poll from the driver thread."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: list[dict[str, dict]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        om = event.progress.observedMetrics
        if om:
            with self._lock:
                self.batches.append({k: v.asDict() for k, v in om.items()})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total(self, observation_name: str, metric: str) -> float:
        """Sum a numeric metric across all batches seen so far."""
        with self._lock:
            return sum(
                b[observation_name][metric]
                for b in self.batches
                if observation_name in b and b[observation_name][metric] is not None
            )
