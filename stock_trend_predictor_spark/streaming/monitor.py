"""Streaming observability (ST8/ST9 operational surface): a
StreamingQueryListener that captures per-batch progress — input rows,
processing rate, batch duration, state-store size — the numbers an
operator watches to catch backpressure, state growth, and watermark
stalls before they page.

The reference's only observability is print() inside its poll loops
(data_collection/fetch_stock.py:58, streaming job console sink); here
the engine emits structured progress the same way a 1000-executor
cluster would feed it to a metrics pipeline.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    """One microbatch's operational numbers (subset of Spark's
    StreamingQueryProgress that operators actually alert on)."""

    query_name: str
    batch_id: int
    num_input_rows: int
    processed_rows_per_second: float
    duration_ms: dict[str, int]
    state_rows_total: int
    watermark: str | None


@dataclass
class ProgressRecorder(StreamingQueryListener):
    """Collects BatchProgress per microbatch. Attach with
    ``spark.streams.addListener(rec)``; detach with
    ``spark.streams.removeListener(rec)``.

    The listener runs on the driver and only appends small dicts —
    no data-path cost. At cluster scale the same hook forwards to a
    metrics sink instead of a list.
    """

    events: list[BatchProgress] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event: Any) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event: Any) -> None:
        p = json.loads(event.progress.json)
        states = p.get("stateOperators") or []
        self.events.append(
            BatchProgress(
                query_name=p.get("name") or "",
                batch_id=p["batchId"],
                num_input_rows=p.get("numInputRows", 0),
                processed_rows_per_second=p.get(
                    "processedRowsPerSecond", 0.0
                ),
                duration_ms={
                    k: int(v) for k, v in (p.get("durationMs") or {}).items()
                },
                state_rows_total=sum(
                    s.get("numRowsTotal", 0) for s in states
                ),
                watermark=(p.get("eventTime") or {}).get("watermark"),
            )
        )

    def onQueryIdle(self, event: Any) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event: Any) -> None:
        self.terminated.append(str(event.id))

    def total_input_rows(self, query_name: str | None = None) -> int:
        return sum(
            e.num_input_rows
            for e in self.events
            if query_name is None or e.query_name == query_name
        )


def attach_recorder(spark: SparkSession) -> ProgressRecorder:
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    return rec
