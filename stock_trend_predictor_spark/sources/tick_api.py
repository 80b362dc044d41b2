"""Custom Python DataSource: the reference's polling market-data API
as a first-class Spark connector.

The reference's data_collection/fetch_stock.py polls yfinance in a
driver-side loop and appends rows to a dict. Spark 4's Python
DataSource API lets that ingestion live INSIDE the engine instead:
`spark.read.format("tick_api")` plans one InputPartition per symbol
(each executor "calls the API" for its symbols in parallel, no driver
loop), and `spark.readStream.format("tick_api")` is the polling form
with replayable offsets — a crash replays [start, end) deterministically,
which is exactly the ST2 offsets/replay contract.

No network in this container, so the DEFAULT "API" is a deterministic
synthetic quote generator (md5-seeded, same idiom as the multimodal
decode stubs). The LIVE provider is wired too (round 6, r5 "what's
missing" #2): `.option("provider", "yfinance")` makes each symbol
partition issue the reference's exact poll —
``yfinance.download(tickers=sym, period=..., interval="1m")``
(data_collection/fetch_stock.py:21-29) — executor-side, import-gated
on the yfinance package (absent here; the option raises a clear
install pointer, asserted in tests/test_datasource.py). Options:
`symbols` (csv), `rows_per_symbol`, `start_epoch_s`, `interval_s`,
`rows_per_batch` (streaming), `provider` (synthetic|yfinance),
`period`/`interval` (yfinance poll window).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_EPOCH = datetime(1970, 1, 1)

SCHEMA_DDL = (
    "symbol string, seq bigint, ts timestamp, price double, volume bigint"
)


def _quote(symbol: str, seq: int, start_s: int, interval_s: int):
    """Deterministic fake of one API quote (executor-side, no state)."""
    h = int.from_bytes(
        hashlib.md5(f"{symbol}:{seq}".encode()).digest()[:8], "big"
    )
    price = 100.0 + (h % 100_000) / 1000.0  # 100.000 .. 199.999
    volume = 1 + (h >> 20) % 10_000
    ts = _EPOCH + timedelta(seconds=start_s + seq * interval_s)
    return (symbol, seq, ts, price, volume)


def _yf_quotes(
    symbol: str, limit: int, period: str, interval: str
) -> Iterator[tuple]:
    """One live yfinance poll for one symbol partition — the
    reference's fetch contract (fetch_stock.py:20-28:
    ``yf.Ticker(symbol).history(period='1d', interval='1m')``, close
    price + volume per bar), re-shaped to the tick_api schema.
    Executor-side import so the dependency is only needed where the
    partition actually runs."""
    try:
        import yfinance as yf
    except ImportError as e:  # pragma: no cover - env-gated live path
        raise ImportError(
            "tick_api provider=yfinance requires the yfinance package "
            "(the reference's poll client, "
            "data_collection/fetch_stock.py:21-29); install it on a "
            "networked cluster or use the default synthetic provider"
        ) from e
    # per-symbol Ticker().history() — the reference's exact call shape
    # (fetch_stock.py uses Ticker.history, not download); it also
    # returns FLAT columns where recent yfinance versions hand
    # download() a MultiIndex even for one ticker, which would make
    # row["Close"] a Series and float() of it deprecated.
    bars = yf.Ticker(symbol).history(period=period, interval=interval)
    for seq, (idx, row) in enumerate(bars.tail(limit).iterrows()):
        yield (
            symbol,
            seq,
            idx.to_pydatetime(),
            float(row["Close"]),
            int(row["Volume"]),
        )


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class TickApiBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = options.get("symbols", "AAPL,GOOGL,MSFT").split(",")
        self.rows = int(options.get("rows_per_symbol", 100))
        self.start_s = int(options.get("start_epoch_s", 1_704_067_200))
        self.interval_s = int(options.get("interval_s", 60))
        self.provider = options.get("provider", "synthetic")
        self.period = options.get("period", "1d")
        self.interval = options.get("interval", "1m")

    def partitions(self) -> Sequence[InputPartition]:
        # one "API call" per symbol, scheduled across executors
        return [_SymbolPartition(s) for s in self.symbols]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        if self.provider == "yfinance":
            yield from _yf_quotes(
                partition.symbol, self.rows, self.period, self.interval
            )
            return
        for seq in range(self.rows):
            yield _quote(partition.symbol, seq, self.start_s, self.interval_s)


class TickApiStreamReader(SimpleDataSourceStreamReader):
    """Polling stream with replayable offsets: offset = next unread seq
    (global across symbols, so a batch is a deterministic rectangle
    symbols × [start, end))."""

    def __init__(self, options: dict):
        self.symbols = options.get("symbols", "AAPL,GOOGL,MSFT").split(",")
        self.start_s = int(options.get("start_epoch_s", 1_704_067_200))
        self.interval_s = int(options.get("interval_s", 60))
        self.batch_rows = int(options.get("rows_per_batch", 10))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        return [
            _quote(s, q, self.start_s, self.interval_s)
            for s in self.symbols
            for q in range(lo, hi)
        ]

    def read(self, start: dict):
        lo = start["seq"]
        hi = lo + self.batch_rows  # one poll's worth
        return self._rows(lo, hi), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay after failure: regenerate the identical rectangle
        return self._rows(start["seq"], end["seq"])


class TickApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tick_api"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return TickApiBatchReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "TickApiWriter":
        return TickApiWriter(self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "TickApiStreamWriter":
        return TickApiStreamWriter(self.options)

    def simpleStreamReader(self, schema: StructType) -> TickApiStreamReader:
        return TickApiStreamReader(self.options)


def register_tick_api(spark) -> None:
    spark.dataSource.register(TickApiDataSource)


@dataclass
class _QuoteFileCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    file: str
    rows: int


class TickApiWriter(DataSourceWriter):
    """Batch writer half of the connector: 'publish quotes to the
    feed'. Each task stages one JSONL file (the stand-in for an HTTP
    POST batch — swap the file write for the API call and nothing
    else changes); the driver's ``commit`` publishes a manifest
    listing exactly the files whose tasks succeeded. Readers that
    honor the manifest see task-level atomicity: a failed/speculated
    task's orphan file is never listed, and ``abort`` removes staged
    files outright. This is the same commit-protocol shape Spark's
    file sinks use, expressed through the Python DataSource API."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("tick_api writer requires option 'path'")
        self.path = path

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {
                            "symbol": row.symbol,
                            "seq": row.seq,
                            "ts": row.ts.strftime("%Y-%m-%d %H:%M:%S"),
                            "price": row.price,
                            "volume": row.volume,
                        }
                    )
                    + "\n"
                )
                n += 1
        return _QuoteFileCommit(file=fname, rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(
                os.path.basename(m.file) for m in messages if m is not None
            ),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class TickApiStreamWriter(DataSourceStreamWriter):
    """Streaming publish: same staged-file-per-task protocol as the
    batch writer, but committed PER EPOCH — the driver writes
    ``_MANIFEST-{batchId}.json`` naming exactly that micro-batch's
    succeeded files. Exactly-once at the feed boundary then falls out
    of the checkpoint: a replayed epoch re-stages files and
    re-publishes the same batchId manifest (readers key on manifests,
    orphan stages are invisible), which is the idempotent-sink
    contract Structured Streaming requires of any real publisher."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("tick_api stream writer requires option 'path'")
        self.path = path

    def write(self, iterator):
        return TickApiWriter({"path": self.path}).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = {
            "batch": batchId,
            "files": sorted(
                os.path.basename(m.file) for m in messages if m is not None
            ),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)
