"""Live-Mongo wiring tests (streaming/mongo_connector.py): the option
surface and the fullDocument projection are unit-assertable with no
server and no connector jar; the jar-gated load path must fail with
Spark's data-source-resolution error, not something misleading."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.streaming.ingest import parse_cdc_envelope
from stock_trend_predictor_spark.streaming.mongo_connector import (
    DEFAULT_DATABASE,
    DEFAULT_SOURCE_COLLECTION,
    fulldocument_to_ticks,
    mongo_batch_options,
    mongo_change_stream_options,
    mongo_ticks_change_stream,
    mongo_write_options,
)

URI = "mongodb://host:27017/?replicaSet=rs0"


def test_change_stream_options_snapshot():
    assert mongo_change_stream_options(URI) == {
        "spark.mongodb.connection.uri": URI,
        "spark.mongodb.database": DEFAULT_DATABASE,
        "spark.mongodb.collection": DEFAULT_SOURCE_COLLECTION,
        "spark.mongodb.change.stream.publish.full.document.only": "true",
    }
    assert (
        mongo_change_stream_options(URI, full_document_only=False)[
            "spark.mongodb.change.stream.publish.full.document.only"
        ]
        == "false"
    )


def test_batch_and_write_options_snapshot():
    assert mongo_batch_options(URI, collection="c")[
        "spark.mongodb.collection"
    ] == "c"
    plain = mongo_write_options(URI, "stock_history_data")
    assert "spark.mongodb.operationType" not in plain
    keyed = mongo_write_options(URI, "stock_history_data", id_field="ts")
    assert keyed["spark.mongodb.operationType"] == "update"
    assert keyed["spark.mongodb.idFieldList"] == "ts"


def test_fulldocument_projection_matches_envelope_parser(spark):
    """The live connector path (fullDocument rows) and the modeled
    envelope path (JSON change events) must project IDENTICAL tick
    rows — one contract, two transports. Exercises the P7 defaults
    (null symbol/source) and the P8 time->ts rename."""
    docs = [
        {
            "symbol": "AAPL",
            "open": 1.0,
            "high": 2.0,
            "low": 0.5,
            "close": 1.5,
            "volume": 100.0,
            "time": "2024-01-02 09:30:00",
            "source": "history",
        },
        {
            # P7: missing symbol and source take the defaults
            "open": 3.0,
            "high": 4.0,
            "low": 2.5,
            "close": 3.5,
            "volume": 50.0,
            "time": "2024-01-02 09:31:00",
        },
    ]
    envelopes = spark.createDataFrame(
        [
            (json.dumps({"operationType": "insert", "fullDocument": d}),)
            for d in docs
        ],
        "value string",
    )
    via_envelope = parse_cdc_envelope(
        envelopes.select(F.col("value").cast("binary").alias("value"))
    ).collect()

    from stock_trend_predictor_spark.streaming.ingest import CDC_SCHEMA

    doc_rows = spark.createDataFrame(
        [
            tuple(
                d.get(f.name)
                for f in CDC_SCHEMA["fullDocument"].dataType.fields
            )
            for d in docs
        ],
        CDC_SCHEMA["fullDocument"].dataType,
    )
    via_connector = fulldocument_to_ticks(doc_rows).collect()
    assert sorted(map(tuple, via_envelope)) == sorted(
        map(tuple, via_connector)
    )
    by_symbol = {r["symbol"]: r for r in via_connector}
    assert by_symbol["UNKNOWN"]["source"] == "unknown"


def test_change_stream_reader_fails_on_missing_connector(spark):
    """Without the mongo-spark jar the reader must fail at load() with
    Spark's data-source-resolution error (the honest env gate), not a
    silent fallback. Skips if someone runs this WITH the jar."""
    try:
        mongo_ticks_change_stream(spark, URI)
    except Exception as e:
        msg = str(e)
        assert "mongodb" in msg.lower()
        assert (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find" in msg
            or "ClassNotFound" in msg
        )
        return
    pytest.skip("mongo-spark connector present; live path available")
