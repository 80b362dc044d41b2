"""Custom Python DataSource (sources/tick_api.py): batch parallelism,
determinism, and the streaming poll/replay contract."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stock_trend_predictor_spark.sources.tick_api import (
    _quote,
    register_tick_api,
)


def _read(spark, **opts):
    register_tick_api(spark)
    r = spark.read.format("tick_api")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_schema_and_counts(spark):
    df = _read(spark, symbols="AAPL,MSFT", rows_per_symbol=50)
    assert df.schema.simpleString() == (
        "struct<symbol:string,seq:bigint,ts:timestamp,"
        "price:double,volume:bigint>"
    )
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 2  # one partition per symbol


def test_batch_read_deterministic_and_matches_kernel(spark):
    df = _read(spark, symbols="AAPL", rows_per_symbol=5)
    rows = sorted(df.collect(), key=lambda r: r.seq)
    expect = [_quote("AAPL", i, 1_704_067_200, 60) for i in range(5)]
    got = [(r.symbol, r.seq, r.ts, r.price, r.volume) for r in rows]
    assert got == expect
    assert sorted(df.collect(), key=lambda r: r.seq) == rows  # re-read equal


def test_batch_read_composes_with_engine_ops(spark):
    """The connector output is a normal DataFrame — aggregates and
    filters compose (and the per-symbol partitioning means the groupBy
    gets pre-clustered input)."""
    df = _read(spark, symbols="AAPL,MSFT,GOOGL", rows_per_symbol=40)
    agg = {
        r.symbol: r.n
        for r in df.where(F.col("price") >= 100.0)
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert agg == {"AAPL": 40, "MSFT": 40, "GOOGL": 40}


def test_stream_poll_offsets_and_determinism(spark, tmp_path):
    register_tick_api(spark)
    q = (
        spark.readStream.format("tick_api")
        .option("symbols", "AAPL,MSFT")
        .option("rows_per_batch", 7)
        .load()
        .writeStream.format("memory")
        .queryName("tick_api_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(
                p["numInputRows"] > 0 for p in q.recentProgress
            ) and spark.table("tick_api_mem").count() >= 28:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {
        (r.symbol, r.seq): (r.price, r.volume)
        for r in spark.table("tick_api_mem").collect()
    }
    assert len(got) >= 28  # ≥2 polls × 2 symbols × 7 seqs, no dups
    # every delivered row matches the deterministic kernel (replay-safe)
    for (sym, seq), (price, volume) in got.items():
        exp = _quote(sym, seq, 1_704_067_200, 60)
        assert (exp[3], exp[4]) == (price, volume)
    # offsets advanced contiguously from 0 per symbol
    seqs = sorted(s for (sym, s) in got if sym == "AAPL")
    assert seqs == list(range(len(seqs)))


def test_tick_api_writer_roundtrip_with_manifest(spark, tmp_path):
    """Writer half of the connector: read from the API source, publish
    through format('tick_api'); the manifest lists exactly the
    committed files and the JSONL contents round-trip."""
    import json
    import os

    from stock_trend_predictor_spark.sources.tick_api import (
        register_tick_api,
    )

    register_tick_api(spark)
    src = (
        spark.read.format("tick_api")
        .option("symbols", "AAPL,MSFT")
        .option("rows_per_symbol", "7")
        .load()
    )
    out = str(tmp_path / "published")
    src.write.format("tick_api").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    on_disk = sorted(
        f for f in os.listdir(out) if f.endswith(".jsonl")
    )
    assert manifest["files"] == on_disk
    assert manifest["rows"] == 14

    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == 14
    got = {
        (r["symbol"], r["seq"], round(r["price"], 3))
        for r in back.collect()
    }
    want = {
        (r["symbol"], r["seq"], round(r["price"], 3))
        for r in src.collect()
    }
    assert got == want


def test_tick_api_stream_writer_per_epoch_manifests(spark, tmp_path):
    """Streaming publish: per-epoch manifests name exactly the files
    of their micro-batch; union of manifests == rows on disk."""
    import glob
    import json
    import os

    register_tick_api(spark)
    out = str(tmp_path / "feed_out")
    q = (
        spark.readStream.format("tick_api")
        .option("symbols", "AAPL")
        .option("rows_per_batch", 5)
        .load()
        .writeStream.format("tick_api")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if len(glob.glob(os.path.join(out, "_MANIFEST-*.json"))) >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    manifests = sorted(glob.glob(os.path.join(out, "_MANIFEST-*.json")))
    assert len(manifests) >= 2
    listed, total = set(), 0
    for mp in manifests:
        m = json.load(open(mp))
        assert not listed & set(m["files"])  # epochs don't share files
        listed |= set(m["files"])
        total += m["rows"]
    # every manifest-listed file exists; data rows match the kernel
    rows = []
    for fname in listed:
        with open(os.path.join(out, fname)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == total
    for r in rows:
        exp = _quote(r["symbol"], r["seq"], 1_704_067_200, 60)
        assert (exp[3], exp[4]) == (r["price"], r["volume"])
    # offsets contiguous from 0 => each epoch published disjoint seqs
    seqs = sorted(r["seq"] for r in rows)
    assert seqs == list(range(len(seqs)))


def test_yfinance_provider_is_import_gated(spark):
    """provider=yfinance wires the reference's live poll
    (fetch_stock.py:21-29). Without the package (this container) the
    task must fail with the install pointer, not fall back to
    synthetic rows silently. Skips if yfinance is installed."""
    import pytest as _pytest

    try:
        import yfinance  # noqa: F401

        _pytest.skip("yfinance present; live path available")
    except ImportError:
        pass

    from stock_trend_predictor_spark.sources.tick_api import (
        register_tick_api,
    )

    register_tick_api(spark)
    df = (
        spark.read.format("tick_api")
        .option("symbols", "AAPL")
        .option("rows_per_symbol", 5)
        .option("provider", "yfinance")
        .load()
    )
    with _pytest.raises(Exception, match="yfinance"):
        df.collect()
