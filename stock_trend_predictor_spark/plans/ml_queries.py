"""ML queries: per-key model fit (applyInPandas, oracle-exact closed
form) and model scoring (broadcast join + native expressions).

The MLlib RandomForest pipeline (ml/pipeline.py) is covered by
tests/test_ml.py — RF predictions are not SQL-expressible, so it is
not an oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import stable_round_sql
from stock_trend_predictor_spark.ml.pergroup import (
    score_with_models,
    train_linreg_closed_form,
    train_linreg_per_key,
)
from stock_trend_predictor_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    materialize_once,
    ticks,
)

_MODEL_AGG_CTE = f"""
{TICKS_ORACLE_CTE},
clean AS (
    SELECT symbol, ts, open, close FROM ticks
    WHERE open IS NOT NULL AND close IS NOT NULL
), agg AS (
    SELECT symbol,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(open AS DECIMAL(27,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(open * close AS DECIMAL(27,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(open * open AS DECIMAL(27,6))) AS DOUBLE) AS sxx
    FROM clean GROUP BY symbol
), models AS (
    SELECT symbol,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM agg
)
"""


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "pergroup_linreg_models",
        oracle=f"""
WITH {_MODEL_AGG_CTE}
SELECT symbol, n_rows,
       {stable_round_sql('slope', 6)} AS slope,
       {stable_round_sql('intercept', 6)} AS intercept
FROM models
""",
        doc="M3 per-key model fit, parallelized: groupBy(symbol)."
        "applyInPandas replaces the reference's sequential driver loop "
        "(predict_from_vm4.py:29-39). Closed-form OLS with decimal-"
        "quantized sums makes the fitted coefficients themselves "
        "oracle-checkable — the Arrow round trip and group partitioning "
        "are verified end-to-end, not just row counts.",
    )
    def pergroup_linreg_models(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.functions.exact import stable_round

        t = ticks(spark, sf_dir).where(
            F.col("open").isNotNull() & F.col("close").isNotNull()
        )
        m = train_linreg_per_key(t)
        return m.select(
            "symbol",
            "n_rows",
            stable_round(F.col("slope"), 6).alias("slope"),
            stable_round(F.col("intercept"), 6).alias("intercept"),
        )

    _RIDGE_LAM = 10.0
    _RIDGE_CTE = f"""
{TICKS_ORACLE_CTE},
clean AS (
    SELECT symbol, ts, open, close FROM ticks
    WHERE open IS NOT NULL AND close IS NOT NULL
), agg AS (
    SELECT symbol,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(open AS DECIMAL(27,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(open * close AS DECIMAL(27,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(open * open AS DECIMAL(27,6))) AS DOUBLE) AS sxx
    FROM clean GROUP BY symbol
), ridge AS (
    SELECT symbol,
           CAST(n AS BIGINT) AS n_rows,
           (sxy - sx * sy / n) / (sxx - sx * sx / n + {_RIDGE_LAM}) AS slope
    FROM agg
)
"""

    @register(
        "pergroup_ridge_models",
        oracle=f"""
WITH {_RIDGE_CTE}
SELECT r.symbol, r.n_rows,
       {stable_round_sql('r.slope', 6)} AS slope,
       {stable_round_sql(
           '(a.sy - r.slope * a.sx) / a.n', 6)} AS intercept
FROM ridge r JOIN agg a ON r.symbol = a.symbol
""",
        doc="Per-key RIDGE fit (lambda=10 L2 penalty on the slope) "
        "through the same two-stage harness as the OLS sibling: "
        "decimal sufficient statistics JVM-side (one pass, 5 numbers "
        "per key shuffle), closed-form shrinkage solve in the Arrow "
        "kernel. Centered-moment expression order is written "
        "identically in the Python kernel and the oracle SQL, so the "
        "shrunk coefficients are value-hash exact — regularization "
        "without losing oracle checkability.",
    )
    def pergroup_ridge_models(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.functions.exact import stable_round
        from stock_trend_predictor_spark.ml.pergroup import (
            train_ridge_per_key,
        )

        t = ticks(spark, sf_dir).where(
            F.col("open").isNotNull() & F.col("close").isNotNull()
        )
        m = train_ridge_per_key(t, lam=_RIDGE_LAM)
        return m.select(
            "symbol",
            "n_rows",
            stable_round(F.col("slope"), 6).alias("slope"),
            stable_round(F.col("intercept"), 6).alias("intercept"),
        )

    @register(
        "pergroup_model_scoring",
        oracle=f"""
WITH {_MODEL_AGG_CTE}
SELECT t.symbol, t.ts, t.open, t.close,
       {stable_round_sql('m.intercept + m.slope * t.open', 6)} AS predicted_close,
       CAST(m.intercept + m.slope * t.open > t.open AS INT) AS prediction,
       {stable_round_sql('(t.close - t.open) / nullif(t.open, 0) * 100', 2)} AS change_pct
FROM clean t JOIN models m ON t.symbol = m.symbol
""",
        doc="M5/ST7 scoring, set-oriented: ticks broadcast-joined to "
        "the models table, prediction + change% as native expressions "
        "(replaces one-doc-at-a-time predict, predict_from_vm4.py:57-65).",
    )
    def pergroup_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Share the derived ticks view between the training aggregation
        # and the scoring join without a session-lifetime cache entry
        # (see materialize_once): re-deriving it would repeat the
        # per-symbol lag() window shuffle.
        t = materialize_once(
            ticks(spark, sf_dir)
            .where(F.col("open").isNotNull() & F.col("close").isNotNull())
            .select("symbol", "ts", "open", "close")
        )
        # Closed-form trainer on the scoring hot path (bit-identical
        # coefficients, no Python stage — see train_linreg_closed_form)
        models = train_linreg_closed_form(t)
        return score_with_models(t, models)

    @register(
        "walkforward_backtest_folds",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
seg AS (
    SELECT symbol, ts, tick_id,
           ntile(6) OVER (PARTITION BY symbol ORDER BY ts, tick_id) AS seg
    FROM ticks
), segagg AS (
    SELECT symbol, seg, count(*) AS n,
           min(ts) AS min_ts, max(ts) AS max_ts
    FROM seg GROUP BY 1, 2
), folds AS (
    SELECT symbol, unnest(generate_series(1, 5)) AS fold
    FROM (SELECT DISTINCT symbol FROM segagg)
)
SELECT f.symbol, CAST(f.fold AS BIGINT) AS fold,
       CAST(sum(s.n) FILTER (WHERE s.seg <= f.fold) AS BIGINT) AS train_rows,
       CAST(sum(s.n) FILTER (WHERE s.seg = f.fold + 1) AS BIGINT) AS test_rows,
       max(s.max_ts) FILTER (WHERE s.seg <= f.fold) AS train_end_ts,
       min(s.min_ts) FILTER (WHERE s.seg = f.fold + 1) AS test_start_ts,
       max(s.max_ts) FILTER (WHERE s.seg = f.fold + 1) AS test_end_ts
FROM folds f JOIN segagg s ON s.symbol = f.symbol
GROUP BY 1, 2
""",
        doc="Walk-forward backtest splitter — the temporally-honest "
        "cross-validation the reference's random 80/20 holdout "
        "(predict_from_vm4.py) is NOT: ntile(6) segments each "
        "symbol's uniquely-ordered history, fold k trains on segments "
        "1..k and tests on segment k+1 (expanding window, test always "
        "strictly after train). The per-row work is one ntile over "
        "the existing per-symbol sort; folds are then derived from "
        "the segment-level aggregate (#symbols x 6 rows), so the "
        "5-fold expansion never touches row data — at 100 TB the "
        "fold manifest is free once the segment agg is computed.",
    )
    def walkforward_backtest_folds(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark.sql.window import Window

        t = ticks(spark, sf_dir).select("symbol", "ts", "tick_id")
        seg = t.withColumn(
            "seg",
            F.ntile(6).over(
                Window.partitionBy("symbol").orderBy("ts", "tick_id")
            ),
        )
        segagg = seg.groupBy("symbol", "seg").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        folds = (
            segagg.select("symbol")
            .distinct()
            .select(
                "symbol",
                F.explode(F.sequence(F.lit(1), F.lit(5))).alias("fold"),
            )
        )
        train = F.col("seg") <= F.col("fold")
        test = F.col("seg") == F.col("fold") + 1
        return (
            folds.join(segagg, "symbol")
            .groupBy("symbol", F.col("fold").cast("bigint").alias("fold"))
            .agg(
                F.sum(F.when(train, F.col("n"))).cast("bigint").alias("train_rows"),
                F.sum(F.when(test, F.col("n"))).cast("bigint").alias("test_rows"),
                F.max(F.when(train, F.col("max_ts"))).alias("train_end_ts"),
                F.min(F.when(test, F.col("min_ts"))).alias("test_start_ts"),
                F.max(F.when(test, F.col("max_ts"))).alias("test_end_ts"),
            )
        )

    _pred_6 = stable_round_sql("m.intercept + m.slope * t.open", 6)

    @register(
        "model_calibration_bins",
        oracle=f"""
WITH {_MODEL_AGG_CTE},
scored AS (
    SELECT t.symbol, {_pred_6} AS pred, t.close
    FROM clean t JOIN models m ON t.symbol = m.symbol
), binned AS (
    SELECT symbol, pred, close,
           ntile(10) OVER (PARTITION BY symbol ORDER BY pred, close)
             AS bin
    FROM scored
)
SELECT symbol, CAST(bin AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       {stable_round_sql(
           "CAST(SUM(CAST(pred AS DECIMAL(27,6))) AS DOUBLE) / count(*)",
           6)} AS mean_pred,
       {stable_round_sql(
           "CAST(SUM(CAST(close AS DECIMAL(27,6))) AS DOUBLE) / count(*)",
           6)} AS mean_actual,
       {stable_round_sql(
           "CAST(SUM(CAST(pred AS DECIMAL(27,6))) AS DOUBLE) / count(*)"
           " - CAST(SUM(CAST(close AS DECIMAL(27,6))) AS DOUBLE)"
           " / count(*)", 6)} AS calibration_gap
FROM binned
GROUP BY symbol, bin
""",
        doc="Model calibration / reliability table: scored ticks "
        "binned into per-symbol prediction deciles (ntile over the "
        "6-dp-rounded prediction — rounding BEFORE the sort makes "
        "the decile boundaries cross-engine deterministic; (pred, "
        "close) ties are interchangeable rows, so bin aggregates are "
        "order-proof), mean predicted vs mean realized close per "
        "bin, and the signed calibration gap. This is the eval "
        "artifact the reference's accuracy number (predict_from_"
        "vm4.py:67) cannot show: WHERE in the prediction range the "
        "model is biased. Decimal-exact bin means; the scoring join "
        "broadcasts the models table exactly as pergroup_model_"
        "scoring does.",
    )
    def model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        from stock_trend_predictor_spark.functions.exact import (
            DECIMAL_T,
            stable_round,
        )

        t = materialize_once(
            ticks(spark, sf_dir)
            .where(F.col("open").isNotNull() & F.col("close").isNotNull())
            .select("symbol", "ts", "open", "close")
        )
        scored = score_with_models(t, train_linreg_closed_form(t)).select(
            "symbol", F.col("predicted_close").alias("pred"), "close"
        )
        w = Window.partitionBy("symbol").orderBy("pred", "close")
        binned = scored.withColumn("bin", F.ntile(10).over(w))
        mean6 = lambda c: stable_round(  # noqa: E731
            F.sum(F.col(c).cast(DECIMAL_T)).cast("double") / F.count(F.lit(1)),
            6,
        )
        return binned.groupBy("symbol", F.col("bin").cast("int").alias("bin")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            mean6("pred").alias("mean_pred"),
            mean6("close").alias("mean_actual"),
            stable_round(
                F.sum(F.col("pred").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1))
                - F.sum(F.col("close").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("calibration_gap"),
        )

    @register(
        "pergroup_pickled_model_scoring",
        # No oracle (rows-only by design): the point of this entry is
        # the OPAQUE-estimator transport — pickled model blobs in a
        # binary column, broadcast + batch-unpickled scoring — which by
        # construction has no SQL-expressible equivalent (the
        # closed-form sibling pergroup_model_scoring carries the
        # oracle-exact form of the same harness). Laws are pytest-
        # gated instead: tests/test_ml.py::test_pickled_blob_models_*
        # checks >=100 keys, per-key prediction equality with a local
        # numpy fit, and that only (key, n_rows, blob) leaves the fit
        # task.
        doc="Per-key ARBITRARY-estimator fit+score via pickled blobs "
        "(ml/blobs.py): one estimator per customer over its order "
        "history (o_totalprice ~ days(o_orderdate)), fitted in "
        "groupBy(c).applyInPandas, pickled into a models DataFrame "
        "(binary column), scored through broadcast + Arrow-batched "
        "pandas UDF that unpickles once per distinct blob per batch. "
        "sklearn's LinearRegression when installed; a numpy lstsq "
        "estimator with the same surface otherwise. 1500 keys at "
        "sf0.01 — the scale shape of thousands of per-entity models "
        "with no driver-side loop or dict.",
    )
    def pergroup_pickled_model_scoring(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.ml.blobs import (
            score_with_pickled_models,
            train_pickled_models,
        )
        from stock_trend_predictor_spark.sources.tables import load_table

        orders = load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("double")
            .alias("order_day"),
            "o_totalprice",
        )
        models = train_pickled_models(
            orders, key="o_custkey", x_cols=["order_day"], y_col="o_totalprice"
        )
        return score_with_pickled_models(
            orders, models, key="o_custkey", x_cols=["order_day"]
        ).select(
            "o_custkey",
            "o_orderkey",
            "n_rows",
            F.round(F.col("predicted"), 6).alias("predicted"),
            F.round(F.col("o_totalprice") - F.col("predicted"), 6).alias(
                "residual"
            ),
        )

    @register(
        "logistic_movement_irls",
        oracle=None,  # iterative GLM — not SQL-expressible; exact
        # algorithm replication law in tests/test_ml.py
        doc="Distributed logistic regression via IRLS on the movement "
        "label (up if this tick's delta > 0) from the previous three "
        "tick deltas — the classifier form of the reference's movement "
        "prediction (ml_model/predict_from_vm4.py:29-39), fitted WITHOUT the "
        "driver-resident frame: each of 4 Newton steps is one "
        "map-side-combinable shuffle of the d x d weighted moments "
        "(decimal(27,18) sums — order-independent), a 4 x 4 driver "
        "solve, and a broadcast of the new coefficients "
        "(ml/irls.py::fit_logistic_irls). Output: one row per "
        "coefficient with the shared fit metrics; rows-only (the "
        "Python law test replays the identical algorithm).",
    )
    def logistic_movement_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        from stock_trend_predictor_spark.ml.irls import fit_logistic_irls

        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        w = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        t = t.withColumn("delta", F.col("close") - F.col("open")).withColumns(
            {f"d{k}": F.lag("delta", k).over(w) for k in (1, 2, 3)}
        )
        feats = t.where(
            F.col("d1").isNotNull()
            & F.col("d2").isNotNull()
            & F.col("d3").isNotNull()
        ).select(
            "d1", "d2", "d3", (F.col("delta") > 0).cast("int").alias("up")
        )
        # 4 IRLS passes + the metrics pass re-read this frame — share
        # the lag computation once instead of replaying the sort 5x.
        feats = materialize_once(feats)
        beta, metrics = fit_logistic_irls(
            feats, ["d1", "d2", "d3"], "up", iters=4
        )
        names = ["intercept", "d1", "d2", "d3"]
        rows = [
            (
                name,
                float(b),
                int(metrics["n_rows"]),
                float(metrics["accuracy"]),
                float(metrics["logloss"]),
            )
            for name, b in zip(names, beta)
        ]
        return spark.createDataFrame(
            rows,
            "feature string, beta double, n_rows long, "
            "accuracy double, logloss double",
        )

    @register(
        "isotonic_calibration_pava",
        oracle=None,  # PAVA's stack recursion is not SQL-expressible;
        # sklearn-free Python replay law in tests/test_ml.py
        doc="Per-symbol isotonic calibration of the closed-form "
        "model's predictions via pool-adjacent-violators "
        "(ml/isotonic.py): the best MONOTONE least-squares step map "
        "from predicted to actual close — the calibration layer "
        "model_calibration_bins's fixed deciles approximate. Exact-"
        "tie predictions pool in a decimal-exact pre-aggregate (one "
        "combinable shuffle), so the per-key Arrow batch sees one row "
        "per DISTINCT prediction and PAVA runs O(n) on that; output "
        "is the step function itself (x ranges, fitted level, "
        "support), a model-sized table per key.",
    )
    def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.ml.isotonic import isotonic_fit_per_key

        t = (
            ticks(spark, sf_dir)
            .where(F.col("open").isNotNull() & F.col("close").isNotNull())
            .select("symbol", "ts", "open", "close")
        )
        models = train_linreg_closed_form(t)
        scored = score_with_models(t, models)
        res = isotonic_fit_per_key(
            scored, key="symbol", x="predicted_close", y="close"
        )
        return res.select(
            "symbol",
            "step_idx",
            "x_lo",
            "x_hi",
            F.round(F.col("fitted"), 6).alias("fitted"),
            "n_rows",
        )


_register()
