"""Time-series batch 6: rolling-origin forecast backtesting with the
MASE metric (Hyndman & Koehler 2006) — the scale-free forecast
accuracy measure that makes seasonal-naive vs naive comparable across
series, and the standard way to answer "is this forecaster better
than doing nothing?" before any model ships.

Scale shape (100 TB): the fact table reduces to the complete daily
calendar grid in one map-side-combined aggregate (grid rows =
calendar days, data-size-independent); every forecast is a lag on
that grid, every error an exact integer count difference.  The only
doubles are the final MAE ratios, micro-floored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_SEASON = 7  # weekly seasonality on the daily grid


def ts_forecast_backtest_mase(spark: SparkSession, sf: str) -> DataFrame:
    """Backtest two baseline forecasters of DAILY ORDER COUNT — naive
    (yesterday's value) and seasonal-naive (same weekday last week) —
    over every day with a full one-week history, on the COMPLETE
    calendar grid (missing days count 0, so lag(7) means 7 calendar
    days, not 7 observed rows).

    MASE(snaive) = MAE(snaive) / MAE(naive): < 1e6 micro-units means
    weekly seasonality beats persistence.  Errors are exact integer
    count differences; the two MAEs and their ratio are one double
    expression, micro-floored."""
    o = t(spark, sf, "orders")
    per_day = (o.select(F.to_date("o_orderdate").alias("d"))
               .groupBy("d").agg(F.count(F.lit(1)).alias("c")))
    span = per_day.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = (span.select(F.explode(F.sequence("d0", "d1")).alias("d"))
           .join(per_day, "d", "left")
           .select("d", F.coalesce("c", F.lit(0)).alias("c")))
    w = Window.orderBy("d")
    lagged = cal.select(
        "d", "c",
        F.lag("c", 1).over(w).alias("f_naive"),
        F.lag("c", _SEASON).over(w).alias("f_snaive"))
    scored = lagged.filter(F.col("f_snaive").isNotNull())
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("c") - F.col("f_naive"))).alias("ae_naive"),
        F.sum(F.abs(F.col("c") - F.col("f_snaive"))).alias("ae_snaive"))
    mae_n = F.col("ae_naive").cast("double") / F.col("n_days").cast("double")
    mae_s = F.col("ae_snaive").cast("double") / F.col("n_days").cast("double")
    return agg.select(
        "n_days",
        F.col("ae_naive").cast("long").alias("abs_err_naive"),
        F.col("ae_snaive").cast("long").alias("abs_err_snaive"),
        F.floor(mae_n * 1000.0).cast("long").alias("mae_naive_milli"),
        F.floor(mae_s * 1000.0).cast("long").alias("mae_snaive_milli"),
        F.floor(F.col("ae_snaive").cast("double")
                / F.col("ae_naive").cast("double") * 1000000.0)
        .cast("long").alias("mase_snaive_micro"))


MASE_SQL = f"""
WITH per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS c
  FROM orders GROUP BY 1
),
span AS (SELECT min(d) AS d0, max(d) AS d1 FROM per_day),
cal AS (
  SELECT gs.g AS d, coalesce(per_day.c, 0) AS c
  FROM (SELECT unnest(generate_series(d0, d1,
                                      INTERVAL 1 DAY))::DATE AS g
        FROM span) gs
  LEFT JOIN per_day ON per_day.d = gs.g
),
lagged AS (
  SELECT d, c,
         lag(c, 1) OVER (ORDER BY d) AS f_naive,
         lag(c, {_SEASON}) OVER (ORDER BY d) AS f_snaive
  FROM cal
),
agg AS (
  SELECT count(*) AS n_days,
         CAST(sum(abs(c - f_naive)) AS BIGINT) AS ae_naive,
         CAST(sum(abs(c - f_snaive)) AS BIGINT) AS ae_snaive
  FROM lagged WHERE f_snaive IS NOT NULL
)
SELECT n_days, ae_naive AS abs_err_naive, ae_snaive AS abs_err_snaive,
       CAST(floor(CAST(ae_naive AS DOUBLE) / CAST(n_days AS DOUBLE)
                  * 1000.0) AS BIGINT) AS mae_naive_milli,
       CAST(floor(CAST(ae_snaive AS DOUBLE) / CAST(n_days AS DOUBLE)
                  * 1000.0) AS BIGINT) AS mae_snaive_milli,
       CAST(floor(CAST(ae_snaive AS DOUBLE) / CAST(ae_naive AS DOUBLE)
                  * 1000000.0) AS BIGINT) AS mase_snaive_micro
FROM agg
"""


QUERIES = {
    "ts_forecast_backtest_mase": (ts_forecast_backtest_mase, MASE_SQL),
}


_N_FOLDS = 5
_HORIZON = 14  # test-window days per fold


def sample_time_split_folds(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-origin cross-validation plan: 5 expanding-window folds
    over the order calendar, each testing the next 14 days — the split
    design every forecast backtest (ts_forecast_backtest_mase) should
    run under, and the time-series analog of sample_kfold_group_assign
    (random K-fold leaks the future into training).

    Cut points divide the span so fold i trains on days ≤ cut_i and
    tests on (cut_i, cut_i + 14]; all boundaries are exact integer
    day arithmetic off the span row, and the per-fold row/day counts
    come from one conditional aggregate over the daily grid."""
    o = t(spark, sf, "orders")
    per_day = (o.select(F.to_date("o_orderdate").alias("d"))
               .groupBy("d").agg(F.count(F.lit(1)).alias("c")))
    span = per_day.agg(F.min("d").alias("d0"), F.max("d").alias("d1"),
                       F.datediff(F.max("d"), F.min("d")).alias("len"))
    folds = span.select(
        "d0", "len",
        F.explode(F.sequence(F.lit(1), F.lit(_N_FOLDS))).alias("fold"))
    # cut_i = d0 + floor(len * i / (K+1)); test = (cut, cut+HORIZON]
    cut = F.col("fold") * F.col("len")
    folds = folds.select(
        "fold",
        F.date_add(F.col("d0"), F.floor(cut / (_N_FOLDS + 1))
                   .cast("int")).alias("train_end"))
    j = per_day.crossJoin(F.broadcast(folds))
    agg = (j.groupBy("fold", "train_end")
           .agg(F.sum(F.when(F.col("d") <= F.col("train_end"),
                             F.col("c")).otherwise(0))
                .alias("train_orders"),
                F.sum(F.when(F.col("d") <= F.col("train_end"), 1)
                      .otherwise(0)).alias("train_days"),
                F.sum(F.when((F.col("d") > F.col("train_end"))
                             & (F.col("d") <= F.date_add("train_end",
                                                         _HORIZON)),
                             F.col("c")).otherwise(0))
                .alias("test_orders"),
                F.sum(F.when((F.col("d") > F.col("train_end"))
                             & (F.col("d") <= F.date_add("train_end",
                                                         _HORIZON)), 1)
                      .otherwise(0)).alias("test_days")))
    return (agg.select("fold", "train_end", "train_days", "train_orders",
                       "test_days", "test_orders")
            .orderBy("fold"))


TIME_SPLIT_SQL = f"""
WITH per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS c
  FROM orders GROUP BY 1
),
span AS (
  SELECT min(d) AS d0, max(d) AS d1, date_diff('day', min(d), max(d))
           AS len
  FROM per_day
),
folds AS (
  SELECT f.range AS fold,
         d0 + CAST(floor(f.range * len / {_N_FOLDS + 1}) AS INTEGER)
           AS train_end
  FROM span CROSS JOIN range(1, {_N_FOLDS + 1}) f
)
SELECT CAST(fold AS BIGINT) AS fold, train_end,
       CAST(sum(CASE WHEN d <= train_end THEN 1 ELSE 0 END) AS BIGINT)
         AS train_days,
       CAST(sum(CASE WHEN d <= train_end THEN c ELSE 0 END) AS BIGINT)
         AS train_orders,
       CAST(sum(CASE WHEN d > train_end
                      AND d <= train_end + {_HORIZON}
                     THEN 1 ELSE 0 END) AS BIGINT) AS test_days,
       CAST(sum(CASE WHEN d > train_end
                      AND d <= train_end + {_HORIZON}
                     THEN c ELSE 0 END) AS BIGINT) AS test_orders
FROM per_day CROSS JOIN folds
GROUP BY fold, train_end
ORDER BY fold
"""


QUERIES["sample_time_split_folds"] = (sample_time_split_folds,
                                      TIME_SPLIT_SQL)


_RS_SCALES = [8, 16, 32, 64]


def ts_hurst_rs(spark: SparkSession, sf: str) -> DataFrame:
    """Hurst exponent of the daily order-count series by classical
    rescaled-range (R/S) analysis: for block sizes 8/16/32/64, the
    per-block range of cumulative mean-deviations over the population
    std, averaged per scale; H is the log-log slope across the four
    scales (H≈0.5 random walk, >0.5 persistent, <0.5 anti-persistent).

    Exactness: with the deviation ladder multiplied through by the
    block size s, Z'_j = s*prefix_j - j*total_b is an exact integer,
    and R/S collapses to R' / sqrt(s*sum(y^2) - (sum y)^2) — ONE double
    division per block over exact integers (constant blocks, D = 0,
    are dropped).  Per-block ratios are micro-floored before the
    per-scale mean so no float accumulation order leaks in; the slope
    is one closed-form expression over the 4 (ln s, ln mean) points.

    Scale: the raw scan reduces to the calendar grid (bounded-domain
    allowlist); the explode is x4 grid rows; prefix/total windows are
    partitioned by (scale, block) — never global over raw data."""
    o = t(spark, sf, "orders")
    daily = (o.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    idx = daily.select(
        "y", F.row_number().over(Window.orderBy("day")).alias("i"))
    scaled = idx.select(
        "y", "i",
        F.explode(F.array(*[F.lit(s) for s in _RS_SCALES])).alias("s"))
    scaled = scaled.withColumn(
        "b", F.expr("(i - 1) div s")).withColumn(
        "j", ((F.col("i") - 1) % F.col("s")) + 1)
    wb = Window.partitionBy("s", "b")
    wp = wb.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    rows = (scaled
            .withColumn("tot", F.sum("y").over(wb))
            .withColumn("prefix", F.sum("y").over(wp))
            .withColumn("z", F.col("s") * F.col("prefix")
                        - F.col("j") * F.col("tot")))
    blocks = (rows.groupBy("s", "b")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.max("tot").alias("sy"),
                   F.sum(F.col("y") * F.col("y")).alias("syy"),
                   F.max("z").alias("zmax"), F.min("z").alias("zmin")))
    d = "double"
    dd = (F.col("s") * F.col("syy") - F.col("sy") * F.col("sy"))
    ok = blocks.filter((F.col("cnt") == F.col("s")) & (dd > 0))
    rs_micro = F.floor((F.col("zmax") - F.col("zmin")).cast(d)
                       / F.sqrt(dd.cast(d)) * 1000000.0).cast("long")
    per_scale = (ok.select("s", rs_micro.alias("rsu"))
                 .groupBy("s")
                 .agg(F.count(F.lit(1)).alias("n_blocks"),
                      F.sum("rsu").alias("rs_sum")))
    mean_rs = F.col("rs_sum").cast(d) / F.col("n_blocks").cast(d) / 1000000.0
    pts = per_scale.select(
        "s", "n_blocks",
        F.floor(mean_rs * 1000000.0).cast("long").alias("mean_rs_micro"),
        F.log(F.col("s").cast(d)).alias("lx"),
        F.log(mean_rs).alias("ly"))
    fit = pts.agg(F.count(F.lit(1)).alias("np"),
                  F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
                  F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
                  F.sum(F.col("lx") * F.col("lx")).alias("sx2"))
    slope = ((F.col("np").cast(d) * F.col("sxy")
              - F.col("sx") * F.col("sy"))
             / (F.col("np").cast(d) * F.col("sx2")
                - F.col("sx") * F.col("sx")))
    h = fit.select(F.floor(slope * 1000.0).cast("long").alias("hurst_milli"))
    return (pts.select(F.col("s").alias("scale"), "n_blocks",
                       "mean_rs_micro")
            .crossJoin(F.broadcast(h))
            .orderBy("scale"))


HURST_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
  FROM orders GROUP BY 1
),
idx AS (
  SELECT y, row_number() OVER (ORDER BY day) AS i FROM daily
),
scaled AS (
  SELECT y, i, t.s, (i - 1) // t.s AS b, ((i - 1) % t.s) + 1 AS j
  FROM idx CROSS JOIN (SELECT unnest([{", ".join(map(str, _RS_SCALES))}])
                       AS s) t
),
rows_z AS (
  SELECT s, b, y,
         sum(y) OVER (PARTITION BY s, b) AS tot,
         s * sum(y) OVER (PARTITION BY s, b ORDER BY i) - j
           * sum(y) OVER (PARTITION BY s, b) AS z
  FROM scaled
),
blocks AS (
  SELECT s, b, count(*) AS cnt, max(tot) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy,
         max(z) AS zmax, min(z) AS zmin
  FROM rows_z GROUP BY 1, 2
),
ok AS (
  SELECT s,
         CAST(floor(CAST(zmax - zmin AS DOUBLE)
                    / sqrt(CAST(s * syy - sy * sy AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS rsu
  FROM blocks WHERE cnt = s AND s * syy - sy * sy > 0
),
per_scale AS (
  SELECT s, count(*) AS n_blocks, CAST(sum(rsu) AS BIGINT) AS rs_sum
  FROM ok GROUP BY s
),
pts AS (
  SELECT s, n_blocks,
         CAST(floor(CAST(rs_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                    / 1000000.0 * 1000000.0) AS BIGINT) AS mean_rs_micro,
         ln(CAST(s AS DOUBLE)) AS lx,
         ln(CAST(rs_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE)
            / 1000000.0) AS ly
  FROM per_scale
),
fit AS (
  SELECT CAST(floor(
    (CAST(count(*) AS DOUBLE) * sum(lx * ly) - sum(lx) * sum(ly))
    / (CAST(count(*) AS DOUBLE) * sum(lx * lx) - sum(lx) * sum(lx))
    * 1000.0) AS BIGINT) AS hurst_milli
  FROM pts
)
SELECT s AS scale, n_blocks, mean_rs_micro, hurst_milli
FROM pts CROSS JOIN fit
ORDER BY scale
"""


QUERIES["ts_hurst_rs"] = (ts_hurst_rs, HURST_SQL)


_FOLD_PERIODS = [5, 6, 7, 14]


def ts_period_folding(spark: SparkSession, sf: str) -> DataFrame:
    """Periodicity scan by epoch folding (the astronomy trick, trig-free):
    for each candidate period P, fold the daily order-count series by
    calendar-day-index mod P and measure the one-way-ANOVA variance
    share eta^2 = SS_between / SS_total over the P phases.  A weekly
    cycle makes eta^2(7) (and its harmonic 14) spike while 5 and 6
    stay at noise level.

    No cos/sin anywhere (no libm-portability risk) and no
    order-dependent double sums: phase counts are unequal on a gappy
    calendar, so the per-phase terms S_k^2/n_k are quantized by exact
    integer division (micro units, DECIMAL(38,0)/HUGEINT products)
    BEFORE the per-period sum — A = sum_k (S_k^2 * 1e6 div n_k),
    B = S^2 * 1e6 div n, C = sum(y^2) * 1e6, eta^2 = (A-B)/(C-B) as
    one double ratio.

    Scale: the raw scan reduces to the calendar grid (one hash agg);
    the day index is datediff from a broadcast min-date scalar (no
    window at all); folding is a <= 14-group agg per period."""
    o = t(spark, sf, "orders")
    daily = (o.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    base = daily.agg(F.min("day").alias("d0"))
    folded = (daily.crossJoin(F.broadcast(base))
              .select(F.datediff(F.col("day"), F.col("d0")).alias("ti"),
                      "y")
              .select(
        "ti", "y",
        F.explode(F.array(*[F.lit(p) for p in _FOLD_PERIODS])).alias("p"))
        .withColumn("ph", F.col("ti") % F.col("p")))
    per_ph = (folded.groupBy("p", "ph")
              .agg(F.sum("y").alias("sk"),
                   F.count(F.lit(1)).alias("nk"),
                   F.sum(F.col("y") * F.col("y")).alias("syyk")))
    term = F.expr("CAST(sk AS DECIMAL(38,0)) * sk * 1000000 div nk")
    per_p = (per_ph.groupBy("p")
             .agg(F.sum(term).alias("a"),
                  F.sum("sk").alias("s_all"),
                  F.sum("nk").alias("n_days"),
                  F.sum("syyk").alias("syy"),
                  F.count(F.lit(1)).alias("n_phases")))
    per_p = per_p.withColumn(
        "b", F.expr("CAST(s_all AS DECIMAL(38,0)) * s_all * 1000000 "
                    "div n_days"))
    d = "double"
    eta2 = ((F.col("a").cast(d) - F.col("b").cast(d))
            / (F.col("syy").cast(d) * 1000000.0 - F.col("b").cast(d)))
    return (per_p.select(
        F.col("p").alias("period"), "n_phases", "n_days",
        F.floor(eta2 * 1000000.0).cast("long").alias("eta2_ppm"))
        .orderBy("period"))


FOLD_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
  FROM orders GROUP BY 1
),
base AS (SELECT min(day) AS d0 FROM daily),
folded AS (
  SELECT datediff('day', b.d0, d.day) % t.p AS ph, t.p, d.y
  FROM daily d CROSS JOIN base b
  CROSS JOIN (SELECT unnest([{", ".join(map(str, _FOLD_PERIODS))}])
              AS p) t
),
per_ph AS (
  SELECT p, ph, CAST(sum(y) AS BIGINT) AS sk, count(*) AS nk,
         CAST(sum(y * y) AS BIGINT) AS syyk
  FROM folded GROUP BY 1, 2
),
per_p AS (
  SELECT p,
         CAST(sum(CAST(sk AS HUGEINT) * sk * 1000000 // nk) AS HUGEINT)
           AS a,
         CAST(sum(sk) AS BIGINT) AS s_all,
         CAST(sum(nk) AS BIGINT) AS n_days,
         CAST(sum(syyk) AS BIGINT) AS syy,
         count(*) AS n_phases
  FROM per_ph GROUP BY 1
),
withb AS (
  SELECT *, CAST(s_all AS HUGEINT) * s_all * 1000000 // n_days AS b
  FROM per_p
)
SELECT p AS period, n_phases, n_days,
       CAST(floor(
         (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
         / (CAST(syy AS DOUBLE) * 1000000.0 - CAST(b AS DOUBLE))
         * 1000000.0) AS BIGINT) AS eta2_ppm
FROM withb
ORDER BY period
"""


QUERIES["ts_period_folding"] = (ts_period_folding, FOLD_SQL)
