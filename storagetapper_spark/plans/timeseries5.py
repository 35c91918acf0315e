"""Time-series statistics batch: autocorrelation, lead-lag
cross-correlation, STL-style seasonal decomposition, and Theil-Sen
robust trend — the per-series diagnostics a telemetry warehouse runs
over its rollups (the reference's monitoring surface stops at counts;
these are the standard next layer per the forecasting literature in
PAPERS.md).

Shared exactness discipline (see SCALE.md rounding-pitfalls): every
correlation is computed from EXACT BIGINT sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy² of integer daily counts) and only the final
scalar expression drops to DOUBLE — the identical IEEE expression on
identical exact inputs yields the identical double in Spark and DuckDB,
so floor(r·10⁶) is hash-stable.  Variance products are cast to DOUBLE
*before* multiplying (vx·vy can exceed BIGINT range); DuckDB sums of
BIGINT are CAST back from HUGEINT inside the oracle.

Shared scale shape: one map-side-combined daily rollup, then per-series
window/self-join work whose cost is bounded by series length, never by
corpus size — series count scales out, series length does not (the same
argument as ts_discord_detection, timeseries4.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_MAX_LAG = 7


def _daily(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (ev.groupBy("event_type",
                       F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def ts_autocorrelation(spark: SparkSession, sf: str) -> DataFrame:
    """ACF at row-lags 1..7 per event-type daily-count series.

    Plan: index each series once (one narrow window), explode the lag
    list (7 rows per point), and self-join on (series, i - lag) — one
    shuffle keyed by series, pairs bounded by 7·len(series).  The
    Pearson r per (series, lag) comes from exact integer sums; constant
    windows (zero variance) are dropped rather than emitting NaN."""
    daily = _daily(spark, sf)
    idx = daily.select(
        "event_type", "cnt",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")).alias("i"))
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(1, _MAX_LAG + 1)])).alias("lag_k")
    a = idx.select("event_type", F.col("cnt").alias("x"), "i", lags)
    b = idx.select(F.col("event_type").alias("bt"),
                   F.col("cnt").alias("y"), F.col("i").alias("bi"))
    pairs = a.join(b, (F.col("bt") == F.col("event_type"))
                   & (F.col("bi") == F.col("i") - F.col("lag_k")))
    s = (pairs.groupBy("event_type", "lag_k")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sx2"),
              F.sum(F.col("y") * F.col("y")).alias("sy2")))
    vx = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
           ).cast("double")
    r = num / F.sqrt(vx.cast("double") * vy.cast("double"))
    return (s.filter((vx > 0) & (vy > 0))
            .select("event_type", "lag_k", F.col("n").alias("n_pairs"),
                    F.floor(r * 1000000).cast("long").alias("acf_micro"))
            .orderBy("event_type", "lag_k"))


TS_ACF_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
pairs AS (
  SELECT a.event_type, l.lag_k, a.cnt AS x, b.cnt AS y
  FROM idx a
  CROSS JOIN (SELECT unnest(range(1, {_MAX_LAG + 1})) AS lag_k) l
  JOIN idx b ON b.event_type = a.event_type AND b.i = a.i - l.lag_k
),
s AS (
  SELECT event_type, lag_k, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2,
         CAST(sum(y * y) AS BIGINT) AS sy2
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag_k, n AS n_pairs,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)
                         * CAST(n * sy2 - sy * sy AS DOUBLE))
                  * 1000000) AS BIGINT) AS acf_micro
FROM s
WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
ORDER BY event_type, lag_k
"""


QUERIES = {
    "ts_autocorrelation": (ts_autocorrelation, TS_ACF_SQL),
}


_XC_A = "view"
_XC_B = "purchase"
_XC_LAG = 3


def ts_cross_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Lead-lag cross-correlation between the 'view' and 'purchase'
    daily series at calendar lags -3..+3 (positive lag = purchases
    trail views).  Both series are tiny after the rollup, so the
    lag-join is a broadcast; the only wide stage is the daily rollup
    itself."""
    daily = _daily(spark, sf)
    va = daily.filter(F.col("event_type") == _XC_A) \
              .select(F.col("day").alias("a_day"), F.col("cnt").alias("x"))
    vb = daily.filter(F.col("event_type") == _XC_B) \
              .select(F.col("day").alias("b_day"), F.col("cnt").alias("y"))
    lags = F.explode(F.array(
        *[F.lit(k) for k in range(-_XC_LAG, _XC_LAG + 1)])).alias("lag_k")
    pairs = (va.select("*", lags)
             .join(F.broadcast(vb),
                   F.col("b_day") == F.date_add(F.col("a_day"),
                                                F.col("lag_k"))))
    s = (pairs.groupBy("lag_k")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sx2"),
              F.sum(F.col("y") * F.col("y")).alias("sy2")))
    vx = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
           ).cast("double")
    r = num / F.sqrt(vx.cast("double") * vy.cast("double"))
    return (s.filter((vx > 0) & (vy > 0))
            .select("lag_k", F.col("n").alias("n_pairs"),
                    F.floor(r * 1000000).cast("long").alias("xcorr_micro"))
            .orderBy("lag_k"))


TS_XCORR_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
va AS (SELECT day AS a_day, cnt AS x FROM daily
       WHERE event_type = '{_XC_A}'),
vb AS (SELECT day AS b_day, cnt AS y FROM daily
       WHERE event_type = '{_XC_B}'),
pairs AS (
  SELECT l.lag_k, a.x, b.y
  FROM va a
  CROSS JOIN (SELECT unnest(range(-{_XC_LAG}, {_XC_LAG + 1})) AS lag_k) l
  JOIN vb b ON b.b_day = a.a_day + CAST(l.lag_k AS INTEGER)
),
s AS (
  SELECT lag_k, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2,
         CAST(sum(y * y) AS BIGINT) AS sy2
  FROM pairs GROUP BY 1
)
SELECT lag_k, n AS n_pairs,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)
                         * CAST(n * sy2 - sy * sy AS DOUBLE))
                  * 1000000) AS BIGINT) AS xcorr_micro
FROM s
WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
ORDER BY lag_k
"""


QUERIES["ts_cross_correlation"] = (ts_cross_correlation, TS_XCORR_SQL)


def ts_stl_seasonal(spark: SparkSession, sf: str) -> DataFrame:
    """STL-style weekday seasonal indices: trend = centered 7-day moving
    average (full windows only), seasonal(dow) = mean of the detrended
    series per weekday.  Differs from seasonality_weekday (raw ratio to
    the global mean) — this is the decomposition form, robust to trend.

    Exactness: detrended·7 = 7·cnt − Σwindow is an exact BIGINT, so the
    per-weekday mean is one double division at the end.  dow is ISO
    Monday=0 in both engines (Spark weekday(), DuckDB isodow()-1)."""
    daily = _daily(spark, sf)
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 3))
    det = (daily.select(
        "event_type", "day", "cnt",
        F.sum("cnt").over(w).alias("tr_sum"),
        F.count(F.lit(1)).over(w).alias("tr_n"))
        .filter(F.col("tr_n") == 7)
        .select("event_type", F.weekday("day").alias("dow"),
                (F.lit(7) * F.col("cnt") - F.col("tr_sum")).alias("det7")))
    seasonal = (F.sum("det7").cast("double") * 1000000
                / (F.lit(7) * F.count(F.lit(1))))
    return (det.groupBy("event_type", "dow")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.floor(seasonal).cast("long").alias("seasonal_micro"))
            .orderBy("event_type", "dow"))


TS_STL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
det AS (
  SELECT event_type, isodow(day) - 1 AS dow,
         7 * cnt - sum(cnt) OVER w AS det7,
         count(*) OVER w AS tr_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT event_type, dow, count(*) AS n_days,
       CAST(floor(CAST(sum(det7) AS DOUBLE) * 1000000
                  / (7 * count(*))) AS BIGINT) AS seasonal_micro
FROM det WHERE tr_n = 7
GROUP BY event_type, dow
ORDER BY event_type, dow
"""


QUERIES["ts_stl_seasonal"] = (ts_stl_seasonal, TS_STL_SQL)


def ts_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend per series: the median of all pairwise
    slopes (cnt_j − cnt_i)/(j − i) over the day-indexed daily counts —
    the standard outlier-resistant alternative to least-squares
    (breakdown point 29%).

    Scale: per-series O(len²) pairs, the accepted Theil-Sen cost (the
    Siegel repeated-median or a sampled-pairs variant is the long-series
    fallback; series here are bounded by the calendar).  Slopes are
    IEEE divisions of exact integers and the median of an odd/even count
    interpolates identically in Spark percentile() and DuckDB
    quantile_cont(), so floor(m·10⁶) is stable."""
    daily = _daily(spark, sf)
    idx = daily.select(
        "event_type", F.col("cnt").cast("long").alias("cnt"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")).alias("i"))
    b = idx.select(F.col("event_type").alias("bt"),
                   F.col("cnt").alias("bcnt"), F.col("i").alias("bi"))
    pairs = idx.join(b, (F.col("bt") == F.col("event_type"))
                     & (F.col("bi") > F.col("i")))
    slope = ((F.col("bcnt") - F.col("cnt")).cast("double")
             / (F.col("bi") - F.col("i")).cast("double"))
    return (pairs.select("event_type", slope.alias("slope"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.floor(F.percentile("slope", F.lit(0.5)) * 1000000)
                 .cast("long").alias("theil_sen_micro"))
            .orderBy("event_type"))


TS_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
pairs AS (
  SELECT a.event_type,
         CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
  FROM idx a JOIN idx b
    ON b.event_type = a.event_type AND b.i > a.i
)
SELECT event_type, count(*) AS n_pairs,
       CAST(floor(quantile_cont(slope, 0.5) * 1000000) AS BIGINT)
         AS theil_sen_micro
FROM pairs
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["ts_theil_sen"] = (ts_theil_sen, TS_THEIL_SEN_SQL)


def ts_stl_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-residual anomaly detection: days whose deseasonalized
    residual deviates > 2σ from the series mean residual — the
    decomposition-based upgrade over anomaly_daily_counts (a raw-count
    z-score cannot separate 'weekend' from 'incident'; this can).

    Pipeline: detrend (7-day centered MA, exact det7 = 7x − Σwindow),
    de-season (per-weekday mean of det7 over exact integer sums),
    residual micro-floored per row, then an exact-integer z-test per
    series.  Joins after the rollup touch only (series × dow) and
    (series) tables — broadcast-sized."""
    daily = _daily(spark, sf)
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 3))
    det = (daily.select(
        "event_type", "day", "cnt",
        F.sum("cnt").over(w).alias("tr_sum"),
        F.count(F.lit(1)).over(w).alias("tr_n"))
        .filter(F.col("tr_n") == 7)
        .select("event_type", "day", F.weekday("day").alias("dow"),
                (F.lit(7) * F.col("cnt") - F.col("tr_sum")).alias("det7")))
    seas = (det.groupBy("event_type", "dow")
            .agg(F.sum("det7").alias("s_num"),
                 F.count(F.lit(1)).alias("s_den")))
    resid = (det.join(F.broadcast(seas), ["event_type", "dow"])
             .select("event_type", "day",
                     F.floor((F.col("det7").cast("double") / 7.0
                              - F.col("s_num").cast("double")
                              / (7.0 * F.col("s_den"))) * 1000000)
                     .cast("long").alias("r")))
    stats = (resid.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("r").alias("sr"),
                  F.sum(F.col("r") * F.col("r")).alias("sr2")))
    mu = F.col("sr").cast("double") / F.col("n").cast("double")
    sd = F.sqrt((F.col("n") * F.col("sr2") - F.col("sr") * F.col("sr"))
                .cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double")))
    st = stats.select("event_type", mu.alias("mu"), sd.alias("sd"))
    return (resid.join(F.broadcast(st), "event_type")
            .filter(F.abs(F.col("r").cast("double") - F.col("mu"))
                    > 2.0 * F.col("sd"))
            .select("event_type", "day", F.col("r").alias("resid_micro"))
            .orderBy("event_type", "day"))


TS_STL_ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
det AS (
  SELECT event_type, day, isodow(day) - 1 AS dow,
         7 * cnt - sum(cnt) OVER w AS det7,
         count(*) OVER w AS tr_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detf AS (SELECT event_type, day, dow, det7 FROM det WHERE tr_n = 7),
seas AS (
  SELECT event_type, dow, CAST(sum(det7) AS BIGINT) AS s_num,
         count(*) AS s_den
  FROM detf GROUP BY 1, 2
),
resid AS (
  SELECT d.event_type, d.day,
         CAST(floor((CAST(d.det7 AS DOUBLE) / 7.0
                     - CAST(s.s_num AS DOUBLE) / (7.0 * s.s_den))
                    * 1000000) AS BIGINT) AS r
  FROM detf d JOIN seas s
    ON s.event_type = d.event_type AND s.dow = d.dow
),
stats AS (
  SELECT event_type, count(*) AS n, CAST(sum(r) AS BIGINT) AS sr,
         CAST(sum(r * r) AS BIGINT) AS sr2
  FROM resid GROUP BY 1
)
SELECT r.event_type, r.day, r.r AS resid_micro
FROM resid r JOIN stats st ON st.event_type = r.event_type
WHERE abs(CAST(r.r AS DOUBLE) - CAST(st.sr AS DOUBLE) / st.n)
      > 2.0 * sqrt(CAST(st.n * st.sr2 - st.sr * st.sr AS DOUBLE)
                   / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)))
ORDER BY r.event_type, r.day
"""


QUERIES["ts_stl_anomaly"] = (ts_stl_anomaly, TS_STL_ANOMALY_SQL)


# ------------------------------------------- rolling robust anomaly --

_ROB_FRAME = 28  # trailing window (days), inclusive of the current day


def ts_rolling_robust_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Robust rolling anomaly detection: flag days whose revenue
    deviates from the trailing 28-day MEDIAN by more than 3 trailing
    MADs — the outlier-immune sibling of anomaly_daily_counts (a
    single spike inflates a trailing σ and masks the next one; it
    cannot move a median).

    MAD needs the median OF DEVIATIONS FROM the frame median — a
    nested frame aggregation no single window expresses — so frames
    materialize via an offset explode + EQUI-join on (day − offset)
    against the daily grid (grid × 28 rows, calendar-bounded at any
    data scale; never a nested-loop range join).  Exactness: medians
    of integers land on halves, so med rides ×2 and MAD ×4 as exact
    ints and the 3-MAD flag is a pure integer comparison."""
    o = t(spark, sf, "orders")
    daily = (o.groupBy(F.unix_date(F.col("o_orderdate").cast("date"))
                       .alias("dd"))
             .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                        .cast("long")).alias("c")))
    offs = daily.select(
        "dd", F.explode(F.sequence(F.lit(0),
                                   F.lit(_ROB_FRAME - 1))).alias("o"))
    members = (offs.join(daily.select(F.col("dd").alias("md"),
                                      F.col("c").alias("mc")),
                         offs.dd - F.col("o") == F.col("md"))
               .select("dd", "mc"))
    med = (members.groupBy("dd")
           .agg(F.count(F.lit(1)).alias("n_frame"),
                (F.percentile("mc", F.lit(0.5)) * 2).cast("long")
                .alias("med_x2")))
    devs = (members.join(med, "dd")
            .select("dd", "n_frame", "med_x2",
                    F.abs(F.col("mc") * 2 - F.col("med_x2"))
                    .alias("dev_x2")))
    mad = (devs.groupBy("dd", "n_frame", "med_x2")
           .agg((F.percentile("dev_x2", F.lit(0.5)) * 2).cast("long")
                .alias("mad_x4")))
    return (daily.join(mad, "dd")
            .filter((F.abs(F.col("c") * 2 - F.col("med_x2")) * 2
                     > 3 * F.col("mad_x4"))
                    & (F.col("n_frame") == _ROB_FRAME))
            .select(F.date_from_unix_date(F.col("dd")).alias("day"),
                    F.col("c").alias("cents"), "n_frame", "med_x2",
                    "mad_x4")
            .orderBy("day"))


TS_ROBUST_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) AS dd,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS c
  FROM orders GROUP BY 1
),
members AS (
  SELECT d.dd, m.c AS mc
  FROM daily d CROSS JOIN range({_ROB_FRAME}) o
  JOIN daily m ON m.dd = d.dd - o.range
),
med AS (
  SELECT dd, count(*) AS n_frame,
         CAST(quantile_cont(mc, 0.5) * 2 AS BIGINT) AS med_x2
  FROM members GROUP BY dd
),
mad AS (
  SELECT m.dd, med.n_frame, med.med_x2,
         CAST(quantile_cont(abs(m.mc * 2 - med.med_x2), 0.5) * 2
              AS BIGINT) AS mad_x4
  FROM members m JOIN med USING (dd)
  GROUP BY m.dd, med.n_frame, med.med_x2
)
SELECT CAST(DATE '1970-01-01' + d.dd * INTERVAL 1 DAY AS DATE) AS day,
       d.c AS cents, mad.n_frame, mad.med_x2, mad.mad_x4
FROM daily d JOIN mad USING (dd)
WHERE abs(d.c * 2 - mad.med_x2) * 2 > 3 * mad.mad_x4
  AND mad.n_frame = {_ROB_FRAME}
ORDER BY day
"""


QUERIES["ts_rolling_robust_anomaly"] = (ts_rolling_robust_anomaly,
                                        TS_ROBUST_SQL)


def ts_changepoint_mean_shift(spark: SparkSession, sf: str) -> DataFrame:
    """Best single mean-shift changepoint over the daily order-count
    series (binary-segmentation step 1): the split day maximizing the
    between-segment sum of squares, via the identity
    argmax_t [ S_L²/n_L + S_R²/n_R ] with S/n from exact BIGINT prefix
    sums over the calendar grid.  The comparison score is the exact
    integer S_L²·n_R + S_R²·n_L (common denominator n_L·n_R dropped —
    it is NOT constant, so the full fraction is compared as one double
    over exact ints; ties broken by day).  Output: the split day, both
    segment means (micro), and the shift.

    Scale: the raw scan reduces to the calendar grid (one hash agg);
    the prefix window runs over the ≤ ~2.5k-day grid (registered in
    the bounded-domain allowlist), and the argmax is a 1-row
    TakeOrdered."""
    daily = (t(spark, sf, "orders")
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(F.sum("y").alias("s_all"),
                    F.count(F.lit(1)).alias("n_all"))
    pre = (daily
           .withColumn("s_l", F.sum("y").over(w))
           .withColumn("n_l", F.count(F.lit(1)).over(w))
           .crossJoin(F.broadcast(tot))
           .filter(F.col("n_l") < F.col("n_all")))
    s_r = F.col("s_all") - F.col("s_l")
    n_r = F.col("n_all") - F.col("n_l")
    d = "double"
    # products formed in DOUBLE: s_all^2 * n_l passes 2^63 near sf50
    # (the ml.py _stump_best lesson); exact-int inputs, identical trees
    score = ((F.col("s_l").cast(d) * F.col("s_l").cast(d) * n_r.cast(d)
              + s_r.cast(d) * s_r.cast(d) * F.col("n_l").cast(d))
             / (F.col("n_l") * n_r).cast(d))
    scored = pre.select(
        "day", "n_l", s_r.alias("s_r"), "s_l", n_r.alias("n_r"),
        F.floor(score).cast("long").alias("score"))
    best = scored.orderBy(F.desc("score"), "day").limit(1)
    return best.select(
        F.col("day").alias("split_day"),
        F.col("n_l").alias("n_left"), F.col("n_r").alias("n_right"),
        F.floor(F.col("s_l") * 1000000 / F.col("n_l")).cast("long")
        .alias("mean_left_micro"),
        F.floor(F.col("s_r") * 1000000 / F.col("n_r")).cast("long")
        .alias("mean_right_micro"),
        (F.floor(F.col("s_r") * 1000000 / F.col("n_r"))
         - F.floor(F.col("s_l") * 1000000 / F.col("n_l")))
        .cast("long").alias("shift_micro"))


CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS s_all, count(*) AS n_all FROM daily
),
pre AS (
  SELECT day,
         CAST(sum(y) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s_l,
         CAST(count(*) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_l,
         s_all, n_all
  FROM daily, tot
),
scored AS (
  SELECT day, n_l, s_l, s_all - s_l AS s_r, n_all - n_l AS n_r,
         CAST(floor((CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE)
                       * CAST(n_all - n_l AS DOUBLE)
                     + CAST(s_all - s_l AS DOUBLE)
                       * CAST(s_all - s_l AS DOUBLE)
                       * CAST(n_l AS DOUBLE))
                    / CAST(n_l * (n_all - n_l) AS DOUBLE)) AS BIGINT)
           AS score
  FROM pre WHERE n_l < n_all
)
SELECT day AS split_day, n_l AS n_left, n_r AS n_right,
       CAST(floor(s_l * 1000000 / n_l) AS BIGINT) AS mean_left_micro,
       CAST(floor(s_r * 1000000 / n_r) AS BIGINT) AS mean_right_micro,
       CAST(floor(s_r * 1000000 / n_r) - floor(s_l * 1000000 / n_l)
            AS BIGINT) AS shift_micro
FROM scored
ORDER BY score DESC, day
LIMIT 1
"""


QUERIES["ts_changepoint_mean_shift"] = (ts_changepoint_mean_shift,
                                        CHANGEPOINT_SQL)
