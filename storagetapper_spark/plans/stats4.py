"""Statistical-inference batch 4: the paired/blocked nonparametric
family (McNemar, Cochran's Q, Friedman) that plans/stats.py's
independent-sample tests can't answer — "did the SAME subjects change?"
— plus two serial-dependence diagnostics (Wald-Wolfowitz runs test,
Ljung-Box portmanteau) and an empirical-Bayes beta shrinkage of
per-part return rates (the quality-score smoothing step every
training-data curation pipeline runs before thresholding sparse
per-source rates).

Exactness discipline (plans/stats3.py): every sufficient statistic is
an exact BIGINT/DECIMAL(38,0) aggregate; each test statistic is ONE
double expression with byte-identical literals in the Spark plan and
the DuckDB oracle, milli/micro-floored.  Degenerate denominators are
NULL-guarded identically on both sides (the ml_pr_auc ADVICE lesson).

Scale notes per query in the docstrings; none of these shuffles more
than one groupBy of the fact table, and every window is either
partitioned by a real key or runs over a calendar-bounded daily grid
(registered in the plan-guard allowlist with its bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# McNemar's test — paired binary outcomes on the same subjects
# ---------------------------------------------------------------------------

def stats_mcnemar_test(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar's chi-square (continuity-corrected) on paired binary
    outcomes: per customer, "ordered in the early era (<= 1997)" vs
    "ordered in the late era (>= 1999)" — the within-subject churn
    question an independent two-sample test gets wrong.  Only the
    discordant cells b (early only) and c (late only) inform the test:
    chi2_cc = max(|b - c| - 1, 0)^2 / (b + c) — the textbook Edwards
    correction clamps at zero so b == c yields chi2 = 0, not 1/(b+c)
    (round-8 ADVICE fix, mirrored byte-identically in the oracle).

    Scale: one groupBy(custkey) with map-side-combined max() indicators
    (the 2x2 table is a 4-integer reduce); no window, no join."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    per_c = (o.groupBy("o_custkey")
             .agg(F.max(F.when(yr <= 1997, 1).otherwise(0)).alias("early"),
                  F.max(F.when(yr >= 1999, 1).otherwise(0)).alias("late")))
    e, l = F.col("early"), F.col("late")
    cells = per_c.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(e * l).alias("both_eras"),
        F.sum(e * (1 - l)).alias("early_only"),
        F.sum((1 - e) * l).alias("late_only"),
        F.sum((1 - e) * (1 - l)).alias("neither"))
    b, c = F.col("early_only").cast("double"), F.col("late_only").cast("double")
    cc = F.greatest(F.abs(b - c) - 1.0, F.lit(0.0))
    chi2 = cc * cc / F.nullif(b + c, F.lit(0.0))
    return cells.select(
        "n_subjects", "both_eras", "early_only", "late_only", "neither",
        F.floor(chi2 * 1000.0).cast("long").alias("chi2_cc_milli"))


MCNEMAR_SQL = """
WITH per_c AS (
  SELECT o_custkey,
         max(CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END) AS early,
         max(CASE WHEN year(o_orderdate) >= 1999 THEN 1 ELSE 0 END) AS late
  FROM orders GROUP BY o_custkey
),
cells AS (
  SELECT count(*) AS n_subjects,
         CAST(sum(early * late) AS BIGINT) AS both_eras,
         CAST(sum(early * (1 - late)) AS BIGINT) AS early_only,
         CAST(sum((1 - early) * late) AS BIGINT) AS late_only,
         CAST(sum((1 - early) * (1 - late)) AS BIGINT) AS neither
  FROM per_c
)
SELECT n_subjects, both_eras, early_only, late_only, neither,
       CAST(floor(
         greatest(abs(CAST(early_only AS DOUBLE) - CAST(late_only AS DOUBLE)) - 1.0, 0.0)
         * greatest(abs(CAST(early_only AS DOUBLE) - CAST(late_only AS DOUBLE)) - 1.0, 0.0)
         / nullif(CAST(early_only AS DOUBLE) + CAST(late_only AS DOUBLE), 0.0)
         * 1000.0) AS BIGINT) AS chi2_cc_milli
FROM cells
"""


# ---------------------------------------------------------------------------
# Cochran's Q — k binary treatments over the same blocks
# ---------------------------------------------------------------------------

def stats_cochran_q(spark: SparkSession, sf: str) -> DataFrame:
    """Cochran's Q over k=3 binary "treatments" (did the customer ever
    place an URGENT / HIGH / MEDIUM priority order) on customer blocks —
    the k-treatment generalization of McNemar.  Blocks with all-0 or
    all-k rows are uninformative and dropped (the textbook convention).
    Q = (k-1) * (k * sum(C_j^2) - T^2) / (k*T - sum(R_i^2)),
    df = k - 1.

    Scale: one groupBy(custkey) building the 3 indicators, then a
    single-row reduce of 5 integer sums; no window, no join."""
    o = t(spark, sf, "orders")
    p = F.col("o_orderpriority")
    k = 3
    per_b = (o.groupBy("o_custkey")
             .agg(F.max(F.when(p == "1-URGENT", 1).otherwise(0)).alias("x1"),
                  F.max(F.when(p == "2-HIGH", 1).otherwise(0)).alias("x2"),
                  F.max(F.when(p == "3-MEDIUM", 1).otherwise(0)).alias("x3"))
             .withColumn("r", F.col("x1") + F.col("x2") + F.col("x3"))
             .filter((F.col("r") > 0) & (F.col("r") < k)))
    s = per_b.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("x1").alias("c1"), F.sum("x2").alias("c2"),
        F.sum("x3").alias("c3"),
        F.sum("r").alias("t_sum"),
        F.sum(F.col("r") * F.col("r")).alias("r2_sum"))
    d = "double"
    c1, c2, c3 = (F.col(x).cast(d) for x in ("c1", "c2", "c3"))
    tt, r2 = F.col("t_sum").cast(d), F.col("r2_sum").cast(d)
    q = (2.0 * (3.0 * (c1 * c1 + c2 * c2 + c3 * c3) - tt * tt)
         / F.nullif(3.0 * tt - r2, F.lit(0.0)))
    return s.select("n_blocks", "c1", "c2", "c3", "t_sum",
                    F.floor(q * 1000.0).cast("long").alias("q_milli"),
                    F.lit(k - 1).cast("int").alias("df"))


COCHRAN_SQL = """
WITH per_b AS (
  SELECT o_custkey,
         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS x1,
         max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS x2,
         max(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS x3
  FROM orders GROUP BY o_custkey
),
kept AS (
  SELECT x1, x2, x3, x1 + x2 + x3 AS r FROM per_b
  WHERE x1 + x2 + x3 > 0 AND x1 + x2 + x3 < 3
),
s AS (
  SELECT count(*) AS n_blocks, CAST(sum(x1) AS BIGINT) AS c1,
         CAST(sum(x2) AS BIGINT) AS c2, CAST(sum(x3) AS BIGINT) AS c3,
         CAST(sum(r) AS BIGINT) AS t_sum,
         CAST(sum(r * r) AS BIGINT) AS r2_sum
  FROM kept
)
SELECT n_blocks, c1, c2, c3, t_sum,
       CAST(floor(
         2.0 * (3.0 * (CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
                       + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE)
                       + CAST(c3 AS DOUBLE) * CAST(c3 AS DOUBLE))
                - CAST(t_sum AS DOUBLE) * CAST(t_sum AS DOUBLE))
         / nullif(3.0 * CAST(t_sum AS DOUBLE) - CAST(r2_sum AS DOUBLE), 0.0)
         * 1000.0) AS BIGINT) AS q_milli,
       CAST(2 AS INT) AS df
FROM s
"""


# ---------------------------------------------------------------------------
# Friedman test — within-block ranks of k repeated measures
# ---------------------------------------------------------------------------

def stats_friedman_test(spark: SparkSession, sf: str) -> DataFrame:
    """Friedman rank test of per-customer yearly spend across the k=3
    treatment years 1995/1996/1997, restricted to complete blocks
    (customers ordering in all three).  Mid-ranks are computed IN
    INTEGERS doubled (rank2 = 2*#smaller + #equal + 1, #equal counting
    self) via a within-block self-join (k^2 = 9 comparisons per block),
    so ties never touch floats.  chi2 = 3*sum(R2_j^2)/(n*k*(k+1))
    - 3*n*(k+1) with R2_j the doubled rank sums.

    Scale: spend reduces per (custkey, year) in one hash agg; the
    self-join is keyed by custkey (3x3 per block) — work is 9n pairs,
    shuffle-partitioned by block key, never global."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    yearly = (o.filter(yr.isin(1995, 1996, 1997))
              .groupBy(F.col("o_custkey").alias("ck"), yr.alias("yr"))
              .agg(F.sum(cents).alias("v")))
    complete = (yearly.groupBy("ck").agg(F.count(F.lit(1)).alias("k_i"))
                .filter(F.col("k_i") == 3).select("ck"))
    blk = yearly.join(complete, "ck")
    other = blk.select(F.col("ck").alias("ck2"), F.col("v").alias("v2"))
    ranked = (blk.join(other, F.col("ck") == F.col("ck2"))
              .groupBy("ck", "yr")
              .agg((2 * F.sum(F.when(F.col("v2") < F.col("v"), 1).otherwise(0))
                    + F.sum(F.when(F.col("v2") == F.col("v"), 1).otherwise(0))
                    + 1).alias("rank2")))
    per_j = ranked.groupBy("yr").agg(F.sum("rank2").alias("r2j"),
                                     F.count(F.lit(1)).alias("n"))
    s = per_j.agg(F.max("n").alias("n_blocks"),
                  F.sum(F.col("r2j").cast(_DEC) * F.col("r2j").cast(_DEC))
                  .alias("ss"))
    n = F.col("n_blocks").cast("double")
    chi2 = 3.0 * F.col("ss").cast("double") / (n * 12.0) - 12.0 * n
    return s.select("n_blocks",
                    F.lit(3).cast("int").alias("k_treatments"),
                    F.floor(chi2 * 1000.0).cast("long").alias("chi2_milli"),
                    F.lit(2).cast("int").alias("df"))


FRIEDMAN_SQL = """
WITH yearly AS (
  SELECT o_custkey AS ck, year(o_orderdate) AS yr,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v
  FROM orders WHERE year(o_orderdate) IN (1995, 1996, 1997)
  GROUP BY 1, 2
),
complete AS (
  SELECT ck FROM yearly GROUP BY ck HAVING count(*) = 3
),
blk AS (
  SELECT y.ck, y.yr, y.v FROM yearly y JOIN complete c ON y.ck = c.ck
),
ranked AS (
  SELECT a.ck, a.yr,
         2 * sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
         + sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS rank2
  FROM blk a JOIN blk b ON a.ck = b.ck
  GROUP BY a.ck, a.yr
),
per_j AS (
  SELECT yr, sum(rank2) AS r2j, count(*) AS n FROM ranked GROUP BY yr
),
s AS (
  SELECT max(n) AS n_blocks,
         sum(CAST(r2j AS HUGEINT) * CAST(r2j AS HUGEINT)) AS ss
  FROM per_j
)
SELECT n_blocks, CAST(3 AS INT) AS k_treatments,
       CAST(floor(
         (3.0 * CAST(ss AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * 12.0)
          - 12.0 * CAST(n_blocks AS DOUBLE)) * 1000.0) AS BIGINT)
         AS chi2_milli,
       CAST(2 AS INT) AS df
FROM s
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test — serial randomness of the daily series
# ---------------------------------------------------------------------------

def stats_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test: is the daily order-count series's
    above/below-mean sign pattern serially random?  The sign is decided
    EXACTLY in integers (y_t * n_days > total, i.e. strictly above the
    mean), runs are counted with one lag over the day-ordered grid, and
    z = (R - mu) / sigma with mu = 2*n1*n2/n + 1 and
    sigma^2 = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n - 1)).

    Scale: the raw scan collapses to the calendar grid (one hash agg,
    <= ~2.5k rows/decade); the lag window over that grid is registered
    in the bounded-domain allowlist."""
    o = t(spark, sf, "orders")
    daily = (o.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    tot = daily.agg(F.sum("y").alias("s_all"),
                    F.count(F.lit(1)).alias("n_all"))
    signed = (daily.crossJoin(F.broadcast(tot))
              .withColumn("above",
                          (F.col("y") * F.col("n_all")
                           > F.col("s_all")).cast("int")))
    w = Window.orderBy("day")
    runs = (signed
            .withColumn("chg",
                        F.when(F.lag("above").over(w).isNull(), 1)
                        .when(F.lag("above").over(w) != F.col("above"), 1)
                        .otherwise(0)))
    s = runs.agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum("above").alias("n_above"),
                 F.sum(1 - F.col("above")).alias("n_below"),
                 F.sum("chg").alias("runs"))
    d = "double"
    n1, n2 = F.col("n_above").cast(d), F.col("n_below").cast(d)
    n, r = F.col("n_days").cast(d), F.col("runs").cast(d)
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
           / (n * n * (n - 1.0)))
    z = (r - mu) / F.nullif(F.sqrt(var), F.lit(0.0))
    return s.select("n_days", "n_above", "n_below", "runs",
                    F.floor(z * 1000.0).cast("long").alias("z_milli"))


RUNS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
  FROM orders GROUP BY 1
),
tot AS (SELECT sum(y) AS s_all, count(*) AS n_all FROM daily),
signed AS (
  SELECT day, CASE WHEN y * n_all > s_all THEN 1 ELSE 0 END AS above
  FROM daily CROSS JOIN tot
),
runs_t AS (
  SELECT above,
         CASE WHEN lag(above) OVER (ORDER BY day) IS NULL THEN 1
              WHEN lag(above) OVER (ORDER BY day) <> above THEN 1
              ELSE 0 END AS chg
  FROM signed
),
s AS (
  SELECT count(*) AS n_days, CAST(sum(above) AS BIGINT) AS n_above,
         CAST(sum(1 - above) AS BIGINT) AS n_below,
         CAST(sum(chg) AS BIGINT) AS runs
  FROM runs_t
)
SELECT n_days, n_above, n_below, runs,
       CAST(floor(
         (CAST(runs AS DOUBLE)
          - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
             / CAST(n_days AS DOUBLE) + 1.0))
         / nullif(sqrt(
             2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
             * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                - CAST(n_days AS DOUBLE))
             / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                * (CAST(n_days AS DOUBLE) - 1.0))), 0.0)
         * 1000.0) AS BIGINT) AS z_milli
FROM s
"""


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau — per-series whiteness test
# ---------------------------------------------------------------------------

_LB_LAGS = 7


def ts_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    """Ljung-Box Q (m=7 lags) per event-type daily-count series — the
    whiteness test over the FIXED-mean ACF estimator rho_k =
    sum(d_t * d_{t+k}) / sum(d_t^2) with d_t = n*x_t - S (mean-centering
    multiplied through by n so every sum is an exact integer;
    ts_autocorrelation's per-lag Pearson is the sliding-mean variant).
    Q = n*(n+2) * sum_k rho_k^2 / (n-k).

    Scale: the raw scan reduces per (event_type, day) in one hash agg;
    lag pairs come from an (i - k) equi-join keyed by event_type
    (7*len(series) pairs, partitioned by series key — no global
    window); products are DECIMAL(38,0)-exact."""
    ev = t(spark, sf, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("x")))
    tot = daily.groupBy("event_type").agg(F.sum("x").alias("s"),
                                          F.count(F.lit(1)).alias("n"))
    cent = (daily.join(tot, "event_type")
            .select("event_type", "day", "n",
                    (F.col("x") * F.col("n") - F.col("s")).alias("dv")))
    idx = cent.withColumn(
        "i", F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")))
    lags = F.explode(F.array(*[F.lit(k) for k in range(1, _LB_LAGS + 1)]))
    a = idx.select("event_type", "n", "dv", "i", lags.alias("lag_k"))
    b = idx.select(F.col("event_type").alias("bt"),
                   F.col("dv").alias("dv2"), F.col("i").alias("bi"))
    num = (a.join(b, (F.col("bt") == F.col("event_type"))
                  & (F.col("bi") == F.col("i") + F.col("lag_k")))
           .groupBy("event_type", "n", "lag_k")
           .agg(F.sum(F.col("dv").cast(_DEC) * F.col("dv2").cast(_DEC))
                .alias("num_k")))
    den = cent.groupBy("event_type").agg(
        F.sum(F.col("dv").cast(_DEC) * F.col("dv").cast(_DEC)).alias("den"))
    d = "double"
    rho = F.col("num_k").cast(d) / F.col("den").cast(d)
    terms = (num.join(den, "event_type")
             .select("event_type", "n", "lag_k",
                     (rho * rho / (F.col("n") - F.col("lag_k")).cast(d))
                     .alias("term"),
                     rho.alias("rho")))
    per_s = (terms.groupBy("event_type", "n")
             .agg(F.sum("term").alias("tsum"),
                  F.max(F.when(F.col("lag_k") == 1, F.col("rho")))
                  .alias("rho1")))
    n = F.col("n").cast(d)
    return (per_s.select(
        "event_type", F.col("n").alias("n_days"),
        F.floor(F.col("rho1") * 1000000.0).cast("long").alias("rho1_micro"),
        F.floor(n * (n + 2.0) * F.col("tsum") * 1000.0).cast("long")
        .alias("q_lb_milli"))
        .orderBy("event_type"))


LJUNG_BOX_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, sum(x) AS s, count(*) AS n FROM daily GROUP BY 1
),
cent AS (
  SELECT d.event_type, d.day, t.n, d.x * t.n - t.s AS dv
  FROM daily d JOIN tot t ON d.event_type = t.event_type
),
idx AS (
  SELECT event_type, n, dv,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM cent
),
num AS (
  SELECT a.event_type, a.n, l.lag_k,
         sum(CAST(a.dv AS HUGEINT) * CAST(b.dv AS HUGEINT)) AS num_k
  FROM idx a
  CROSS JOIN (SELECT unnest(range(1, {_LB_LAGS + 1})) AS lag_k) l
  JOIN idx b ON b.event_type = a.event_type AND b.i = a.i + l.lag_k
  GROUP BY 1, 2, 3
),
den AS (
  SELECT event_type, sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT)) AS den
  FROM cent GROUP BY 1
),
terms AS (
  SELECT n.event_type, n.n,
         (CAST(n.num_k AS DOUBLE) / CAST(d.den AS DOUBLE))
         * (CAST(n.num_k AS DOUBLE) / CAST(d.den AS DOUBLE))
         / CAST(n.n - n.lag_k AS DOUBLE) AS term,
         CASE WHEN n.lag_k = 1
              THEN CAST(n.num_k AS DOUBLE) / CAST(d.den AS DOUBLE) END AS rho1
  FROM num n JOIN den d ON n.event_type = d.event_type
)
SELECT event_type, n AS n_days,
       CAST(floor(max(rho1) * 1000000.0) AS BIGINT) AS rho1_micro,
       CAST(floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                  * sum(term) * 1000.0) AS BIGINT) AS q_lb_milli
FROM terms
GROUP BY event_type, n
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Empirical-Bayes beta shrinkage of sparse per-group rates
# ---------------------------------------------------------------------------

def ml_eb_shrinkage(spark: SparkSession, sf: str) -> DataFrame:
    """Empirical-Bayes beta shrinkage of per-part return rates — the
    smoothing every curation pipeline applies before thresholding a
    rate estimated from 30 observations.  Method of moments on the
    micro-quantized per-part rates (rate_u = k*1e6 div n, an exact
    integer, so the moment sums never touch float accumulation):
    alpha + beta = m*(1-m)/v - 1, alpha = m*(alpha+beta); the shrunk
    rate is (k + alpha) / (n + alpha + beta).  Output: the 15
    highest-volume parts with raw and shrunk micro-rates.

    Degenerate-prior guard (round-8 ADVICE fix): on near-constant
    per-part rates the method-of-moments prior collapses (v == 0 →
    division by zero; v >= m*(1-m) → alpha+beta <= 0, a nonsensical
    negative-mass Beta) — both sides NULL the prior via nullif(v, 0)
    plus a CASE WHEN ab > 0 gate, so the shrunk columns surface NULL
    instead of NaN/negative rates, mirrored byte-identically in
    EB_SHRINK_SQL.

    Scale: one groupBy(partkey) over the fact table, a 1-row moment
    reduce broadcast back, and a TakeOrdered(15) — the prior fit is
    model-sized driver traffic only."""
    li = t(spark, sf, "lineitem")
    per_p = (li.groupBy("l_partkey")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                  .alias("k")))
    per_p = per_p.withColumn(
        "rate_u", F.expr("k * 1000000 div n").cast("long"))
    mom = per_p.agg(F.count(F.lit(1)).alias("p"),
                    F.sum("rate_u").alias("s1"),
                    F.sum(F.col("rate_u").cast(_DEC)
                          * F.col("rate_u").cast(_DEC)).alias("s2"))
    d = "double"
    p = F.col("p").cast(d)
    m = F.col("s1").cast(d) / p / 1000000.0
    ex2 = F.col("s2").cast(d) / p / 1000000.0 / 1000000.0
    v = ex2 - m * m
    ab_raw = m * (1.0 - m) / F.nullif(v, F.lit(0.0)) - 1.0
    ab = F.when(ab_raw > 0.0, ab_raw)
    prior = mom.select(m.alias("m"), v.alias("v"), ab.alias("ab"),
                       (m * ab).alias("alpha"))
    joined = per_p.crossJoin(F.broadcast(prior))
    shrunk = ((F.col("k").cast(d) + F.col("alpha"))
              / (F.col("n").cast(d) + F.col("ab")))
    return (joined.select(
        "l_partkey", "n", "k",
        F.col("rate_u").alias("raw_rate_micro"),
        F.floor(shrunk * 1000000.0).cast("long").alias("shrunk_rate_micro"),
        F.floor(F.col("alpha") * 1000.0).cast("long").alias("alpha_milli"),
        F.floor((F.col("ab") - F.col("alpha")) * 1000.0).cast("long")
        .alias("beta_milli"))
        .orderBy(F.desc("n"), "l_partkey").limit(15))


EB_SHRINK_SQL = """
WITH per_p AS (
  SELECT l_partkey, count(*) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM lineitem GROUP BY 1
),
rated AS (
  SELECT l_partkey, n, k, CAST((k * 1000000) // n AS BIGINT) AS rate_u
  FROM per_p
),
mom AS (
  SELECT count(*) AS p, sum(rate_u) AS s1,
         sum(CAST(rate_u AS HUGEINT) * CAST(rate_u AS HUGEINT)) AS s2
  FROM rated
),
prior AS (
  SELECT
    CAST(s1 AS DOUBLE) / CAST(p AS DOUBLE) / 1000000.0 AS m,
    CAST(s2 AS DOUBLE) / CAST(p AS DOUBLE) / 1000000.0 / 1000000.0
      - (CAST(s1 AS DOUBLE) / CAST(p AS DOUBLE) / 1000000.0)
        * (CAST(s1 AS DOUBLE) / CAST(p AS DOUBLE) / 1000000.0) AS v
  FROM mom
),
prior2 AS (
  SELECT m, v,
         CASE WHEN m * (1.0 - m) / nullif(v, 0.0) - 1.0 > 0.0
              THEN m * (1.0 - m) / nullif(v, 0.0) - 1.0 END AS ab,
         m * (CASE WHEN m * (1.0 - m) / nullif(v, 0.0) - 1.0 > 0.0
                   THEN m * (1.0 - m) / nullif(v, 0.0) - 1.0 END) AS alpha
  FROM prior
)
SELECT l_partkey, n, k, rate_u AS raw_rate_micro,
       CAST(floor((CAST(k AS DOUBLE) + alpha)
                  / (CAST(n AS DOUBLE) + ab) * 1000000.0) AS BIGINT)
         AS shrunk_rate_micro,
       CAST(floor(alpha * 1000.0) AS BIGINT) AS alpha_milli,
       CAST(floor((ab - alpha) * 1000.0) AS BIGINT) AS beta_milli
FROM rated CROSS JOIN prior2
ORDER BY n DESC, l_partkey
LIMIT 15
"""


QUERIES = {
    "stats_mcnemar_test": (stats_mcnemar_test, MCNEMAR_SQL),
    "stats_cochran_q": (stats_cochran_q, COCHRAN_SQL),
    "stats_friedman_test": (stats_friedman_test, FRIEDMAN_SQL),
    "stats_runs_test": (stats_runs_test, RUNS_SQL),
    "ts_ljung_box": (ts_ljung_box, LJUNG_BOX_SQL),
    "ml_eb_shrinkage": (ml_eb_shrinkage, EB_SHRINK_SQL),
}


# ---------------------------------------------------------------------------
# Dunn's post-hoc test — which pairs differ, after Kruskal-Wallis fires
# ---------------------------------------------------------------------------

def stats_dunn_posthoc(spark: SparkSession, sf: str) -> DataFrame:
    """Dunn's pairwise post-hoc z (tie-corrected) for the three
    return-flag populations of l_quantity — the "which pairs actually
    differ" follow-up to stats_kruskal_wallis, with the Bonferroni
    significance verdict at alpha=0.05 over the 3 comparisons
    (|z| > 2.638, the literal two-sided 0.05/3 threshold in milli).

    Same doubled-rank-sum identity as Kruskal-Wallis (stats2.py:41):
    2*R_g on the 50-value quantity grid from exact integer counts;
    sigma^2 = [N(N+1)/12 - sum(t^3-t)/(12(N-1))] * (1/n_i + 1/n_j).
    One grid shuffle; pairs come from a 1-row stack, never a join."""
    li = t(spark, sf, "lineitem")
    per_v = (li.select(F.col("l_quantity").cast("long").alias("v"),
                       "l_returnflag")
             .groupBy("v")
             .agg(*[F.sum(F.when(F.col("l_returnflag") == g, 1)
                          .otherwise(0)).alias(f"c_{g.lower()}")
                    for g in ("A", "N", "R")],
                  F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    terms = per_v.select(
        "*", (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    rank_wt = (F.lit(2).cast(_DEC) * F.col("before").cast(_DEC)
               + F.col("cnt").cast(_DEC) + F.lit(1).cast(_DEC))
    agg = terms.agg(
        *[F.sum(f"c_{g}").alias(f"n_{g}") for g in ("a", "n", "r")],
        *[F.sum(F.col(f"c_{g}").cast(_DEC) * rank_wt).alias(f"r2_{g}")
          for g in ("a", "n", "r")],
        F.sum(F.col("cnt").cast(_DEC) * F.col("cnt").cast(_DEC)
              * F.col("cnt").cast(_DEC) - F.col("cnt").cast(_DEC))
        .alias("tie_term"))
    d = "double"
    n = (F.col("n_a") + F.col("n_n") + F.col("n_r")).cast(d)
    sig2_base = (n * (n + 1.0) / 12.0
                 - F.col("tie_term").cast(d) / (12.0 * (n - 1.0)))

    def _z(gi: str, gj: str):
        ri = F.col(f"r2_{gi}").cast(d) / 2.0 / F.col(f"n_{gi}").cast(d)
        rj = F.col(f"r2_{gj}").cast(d) / 2.0 / F.col(f"n_{gj}").cast(d)
        se = F.sqrt(sig2_base * (1.0 / F.col(f"n_{gi}").cast(d)
                                 + 1.0 / F.col(f"n_{gj}").cast(d)))
        return F.floor((ri - rj) / se * 1000.0).cast("long")

    row = agg.select(
        "n_a", "n_n", "n_r",
        _z("a", "n").alias("z_an"), _z("a", "r").alias("z_ar"),
        _z("n", "r").alias("z_nr"))
    out = row.selectExpr(
        "stack(3, 'A-N', n_a, n_n, z_an, 'A-R', n_a, n_r, z_ar, "
        "'N-R', n_n, n_r, z_nr) AS (pair, n_i, n_j, z_milli)")
    return (out.withColumn(
        "significant_bonf",
        (F.abs(F.col("z_milli")) > 2638).cast("boolean"))
        .orderBy("pair"))


DUNN_SQL = """
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c_a,
         sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS c_n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c_r,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
),
terms AS (
  SELECT *, sum(cnt) OVER (ORDER BY v) - cnt AS before FROM per_v
),
agg AS (
  SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
         CAST(sum(c_n) AS BIGINT) AS n_n,
         CAST(sum(c_r) AS BIGINT) AS n_r,
         sum(CAST(c_a AS HUGEINT) * (2 * before + cnt + 1)) AS r2_a,
         sum(CAST(c_n AS HUGEINT) * (2 * before + cnt + 1)) AS r2_n,
         sum(CAST(c_r AS HUGEINT) * (2 * before + cnt + 1)) AS r2_r,
         sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_term
  FROM terms
),
z AS (
  SELECT n_a, n_n, n_r,
         CAST(n_a + n_n + n_r AS DOUBLE) AS nn,
         CAST(r2_a AS DOUBLE) / 2.0 / CAST(n_a AS DOUBLE) AS rb_a,
         CAST(r2_n AS DOUBLE) / 2.0 / CAST(n_n AS DOUBLE) AS rb_n,
         CAST(r2_r AS DOUBLE) / 2.0 / CAST(n_r AS DOUBLE) AS rb_r,
         CAST(tie_term AS DOUBLE) AS tie
  FROM agg
),
z2 AS (
  SELECT n_a, n_n, n_r, rb_a, rb_n, rb_r,
         nn * (nn + 1.0) / 12.0 - tie / (12.0 * (nn - 1.0)) AS s2
  FROM z
),
pairs AS (
  SELECT 'A-N' AS pair, n_a AS n_i, n_n AS n_j,
         CAST(floor((rb_a - rb_n)
           / sqrt(s2 * (1.0 / CAST(n_a AS DOUBLE)
                        + 1.0 / CAST(n_n AS DOUBLE))) * 1000.0) AS BIGINT)
           AS z_milli
  FROM z2
  UNION ALL
  SELECT 'A-R', n_a, n_r,
         CAST(floor((rb_a - rb_r)
           / sqrt(s2 * (1.0 / CAST(n_a AS DOUBLE)
                        + 1.0 / CAST(n_r AS DOUBLE))) * 1000.0) AS BIGINT)
  FROM z2
  UNION ALL
  SELECT 'N-R', n_n, n_r,
         CAST(floor((rb_n - rb_r)
           / sqrt(s2 * (1.0 / CAST(n_n AS DOUBLE)
                        + 1.0 / CAST(n_r AS DOUBLE))) * 1000.0) AS BIGINT)
  FROM z2
)
SELECT pair, n_i, n_j, z_milli, abs(z_milli) > 2638 AS significant_bonf
FROM pairs ORDER BY pair
"""


# ---------------------------------------------------------------------------
# Bartlett's test — parametric variance homogeneity
# ---------------------------------------------------------------------------

def stats_bartlett_test(spark: SparkSession, sf: str) -> DataFrame:
    """Bartlett's chi-square for equality of the three return-flag
    price variances — the parametric (normality-assuming) sibling of
    stats_levene_brown_forsythe; when both are registered a pipeline
    can report robust and classical verdicts side by side.  Unbiased
    per-group variances come EXACTLY from DECIMAL(38,0) cent sums
    (s2 = (n*Sxx - Sx^2)/(n*(n-1)), cents^2 units); the statistic
    [(N-k)*ln(s2_p) - sum((n_i-1)*ln(s2_i))] / C is one double
    expression (ln over exact-integer-derived doubles, the
    ml_mutual_info_screen precedent).

    Scale: one map-side-combined 3-group moment agg; a 1-row solve."""
    li = t(spark, sf, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    base = li.select(F.col("l_returnflag").alias("g"), cents.alias("x"))
    agg = base.agg(
        *[F.sum(F.when(F.col("g") == g, 1).otherwise(0))
          .alias(f"n_{g.lower()}") for g in ("A", "N", "R")],
        *[F.sum(F.when(F.col("g") == g, F.col("x")).otherwise(0))
          .cast(_DEC).alias(f"sx_{g.lower()}") for g in ("A", "N", "R")],
        *[F.sum(F.when(F.col("g") == g,
                       F.col("x").cast(_DEC) * F.col("x").cast(_DEC))
                .otherwise(F.lit(0).cast(_DEC)))
          .alias(f"sxx_{g.lower()}") for g in ("A", "N", "R")])
    d = "double"

    def s2(g: str):
        n = F.col(f"n_{g}").cast(d)
        return ((n * F.col(f"sxx_{g}").cast(d)
                 - F.col(f"sx_{g}").cast(d) * F.col(f"sx_{g}").cast(d))
                / (n * (n - 1.0)))

    n_tot = sum((F.col(f"n_{g}").cast(d) for g in ("a", "n", "r")),
                F.lit(0.0))
    k = F.lit(3.0)
    sp2 = sum(((F.col(f"n_{g}").cast(d) - 1.0) * s2(g)
               for g in ("a", "n", "r")), F.lit(0.0)) / (n_tot - k)
    num = ((n_tot - k) * F.log(sp2)
           - sum(((F.col(f"n_{g}").cast(d) - 1.0) * F.log(s2(g))
                  for g in ("a", "n", "r")), F.lit(0.0)))
    corr = (1.0 + (sum((1.0 / (F.col(f"n_{g}").cast(d) - 1.0)
                        for g in ("a", "n", "r")), F.lit(0.0))
                   - 1.0 / (n_tot - k)) / (3.0 * (k - 1.0)))
    return agg.select(
        "n_a", "n_n", "n_r",
        *[F.floor(s2(g) / 10000.0).cast("long")
          .alias(f"var_{g}_dollars2") for g in ("a", "n", "r")],
        F.floor(num / corr * 1000.0).cast("long").alias("chi2_milli"),
        F.floor(corr * 1000000.0).cast("long").alias("correction_micro"),
        F.lit(2).cast("int").alias("df"))


BARTLETT_SQL = """
WITH base AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x
  FROM lineitem
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
    sum(CASE WHEN g = 'A' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx_a,
    sum(CASE WHEN g = 'N' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx_n,
    sum(CASE WHEN g = 'R' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx_r,
    sum(CASE WHEN g = 'A' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_a,
    sum(CASE WHEN g = 'N' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_n,
    sum(CASE WHEN g = 'R' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_r
  FROM base
),
v AS (
  SELECT n_a, n_n, n_r,
    (CAST(n_a AS DOUBLE) * CAST(sxx_a AS DOUBLE)
     - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE))
      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) AS s2_a,
    (CAST(n_n AS DOUBLE) * CAST(sxx_n AS DOUBLE)
     - CAST(sx_n AS DOUBLE) * CAST(sx_n AS DOUBLE))
      / (CAST(n_n AS DOUBLE) * (CAST(n_n AS DOUBLE) - 1.0)) AS s2_n,
    (CAST(n_r AS DOUBLE) * CAST(sxx_r AS DOUBLE)
     - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE))
      / (CAST(n_r AS DOUBLE) * (CAST(n_r AS DOUBLE) - 1.0)) AS s2_r,
    CAST(n_a + n_n + n_r AS DOUBLE) AS nt
  FROM agg
),
v2 AS (
  SELECT *,
    ((CAST(n_a AS DOUBLE) - 1.0) * s2_a + (CAST(n_n AS DOUBLE) - 1.0) * s2_n
     + (CAST(n_r AS DOUBLE) - 1.0) * s2_r) / (nt - 3.0) AS sp2,
    1.0 + ((1.0 / (CAST(n_a AS DOUBLE) - 1.0)
            + 1.0 / (CAST(n_n AS DOUBLE) - 1.0)
            + 1.0 / (CAST(n_r AS DOUBLE) - 1.0))
           - 1.0 / (nt - 3.0)) / (3.0 * (3.0 - 1.0)) AS corr
  FROM v
)
SELECT n_a, n_n, n_r,
       CAST(floor(s2_a / 10000.0) AS BIGINT) AS var_a_dollars2,
       CAST(floor(s2_n / 10000.0) AS BIGINT) AS var_n_dollars2,
       CAST(floor(s2_r / 10000.0) AS BIGINT) AS var_r_dollars2,
       CAST(floor(
         ((nt - 3.0) * ln(sp2)
          - ((CAST(n_a AS DOUBLE) - 1.0) * ln(s2_a)
             + (CAST(n_n AS DOUBLE) - 1.0) * ln(s2_n)
             + (CAST(n_r AS DOUBLE) - 1.0) * ln(s2_r))) / corr * 1000.0)
         AS BIGINT) AS chi2_milli,
       CAST(floor(corr * 1000000.0) AS BIGINT) AS correction_micro,
       CAST(2 AS INT) AS df
FROM v2
"""


QUERIES["stats_dunn_posthoc"] = (stats_dunn_posthoc, DUNN_SQL)
QUERIES["stats_bartlett_test"] = (stats_bartlett_test, BARTLETT_SQL)


# ---------------------------------------------------------------------------
# Anderson-Darling k-sample — tail-sensitive distribution equality
# ---------------------------------------------------------------------------

def stats_anderson_darling(spark: SparkSession, sf: str) -> DataFrame:
    """Scholz-Stephens k-sample Anderson-Darling A2 (the tie-adjusted
    midpoint version) across the three return-flag populations of
    l_quantity — the tail-weighted companion to stats_ks_two_sample
    and stats_kruskal_wallis (AD up-weights the distribution tails
    where KS is blind).  With the midpoint quantities doubled
    (M2 = 2*before_i + f_i, B2 = 2*before + l), each grid term is
      (l_j / N) * (N*M2 - n_i*B2)^2 / (B2*(2N - B2) - N*l_j)
    over exact integers; per-row terms are micro-floored before the
    per-sample sums so no float accumulation order leaks in, and
    A2 = (N-1)/N * sum_i S_i / n_i.  Under H0, E[A2] = k-1 = 2.

    Scale: the raw scan reduces to the <= 50-row quantity grid (one
    hash agg); the cumulative window runs there (bounded-domain
    allowlist, same grid as Kruskal-Wallis); everything after is a
    1-row reduce."""
    li = t(spark, sf, "lineitem")
    per_v = (li.select(F.col("l_quantity").cast("long").alias("v"),
                       "l_returnflag")
             .groupBy("v")
             .agg(*[F.sum(F.when(F.col("l_returnflag") == g, 1)
                          .otherwise(0)).alias(f"f_{g.lower()}")
                    for g in ("A", "N", "R")],
                  F.count(F.lit(1)).alias("l")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    grid = per_v.select(
        "*",
        *[(F.sum(f"f_{g}").over(w) - F.col(f"f_{g}")).alias(f"bef_{g}")
          for g in ("a", "n", "r")],
        (F.sum("l").over(w) - F.col("l")).alias("bef"))
    tot = per_v.agg(*[F.sum(f"f_{g}").alias(f"n_{g}")
                      for g in ("a", "n", "r")],
                    F.sum("l").alias("nn"))
    j = grid.crossJoin(F.broadcast(tot))
    d = "double"
    b2 = (2 * F.col("bef") + F.col("l")).cast(d)
    nN = F.col("nn").cast(d)
    den = b2 * (2.0 * nN - b2) - nN * F.col("l").cast(d)

    def term(g: str):
        m2 = (2 * F.col(f"bef_{g}") + F.col(f"f_{g}")).cast(d)
        num = nN * m2 - F.col(f"n_{g}").cast(d) * b2
        return F.sum(F.when(
            den > 0,
            F.floor(F.col("l").cast(d) / nN * num * num / den
                    * 1000000.0).cast("long")).otherwise(0)).alias(f"s_{g}")

    s = (j.groupBy("n_a", "n_n", "n_r", "nn")
         .agg(term("a"), term("n"), term("r"),
              F.count(F.lit(1)).alias("n_values")))
    a2 = ((nN - 1.0) / nN
          * sum((F.col(f"s_{g}").cast(d) / 1000000.0
                 / F.col(f"n_{g}").cast(d) for g in ("a", "n", "r")),
                F.lit(0.0)))
    return s.select(
        "n_a", "n_n", "n_r", "n_values",
        F.floor(a2 * 1000000.0).cast("long").alias("a2_micro"))


AD_KSAMPLE_SQL = """
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS f_a,
         sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS f_n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS f_r,
         count(*) AS l
  FROM lineitem GROUP BY 1
),
grid AS (
  SELECT *,
         sum(f_a) OVER (ORDER BY v) - f_a AS bef_a,
         sum(f_n) OVER (ORDER BY v) - f_n AS bef_n,
         sum(f_r) OVER (ORDER BY v) - f_r AS bef_r,
         sum(l) OVER (ORDER BY v) - l AS bef
  FROM per_v
),
tot AS (
  SELECT CAST(sum(f_a) AS BIGINT) AS n_a, CAST(sum(f_n) AS BIGINT) AS n_n,
         CAST(sum(f_r) AS BIGINT) AS n_r, CAST(sum(l) AS BIGINT) AS nn
  FROM per_v
),
terms AS (
  SELECT t.n_a, t.n_n, t.n_r, t.nn,
         CAST(2 * g.bef + g.l AS DOUBLE) AS b2,
         CAST(g.l AS DOUBLE) AS l,
         CAST(2 * g.bef_a + g.f_a AS DOUBLE) AS m2_a,
         CAST(2 * g.bef_n + g.f_n AS DOUBLE) AS m2_n,
         CAST(2 * g.bef_r + g.f_r AS DOUBLE) AS m2_r
  FROM grid g CROSS JOIN tot t
),
s AS (
  SELECT n_a, n_n, n_r, nn, count(*) AS n_values,
    sum(CASE WHEN b2 * (2.0 * nn - b2) - nn * l > 0 THEN
      CAST(floor(l / nn * (nn * m2_a - n_a * b2) * (nn * m2_a - n_a * b2)
                 / (b2 * (2.0 * nn - b2) - nn * l) * 1000000.0) AS BIGINT)
      ELSE 0 END) AS s_a,
    sum(CASE WHEN b2 * (2.0 * nn - b2) - nn * l > 0 THEN
      CAST(floor(l / nn * (nn * m2_n - n_n * b2) * (nn * m2_n - n_n * b2)
                 / (b2 * (2.0 * nn - b2) - nn * l) * 1000000.0) AS BIGINT)
      ELSE 0 END) AS s_n,
    sum(CASE WHEN b2 * (2.0 * nn - b2) - nn * l > 0 THEN
      CAST(floor(l / nn * (nn * m2_r - n_r * b2) * (nn * m2_r - n_r * b2)
                 / (b2 * (2.0 * nn - b2) - nn * l) * 1000000.0) AS BIGINT)
      ELSE 0 END) AS s_r
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT n_a, n_n, n_r, n_values,
       CAST(floor(
         (CAST(nn AS DOUBLE) - 1.0) / CAST(nn AS DOUBLE)
         * (CAST(s_a AS DOUBLE) / 1000000.0 / CAST(n_a AS DOUBLE)
            + CAST(s_n AS DOUBLE) / 1000000.0 / CAST(n_n AS DOUBLE)
            + CAST(s_r AS DOUBLE) / 1000000.0 / CAST(n_r AS DOUBLE))
         * 1000000.0) AS BIGINT) AS a2_micro
FROM s
"""


QUERIES["stats_anderson_darling"] = (stats_anderson_darling, AD_KSAMPLE_SQL)


# ---------------------------------------------------------------------------
# TOST equivalence — "are these arms the SAME within a margin?"
# ---------------------------------------------------------------------------

_TOST_MARGIN_CENTS = 50000.0  # +- $500 equivalence margin on mean net rev
_TOST_Z_CRIT_MILLI = 1645     # one-sided z at alpha = 0.05


def stats_tost_equivalence(spark: SparkSession, sf: str) -> DataFrame:
    """Two one-sided tests (TOST) for EQUIVALENCE of PROMO vs
    non-PROMO mean per-item net revenue within +-$500 — the question
    "can we declare the arms interchangeable?", which a failed
    significance test (stats_welch_ttest) does NOT answer.  With the
    Welch standard error from exact DECIMAL cent moments,
    z_lower = (diff + margin)/se and z_upper = (diff - margin)/se;
    equivalence holds iff z_lower > 1.645 AND z_upper < -1.645.

    Scale: the same 6-integer two-group moment reduce as the Welch
    test; one double expression per z."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("tr"))
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 100).cast("long")
    base = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("tr", net.alias("c")))
    g = (base.groupBy("tr")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"),
              F.sum(F.col("c").cast(_DEC) * F.col("c").cast(_DEC))
              .alias("ss")))
    wide = g.agg(*[
        F.sum(F.when(F.col("tr") == tv, F.col(col)).otherwise(
            F.lit(0).cast(_DEC) if col == "ss" else F.lit(0)))
        .alias(f"{col}_{'t' if tv else 'c'}")
        for tv in (True, False) for col in ("n", "s", "ss")])
    d = "double"

    def mom(sfx: str):
        n = F.col(f"n_{sfx}").cast(d)
        mu = F.col(f"s_{sfx}").cast(d) / n
        var = (F.col(f"ss_{sfx}").cast(d) / n - mu * mu) * n / (n - 1.0)
        return n, mu, var

    nt, mt, vt = mom("t")
    nc, mc, vc = mom("c")
    diff = mt - mc
    se = F.sqrt(vt / nt + vc / nc)
    zl = (diff + _TOST_MARGIN_CENTS) / se
    zu = (diff - _TOST_MARGIN_CENTS) / se
    return wide.select(
        F.col("n_t").alias("n_promo"), F.col("n_c").alias("n_other"),
        F.floor(diff * 10.0).cast("long").alias("diff_milli_dollars"),
        F.floor(se * 10.0).cast("long").alias("se_milli_dollars"),
        F.floor(zl * 1000.0).cast("long").alias("z_lower_milli"),
        F.floor(zu * 1000.0).cast("long").alias("z_upper_milli"),
        ((F.floor(zl * 1000.0) > _TOST_Z_CRIT_MILLI)
         & (F.floor(zu * 1000.0) < -_TOST_Z_CRIT_MILLI))
        .alias("equivalent"))


TOST_SQL = f"""
WITH base AS (
  SELECT starts_with(p.p_type, 'PROMO') AS tr,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS c
  FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
),
g AS (
  SELECT tr, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
         sum(CAST(c AS HUGEINT) * c) AS ss
  FROM base GROUP BY tr
),
wide AS (
  SELECT
    CAST(sum(CASE WHEN tr THEN n ELSE 0 END) AS BIGINT) AS n_t,
    CAST(sum(CASE WHEN tr THEN s ELSE 0 END) AS BIGINT) AS s_t,
    sum(CASE WHEN tr THEN ss ELSE 0 END) AS ss_t,
    CAST(sum(CASE WHEN NOT tr THEN n ELSE 0 END) AS BIGINT) AS n_c,
    CAST(sum(CASE WHEN NOT tr THEN s ELSE 0 END) AS BIGINT) AS s_c,
    sum(CASE WHEN NOT tr THEN ss ELSE 0 END) AS ss_c
  FROM g
),
z AS (
  SELECT n_t, n_c,
    CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS diff,
    sqrt(
      (CAST(ss_t AS DOUBLE) / CAST(n_t AS DOUBLE)
       - (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))
         * (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
      * CAST(n_t AS DOUBLE) / (CAST(n_t AS DOUBLE) - 1.0)
      / CAST(n_t AS DOUBLE)
      + (CAST(ss_c AS DOUBLE) / CAST(n_c AS DOUBLE)
         - (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
           * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
        * CAST(n_c AS DOUBLE) / (CAST(n_c AS DOUBLE) - 1.0)
        / CAST(n_c AS DOUBLE)) AS se
  FROM wide
)
SELECT n_t AS n_promo, n_c AS n_other,
       CAST(floor(diff * 10.0) AS BIGINT) AS diff_milli_dollars,
       CAST(floor(se * 10.0) AS BIGINT) AS se_milli_dollars,
       CAST(floor((diff + {_TOST_MARGIN_CENTS}) / se * 1000.0) AS BIGINT)
         AS z_lower_milli,
       CAST(floor((diff - {_TOST_MARGIN_CENTS}) / se * 1000.0) AS BIGINT)
         AS z_upper_milli,
       CAST(floor((diff + {_TOST_MARGIN_CENTS}) / se * 1000.0) AS BIGINT)
         > {_TOST_Z_CRIT_MILLI}
       AND CAST(floor((diff - {_TOST_MARGIN_CENTS}) / se * 1000.0)
                AS BIGINT) < -{_TOST_Z_CRIT_MILLI} AS equivalent
FROM z
"""


# ---------------------------------------------------------------------------
# Sign test — distribution-free paired comparison
# ---------------------------------------------------------------------------

def stats_sign_test(spark: SparkSession, sf: str) -> DataFrame:
    """Paired sign test (normal approximation with continuity
    correction): did per-customer spend move up or down from 1996 to
    1997, for customers active in BOTH years?  Counts the signs of
    exact cent differences (ties dropped, the textbook convention);
    z = (n_pos - n/2 - 0.5*sign) / sqrt(n/4) — the distribution-free
    sibling of a paired t-test, immune to spend's heavy tail.

    Scale: one (custkey, year) hash agg, one per-customer pairing
    (groupBy, not a join), one 4-integer reduce."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = (o.filter(yr.isin(1996, 1997))
           .groupBy("o_custkey")
           .agg(F.sum(F.when(yr == 1996, cents)).alias("v96"),
                F.sum(F.when(yr == 1997, cents)).alias("v97"))
           .filter(F.col("v96").isNotNull() & F.col("v97").isNotNull()))
    s = per.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("v97") > F.col("v96"), 1).otherwise(0))
        .alias("n_pos"),
        F.sum(F.when(F.col("v97") < F.col("v96"), 1).otherwise(0))
        .alias("n_neg"),
        F.sum(F.when(F.col("v97") == F.col("v96"), 1).otherwise(0))
        .alias("n_ties"))
    d = "double"
    n = (F.col("n_pos") + F.col("n_neg")).cast(d)
    x = F.col("n_pos").cast(d)
    z = (x - n / 2.0 - F.signum(x - n / 2.0) * 0.5) / F.sqrt(n / 4.0)
    return s.select("n_pairs", "n_pos", "n_neg", "n_ties",
                    F.floor(z * 1000.0).cast("long").alias("z_milli"))


SIGN_TEST_SQL = """
WITH per AS (
  SELECT o_custkey,
         sum(CASE WHEN year(o_orderdate) = 1996
             THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END)
           AS v96,
         sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END)
           AS v97
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey
),
kept AS (SELECT * FROM per WHERE v96 IS NOT NULL AND v97 IS NOT NULL),
s AS (
  SELECT count(*) AS n_pairs,
         CAST(sum(CASE WHEN v97 > v96 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(sum(CASE WHEN v97 < v96 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg,
         CAST(sum(CASE WHEN v97 = v96 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ties
  FROM kept
)
SELECT n_pairs, n_pos, n_neg, n_ties,
       CAST(floor(
         (CAST(n_pos AS DOUBLE)
          - CAST(n_pos + n_neg AS DOUBLE) / 2.0
          - sign(CAST(n_pos AS DOUBLE)
                 - CAST(n_pos + n_neg AS DOUBLE) / 2.0) * 0.5)
         / sqrt(CAST(n_pos + n_neg AS DOUBLE) / 4.0) * 1000.0)
         AS BIGINT) AS z_milli
FROM s
"""


QUERIES["stats_tost_equivalence"] = (stats_tost_equivalence, TOST_SQL)
QUERIES["stats_sign_test"] = (stats_sign_test, SIGN_TEST_SQL)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank — paired magnitudes, not just signs
# ---------------------------------------------------------------------------

def stats_wilcoxon_signed_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Wilcoxon signed-rank test on the same 1996-vs-1997 per-customer
    spend pairs as stats_sign_test, but using the MAGNITUDE ranks the
    sign test throws away.  Midranks never materialize per pair: on
    the |diff|-cents grid, 2*W+ = sum over values of
    n_pos(v) * (2*before(v) + cnt(v) + 1) exactly (the Kruskal-Wallis
    doubled-rank identity); z uses the tie-corrected variance
    Var = n(n+1)(2n+1)/24 - sum(t^3 - t)/48 and a 0.5 continuity
    correction.  Zero diffs are dropped (textbook convention).

    Scale: one (cust, year) hash agg, one |diff| grid agg, one
    cumulative window on the grid (bounded-domain allowlist —
    distinct |diff| cents), a 1-row reduce."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = (o.filter(yr.isin(1996, 1997))
           .groupBy("o_custkey")
           .agg(F.sum(F.when(yr == 1996, cents)).alias("v96"),
                F.sum(F.when(yr == 1997, cents)).alias("v97"))
           .filter(F.col("v96").isNotNull() & F.col("v97").isNotNull())
           .select((F.col("v97") - F.col("v96")).alias("diff"))
           .filter(F.col("diff") != 0))
    per_v = (per.groupBy(F.abs(F.col("diff")).alias("v"))
             .agg(F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
                  .alias("n_pos_v"),
                  F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    terms = per_v.select(
        "n_pos_v", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    agg = terms.agg(
        F.sum("cnt").alias("n"),
        F.sum("n_pos_v").alias("n_pos"),
        F.sum(F.col("n_pos_v").cast(_DEC)
              * (F.lit(2).cast(_DEC) * F.col("before").cast(_DEC)
                 + F.col("cnt").cast(_DEC) + F.lit(1).cast(_DEC)))
        .alias("w2_pos"),
        F.sum(F.col("cnt").cast(_DEC) * F.col("cnt").cast(_DEC)
              * F.col("cnt").cast(_DEC) - F.col("cnt").cast(_DEC))
        .alias("tie_term"))
    d = "double"
    n = F.col("n").cast(d)
    wp = F.col("w2_pos").cast(d) / 2.0
    mu = n * (n + 1.0) / 4.0
    var = (n * (n + 1.0) * (2.0 * n + 1.0) / 24.0
           - F.col("tie_term").cast(d) / 48.0)
    z = (wp - mu - F.signum(wp - mu) * 0.5) / F.sqrt(var)
    return agg.select(
        "n", "n_pos",
        F.col("w2_pos").cast("long").alias("w_plus_x2"),
        F.col("tie_term").cast("long").alias("tie_term"),
        F.floor(z * 1000.0).cast("long").alias("z_milli"))


WILCOXON_SQL = """
WITH per AS (
  SELECT o_custkey,
         sum(CASE WHEN year(o_orderdate) = 1996
             THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END)
           AS v96,
         sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END)
           AS v97
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey
),
diffs AS (
  SELECT v97 - v96 AS diff FROM per
  WHERE v96 IS NOT NULL AND v97 IS NOT NULL AND v97 <> v96
),
per_v AS (
  SELECT abs(diff) AS v,
         sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS n_pos_v,
         count(*) AS cnt
  FROM diffs GROUP BY 1
),
terms AS (
  SELECT n_pos_v, cnt,
         sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
           AS before
  FROM per_v
),
agg AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(n_pos_v) AS BIGINT) AS n_pos,
         sum(CAST(n_pos_v AS HUGEINT)
             * (2 * CAST(before AS HUGEINT) + cnt + 1)) AS w2_pos,
         sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_term
  FROM terms
)
SELECT n, n_pos,
       CAST(w2_pos AS BIGINT) AS w_plus_x2,
       CAST(tie_term AS BIGINT) AS tie_term,
       CAST(floor(
         (CAST(w2_pos AS DOUBLE) / 2.0
          - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0
          - sign(CAST(w2_pos AS DOUBLE) / 2.0
                 - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
            * 0.5)
         / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                - CAST(tie_term AS DOUBLE) / 48.0)
         * 1000.0) AS BIGINT) AS z_milli
FROM agg
"""


QUERIES["stats_wilcoxon_signed_rank"] = (stats_wilcoxon_signed_rank,
                                         WILCOXON_SQL)


# ---------------------------------------------------------------------------
# Wilson score intervals — honest CIs for small-count rates
# ---------------------------------------------------------------------------

_WILSON_Z = "1.959964"  # two-sided 95% normal quantile, shared literal


def stats_wilson_ci(spark: SparkSession, sf: str) -> DataFrame:
    """95% Wilson score interval for the URGENT-order rate per
    market segment — the rate CI that behaves at small counts and
    rates near 0/1 where the naive Wald interval collapses; the
    standard for conversion-rate dashboards.
    center = (p + z^2/2n) / (1 + z^2/n);
    half = z * sqrt(p(1-p)/n + z^2/4n^2) / (1 + z^2/n).

    Scale: one segment-keyed conditional count (5-row domain), one
    double expression per bound."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    per = (o.join(c, o.o_custkey == c.c_custkey)
           .groupBy(F.col("c_mktsegment").alias("segment"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                      .otherwise(0)).alias("k")))
    d = "double"
    n, k = F.col("n").cast(d), F.col("k").cast(d)
    p = k / n
    z = F.expr(_WILSON_Z)
    z2n = z * z / n
    center = (p + z2n / 2.0) / (1.0 + z2n)
    half = (z * F.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
            / (1.0 + z2n))
    return (per.select(
        "segment", "n", "k",
        F.floor(p * 1000000.0).cast("long").alias("rate_micro"),
        F.floor((center - half) * 1000000.0).cast("long")
        .alias("wilson_lo_micro"),
        F.floor((center + half) * 1000000.0).cast("long")
        .alias("wilson_hi_micro"))
        .orderBy("segment"))


WILSON_SQL = f"""
WITH per AS (
  SELECT c.c_mktsegment AS segment, count(*) AS n,
         CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                  THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
calc AS (
  SELECT segment, n, k,
         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         {_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE) AS z2n,
         CAST(n AS DOUBLE) AS nd
  FROM per
)
SELECT segment, n, k,
       CAST(floor(p * 1000000.0) AS BIGINT) AS rate_micro,
       CAST(floor(((p + z2n / 2.0) / (1.0 + z2n)
         - {_WILSON_Z} * sqrt(p * (1.0 - p) / nd
             + {_WILSON_Z} * {_WILSON_Z} / (4.0 * nd * nd))
           / (1.0 + z2n)) * 1000000.0) AS BIGINT) AS wilson_lo_micro,
       CAST(floor(((p + z2n / 2.0) / (1.0 + z2n)
         + {_WILSON_Z} * sqrt(p * (1.0 - p) / nd
             + {_WILSON_Z} * {_WILSON_Z} / (4.0 * nd * nd))
           / (1.0 + z2n)) * 1000000.0) AS BIGINT) AS wilson_hi_micro
FROM calc
ORDER BY segment
"""


QUERIES["stats_wilson_ci"] = (stats_wilson_ci, WILSON_SQL)


# ---------------------------------------------------------------------------
# Capture-recapture — how big is the corpus we HAVEN'T crawled?
# ---------------------------------------------------------------------------

def stats_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """Chapman capture-recapture estimate of total population size from
    two independent "crawls" of the document corpus (deterministic,
    DISJOINT-SEEDED md5 hash samples: crawl A keeps u1 < 40%, crawl B
    keeps u2 < 40% on a different salt) — the estimator a crawl
    pipeline uses to answer "how much of the web/corpus have we NOT
    seen?" from overlap alone.  N_hat = (n1+1)(n2+1)/(m+1) - 1 with
    variance (n1+1)(n2+1)(n1-m)(n2-m)/((m+1)^2(m+2)); both exact
    integers until two final divisions, and the truth is in the
    fixture so the estimate's error is reported alongside.

    Scale: one scan computing two hash bits, a 4-integer reduce."""
    docs = t(spark, sf, "documents")
    u1 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            1, 15), 16, 10).cast("long")
    u2 = F.conv(F.substring(F.md5(F.concat(F.lit("crawlB:"),
                                           F.col("doc_id").cast("string"))),
                            1, 15), 16, 10).cast("long")
    thr = int((1 << 60) * 0.4)
    flags = docs.select((u1 < thr).cast("int").alias("a"),
                        (u2 < thr).cast("int").alias("b"))
    s = flags.agg(F.count(F.lit(1)).alias("n_true"),
                  F.sum("a").alias("n1"), F.sum("b").alias("n2"),
                  F.sum(F.col("a") * F.col("b")).alias("m"))
    d = "double"
    n1, n2, m = (F.col(x).cast(d) for x in ("n1", "n2", "m"))
    nhat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    var = ((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
           / ((m + 1.0) * (m + 1.0) * (m + 2.0)))
    return s.select(
        "n_true", "n1", "n2", F.col("m").alias("recaptured"),
        F.floor(nhat).cast("long").alias("n_hat"),
        F.floor(F.sqrt(var)).cast("long").alias("se_floor"),
        F.floor((nhat - F.col("n_true").cast(d))
                * 1000000.0 / F.col("n_true").cast(d)).cast("long")
        .alias("rel_err_ppm"))


CAPTURE_SQL = f"""
WITH flags AS (
  SELECT
    CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                    1, 15)) AS BIGINT) < {int((1 << 60) * 0.4)}
         THEN 1 ELSE 0 END AS a,
    CASE WHEN CAST(('0x' || substring(md5('crawlB:'
                    || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              < {int((1 << 60) * 0.4)}
         THEN 1 ELSE 0 END AS b
  FROM documents
),
s AS (
  SELECT count(*) AS n_true, CAST(sum(a) AS BIGINT) AS n1,
         CAST(sum(b) AS BIGINT) AS n2,
         CAST(sum(a * b) AS BIGINT) AS m
  FROM flags
)
SELECT n_true, n1, n2, m AS recaptured,
       CAST(floor((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
                  / (CAST(m AS DOUBLE) + 1.0) - 1.0) AS BIGINT) AS n_hat,
       CAST(floor(sqrt((CAST(n1 AS DOUBLE) + 1.0)
                       * (CAST(n2 AS DOUBLE) + 1.0)
                       * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
                       * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
                       / ((CAST(m AS DOUBLE) + 1.0)
                          * (CAST(m AS DOUBLE) + 1.0)
                          * (CAST(m AS DOUBLE) + 2.0)))) AS BIGINT)
         AS se_floor,
       CAST(floor(((CAST(n1 AS DOUBLE) + 1.0)
                   * (CAST(n2 AS DOUBLE) + 1.0)
                   / (CAST(m AS DOUBLE) + 1.0) - 1.0
                   - CAST(n_true AS DOUBLE))
                  * 1000000.0 / CAST(n_true AS DOUBLE)) AS BIGINT)
         AS rel_err_ppm
FROM s
"""


QUERIES["stats_capture_recapture"] = (stats_capture_recapture, CAPTURE_SQL)


# ---------------------------------------------------------------------------
# Benjamini-Yekutieli — FDR under arbitrary dependence
# ---------------------------------------------------------------------------

from statistics import NormalDist as _ND

from storagetapper_spark.plans import stats as _stats

_BY_M = _stats._BH_M
_BY_C = sum(1.0 / j for j in range(1, _BY_M + 1))  # harmonic H_m
_BY_THR_MICRO = [
    int(_ND().inv_cdf(1.0 - 0.05 * i / (2.0 * _BY_M * _BY_C)) * 1e6)
    for i in range(1, _BY_M + 1)]


def stats_fdr_by(spark: SparkSession, sf: str) -> DataFrame:
    """Benjamini-Yekutieli FDR step-up over the same 25 per-brand
    |z| tests as stats_fdr_bh — the variant that stays valid under
    ARBITRARY dependence between the tests (BH's positive-dependence
    assumption dropped) by shrinking alpha by the harmonic factor
    c(m) = sum 1/i ~ ln m.  Identical walk, stricter literal
    thresholds Φ⁻¹(1 - α·i/(2·m·c(m))) (stdlib inv_cdf at module
    import, never libm at query time); BY can only reject a subset of
    BH's rejections, which the property test asserts.

    Scale: shares _brand_z's one moment aggregation; the step-up walk
    is two windows on the 25-row brand table (allowlisted domain)."""
    zt = _stats._brand_z(spark, sf)
    thr = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(_BY_THR_MICRO)],
        "rk bigint, thr_micro bigint")
    ranked = (zt.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.desc("abs_z_micro"), F.asc("p_brand"))))
        .join(F.broadcast(thr), "rk"))
    istar = F.max(F.when(F.col("abs_z_micro") >= F.col("thr_micro"),
                         F.col("rk"))).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    return (ranked.select(
        "p_brand", "n", "abs_z_micro", "rk", "thr_micro",
        (F.col("rk") <= F.coalesce(istar, F.lit(0))).alias("rejected"))
        .orderBy("rk"))


# the oracle is BH's SQL verbatim with the threshold VALUES swapped —
# guaranteed to share the z construction and the step-up walk
_BH_VALUES = ", ".join(f"({i + 1}, {v})"
                       for i, v in enumerate(_stats._BH_THR_MICRO))
_BY_VALUES = ", ".join(f"({i + 1}, {v})"
                       for i, v in enumerate(_BY_THR_MICRO))
assert _BH_VALUES in _stats.BH_SQL
BY_SQL = _stats.BH_SQL.replace(_BH_VALUES, _BY_VALUES)


QUERIES["stats_fdr_by"] = (stats_fdr_by, BY_SQL)


# ---------------------------------------------------------------------------
# Exact trimmed mean — the robust-center sibling of winsorized_prices
# ---------------------------------------------------------------------------

_TRIM_PCT_MILLI = 50  # 5% per tail


def agg_trimmed_mean_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 5%-per-tail trimmed mean of the per-item price — the
    robust center that DROPS the tails winsorized_prices clamps.
    k = floor(0.05 * n) rows leave each tail; the trimmed sum comes
    from the cumulative cents-value grid with exact PARTIAL boundary
    terms (a boundary value keeps cnt - overlap copies), so the result
    is an integer ratio — no per-row rank ever materializes.

    Scale: one value-grid aggregate + one cumulative window (bounded
    cents domain, the stats_ks_two_sample allowlist shape), then a
    1-row reduce."""
    li = t(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_v = (li.select(cents.alias("v"))
             .groupBy("v").agg(F.count(F.lit(1)).alias("cnt")))
    # r10 (guide §1.2): n comes from an unbounded frame on the SAME
    # single-partition ordering as the cumulative sum — one lineitem
    # scan + one window instead of per_v evaluated twice (tot agg +
    # cum) and a crossJoin; the integers are identical.
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                            Window.unboundedFollowing)
    cum = (per_v
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(w_all))
           .withColumn("k", F.expr(
               f"n * {_TRIM_PCT_MILLI} div 1000").cast("long")))
    # copies of value v surviving the trim: cnt minus the overlap with
    # the bottom-k range [1, k] and the top-k range (n-k, n]
    before = F.col("cum") - F.col("cnt")
    lo_cut = F.greatest(F.lit(0), F.col("k") - before)
    hi_cut = F.greatest(F.lit(0),
                        F.col("cum") - (F.col("n") - F.col("k")))
    keep = F.greatest(F.lit(0), F.col("cnt") - lo_cut - hi_cut)
    s = cum.agg(
        F.max("n").alias("n"), F.max("k").alias("k_per_tail"),
        F.sum(keep).alias("n_kept"),
        F.sum(keep.cast(_DEC) * F.col("v").cast(_DEC)).alias("ksum"))
    return s.select(
        "n", "k_per_tail", F.col("n_kept").cast("long").alias("n_kept"),
        F.expr("CAST(ksum div n_kept AS BIGINT)")
        .alias("trimmed_mean_cents"),
        F.expr("CAST(ksum * 1000 div n_kept AS BIGINT)")
        .alias("trimmed_mean_milli_cents"))


TRIMMED_SQL = f"""
WITH per_v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM per_v),
cum AS (
  SELECT v, cnt,
         sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         t.n, t.n * {_TRIM_PCT_MILLI} // 1000 AS k
  FROM per_v CROSS JOIN tot t
),
kept AS (
  SELECT n, k,
         greatest(0, cnt - greatest(0, k - (cum - cnt))
                  - greatest(0, cum - (n - k))) AS keep, v
  FROM cum
),
s AS (
  SELECT CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT)
           AS k_per_tail,
         CAST(sum(keep) AS BIGINT) AS n_kept,
         sum(CAST(keep AS HUGEINT) * v) AS ksum
  FROM kept
)
SELECT n, k_per_tail, n_kept,
       CAST(ksum // n_kept AS BIGINT) AS trimmed_mean_cents,
       CAST(ksum * 1000 // n_kept AS BIGINT) AS trimmed_mean_milli_cents
FROM s
"""


QUERIES["agg_trimmed_mean_exact"] = (agg_trimmed_mean_exact, TRIMMED_SQL)
