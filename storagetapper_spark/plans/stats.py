"""Statistical-inference batch: the distribution-comparison tests an
analytics engine is asked for once the descriptive stats exist —
two-sample Kolmogorov-Smirnov, Mann-Whitney rank-sum, chi-square
independence (+ Cramér's V), a sequential probability ratio test
(SPRT) backtest, and a Poisson-bootstrap confidence interval.

Exactness discipline (SCALE.md rounding-pitfalls list): every test
statistic is assembled from EXACT integer counts; cross-engine floats
appear only as (a) per-cell terms floored to integer micro-units
BEFORE the final sum (order-independent, the price_anova pattern), or
(b) a single double expression over exact integers written with
byte-identical literals in both engines (IEEE ops on equal inputs are
deterministic).  Nothing here depends on libm: logs are precomputed
Python literals embedded in both the Spark plan and the oracle SQL.

Scale shapes (100 TB):
- KS / Mann-Whitney reduce the fact table to a per-distinct-VALUE count
  grid first (map-side combinable), so the ordered cumulative window
  runs over the value grid (price grid / quantity grid), never over
  rows — grid size is data-type-bounded, not data-size-bounded.
- Chi-square is a handful of keyed counts + broadcast margins.
- SPRT is inherently sequential (that is the point of the test); the
  batch form backtests the decision boundary with one per-arm ordered
  window.  The production form is the 2-counters-per-arm streaming
  state this query's cumulative columns simulate.
- The Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
  Massive Data Streams", Google 2012) is THE one-pass bootstrap: each
  row draws its replicate multiplicities independently from
  Poisson(1) — deterministic here via md5 — so 64 resamples cost one
  64-way explode into a map-side-combined agg, never 64 data passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

# ---------------------------------------------------------------- KS --

_DEC = "decimal(19,0)"


def stats_ks_two_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample KS distance between the extended-price distributions
    of returned (R) vs shipped-clean (N) line items.

    D = max_x |F_R(x) − F_N(x)| computed on the integer lattice:
    |cum_R·n_N − cum_N·n_R| in DECIMAL(38,0), so the max and its argmax
    are exact; only the final D value divides (one double op).  The
    cumulative window runs over DISTINCT price cents (grid-bounded)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_v = (li.select(cents.alias("v"), "l_returnflag")
             .groupBy("v")
             .agg(F.sum(F.when(F.col("l_returnflag") == "R", 1)
                        .otherwise(0)).alias("c_r"),
                  F.sum(F.when(F.col("l_returnflag") == "N", 1)
                        .otherwise(0)).alias("c_n")))
    tot = per_v.agg(F.sum("c_r").alias("n_r"), F.sum("c_n").alias("n_n"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = (per_v.select(
        "v",
        F.sum("c_r").over(w).alias("cum_r"),
        F.sum("c_n").over(w).alias("cum_n"))
        .crossJoin(F.broadcast(tot))
        .select("v", "n_r", "n_n",
                F.abs(F.col("cum_r").cast(_DEC) * F.col("n_n").cast(_DEC)
                      - F.col("cum_n").cast(_DEC)
                      * F.col("n_r").cast(_DEC)).alias("diff")))
    maxd = cum.agg(F.max("diff").alias("maxd"))
    arg = (cum.join(F.broadcast(maxd), F.col("diff") == F.col("maxd"))
           .groupBy("n_r", "n_n", "maxd")
           .agg(F.min("v").alias("at_cents")))
    ks_micro = F.floor(F.col("maxd").cast("double") * 1000000.0
                       / (F.col("n_r").cast("double")
                          * F.col("n_n").cast("double"))).cast("long")
    return arg.select("n_r", "n_n", ks_micro.alias("ks_d_micro"),
                      "at_cents")


KS_SQL = """
WITH per_v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c_r,
         sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS c_n
  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
),
tot AS (SELECT sum(c_r) AS n_r, sum(c_n) AS n_n FROM per_v),
cum AS (
  SELECT v, t.n_r, t.n_n,
         abs(CAST(sum(c_r) OVER w AS HUGEINT) * CAST(t.n_n AS HUGEINT)
             - CAST(sum(c_n) OVER w AS HUGEINT) * CAST(t.n_r AS HUGEINT))
           AS diff
  FROM per_v CROSS JOIN tot t
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
),
m AS (SELECT max(diff) AS maxd FROM cum)
SELECT CAST(c.n_r AS BIGINT) AS n_r, CAST(c.n_n AS BIGINT) AS n_n,
       CAST(floor(CAST(m.maxd AS DOUBLE) * 1000000.0
                  / (CAST(c.n_r AS DOUBLE) * CAST(c.n_n AS DOUBLE)))
            AS BIGINT) AS ks_d_micro,
       min(c.v) AS at_cents
FROM cum c CROSS JOIN m
WHERE c.diff = m.maxd
GROUP BY c.n_r, c.n_n, m.maxd
"""

# ------------------------------------------------------ Mann-Whitney --


def stats_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) comparing quantity distributions of
    returned (R) vs clean (N) line items, with the exact tie-corrected
    normal approximation.

    Midranks never materialize per row: on the per-value grid,
    2·R_R = Σ_v c_R(v)·(2·before(v) + cnt(v) + 1) is an exact integer
    identity, so U, the tie term Σ(t³−t), and the z-score all derive
    from integer aggregates (z is one double expression, identical in
    both engines)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    per_v = (li.select(F.col("l_quantity").cast("long").alias("v"),
                       "l_returnflag")
             .groupBy("v")
             .agg(F.sum(F.when(F.col("l_returnflag") == "R", 1)
                        .otherwise(0)).alias("c_r"),
                  F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    terms = per_v.select(
        "v", "c_r", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    agg = terms.agg(
        F.sum("c_r").alias("n_r"),
        (F.sum("cnt") - F.sum("c_r")).alias("n_n"),
        F.sum(F.col("c_r").cast(_DEC)
              * (F.lit(2).cast(_DEC) * F.col("before").cast(_DEC)
                 + F.col("cnt").cast(_DEC) + F.lit(1).cast(_DEC)))
        .alias("r2"),
        F.sum(F.col("cnt").cast(_DEC) * F.col("cnt").cast(_DEC)
              * F.col("cnt").cast(_DEC)
              - F.col("cnt").cast(_DEC)).alias("tie_term"))
    u2 = (F.col("r2") - F.col("n_r").cast(_DEC)
          * (F.col("n_r").cast(_DEC) + F.lit(1).cast(_DEC)))
    nr, nn = F.col("n_r").cast("double"), F.col("n_n").cast("double")
    n = nr + nn
    var = nr * nn / 12.0 * ((n + 1.0)
                            - F.col("tie_term").cast("double")
                            / (n * (n - 1.0)))
    z = ((F.col("u_r_x2").cast("double") - nr * nn) / 2.0) / F.sqrt(var)
    return (agg.withColumn("u_r_x2", u2.cast("long"))
            .select("n_r", "n_n", "u_r_x2",
                    F.col("tie_term").cast("long").alias("tie_term"),
                    F.floor(z * 1000000.0).cast("long").alias("z_micro")))


MW_SQL = """
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c_r,
         count(*) AS cnt
  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
),
terms AS (
  SELECT v, c_r, cnt,
         sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
           AS before
  FROM per_v
),
agg AS (
  SELECT sum(c_r) AS n_r, sum(cnt) - sum(c_r) AS n_n,
         sum(CAST(c_r AS HUGEINT) * (2 * CAST(before AS HUGEINT)
                                     + CAST(cnt AS HUGEINT) + 1)) AS r2,
         sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
             * CAST(cnt AS HUGEINT) - CAST(cnt AS HUGEINT)) AS tie_term
  FROM terms
)
SELECT CAST(n_r AS BIGINT) AS n_r, CAST(n_n AS BIGINT) AS n_n,
       CAST(r2 - CAST(n_r AS HUGEINT) * (CAST(n_r AS HUGEINT) + 1)
            AS BIGINT) AS u_r_x2,
       CAST(tie_term AS BIGINT) AS tie_term,
       CAST(floor(
         ((CAST(r2 - CAST(n_r AS HUGEINT) * (CAST(n_r AS HUGEINT) + 1)
                AS DOUBLE) - CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))
          / 2.0)
         / sqrt(CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE) / 12.0
                * ((CAST(n_r AS DOUBLE) + CAST(n_n AS DOUBLE) + 1.0)
                   - CAST(tie_term AS DOUBLE)
                     / ((CAST(n_r AS DOUBLE) + CAST(n_n AS DOUBLE))
                        * (CAST(n_r AS DOUBLE) + CAST(n_n AS DOUBLE)
                           - 1.0))))
         * 1000000.0) AS BIGINT) AS z_micro
FROM agg
"""

# -------------------------------------------------------- chi-square --


def stats_chi_square(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square test of independence for order priority × status,
    with Cramér's V effect size.

    Per-cell terms 10⁶·(O·N − R·C)²/(R·C·N) are floored to integer
    micros BEFORE the (≤15-row) final sum — order-independent across
    partitions and engines (the price_anova pattern); margins join
    broadcast."""
    o = t(spark, sf, "orders")
    cells = (o.groupBy(F.col("o_orderpriority").alias("pri"),
                       F.col("o_orderstatus").alias("st"))
             .agg(F.count(F.lit(1)).alias("obs")))
    rows = cells.groupBy("pri").agg(F.sum("obs").alias("rtot"))
    cols = cells.groupBy("st").agg(F.sum("obs").alias("ctot"))
    tot = cells.agg(F.sum("obs").alias("n"),
                    F.countDistinct("pri").alias("n_pri"),
                    F.countDistinct("st").alias("n_st"))
    j = (cells.join(F.broadcast(rows), "pri")
         .join(F.broadcast(cols), "st")
         .crossJoin(F.broadcast(tot)))
    o_, n_ = F.col("obs").cast("double"), F.col("n").cast("double")
    r_, c_ = F.col("rtot").cast("double"), F.col("ctot").cast("double")
    cell_micro = F.floor(
        1000000.0 * (o_ * n_ - r_ * c_) * (o_ * n_ - r_ * c_)
        / (r_ * c_ * n_)).cast("long")
    agg = (j.groupBy("n", "n_pri", "n_st")
           .agg(F.count(F.lit(1)).alias("n_cells"),
                F.sum(cell_micro).alias("chi2_micro")))
    dof = ((F.col("n_pri") - 1) * (F.col("n_st") - 1)).cast("long")
    v = F.sqrt(F.col("chi2_micro").cast("double") / 1000000.0
               / (F.col("n").cast("double")
                  * F.least(F.col("n_pri") - 1,
                            F.col("n_st") - 1).cast("double")))
    return agg.select(F.col("n").alias("n_orders"), "n_cells",
                      dof.alias("dof"), "chi2_micro",
                      F.floor(v * 1000000.0).cast("long")
                      .alias("cramers_v_micro"))


CHI2_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS obs
  FROM orders GROUP BY 1, 2
),
r AS (SELECT pri, sum(obs) AS rtot FROM cells GROUP BY 1),
c AS (SELECT st, sum(obs) AS ctot FROM cells GROUP BY 1),
tot AS (SELECT sum(obs) AS n, count(DISTINCT pri) AS n_pri,
               count(DISTINCT st) AS n_st FROM cells),
per_cell AS (
  SELECT t.n, t.n_pri, t.n_st,
         CAST(floor(1000000.0
           * (CAST(obs AS DOUBLE) * CAST(t.n AS DOUBLE)
              - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE))
           * (CAST(obs AS DOUBLE) * CAST(t.n AS DOUBLE)
              - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE))
           / (CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE)
              * CAST(t.n AS DOUBLE))) AS BIGINT) AS cell_micro
  FROM cells
  JOIN r USING (pri) JOIN c USING (st) CROSS JOIN tot t
)
SELECT CAST(n AS BIGINT) AS n_orders, count(*) AS n_cells,
       CAST((n_pri - 1) * (n_st - 1) AS BIGINT) AS dof,
       CAST(sum(cell_micro) AS BIGINT) AS chi2_micro,
       CAST(floor(sqrt(CAST(sum(cell_micro) AS DOUBLE) / 1000000.0
                       / (CAST(n AS DOUBLE)
                          * CAST(least(n_pri - 1, n_st - 1) AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS cramers_v_micro
FROM per_cell GROUP BY n, n_pri, n_st
"""

# --------------------------------------------------------------- SPRT --

# H0: p = 0.4, H1: p = 0.5, alpha = beta = 0.05.  Log-likelihood-ratio
# increments and Wald boundaries precomputed in Python so both engines
# use byte-identical double literals (libm log() may differ per engine).
_LA = 0.22314355131420976    # ln(0.5 / 0.4)   — success increment
_LB = -0.1823215567939546    # ln(0.5 / 0.6)   — failure increment
_HI = 2.9444389791664403     # ln((1-beta)/alpha) = ln(19)
_LO = -2.9444389791664403    # ln(beta/(1-alpha)) = -ln(19)


def stats_sprt_ab(spark: SparkSession, sf: str) -> DataFrame:
    """Wald SPRT backtest over the event stream: per experiment arm
    (user-id parity), is the purchase rate among view/purchase trials
    0.5 (H1) rather than 0.4 (H0)?  Walks the cumulative LLR in event
    order and reports the FIRST boundary crossing.

    The LLR at trial t is s·LA + f·LB with exact integer cumulative
    counts s, f — one fused multiply-free double expression, identical
    across engines.  Batch form of the production 2-counters-per-arm
    streaming state (the sequential test's whole point is that the
    crossing decision needs only those counters).

    Row bound (VERDICT r5 #5): the per-trial walk is TWO-PASS, never
    one per-arm partition over all trials.  Pass 1 aggregates exact
    (s, f) per (arm, day) — map-side-combined — and cascades per-day
    offsets with an arm-partitioned window over the DAY table
    (calendar-bounded: ≤ #days rows per arm).  Pass 2 walks trials in
    partitions keyed by (arm, day) — bounded by one day's trial volume
    — seeded by the day offset, producing the identical cumulative
    (s, f) path (exact integer adds are associative).  First-crossing
    selection is the same two-level argmin: per-(arm, day) first
    crossing, then per-arm first day among ≤ #days candidates.  The
    guard test (test_stats_inference) asserts only day-aggregated
    windows are arm-only-partitioned."""
    ev = (t(spark, sf, "events")
          .filter(F.col("event_type").isin("view", "purchase")))
    base = ev.select(
        (F.col("user_id") % 2).alias("arm"), "ts", "event_id",
        F.to_date("ts").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("is_s"))
    daily = (base.groupBy("arm", "day")
             .agg(F.sum("is_s").alias("s_day"),
                  F.sum(1 - F.col("is_s")).alias("f_day")))
    w_days = (Window.partitionBy("arm").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, -1))
    offsets = daily.select(
        "arm", "day",
        F.coalesce(F.sum("s_day").over(w_days), F.lit(0)).alias("s_off"),
        F.coalesce(F.sum("f_day").over(w_days), F.lit(0)).alias("f_off"))
    w_in = (Window.partitionBy("arm", "day").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    trials = (base.join(offsets, ["arm", "day"])
              .select("arm", "day", "ts", "event_id",
                      (F.col("s_off") + F.sum("is_s").over(w_in))
                      .alias("s"),
                      (F.col("f_off") + F.sum(1 - F.col("is_s")).over(w_in))
                      .alias("f")))
    llr = (F.col("s").cast("double") * F.lit(_LA)
           + F.col("f").cast("double") * F.lit(_LB))
    crossed = trials.filter((llr >= F.lit(_HI)) | (llr <= F.lit(_LO)))
    # two-level argmin: first crossing within each (arm, day) partition
    # (day-bounded), then the earliest day among ≤ #days candidates
    day_first = (crossed
                 .withColumn("rn", F.row_number().over(
                     Window.partitionBy("arm", "day")
                     .orderBy("ts", "event_id")))
                 .filter(F.col("rn") == 1))
    first = (day_first
             .withColumn("rd", F.row_number().over(
                 Window.partitionBy("arm").orderBy("day")))
             .filter(F.col("rd") == 1)
             .select("arm",
                     F.when(llr >= F.lit(_HI), F.lit("accept_h1"))
                     .otherwise(F.lit("accept_h0")).alias("decision"),
                     (F.col("s") + F.col("f")).alias("n_at_decision"),
                     F.col("s").alias("s_at_decision")))
    totals = (base.groupBy("arm")
              .agg(F.count(F.lit(1)).alias("n_trials"),
                   F.sum("is_s").alias("n_success")))
    return (totals.join(first, "arm", "left")
            .select("arm", "n_trials", "n_success",
                    F.coalesce("decision", F.lit("continue"))
                    .alias("decision"),
                    "n_at_decision", "s_at_decision")
            .orderBy("arm"))


SPRT_SQL = f"""
WITH trials AS (
  SELECT user_id % 2 AS arm, ts, event_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              OVER w AS BIGINT) AS s,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
              OVER w AS BIGINT) AS f
  FROM events WHERE event_type IN ('view', 'purchase')
  WINDOW w AS (PARTITION BY user_id % 2 ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
crossed AS (
  SELECT arm, ts, event_id, s, f,
         CAST(s AS DOUBLE) * {_LA!r} + CAST(f AS DOUBLE) * {_LB!r}
           AS llr
  FROM trials
  WHERE CAST(s AS DOUBLE) * {_LA!r} + CAST(f AS DOUBLE) * {_LB!r}
          >= {_HI!r}
     OR CAST(s AS DOUBLE) * {_LA!r} + CAST(f AS DOUBLE) * {_LB!r}
          <= {_LO!r}
),
first AS (
  SELECT arm,
         CASE WHEN llr >= {_HI!r} THEN 'accept_h1'
              ELSE 'accept_h0' END AS decision,
         s + f AS n_at_decision, s AS s_at_decision,
         row_number() OVER (PARTITION BY arm ORDER BY ts, event_id)
           AS rn
  FROM crossed
),
totals AS (
  SELECT arm, count(*) AS n_trials, max(s) AS n_success
  FROM trials GROUP BY 1
)
SELECT t.arm, t.n_trials, t.n_success,
       coalesce(f.decision, 'continue') AS decision,
       f.n_at_decision, f.s_at_decision
FROM totals t LEFT JOIN (SELECT * FROM first WHERE rn = 1) f
  ON t.arm = f.arm
ORDER BY t.arm
"""

# ---------------------------------------------------------- bootstrap --

_B = 64  # bootstrap replicates
# Poisson(1) inverse-CDF thresholds on the 15-bit integer grid:
# t_k = round(P(X <= k) * 32768), k = 0..6; a 15-bit md5-derived
# uniform v draws w = min{k : v < t_k} (else 7).  Integer-only, so the
# draw is EXACT cross-engine — no float thresholds at all.  The grid
# quantizes each CDF point by < 3e-5 and truncates the tail beyond 7
# (P ≈ 1e-6): invisible to a bootstrap, which is a Monte-Carlo
# approximation to begin with.
_POIS_T15 = [12055, 24109, 30137, 32146, 32648, 32749, 32765]


def stats_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the mean order total.

    Each (order, replicate) pair draws a Poisson(1) multiplicity from a
    deterministic md5-derived 15-bit uniform (engine-portable,
    reproducible); replicate means are weighted means over exact cents,
    and the CI is the exact interpolated 2.5/97.5 percentile over the
    64 replicate means.  One explode into a map-side-combined agg — a
    single data pass, the Chamandy-style streaming bootstrap.

    Hash economics (measured, sf0.1): one md5+conv per (row, replicate)
    ran 11s and per-replicate hex decoding via ascii() still 8s — the
    string ops were the whole stage.  Instead ONE md5+conv per (row,
    group-of-4) yields a 60-bit integer whose four 15-bit fields are
    independent uniforms: string work happens on B/4 of the rows, and
    the per-replicate draw is two integer ops (shift + mask).  16× less
    hashing than the naive form; measured ~3s."""
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(F.col("o_orderkey").alias("k"), cents.alias("c"))
    grp = base.select(
        "k", "c",
        F.explode(F.sequence(F.lit(0), F.lit(_B // 4 - 1))).alias("g"))
    h60 = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("k").cast("string"), F.col("g").cast("string"))),
        1, 15), 16, 10).cast("long")
    quads = (grp.select("c", "g", h60.alias("h"))
             .select("c", "g", "h",
                     F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")))
    v = F.expr("(h >> (j * 15)) & 32767")
    wexpr = F.lit(7)
    for kk in range(len(_POIS_T15) - 1, -1, -1):
        wexpr = F.when(F.col("v") < F.lit(_POIS_T15[kk]),
                       F.lit(kk)).otherwise(wexpr)
    reps = (quads.select(
        "c", (F.col("g") * 4 + F.col("j")).alias("b"), v.alias("v"))
        .select("c", "b", wexpr.alias("w"))
        .groupBy("b")
        .agg((F.sum(F.col("w") * F.col("c")).cast("double")
              / F.sum("w").cast("double")).alias("mean_c")))
    point = base.agg(
        (F.sum("c").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("mean_all"), F.count(F.lit(1)).alias("n_orders"))
    ci = reps.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.percentile("mean_c", F.lit(0.025)).alias("lo"),
        F.percentile("mean_c", F.lit(0.975)).alias("hi"))
    return (ci.crossJoin(F.broadcast(point))
            .select("n_orders", "n_reps",
                    F.floor(F.col("mean_all") * 1000.0).cast("long")
                    .alias("mean_millicents"),
                    F.floor(F.col("lo") * 1000.0).cast("long")
                    .alias("ci_lo_millicents"),
                    F.floor(F.col("hi") * 1000.0).cast("long")
                    .alias("ci_hi_millicents")))


def _pois_case_sql() -> str:
    branches = "\n".join(
        f"         WHEN v < {thr} THEN {k}"
        for k, thr in enumerate(_POIS_T15))
    return f"CASE\n{branches}\n         ELSE 7 END"


BOOTSTRAP_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
grp AS (
  SELECT k, c, g.range AS g FROM base CROSS JOIN range({_B // 4}) g
),
hashed AS MATERIALIZED (
  -- one md5 + hex parse per (row, group-of-4); MATERIALIZED so the
  -- string work computes once, the per-replicate draw is shift+mask
  SELECT c, g,
         CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || ':'
                                      || CAST(g AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM grp
),
weights AS (
  SELECT c, g * 4 + j AS b,
         {_pois_case_sql()} AS w
  FROM (SELECT c, g, jj.range AS j,
               (h >> (CAST(jj.range AS INTEGER) * 15)) & 32767 AS v
        FROM hashed CROSS JOIN range(4) jj)
),
reps AS (
  SELECT b, CAST(sum(w * c) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
           AS mean_c
  FROM weights GROUP BY b
),
point AS (
  SELECT CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_all,
         count(*) AS n_orders
  FROM base
)
SELECT p.n_orders, count(*) AS n_reps,
       CAST(floor(p.mean_all * 1000.0) AS BIGINT) AS mean_millicents,
       CAST(floor(quantile_cont(r.mean_c, 0.025) * 1000.0) AS BIGINT)
         AS ci_lo_millicents,
       CAST(floor(quantile_cont(r.mean_c, 0.975) * 1000.0) AS BIGINT)
         AS ci_hi_millicents
FROM reps r CROSS JOIN point p
GROUP BY p.n_orders, p.mean_all
"""


# ------------------------------------------- rank correlations ------


def stats_kendall_tau(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall's τ-b between quantity and discount across line items.

    Naive τ is O(n²) pairs; on the (quantity × discount) VALUE GRID it
    is exact from cell counts: concordant/discordant pair totals come
    from 2-D prefix sums over the ~550-cell contingency table (two
    chained windows — cum over discount within quantity, then cum over
    quantity at fixed discount), and tie terms from the margins.  Every
    count is an exact integer (DECIMAL/HUGEINT for the pair products);
    τ-b drops to double in one final expression."""
    li = t(spark, sf, "lineitem")
    cells = (li.groupBy(F.col("l_quantity").cast("long").alias("q"),
                        F.round(F.col("l_discount") * 100).cast("long")
                        .alias("d"))
             .agg(F.count(F.lit(1)).alias("n")))
    # strict 2-D prefix: lt_lt(q,d) = sum of n over q'<q, d'<d
    wd = (Window.partitionBy("q").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, -1))
    with_d = cells.select("q", "d", "n",
                          F.coalesce(F.sum("n").over(wd), F.lit(0))
                          .alias("cum_d_lt"))  # same q, d' < d
    wq = (Window.partitionBy("d").orderBy("q")
          .rowsBetween(Window.unboundedPreceding, -1))
    # over q' < q: totals at d' < d and at d' = d
    pre = with_d.select(
        "q", "d", "n",
        F.coalesce(F.sum("cum_d_lt").over(wq), F.lit(0)).alias("lt_lt"),
        F.coalesce(F.sum("n").over(wq), F.lit(0)).alias("lt_eq"))
    # over q' < q, any d': from quantity margin
    qmarg = (cells.groupBy("q").agg(F.sum("n").alias("nq")))
    wq2 = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    qcum = qmarg.select("q", F.coalesce(F.sum("nq").over(wq2), F.lit(0))
                        .alias("lt_any"))
    j = pre.join(qcum, "q")
    # discordant partner count for a cell: q'<q AND d'>d
    terms = j.select(
        "q", "d", "n",
        (F.col("n").cast(_DEC) * F.col("lt_lt").cast(_DEC)).alias("c"),
        (F.col("n").cast(_DEC)
         * (F.col("lt_any") - F.col("lt_eq") - F.col("lt_lt"))
         .cast(_DEC)).alias("dd"))
    tots = terms.agg(F.sum("c").alias("conc"), F.sum("dd").alias("disc"),
                     F.sum("n").alias("nn"))
    ties_q = (qmarg.agg(F.sum(F.col("nq").cast(_DEC)
                              * (F.col("nq").cast(_DEC) - 1))
                        .alias("tq2")))
    dmarg = cells.groupBy("d").agg(F.sum("n").alias("nd"))
    ties_d = (dmarg.agg(F.sum(F.col("nd").cast(_DEC)
                              * (F.col("nd").cast(_DEC) - 1))
                        .alias("td2")))
    out = tots.crossJoin(F.broadcast(ties_q)).crossJoin(F.broadcast(ties_d))
    n0x2 = (F.col("nn").cast(_DEC) * (F.col("nn").cast(_DEC) - 1))
    tau = ((F.col("conc") - F.col("disc")).cast("double") * 2.0
           / F.sqrt((n0x2 - F.col("tq2")).cast("double")
                    * (n0x2 - F.col("td2")).cast("double")))
    return out.select(
        F.col("nn").cast("long").alias("n_items"),
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        F.floor(tau * 1000000.0).cast("long").alias("tau_b_micro"))


KENDALL_SQL = """
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
with_d AS (
  SELECT q, d, n,
         coalesce(sum(n) OVER (PARTITION BY q ORDER BY d
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS cum_d_lt
  FROM cells
),
pre AS (
  SELECT q, d, n,
         coalesce(sum(cum_d_lt) OVER wq, 0) AS lt_lt,
         coalesce(sum(n) OVER wq, 0) AS lt_eq
  FROM with_d
  WINDOW wq AS (PARTITION BY d ORDER BY q
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
qmarg AS (SELECT q, sum(n) AS nq FROM cells GROUP BY q),
qcum AS (
  SELECT q, coalesce(sum(nq) OVER (ORDER BY q
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0)
           AS lt_any
  FROM qmarg
),
terms AS (
  SELECT p.n, CAST(p.n AS HUGEINT) * p.lt_lt AS c,
         CAST(p.n AS HUGEINT) * (qc.lt_any - p.lt_eq - p.lt_lt) AS dd
  FROM pre p JOIN qcum qc USING (q)
),
tots AS (
  SELECT sum(c) AS conc, sum(dd) AS disc, sum(n) AS nn FROM terms
),
tq AS (SELECT sum(CAST(nq AS HUGEINT) * (nq - 1)) AS tq2 FROM qmarg),
td AS (SELECT sum(CAST(nd AS HUGEINT) * (nd - 1)) AS td2
       FROM (SELECT d, sum(n) AS nd FROM cells GROUP BY d))
SELECT CAST(nn AS BIGINT) AS n_items,
       CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       CAST(floor(CAST(conc - disc AS DOUBLE) * 2.0
                  / sqrt(CAST(CAST(nn AS HUGEINT) * (nn - 1) - tq2
                              AS DOUBLE)
                         * CAST(CAST(nn AS HUGEINT) * (nn - 1) - td2
                                AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS tau_b_micro
FROM tots CROSS JOIN tq CROSS JOIN td
"""


def stats_spearman_rho(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation (tie-corrected = Pearson on midranks)
    between quantity and discount, exact from the value grids.

    Midranks on a grid are (2·before + cnt + 1)/2 — halves, so they
    ride ×2 as exact integers; all Pearson sums (Σr, Σr², Σr_x·r_y)
    are exact DECIMAL/HUGEINT aggregates over cells, and ρ divides
    once at the end."""
    li = t(spark, sf, "lineitem")
    cells = (li.groupBy(F.col("l_quantity").cast("long").alias("q"),
                        F.round(F.col("l_discount") * 100).cast("long")
                        .alias("d"))
             .agg(F.count(F.lit(1)).alias("n")))

    def midranks(marg, key, total_alias):
        w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, 0)
        return marg.select(
            key,
            (2 * (F.sum(total_alias).over(w) - F.col(total_alias))
             + F.col(total_alias) + 1).alias(f"r{key}_x2"))

    qm = midranks(cells.groupBy("q").agg(F.sum("n").alias("nq")),
                  "q", "nq")
    dm = midranks(cells.groupBy("d").agg(F.sum("n").alias("nd")),
                  "d", "nd")
    j = cells.join(F.broadcast(qm), "q").join(F.broadcast(dm), "d")
    sums = j.agg(
        F.sum("n").alias("nn"),
        F.sum(F.col("n").cast(_DEC) * F.col("rq_x2").cast(_DEC))
        .alias("sx"),
        F.sum(F.col("n").cast(_DEC) * F.col("rd_x2").cast(_DEC))
        .alias("sy"),
        F.sum(F.col("n").cast(_DEC) * F.col("rq_x2").cast(_DEC)
              * F.col("rq_x2").cast(_DEC)).alias("sxx"),
        F.sum(F.col("n").cast(_DEC) * F.col("rd_x2").cast(_DEC)
              * F.col("rd_x2").cast(_DEC)).alias("syy"),
        F.sum(F.col("n").cast(_DEC) * F.col("rq_x2").cast(_DEC)
              * F.col("rd_x2").cast(_DEC)).alias("sxy"))
    nn = F.col("nn").cast("double")
    cov = F.col("sxy").cast("double") - (F.col("sx").cast("double")
                                         * F.col("sy").cast("double")
                                         / nn)
    vx = F.col("sxx").cast("double") - (F.col("sx").cast("double")
                                        * F.col("sx").cast("double")
                                        / nn)
    vy = F.col("syy").cast("double") - (F.col("sy").cast("double")
                                        * F.col("sy").cast("double")
                                        / nn)
    rho = cov / F.sqrt(vx * vy)
    return sums.select(F.col("nn").cast("long").alias("n_items"),
                       F.floor(rho * 1000000.0).cast("long")
                       .alias("rho_micro"))


SPEARMAN_SQL = """
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
qm AS (
  SELECT q, 2 * (sum(nq) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
                 - nq) + nq + 1 AS rq_x2
  FROM (SELECT q, sum(n) AS nq FROM cells GROUP BY q)
),
dm AS (
  SELECT d, 2 * (sum(nd) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                 - nd) + nd + 1 AS rd_x2
  FROM (SELECT d, sum(n) AS nd FROM cells GROUP BY d)
),
sums AS (
  SELECT sum(n) AS nn,
         sum(CAST(n AS HUGEINT) * rq_x2) AS sx,
         sum(CAST(n AS HUGEINT) * rd_x2) AS sy,
         sum(CAST(n AS HUGEINT) * rq_x2 * rq_x2) AS sxx,
         sum(CAST(n AS HUGEINT) * rd_x2 * rd_x2) AS syy,
         sum(CAST(n AS HUGEINT) * rq_x2 * rd_x2) AS sxy
  FROM cells JOIN qm USING (q) JOIN dm USING (d)
)
SELECT CAST(nn AS BIGINT) AS n_items,
       CAST(floor((CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(nn AS DOUBLE))
                  / sqrt((CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(nn AS DOUBLE))
                         * (CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                              / CAST(nn AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS rho_micro
FROM sums
"""


# ------------------------------------ causal / experimentation ------


def stats_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences: did PROMO parts' per-item net revenue
    move differently from non-promo parts between 1995 and 1996?

    DiD = (T₉₆−T₉₅) − (C₉₆−C₉₅) on group-mean revenue — the canonical
    2×2 causal panel.  One broadcast dim join tags treatment, one agg
    produces the four cells as exact cent sums + counts; the estimate
    is a single double expression over the eight integers (identical
    both engines), shipped in floor-millicents."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select(
        "p_partkey",
        F.col("p_type").startswith("PROMO").alias("treated"))
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 100).cast("long")
    base = (li.filter(F.year("l_shipdate").isin(1995, 1996))
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("treated",
                    (F.year("l_shipdate") == 1996).alias("post"),
                    net.alias("c")))
    cells = (base.groupBy("treated", "post")
             .agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("n")))
    wide = cells.agg(
        *[F.sum(F.when((F.col("treated") == tr) & (F.col("post") == po),
                       F.col(col)).otherwise(0)).alias(f"{col}_{tag}")
          for (tr, po, tag) in [(True, False, "t_pre"),
                                (True, True, "t_post"),
                                (False, False, "c_pre"),
                                (False, True, "c_post")]
          for col in ("s", "n")])

    def mean(tag):
        return (F.col(f"s_{tag}").cast("double")
                / F.col(f"n_{tag}").cast("double"))

    did = (mean("t_post") - mean("t_pre")) - (mean("c_post")
                                              - mean("c_pre"))
    return wide.select(
        "n_t_pre", "n_t_post", "n_c_pre", "n_c_post",
        F.floor(mean("t_pre") * 1000).cast("long").alias(
            "t_pre_millicents"),
        F.floor(mean("t_post") * 1000).cast("long").alias(
            "t_post_millicents"),
        F.floor(mean("c_pre") * 1000).cast("long").alias(
            "c_pre_millicents"),
        F.floor(mean("c_post") * 1000).cast("long").alias(
            "c_post_millicents"),
        F.floor(did * 1000).cast("long").alias("did_millicents"))


DID_SQL = """
WITH base AS (
  SELECT p.p_type LIKE 'PROMO%' AS treated,
         year(l_shipdate) = 1996 AS post,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS c
  FROM lineitem JOIN part p ON l_partkey = p.p_partkey
  WHERE year(l_shipdate) IN (1995, 1996)
),
cells AS (
  SELECT treated, post, CAST(sum(c) AS BIGINT) AS s, count(*) AS n
  FROM base GROUP BY 1, 2
),
wide AS (
  SELECT
    sum(CASE WHEN treated AND NOT post THEN s ELSE 0 END) AS s_t_pre,
    sum(CASE WHEN treated AND NOT post THEN n ELSE 0 END) AS n_t_pre,
    sum(CASE WHEN treated AND post THEN s ELSE 0 END) AS s_t_post,
    sum(CASE WHEN treated AND post THEN n ELSE 0 END) AS n_t_post,
    sum(CASE WHEN NOT treated AND NOT post THEN s ELSE 0 END) AS s_c_pre,
    sum(CASE WHEN NOT treated AND NOT post THEN n ELSE 0 END) AS n_c_pre,
    sum(CASE WHEN NOT treated AND post THEN s ELSE 0 END) AS s_c_post,
    sum(CASE WHEN NOT treated AND post THEN n ELSE 0 END) AS n_c_post
  FROM cells
)
SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre,
       CAST(n_t_post AS BIGINT) AS n_t_post,
       CAST(n_c_pre AS BIGINT) AS n_c_pre,
       CAST(n_c_post AS BIGINT) AS n_c_post,
       CAST(floor(CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE)
                  * 1000) AS BIGINT) AS t_pre_millicents,
       CAST(floor(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
                  * 1000) AS BIGINT) AS t_post_millicents,
       CAST(floor(CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)
                  * 1000) AS BIGINT) AS c_pre_millicents,
       CAST(floor(CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
                  * 1000) AS BIGINT) AS c_post_millicents,
       CAST(floor(((CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
                    - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
                   - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
                      - CAST(s_c_pre AS DOUBLE)
                        / CAST(n_c_pre AS DOUBLE)))
                  * 1000) AS BIGINT) AS did_millicents
FROM wide
"""


def stats_cuped_adjustment(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction for the user-parity A/B experiment:
    pre-period event value (x) is the covariate for post-period value
    (y); θ = cov(x,y)/var(x) is estimated POOLED across arms, each
    user's adjusted outcome is y − θ·(x − x̄), and the query reports the
    raw vs adjusted arm difference plus the variance-reduction share
    (≈ ρ², the whole point of CUPED — Deng et al. 2013).

    Every moment (Σx, Σy, Σxy, Σx², Σy²) is an exact cent-integer agg
    over per-user pairs; θ, the adjusted means, and the variance ratio
    are final double expressions over those integers."""
    ev = t(spark, sf, "events")
    mid = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = (ev.filter(F.col("event_type").isin("view", "purchase",
                                                   "click"))
                .groupBy((F.col("user_id") % 2).alias("arm"), "user_id")
                .agg(F.sum(F.when(F.col("ts") < mid,
                                  F.round(F.col("value") * 100)
                                  .cast("long")).otherwise(0)).alias("x"),
                     F.sum(F.when(F.col("ts") >= mid,
                                  F.round(F.col("value") * 100)
                                  .cast("long")).otherwise(0))
                     .alias("y")))
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("y").cast(_DEC)).alias("sxy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).alias("sxx"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).alias("syy"))
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("x").alias("sxa"), F.sum("y").alias("sya"))
    j = arms.crossJoin(F.broadcast(mom))
    nd = F.col("n").cast("double")
    theta = ((F.col("sxy").cast("double")
              - F.col("sx").cast("double") * F.col("sy").cast("double")
              / nd)
             / (F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
                / nd))
    xbar = F.col("sx").cast("double") / nd
    raw_mean = F.col("sya").cast("double") / F.col("na").cast("double")
    adj_mean = raw_mean - theta * (F.col("sxa").cast("double")
                                   / F.col("na").cast("double") - xbar)
    # variance-reduction share = rho^2 (pooled)
    corr_num = (F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
                / nd)
    vxx = (F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double") / nd)
    vyy = (F.col("syy").cast("double")
           - F.col("sy").cast("double") * F.col("sy").cast("double") / nd)
    rho2 = corr_num * corr_num / (vxx * vyy)
    return (j.select(
        "arm", "na",
        F.floor(raw_mean * 1000).cast("long").alias("raw_millicents"),
        F.floor(adj_mean * 1000).cast("long").alias("cuped_millicents"),
        F.floor(theta * 1000000.0).cast("long").alias("theta_micro"),
        F.floor(rho2 * 1000000.0).cast("long").alias("var_red_micro"))
        .orderBy("arm"))


CUPED_SQL = """
WITH per_user AS (
  SELECT user_id % 2 AS arm, user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events
  WHERE event_type IN ('view', 'purchase', 'click')
  GROUP BY 1, 2
),
mom AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM per_user
),
arms AS (
  SELECT arm, count(*) AS na,
         CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
  FROM per_user GROUP BY 1
)
SELECT arm, na,
       CAST(floor(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) * 1000)
            AS BIGINT) AS raw_millicents,
       CAST(floor((CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
                   - ((CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      / (CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           / CAST(n AS DOUBLE)))
                     * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
                        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                  * 1000) AS BIGINT) AS cuped_millicents,
       CAST(floor((CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                       / CAST(n AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS theta_micro,
       CAST(floor((CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  * (CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                       / CAST(n AS DOUBLE))
                  / ((CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     * (CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS var_red_micro
FROM arms CROSS JOIN mom
ORDER BY arm
"""


# Normal quantiles as literals (no libm/erf dependence):
_Z_A2 = 1.959963984540054    # z_{0.975} — two-sided alpha = 0.05
_Z_B = 0.8416212335729143    # z_{0.80} — power 80%
_LIFTS_BP = [100, 200, 500]  # absolute lifts, basis points


def stats_power_sample_size(spark: SparkSession, sf: str) -> DataFrame:
    """Experiment power analysis: per-arm sample size required to
    detect a +100/200/500 bp absolute lift over the observed purchase
    rate at alpha=0.05 (two-sided), power 80% — the planning query run
    before stats_sprt_ab/ab_test_conversion start collecting.

    n = (z_{a/2}+z_b)²·(p₁q₁+p₂q₂)/δ² from TWO exact integers (trial
    and success counts) and literal normal quantiles; reports whether
    the CURRENT smaller arm is already powered for each lift."""
    ev = (t(spark, sf, "events")
          .filter(F.col("event_type").isin("view", "purchase")))
    counts = ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .alias("n_arm0"))
    lifts = spark.createDataFrame([(bp,) for bp in _LIFTS_BP],
                                  "lift_bp long")
    j = lifts.crossJoin(F.broadcast(counts))
    p1 = F.col("s").cast("double") / F.col("n").cast("double")
    p2 = p1 + F.col("lift_bp").cast("double") / 10000.0
    z = F.lit(_Z_A2 + _Z_B)
    delta = F.col("lift_bp").cast("double") / 10000.0
    req = F.ceil(z * z * (p1 * (1 - p1) + p2 * (1 - p2))
                 / (delta * delta)).cast("long")
    arm_min = F.least(F.col("n_arm0"), F.col("n") - F.col("n_arm0"))
    return (j.select(
        "lift_bp",
        F.floor(p1 * 1000000.0).cast("long").alias("baseline_micro"),
        req.alias("n_required_per_arm"),
        arm_min.alias("n_current_min_arm"),
        (arm_min >= req).alias("powered"))
        .orderBy("lift_bp"))


POWER_SQL = f"""
WITH counts AS (
  SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s,
         count(*) AS n,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_arm0
  FROM events WHERE event_type IN ('view', 'purchase')
),
lifts AS (SELECT unnest([{", ".join(str(b) for b in _LIFTS_BP)}])
            AS lift_bp)
SELECT CAST(lift_bp AS BIGINT) AS lift_bp,
       CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
            AS BIGINT) AS baseline_micro,
       CAST(ceil({_Z_A2 + _Z_B!r} * {_Z_A2 + _Z_B!r}
                 * ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    + (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                       + CAST(lift_bp AS DOUBLE) / 10000.0)
                      * (1 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                              + CAST(lift_bp AS DOUBLE) / 10000.0)))
                 / ((CAST(lift_bp AS DOUBLE) / 10000.0)
                    * (CAST(lift_bp AS DOUBLE) / 10000.0)))
            AS BIGINT) AS n_required_per_arm,
       CAST(least(n_arm0, n - n_arm0) AS BIGINT) AS n_current_min_arm,
       least(n_arm0, n - n_arm0)
         >= ceil({_Z_A2 + _Z_B!r} * {_Z_A2 + _Z_B!r}
                 * ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    + (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                       + CAST(lift_bp AS DOUBLE) / 10000.0)
                      * (1 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                              + CAST(lift_bp AS DOUBLE) / 10000.0)))
                 / ((CAST(lift_bp AS DOUBLE) / 10000.0)
                    * (CAST(lift_bp AS DOUBLE) / 10000.0)))
         AS powered
FROM lifts CROSS JOIN counts
ORDER BY lift_bp
"""


def stats_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test: is PROMO parts' mean per-item
    net revenue different from non-promo?  (The significance test next
    to stats_diff_in_diff's effect estimate.)

    Six exact integers (n, Σc, Σc² per group, cents in DECIMAL) feed
    one double expression for t and the Welch–Satterthwaite dof —
    identical both engines, micro-floored."""
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
        F.sum(F.when(F.col("tr") == tv, F.col(col)).otherwise(0))
        .alias(f"{col}{tag}")
        for tv, tag in [(True, "1"), (False, "0")]
        for col in ("n", "s", "ss")])

    def stats_for(tag):
        n = F.col(f"n{tag}").cast("double")
        s = F.col(f"s{tag}").cast("double")
        ss = F.col(f"ss{tag}").cast("double")
        var = (ss - s * s / n) / (n - 1.0)
        return n, s / n, var

    n1, m1, v1 = stats_for("1")
    n0, m0, v0 = stats_for("0")
    se1, se0 = v1 / n1, v0 / n0
    tstat = (m1 - m0) / F.sqrt(se1 + se0)
    dof = ((se1 + se0) * (se1 + se0)
           / (se1 * se1 / (n1 - 1.0) + se0 * se0 / (n0 - 1.0)))
    return wide.select(
        F.col("n1").alias("n_promo"), F.col("n0").alias("n_other"),
        F.floor(m1 * 1000).cast("long").alias("mean_promo_millicents"),
        F.floor(m0 * 1000).cast("long").alias("mean_other_millicents"),
        F.floor(tstat * 1000000.0).cast("long").alias("t_micro"),
        F.floor(dof * 1000.0).cast("long").alias("dof_milli"))


WELCH_SQL = """
WITH base AS (
  SELECT p.p_type LIKE 'PROMO%' AS tr,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS c
  FROM lineitem JOIN part p ON l_partkey = p.p_partkey
),
g AS (
  SELECT tr, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
         sum(CAST(c AS HUGEINT) * c) AS ss
  FROM base GROUP BY tr
),
wide AS (
  SELECT sum(CASE WHEN tr THEN n ELSE 0 END) AS n1,
         sum(CASE WHEN tr THEN s ELSE 0 END) AS s1,
         sum(CASE WHEN tr THEN ss ELSE 0 END) AS ss1,
         sum(CASE WHEN NOT tr THEN n ELSE 0 END) AS n0,
         sum(CASE WHEN NOT tr THEN s ELSE 0 END) AS s0,
         sum(CASE WHEN NOT tr THEN ss ELSE 0 END) AS ss0
  FROM g
)
SELECT CAST(n1 AS BIGINT) AS n_promo, CAST(n0 AS BIGINT) AS n_other,
       CAST(floor(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1000)
            AS BIGINT) AS mean_promo_millicents,
       CAST(floor(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1000)
            AS BIGINT) AS mean_other_millicents,
       CAST(floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                  / sqrt(((CAST(ss1 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                             / CAST(n1 AS DOUBLE))
                          / (CAST(n1 AS DOUBLE) - 1.0))
                         / CAST(n1 AS DOUBLE)
                         + ((CAST(ss0 AS DOUBLE)
                             - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                               / CAST(n0 AS DOUBLE))
                            / (CAST(n0 AS DOUBLE) - 1.0))
                           / CAST(n0 AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS t_micro,
       CAST(floor(
         (((CAST(ss1 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
           / CAST(n1 AS DOUBLE))
          + ((CAST(ss0 AS DOUBLE)
              - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)
             / CAST(n0 AS DOUBLE)))
         * (((CAST(ss1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
             / CAST(n1 AS DOUBLE))
            + ((CAST(ss0 AS DOUBLE)
                - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                  / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)
               / CAST(n0 AS DOUBLE)))
         / ((((CAST(ss1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
              / CAST(n1 AS DOUBLE))
             * ((CAST(ss1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
                / CAST(n1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) - 1.0))
            + (((CAST(ss0 AS DOUBLE)
                 - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                   / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)
                / CAST(n0 AS DOUBLE))
               * ((CAST(ss0 AS DOUBLE)
                   - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                     / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)
                  / CAST(n0 AS DOUBLE))
               / (CAST(n0 AS DOUBLE) - 1.0)))
         * 1000.0) AS BIGINT) AS dof_milli
FROM wide
"""


def ml_auc_roc(spark: SparkSession, sf: str) -> DataFrame:
    """ROC-AUC of embedding dimension 0 as a scorer for label=1, via
    the rank identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁·n₀) with midranks on
    the quantized score grid — the standard model-evaluation metric
    computed with the Mann-Whitney machinery (exact integers until the
    final division)."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0))
                  .alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    terms = per_v.select(
        "c_p", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    agg = terms.agg(
        F.sum("c_p").alias("n_pos"),
        (F.sum("cnt") - F.sum("c_p")).alias("n_neg"),
        F.sum(F.col("c_p").cast(_DEC)
              * (F.lit(2).cast(_DEC) * F.col("before").cast(_DEC)
                 + F.col("cnt").cast(_DEC) + F.lit(1).cast(_DEC)))
        .alias("r2"))
    u2 = (F.col("r2") - F.col("n_pos").cast(_DEC)
          * (F.col("n_pos").cast(_DEC) + F.lit(1).cast(_DEC)))
    auc = (u2.cast("double") / 2.0
           / (F.col("n_pos").cast("double")
              * F.col("n_neg").cast("double")))
    return agg.select("n_pos", "n_neg",
                      F.floor(auc * 1000000.0).cast("long")
                      .alias("auc_micro"))


AUC_SQL = """
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
per_v AS (
  SELECT v, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_p,
         count(*) AS cnt
  FROM base GROUP BY v
),
terms AS (
  SELECT c_p, cnt,
         sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
           AS before
  FROM per_v
),
agg AS (
  SELECT sum(c_p) AS n_pos, sum(cnt) - sum(c_p) AS n_neg,
         sum(CAST(c_p AS HUGEINT)
             * (2 * CAST(before AS HUGEINT) + CAST(cnt AS HUGEINT) + 1))
           AS r2
  FROM terms
)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(floor(CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)
                       AS DOUBLE) / 2.0
                  / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS auc_micro
FROM agg
"""


QUERIES = {
    "stats_ks_two_sample": (stats_ks_two_sample, KS_SQL),
    "stats_kendall_tau": (stats_kendall_tau, KENDALL_SQL),
    "stats_spearman_rho": (stats_spearman_rho, SPEARMAN_SQL),
    "stats_diff_in_diff": (stats_diff_in_diff, DID_SQL),
    "stats_cuped_adjustment": (stats_cuped_adjustment, CUPED_SQL),
    "stats_power_sample_size": (stats_power_sample_size, POWER_SQL),
    "stats_welch_ttest": (stats_welch_ttest, WELCH_SQL),
    "ml_auc_roc": (ml_auc_roc, AUC_SQL),
    "stats_mann_whitney": (stats_mann_whitney, MW_SQL),
    "stats_chi_square": (stats_chi_square, CHI2_SQL),
    "stats_sprt_ab": (stats_sprt_ab, SPRT_SQL),
    "stats_bootstrap_ci": (stats_bootstrap_ci, BOOTSTRAP_SQL),
}


# BH step-up z-thresholds Φ⁻¹(1 − α·i/(2m)) for α=0.05, m=25 brands,
# i=1..25, precomputed as LITERALS (the stats_power_sample_size
# discipline: normal quantiles never touch libm at query time, so
# there is no erf to disagree across engines).
_BH_M = 25
_BH_THR_MICRO = [3090232, 2878161, 2747781, 2652069, 2575829, 2512144,
                 2457263, 2408915, 2365618, 2326347, 2290367, 2257129,
                 2226211, 2197286, 2170090, 2144410, 2120071, 2096927,
                 2074854, 2053748, 2033520, 2014090, 1995393, 1977368,
                 1959963]


def stats_fdr_bh(spark: SparkSession, sf: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction across the 25 per-brand
    two-sample z-tests (brand mean list price vs all other brands) —
    the multiple-testing layer every metrics platform runs on top of
    its per-segment tests.

    BH on p-values from one normal test family is EQUIVALENT to
    comparing the rank-i largest |z| against the literal threshold
    Φ⁻¹(1 − α·i/2m): reject ranks 1..i* where i* is the LAST rank
    whose |z| clears its threshold (step-up).  Working in |z| space
    keeps the whole query on exact integer moments + one double z
    expression (micro-floored) and literal thresholds — no erf at
    query time, nothing engine-divergent.

    Scale: per-brand moments are one map-side-combined aggregation;
    the BH walk is two windows over the 25-row brand table (bounded
    domain, registered in the plan-guard allowlist).  The |z| table is
    shared with stats_holm_bonferroni (_brand_z below)."""
    zt = _brand_z(spark, sf)
    thr = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(_BH_THR_MICRO)],
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


BH_SQL = f"""
WITH per AS (
  SELECT p_brand, count(*) AS n,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS s,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS s2
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, sum(s) AS ts,
               sum(s2) AS ts2 FROM per),
zt AS (
  SELECT p_brand, n,
         CAST(floor(abs(
           (CAST(s AS DOUBLE) / n - CAST(ts - s AS DOUBLE) / (tn - n))
           / sqrt(
               ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                 * (CAST(s AS DOUBLE) / n)) / (n - 1)) / n
             + ((CAST(ts2 - s2 AS DOUBLE) - CAST(ts - s AS DOUBLE)
                 * (CAST(ts - s AS DOUBLE) / (tn - n))) / (tn - n - 1))
               / (tn - n))) * 1000000) AS BIGINT) AS abs_z_micro
  FROM per CROSS JOIN tot
),
thr AS (
  SELECT CAST(i.range + 1 AS BIGINT) AS rk,
         CAST(m.v AS BIGINT) AS thr_micro
  FROM range({_BH_M}) i
  JOIN (VALUES {", ".join(f"({i + 1}, {v})"
                          for i, v in enumerate(_BH_THR_MICRO))})
       m(rk, v) ON m.rk = i.range + 1
),
ranked AS (
  SELECT zt.*, ROW_NUMBER() OVER (ORDER BY abs_z_micro DESC,
                                  p_brand ASC) AS rk
  FROM zt
)
SELECT r.p_brand, r.n, r.abs_z_micro, r.rk, thr.thr_micro,
       r.rk <= coalesce(
         max(CASE WHEN r.abs_z_micro >= thr.thr_micro
                  THEN r.rk END) OVER (), 0) AS rejected
FROM ranked r JOIN thr USING (rk)
ORDER BY r.rk
"""


QUERIES["stats_fdr_bh"] = (stats_fdr_bh, BH_SQL)


# Holm step-DOWN z-thresholds Φ⁻¹(1 − α/(2(m−i+1))) — FWER control,
# the conservative sibling of the BH FDR thresholds above; same
# literal-quantile discipline.
_HOLM_THR_MICRO = [3090232, 3078088, 3065383, 3052065, 3038074, 3023341,
                   3007786, 2991316, 2973819, 2955166, 2935199, 2913726,
                   2890511, 2865260, 2837596, 2807033, 2772921, 2734368,
                   2690109, 2638257, 2575829, 2497705, 2393979, 2241402,
                   1959963]


def _brand_z(spark: SparkSession, sf: str) -> DataFrame:
    """Shared per-brand |z| table for the multiple-testing family:
    exact DECIMAL moments → one double z expression, micro-floored
    (stats_fdr_bh's machinery, factored for reuse)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select("p_partkey", "p_brand")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per = (li.join(p, li.l_partkey == p.p_partkey)
           .select("p_brand", cents.alias("c"))
           .groupBy("p_brand")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
                F.sum((F.col("c").cast("decimal(38,0)")
                       * F.col("c")).cast("decimal(38,0)")).alias("s2")))
    tot = per.agg(F.sum("n").alias("tn"), F.sum("s").alias("ts"),
                  F.sum("s2").alias("ts2"))
    j = per.crossJoin(F.broadcast(tot)).select(
        "p_brand", "n", "s", "s2",
        (F.col("tn") - F.col("n")).alias("rn"),
        (F.col("ts") - F.col("s")).alias("rs"),
        (F.col("ts2") - F.col("s2")).alias("rs2"))
    mb = F.col("s").cast("double") / F.col("n").cast("double")
    mr = F.col("rs").cast("double") / F.col("rn").cast("double")
    vb = ((F.col("s2").cast("double")
           - F.col("s").cast("double") * mb)
          / (F.col("n") - 1).cast("double"))
    vr = ((F.col("rs2").cast("double")
           - F.col("rs").cast("double") * mr)
          / (F.col("rn") - 1).cast("double"))
    z = (mb - mr) / F.sqrt(vb / F.col("n").cast("double")
                           + vr / F.col("rn").cast("double"))
    return j.select("p_brand", "n",
                    F.floor(F.abs(z) * 1000000).cast("long")
                    .alias("abs_z_micro"))


def stats_holm_bonferroni(spark: SparkSession, sf: str) -> DataFrame:
    """Holm–Bonferroni step-DOWN over the same 25 per-brand z-tests as
    stats_fdr_bh — familywise-error control where BH controls FDR.
    Step-down semantics: walk ranks 1,2,… while each |z| clears its
    Φ⁻¹(1 − α/(2(m−i+1))) literal threshold; the FIRST failure stops
    everything after it (min failing rank), the mirror image of BH's
    step-up (max passing rank).  Same bounded 25-row windows, same
    no-erf discipline."""
    zt = _brand_z(spark, sf)
    thr = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(_HOLM_THR_MICRO)],
        "rk bigint, thr_micro bigint")
    ranked = (zt.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.desc("abs_z_micro"), F.asc("p_brand"))))
        .join(F.broadcast(thr), "rk"))
    first_fail = F.min(F.when(F.col("abs_z_micro") < F.col("thr_micro"),
                              F.col("rk"))).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    return (ranked.select(
        "p_brand", "n", "abs_z_micro", "rk", "thr_micro",
        (F.col("rk") < F.coalesce(first_fail, F.lit(_BH_M + 1)))
        .alias("rejected"))
        .orderBy("rk"))


HOLM_SQL = f"""
WITH per AS (
  SELECT p_brand, count(*) AS n,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS s,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS s2
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, sum(s) AS ts,
               sum(s2) AS ts2 FROM per),
zt AS (
  SELECT p_brand, n,
         CAST(floor(abs(
           (CAST(s AS DOUBLE) / n - CAST(ts - s AS DOUBLE) / (tn - n))
           / sqrt(
               ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                 * (CAST(s AS DOUBLE) / n)) / (n - 1)) / n
             + ((CAST(ts2 - s2 AS DOUBLE) - CAST(ts - s AS DOUBLE)
                 * (CAST(ts - s AS DOUBLE) / (tn - n))) / (tn - n - 1))
               / (tn - n))) * 1000000) AS BIGINT) AS abs_z_micro
  FROM per CROSS JOIN tot
),
thr AS (
  SELECT CAST(m.rk AS BIGINT) AS rk, CAST(m.v AS BIGINT) AS thr_micro
  FROM (VALUES {", ".join(f"({i + 1}, {v})"
                          for i, v in enumerate(_HOLM_THR_MICRO))})
       m(rk, v)
),
ranked AS (
  SELECT zt.*, ROW_NUMBER() OVER (ORDER BY abs_z_micro DESC,
                                  p_brand ASC) AS rk
  FROM zt
)
SELECT r.p_brand, r.n, r.abs_z_micro, r.rk, thr.thr_micro,
       r.rk < coalesce(
         min(CASE WHEN r.abs_z_micro < thr.thr_micro
                  THEN r.rk END) OVER (), {_BH_M + 1}) AS rejected
FROM ranked r JOIN thr USING (rk)
ORDER BY r.rk
"""


QUERIES["stats_holm_bonferroni"] = (stats_holm_bonferroni, HOLM_SQL)
