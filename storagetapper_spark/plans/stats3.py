"""Statistical-description batch 3: higher central moments (skewness
and excess kurtosis from exact power sums), the standardized
effect-size family (Cohen's d, Hedges' g, Cliff's delta) that turns
"significant" into "how big", and an exact two-sample QQ table — the
distribution-shape diagnostics next to plans/stats.py's tests.

Exactness discipline unchanged: DECIMAL/HUGEINT power sums (the 4th
power of dollar-unit values stays within 38 digits up to ~1e9 rows),
one double expression per statistic with byte-identical literals,
micro-floored outputs.  The QQ table interpolates IN INTEGERS off
the per-group cumulative value grid (percentile_cont's position is
the rational (20 + k(n-1))/20), sidestepping the engines' last-ulp
float-interpolation disagreement entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_DEC = "decimal(38,0)"


def agg_skewness_kurtosis(spark: SparkSession, sf: str) -> DataFrame:
    """Per-return-flag skewness g1 = m3/m2^1.5 and excess kurtosis
    g2 = m4/m2² − 3 of the per-item price (whole dollars), assembled
    from exact integer power sums S1..S4 (DECIMAL(38,0) keeps v⁴ sums
    exact to ~1e9 rows) via the raw→central moment expansion — one
    map-side-combined aggregate, one double expression per group."""
    li = t(spark, sf, "lineitem")
    v = F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long")
    base = li.select(F.col("l_returnflag").alias("g"), v.alias("v"),
                     (v * v).alias("v2"))
    per_g = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum("v2").alias("s2"),
        F.sum(F.col("v2").cast(_DEC) * F.col("v").cast(_DEC)).alias("s3"),
        F.sum(F.col("v2").cast(_DEC) * F.col("v2").cast(_DEC)).alias("s4"))
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (F.col("s3").cast("double") / n
          - 3.0 * mu * F.col("s2").cast("double") / n + 2.0 * mu * mu * mu)
    m4 = (F.col("s4").cast("double") / n
          - 4.0 * mu * F.col("s3").cast("double") / n
          + 6.0 * mu * mu * F.col("s2").cast("double") / n
          - 3.0 * mu * mu * mu * mu)
    return (per_g.select(
        "g", "n",
        F.floor(mu * 1000.0).cast("long").alias("mean_milli"),
        F.floor(F.sqrt(m2) * 1000.0).cast("long").alias("stddev_milli"),
        F.floor(m3 / (m2 * F.sqrt(m2)) * 1000000.0).cast("long")
        .alias("skewness_micro"),
        F.floor((m4 / (m2 * m2) - 3.0) * 1000000.0).cast("long")
        .alias("excess_kurtosis_micro"))
        .orderBy("g"))


SKEW_KURT_SQL = """
WITH base AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v
  FROM lineitem
),
per_g AS (
  SELECT g, count(*) AS n, CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2,
         sum(CAST(v * v AS HUGEINT) * v) AS s3,
         sum(CAST(v * v AS HUGEINT) * (v * v)) AS s4
  FROM base GROUP BY g
),
mom AS (
  SELECT g, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM per_g
),
cen AS (
  SELECT g, n, mu,
         r2 - mu * mu AS m2,
         r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
         r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
            - 3.0 * mu * mu * mu * mu AS m4
  FROM mom
)
SELECT g, n,
       CAST(floor(mu * 1000.0) AS BIGINT) AS mean_milli,
       CAST(floor(sqrt(m2) * 1000.0) AS BIGINT) AS stddev_milli,
       CAST(floor(m3 / (m2 * sqrt(m2)) * 1000000.0) AS BIGINT)
         AS skewness_micro,
       CAST(floor((m4 / (m2 * m2) - 3.0) * 1000000.0) AS BIGINT)
         AS excess_kurtosis_micro
FROM cen
ORDER BY g
"""


def stats_effect_sizes(spark: SparkSession, sf: str) -> DataFrame:
    """The effect-size companions to stats_mann_whitney /
    stats_welch_ttest on the same R-vs-N quantity comparison: Cohen's
    d (pooled-SD standardized mean difference), Hedges' g (the
    small-sample bias correction d·(1 − 3/(4N−9))), and Cliff's delta
    (the rank-based 2U/(n₁n₂) − 1, tie-halved — derived from the same
    midrank identity on the 50-value grid, no per-row ranks).

    Significance without magnitude is the classic misread; these are
    the numbers a report should carry next to the p-value."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N"))
    base = li.select((F.col("l_returnflag") == "R").alias("r"),
                     F.col("l_quantity").cast("long").alias("v"))
    # moments for d / g
    g = base.groupBy("r").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"))
    wide = g.agg(*[
        F.sum(F.when(F.col("r") == tv, F.col(c)).otherwise(0))
        .alias(f"{c}{tag}")
        for tv, tag in [(True, "1"), (False, "0")]
        for c in ("n", "s", "ss")])
    # rank-sum for Cliff's delta (midrank grid identity, stats.py:119)
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("r"), 1).otherwise(0)).alias("c_r"),
                  F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    terms = per_v.select(
        "c_r", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    u2 = terms.agg(F.sum(
        F.col("c_r").cast("decimal(19,0)")
        * (F.lit(2).cast("decimal(19,0)") * F.col("before").cast("decimal(19,0)")
           + F.col("cnt").cast("decimal(19,0)") + F.lit(1).cast("decimal(19,0)")))
        .alias("r2"))
    j = wide.crossJoin(F.broadcast(u2))

    def m(tag):
        nn = F.col(f"n{tag}").cast("double")
        sv = F.col(f"s{tag}").cast("double")
        sq = F.col(f"ss{tag}").cast("double")
        return nn, sv / nn, (sq - sv * sv / nn) / (nn - 1.0)

    n1, m1, v1 = m("1")
    n0, m0, v0 = m("0")
    sp = F.sqrt(((n1 - 1.0) * v1 + (n0 - 1.0) * v0) / (n1 + n0 - 2.0))
    d = (m1 - m0) / sp
    gh = d * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0))
    # U_R (tie-halved, x2 units) = R2_R − n_R(n_R+1); delta = 2U/(n1 n0) − 1
    u_x2 = (F.col("r2").cast("double")
            - n1 * (n1 + 1.0))
    delta = u_x2 / (n1 * n0) - 1.0
    return j.select(
        F.col("n1").alias("n_r"), F.col("n0").alias("n_n"),
        F.floor(d * 1000000.0).cast("long").alias("cohens_d_micro"),
        F.floor(gh * 1000000.0).cast("long").alias("hedges_g_micro"),
        F.floor(delta * 1000000.0).cast("long")
        .alias("cliffs_delta_micro"))


EFFECT_SQL = """
WITH base AS (
  SELECT l_returnflag = 'R' AS r, CAST(l_quantity AS BIGINT) AS v
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
g AS (
  SELECT r, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss
  FROM base GROUP BY r
),
wide AS (
  SELECT sum(CASE WHEN r THEN n ELSE 0 END) AS n1,
         sum(CASE WHEN r THEN s ELSE 0 END) AS s1,
         sum(CASE WHEN r THEN ss ELSE 0 END) AS ss1,
         sum(CASE WHEN NOT r THEN n ELSE 0 END) AS n0,
         sum(CASE WHEN NOT r THEN s ELSE 0 END) AS s0,
         sum(CASE WHEN NOT r THEN ss ELSE 0 END) AS ss0
  FROM g
),
per_v AS (
  SELECT v, sum(CASE WHEN r THEN 1 ELSE 0 END) AS c_r, count(*) AS cnt
  FROM base GROUP BY v
),
terms AS (
  SELECT c_r, cnt,
         sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
           AS before
  FROM per_v
),
u AS (
  SELECT sum(CAST(c_r AS HUGEINT)
             * (2 * CAST(before AS HUGEINT) + cnt + 1)) AS r2
  FROM terms
),
calc AS (
  SELECT CAST(n1 AS DOUBLE) AS n1d, CAST(n0 AS DOUBLE) AS n0d,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
         (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
            / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0) AS v0,
         CAST(r2 AS DOUBLE) AS r2d, n1, n0
  FROM wide, u
)
SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n0 AS BIGINT) AS n_n,
       CAST(floor((m1 - m0) / sqrt(((n1d - 1.0) * v1 + (n0d - 1.0) * v0)
                                   / (n1d + n0d - 2.0))
                  * 1000000.0) AS BIGINT) AS cohens_d_micro,
       CAST(floor((m1 - m0) / sqrt(((n1d - 1.0) * v1 + (n0d - 1.0) * v0)
                                   / (n1d + n0d - 2.0))
                  * (1.0 - 3.0 / (4.0 * (n1d + n0d) - 9.0))
                  * 1000000.0) AS BIGINT) AS hedges_g_micro,
       CAST(floor(((r2d - n1d * (n1d + 1.0)) / (n1d * n0d) - 1.0)
                  * 1000000.0) AS BIGINT) AS cliffs_delta_micro
FROM calc
"""


_QQ_PROBS = [round(0.05 * i, 2) for i in range(1, 20)]


def stats_qq_table(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample QQ table: the 19 ventiles (5%..95%) of per-item
    price for returned (R) vs clean (N) line items, side by side with
    their gap — the distribution-shape readout behind a QQ plot, and
    the place where "same median, fatter tail" becomes visible.

    The quantiles are EXACT INTEGERS end to end: percentile_cont's
    position 1 + p(n-1) with p = k/20 is the rational
    (20 + k(n-1))/20, so v_lo/v_hi come off the per-group cumulative
    VALUE GRID (the Levene-median machinery - no per-group sort) and
    the interpolated quantile in milli-dollars is
    v_lo*1000 + (v_hi-v_lo)*frac20*50 - no doubles anywhere, which is
    what makes the two engines agree bit-for-bit (quantile_cont's
    float interpolation differs from Spark's in the last ulp; at the
    milli floor that was a real observed mismatch at sf0.001)."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N"))
    priced = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long")
        .alias("v"))
    sizes = priced.groupBy("g").agg(F.count(F.lit(1)).alias("n_g"))
    grid = priced.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.partitionBy("g").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = grid.select("g", "v", F.sum("cnt").over(w).alias("cum"))
    probes = sizes.select(
        "g", "n_g",
        F.explode(F.sequence(F.lit(1), F.lit(19))).alias("k"))
    pos20 = F.lit(20) + F.col("k") * (F.col("n_g") - 1)
    probes = probes.select(
        "g", (F.col("k") * 5).alias("p_pct"),
        F.floor(pos20 / 20).cast("long").alias("lo_k"),
        (pos20 % 20).alias("frac20"))
    jq = (cum.join(F.broadcast(probes), "g")
          .groupBy("g", "p_pct", "frac20")
          .agg(F.min(F.when(F.col("cum") >= F.col("lo_k"), F.col("v")))
               .alias("v_lo"),
               F.min(F.when(F.col("cum") >= F.col("lo_k") + 1, F.col("v")))
               .alias("v_hi")))
    q_milli = (F.col("v_lo") * 1000
               + (F.coalesce("v_hi", F.col("v_lo")) - F.col("v_lo"))
               * F.col("frac20") * 50)
    qq = jq.select("g", "p_pct", q_milli.alias("q"))
    wide = (qq.groupBy("p_pct")
            .agg(F.max(F.when(F.col("g") == "R", F.col("q"))).alias("q_r"),
                 F.max(F.when(F.col("g") == "N", F.col("q"))).alias("q_n")))
    return (wide.select(
        "p_pct",
        F.col("q_r").alias("q_r_milli"),
        F.col("q_n").alias("q_n_milli"),
        (F.col("q_r") - F.col("q_n")).alias("gap_milli"))
        .orderBy("p_pct"))


QQ_SQL = """
WITH priced AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
sizes AS (SELECT g, count(*) AS n_g FROM priced GROUP BY g),
grid AS (SELECT g, v, count(*) AS cnt FROM priced GROUP BY g, v),
cum AS (
  SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cum
  FROM grid
),
probes AS (
  SELECT g, k.range * 5 AS p_pct,
         (20 + k.range * (n_g - 1)) // 20 AS lo_k,
         (20 + k.range * (n_g - 1)) % 20 AS frac20
  FROM sizes CROSS JOIN range(1, 20) k
),
jq AS (
  SELECT cum.g, p_pct, frac20,
         min(CASE WHEN cum >= lo_k THEN v END) AS v_lo,
         min(CASE WHEN cum >= lo_k + 1 THEN v END) AS v_hi
  FROM cum JOIN probes ON cum.g = probes.g
  GROUP BY cum.g, p_pct, frac20
),
qq AS (
  SELECT g, p_pct,
         v_lo * 1000 + (coalesce(v_hi, v_lo) - v_lo) * frac20 * 50 AS q
  FROM jq
)
SELECT CAST(p_pct AS BIGINT) AS p_pct,
       CAST(max(CASE WHEN g = 'R' THEN q END) AS BIGINT) AS q_r_milli,
       CAST(max(CASE WHEN g = 'N' THEN q END) AS BIGINT) AS q_n_milli,
       CAST(max(CASE WHEN g = 'R' THEN q END)
            - max(CASE WHEN g = 'N' THEN q END) AS BIGINT) AS gap_milli
FROM qq GROUP BY p_pct ORDER BY p_pct
"""


QUERIES = {
    "agg_skewness_kurtosis": (agg_skewness_kurtosis, SKEW_KURT_SQL),
    "stats_effect_sizes": (stats_effect_sizes, EFFECT_SQL),
    "stats_qq_table": (stats_qq_table, QQ_SQL),
}


def agg_theil_index(spark: SparkSession, sf: str) -> DataFrame:
    """Theil's T inequality index of customer revenue with its exact
    within/between market-segment decomposition — the entropy-based
    companion to gini_revenue, and the only standard inequality index
    that decomposes additively: T = T_between + Σ_g share_g·T_g.

    Per-customer revenue cents are exact integers; each customer's
    (x/μ)ln(x/μ) term is nano-floored BEFORE the segment sum (the
    order-independent reduction discipline), and the between term uses
    segment aggregates only.  Output: one row per segment (share,
    within-T) plus the 'ALL' rollup row carrying T, T_within,
    T_between."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("long")
    per_cust = (li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_custkey").agg(F.sum(cents).alias("x"))
                .join(F.broadcast(c),
                      F.col("o_custkey") == F.col("c_custkey"))
                .select("c_mktsegment", "x"))
    tot = per_cust.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("x").alias("s"))
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    term = (F.col("x").cast("double") / mu
            * F.log(F.col("x").cast("double") / mu))
    terms = (per_cust.crossJoin(F.broadcast(tot))
             .select("c_mktsegment", "x", "n", "s",
                     F.floor(term * 1e9).cast("long").alias("t_nano")))
    per_seg = terms.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("x").alias("s_g"),
        F.sum("t_nano").alias("tsum_nano"),
        F.max("n").alias("n"), F.max("s").alias("s"))
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ngd = F.col("n_g").cast("double")
    sgd = F.col("s_g").cast("double")
    share = sgd / sd
    # T_g: within-segment Theil needs terms against the SEGMENT mean:
    # (x/mu_g)ln(x/mu_g) = (mu/mu_g)[(x/mu)(ln(x/mu) - ln(mu_g/mu))]
    # => T_g = (n_g/n_rows... derive from the global-mu terms exactly:
    # sum_g[(x/mu)ln(x/mu)]/n = share*(T_g/ (n/n_g) scaling) + ...;
    # simpler and standard: T = (1/n)*sum(terms); T_between from
    # aggregates; T_within = T - T_between (additivity).
    t_seg_contrib = F.col("tsum_nano").cast("double") / 1e9 / nd
    t_between_g = share * F.log(share / (ngd / nd))
    per_seg_out = per_seg.select(
        F.col("c_mktsegment").alias("segment"), "n_g",
        F.floor(share * 1000000.0).cast("long").alias("revenue_share_micro"),
        F.floor(t_seg_contrib * 1e9).cast("long").alias("t_contrib_nano"),
        F.floor(t_between_g * 1e9).cast("long").alias("t_between_nano"))
    rollup = (per_seg_out.agg(
        F.sum("n_g").alias("n_g"),
        F.sum("revenue_share_micro").alias("revenue_share_micro"),
        F.sum("t_contrib_nano").alias("t_contrib_nano"),
        F.sum("t_between_nano").alias("t_between_nano"))
        .select(F.lit("ALL").alias("segment"), "n_g",
                "revenue_share_micro", "t_contrib_nano",
                "t_between_nano"))
    return per_seg_out.unionByName(rollup).orderBy("segment")


THEIL_SQL = """
WITH per_cust AS (
  SELECT c_mktsegment,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_custkey
),
tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM per_cust),
terms AS (
  SELECT c_mktsegment, x, n, s,
         CAST(floor(CAST(x AS DOUBLE)
                    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(x AS DOUBLE)
                         / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1e9) AS BIGINT) AS t_nano
  FROM per_cust, tot
),
per_seg AS (
  SELECT c_mktsegment, count(*) AS n_g, CAST(sum(x) AS BIGINT) AS s_g,
         CAST(sum(t_nano) AS BIGINT) AS tsum_nano,
         max(n) AS n, max(s) AS s
  FROM terms GROUP BY c_mktsegment
),
seg_out AS (
  SELECT c_mktsegment AS segment, n_g,
         CAST(floor(CAST(s_g AS DOUBLE) / CAST(s AS DOUBLE) * 1000000.0)
              AS BIGINT) AS revenue_share_micro,
         CAST(floor(CAST(tsum_nano AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
                    * 1e9) AS BIGINT) AS t_contrib_nano,
         CAST(floor(CAST(s_g AS DOUBLE) / CAST(s AS DOUBLE)
                    * ln((CAST(s_g AS DOUBLE) / CAST(s AS DOUBLE))
                         / (CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1e9) AS BIGINT) AS t_between_nano
  FROM per_seg
)
SELECT segment, CAST(n_g AS BIGINT) AS n_g, revenue_share_micro,
       t_contrib_nano, t_between_nano
FROM seg_out
UNION ALL
SELECT 'ALL', CAST(sum(n_g) AS BIGINT),
       CAST(sum(revenue_share_micro) AS BIGINT),
       CAST(sum(t_contrib_nano) AS BIGINT),
       CAST(sum(t_between_nano) AS BIGINT)
FROM seg_out
ORDER BY segment
"""


QUERIES["agg_theil_index"] = (agg_theil_index, THEIL_SQL)


def stats_cmh_test(spark: SparkSession, sf: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test: is PROMO exposure associated with
    returns AFTER controlling for supplier nation?  The stratified
    2x2 test that catches Simpson's-paradox reversals a pooled
    chi-square (stats_chi_square) cannot — each nation contributes its
    own 2x2 table and the test pools evidence without pooling rows.

    Per stratum k: a_k (promo & returned), E_k = r1·c1/n,
    V_k = r1·r0·c1·c0/(n²(n−1)); χ²_CMH = (|Σa−ΣE| − 0.5)²/ΣV with
    the standard continuity correction, plus the Mantel-Haenszel
    pooled odds ratio Σ(ad/n)/Σ(bc/n).  All cell counts are exact
    integers from ONE keyed aggregate over 25 strata; the statistic is
    one double expression, micro-floored."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("promo"))
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    base = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .select("s_nationkey", "promo",
                    (F.col("l_returnflag") == "R").alias("ret")))
    cells = base.groupBy("s_nationkey").agg(
        F.sum(F.when(F.col("promo") & F.col("ret"), 1).otherwise(0))
        .alias("a"),
        F.sum(F.when(F.col("promo") & ~F.col("ret"), 1).otherwise(0))
        .alias("b"),
        F.sum(F.when(~F.col("promo") & F.col("ret"), 1).otherwise(0))
        .alias("c"),
        F.sum(F.when(~F.col("promo") & ~F.col("ret"), 1).otherwise(0))
        .alias("d"))
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    c = F.col("c").cast("double")
    d = F.col("d").cast("double")
    n = a + b + c + d
    e = (a + b) * (a + c) / n
    v = ((a + b) * (c + d) * (a + c) * (b + d)) / (n * n * (n - 1.0))
    terms = cells.select(
        F.col("a").alias("a_int"), e.alias("e"), v.alias("v"),
        (a * d / n).alias("ad_n"), (b * c / n).alias("bc_n"))
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("a_int").alias("sum_a"),
        F.sum("e").alias("sum_e"), F.sum("v").alias("sum_v"),
        F.sum("ad_n").alias("sum_ad"), F.sum("bc_n").alias("sum_bc"))
    chi2 = ((F.abs(F.col("sum_a").cast("double") - F.col("sum_e")) - 0.5)
            * (F.abs(F.col("sum_a").cast("double") - F.col("sum_e")) - 0.5)
            / F.col("sum_v"))
    return agg.select(
        "n_strata", "sum_a",
        F.floor(F.col("sum_e") * 1000.0).cast("long")
        .alias("expected_milli"),
        F.floor(chi2 * 1000000.0).cast("long").alias("chi2_micro"),
        F.floor(F.col("sum_ad") / F.col("sum_bc") * 1000000.0)
        .cast("long").alias("mh_odds_ratio_micro"))


CMH_SQL = """
WITH base AS (
  SELECT s_nationkey, p_type LIKE 'PROMO%' AS promo,
         l_returnflag = 'R' AS ret
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
),
cells AS (
  SELECT s_nationkey,
         sum(CASE WHEN promo AND ret THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN promo AND NOT ret THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN NOT promo AND ret THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN NOT promo AND NOT ret THEN 1 ELSE 0 END) AS d
  FROM base GROUP BY s_nationkey
),
terms AS (
  SELECT CAST(a AS BIGINT) AS a_int,
         (CAST(a AS DOUBLE) + b) * (CAST(a AS DOUBLE) + c)
           / (CAST(a AS DOUBLE) + b + c + d) AS e,
         ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)
          * (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d))
         / ((CAST(a AS DOUBLE) + b + c + d)
            * (CAST(a AS DOUBLE) + b + c + d)
            * ((CAST(a AS DOUBLE) + b + c + d) - 1.0)) AS v,
         CAST(a AS DOUBLE) * d / (CAST(a AS DOUBLE) + b + c + d) AS ad_n,
         CAST(b AS DOUBLE) * c / (CAST(a AS DOUBLE) + b + c + d) AS bc_n
  FROM cells
),
agg AS (
  SELECT count(*) AS n_strata, CAST(sum(a_int) AS BIGINT) AS sum_a,
         sum(e) AS sum_e, sum(v) AS sum_v,
         sum(ad_n) AS sum_ad, sum(bc_n) AS sum_bc
  FROM terms
)
SELECT CAST(n_strata AS BIGINT) AS n_strata, sum_a,
       CAST(floor(sum_e * 1000.0) AS BIGINT) AS expected_milli,
       CAST(floor((abs(CAST(sum_a AS DOUBLE) - sum_e) - 0.5)
                  * (abs(CAST(sum_a AS DOUBLE) - sum_e) - 0.5)
                  / sum_v * 1000000.0) AS BIGINT) AS chi2_micro,
       CAST(floor(sum_ad / sum_bc * 1000000.0) AS BIGINT)
         AS mh_odds_ratio_micro
FROM agg
"""


QUERIES["stats_cmh_test"] = (stats_cmh_test, CMH_SQL)


def stats_overdispersion_test(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson overdispersion (dispersion-index) test on DAILY order
    counts over the complete calendar: D = Σ(c−c̄)²/c̄ ~ χ²(n−1) under
    a homogeneous Poisson arrival process; the variance-to-mean ratio
    answers "can I model arrivals as Poisson?" before any
    queueing/forecast model assumes it.  Complete-grid counts (the
    MASE convention — missing days are real zeros), exact integer
    (n, Σc, Σc²), one double expression."""
    o = t(spark, sf, "orders")
    per_day = (o.select(F.to_date("o_orderdate").alias("d"))
               .groupBy("d").agg(F.count(F.lit(1)).alias("c")))
    span = per_day.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = (span.select(F.explode(F.sequence("d0", "d1")).alias("d"))
           .join(per_day, "d", "left")
           .select(F.coalesce("c", F.lit(0)).alias("c")))
    agg = cal.agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"),
                  F.sum(F.col("c") * F.col("c")).alias("ss"))
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - 1.0)
    disp = (ss - s * s / n) / mean
    return agg.select(
        F.col("n").alias("n_days"), F.col("s").alias("n_orders"),
        F.floor(mean * 1000.0).cast("long").alias("mean_milli"),
        F.floor(var / mean * 1000000.0).cast("long").alias("vmr_micro"),
        F.floor(disp * 1000.0).cast("long").alias("dispersion_milli"))


OVERDISP_SQL = """
WITH per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS c
  FROM orders GROUP BY 1
),
span AS (SELECT min(d) AS d0, max(d) AS d1 FROM per_day),
cal AS (
  SELECT coalesce(per_day.c, 0) AS c
  FROM (SELECT unnest(generate_series(d0, d1,
                                      INTERVAL 1 DAY))::DATE AS g
        FROM span) gs
  LEFT JOIN per_day ON per_day.d = gs.g
),
agg AS (
  SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS ss
  FROM cal
)
SELECT n AS n_days, s AS n_orders,
       CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000.0)
            AS BIGINT) AS mean_milli,
       CAST(floor(((CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
                  / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS vmr_micro,
       CAST(floor((CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000.0) AS BIGINT) AS dispersion_milli
FROM agg
"""


QUERIES["stats_overdispersion_test"] = (stats_overdispersion_test,
                                        OVERDISP_SQL)
