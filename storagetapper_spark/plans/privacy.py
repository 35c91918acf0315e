"""Privacy-risk auditing + probabilistic record linkage — the release
gate a training-data pipeline runs before shipping a corpus extract
(k-anonymity / l-diversity over quasi-identifiers, Fellegi-Sunter
match scoring over blocked candidate pairs).

Reference parity: the reference ships per-table validation jobs
(main_test.go golden matrices) but no privacy layer; this extends the
§2.7 training-data surface the same way the PII flag/redact queries do
(operators/text.py) — audit queries over the shipped fixtures.

Exactness: every statistic is an exact integer (counts, milli-weight
sums, cents); the only doubles are the band expressions
floor(acctbal / width) evaluated identically in both engines.

Scale: one groupBy on the quasi-identifier (k-anon / l-div) — a single
hash shuffle.  Linkage pairs come from an equi-join on the blocking
key (nation x $5 acctbal band), never a cross join; block sizes are
bounded by the band granularity, so pair fan-out per block stays
distribution-bounded at any corpus size (same stance as the LSH
band-bucket joins in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_K = 5          # k-anonymity threshold
_L = 3          # l-diversity threshold
_BAL_BAND = 1000.0   # quasi-identifier acctbal band width ($)
_BLK_BAND = 500.0    # linkage blocking band width ($)


def _qi(spark: SparkSession, sf: str) -> DataFrame:
    """Customer rows keyed by the quasi-identifier triple a re-identifier
    would join on: (market segment, nation, $1000 balance band)."""
    return t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long")
        .alias("bal_band"))


def privacy_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit: group customers by the quasi-identifier
    triple, then per market segment report how many equivalence
    classes fall below k=5 and how many rows they expose."""
    groups = (_qi(spark, sf)
              .groupBy("c_mktsegment", "c_nationkey", "bal_band")
              .agg(F.count(F.lit(1)).alias("sz")))
    return (groups.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.min("sz").alias("k_anonymity"),
                 F.sum(F.when(F.col("sz") < _K, 1).otherwise(0))
                 .alias("groups_below_k"),
                 F.sum(F.when(F.col("sz") < _K, F.col("sz"))
                       .otherwise(0)).alias("exposed_rows"),
                 F.sum("sz").alias("rows"))
            .orderBy("c_mktsegment"))


K_ANONYMITY_SQL = f"""
WITH qi AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band
  FROM customer
),
groups AS (
  SELECT c_mktsegment, c_nationkey, bal_band, count(*) AS sz
  FROM qi GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       count(*) AS n_groups,
       min(sz) AS k_anonymity,
       CAST(sum(CASE WHEN sz < {_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k,
       CAST(sum(CASE WHEN sz < {_K} THEN sz ELSE 0 END) AS BIGINT)
         AS exposed_rows,
       CAST(sum(sz) AS BIGINT) AS rows
FROM groups
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def privacy_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit: within each quasi-identifier class, count the
    DISTINCT values of the sensitive attribute (order priority of the
    customer's orders); classes with fewer than l=3 distinct values
    let an attacker infer the sensitive value from the QI alone."""
    orders = t(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    joined = _qi(spark, sf).join(
        orders, F.col("c_custkey") == F.col("o_custkey"))
    groups = (joined
              .groupBy("c_mktsegment", "c_nationkey", "bal_band")
              .agg(F.countDistinct("o_orderpriority").alias("l_div"),
                   F.count(F.lit(1)).alias("sz")))
    return (groups.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.min("l_div").alias("min_l"),
                 F.sum(F.when(F.col("l_div") < _L, 1).otherwise(0))
                 .alias("groups_below_l"),
                 F.sum(F.when(F.col("l_div") < _L, F.col("sz"))
                       .otherwise(0)).alias("exposed_rows"))
            .orderBy("c_mktsegment"))


L_DIVERSITY_SQL = f"""
WITH qi AS (
  SELECT c_custkey, c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band
  FROM customer
),
groups AS (
  SELECT c_mktsegment, c_nationkey, bal_band,
         count(DISTINCT o_orderpriority) AS l_div,
         count(*) AS sz
  FROM qi JOIN orders ON c_custkey = o_custkey
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       count(*) AS n_groups,
       CAST(min(l_div) AS BIGINT) AS min_l,
       CAST(sum(CASE WHEN l_div < {_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l,
       CAST(sum(CASE WHEN l_div < {_L} THEN sz ELSE 0 END) AS BIGINT)
         AS exposed_rows
FROM groups
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# Fellegi-Sunter field weights in milli-units: log2(m/u) for agreement,
# log2((1-m)/(1-u)) for disagreement, from fixed (documented) m/u
# estimates — m: P(agree | match), u: P(agree | non-match).
#   segment  m=0.95 u=0.20 -> agree +2248, disagree -4000
#   balance  m=0.90 u=0.05 -> agree +4170, disagree -3248
#   name     m=0.98 u=0.01 -> agree +6615, disagree -5629
_W = {
    "seg": (2248, -4000),
    "bal": (4170, -3248),
    "name": (6615, -5629),
}
_BAL_TOL_CENTS = 2500   # |balance delta| <= $25 counts as agreement
_T_MATCH = 6000         # milli-score thresholds
_T_POSSIBLE = 0


def linkage_fellegi_sunter(spark: SparkSession, sf: str) -> DataFrame:
    """Probabilistic record linkage over blocked customer pairs:
    candidates share a nation and sit within ONE $500 balance band of
    each other (the left side probes the right side's band and both
    adjacent bands — LSH-style multi-probing, so a $25-close pair
    straddling a band boundary is never missed); each pair gets the
    Fellegi-Sunter milli-weight sum over three field comparisons
    (segment equality, balance within $25, name 3-suffix equality) and
    a match / possible / nonmatch class by fixed thresholds.  Returns
    the per-class pair counts and score profile.

    Scale: block size is the (nation, band) occupancy — the band width
    is the knob, and multi-probing decouples it from the agreement
    tolerance (any width >= the $25 tolerance keeps recall exact), so
    at 1e9 customers the width shrinks to $25 and blocks stay
    distribution-bounded while the candidate cost is a flat 3x.  The
    probe explode is a narrow 3x generator on one side only."""
    base = t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        F.floor(F.col("c_acctbal") / _BLK_BAND).cast("long").alias("blk"),
        F.expr("right(c_name, 3)").alias("name3"))
    probes = base.select(
        "*",
        F.explode(F.array(F.col("blk") - 1, F.col("blk"),
                          F.col("blk") + 1)).alias("probe"))
    a = base.alias("a")
    b = probes.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.blk") == F.col("b.probe"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")))

    def w(agree: F.Column, key: str) -> F.Column:
        up, down = _W[key]
        return F.when(agree, F.lit(up)).otherwise(F.lit(down))

    score = (
        w(F.col("a.c_mktsegment") == F.col("b.c_mktsegment"), "seg")
        + w(F.abs(F.col("a.bal_cents") - F.col("b.bal_cents"))
            <= _BAL_TOL_CENTS, "bal")
        + w(F.col("a.name3") == F.col("b.name3"), "name"))
    scored = pairs.select(score.alias("score"))
    cls = (F.when(F.col("score") >= _T_MATCH, F.lit("match"))
           .when(F.col("score") >= _T_POSSIBLE, F.lit("possible"))
           .otherwise(F.lit("nonmatch")))
    return (scored.select(cls.alias("link_class"), "score")
            .groupBy("link_class")
            .agg(F.count(F.lit(1)).alias("pairs"),
                 F.min("score").alias("min_score"),
                 F.max("score").alias("max_score"),
                 F.floor(F.avg("score")).cast("long")
                 .alias("avg_score_milli"))
            .orderBy("link_class"))


FELLEGI_SUNTER_SQL = f"""
WITH base AS (
  SELECT c_custkey, c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents,
         CAST(floor(c_acctbal / {_BLK_BAND}) AS BIGINT) AS blk,
         right(c_name, 3) AS name3
  FROM customer
),
pairs AS (
  SELECT (CASE WHEN a.c_mktsegment = b.c_mktsegment
               THEN {_W['seg'][0]} ELSE {_W['seg'][1]} END)
       + (CASE WHEN abs(a.bal_cents - b.bal_cents) <= {_BAL_TOL_CENTS}
               THEN {_W['bal'][0]} ELSE {_W['bal'][1]} END)
       + (CASE WHEN a.name3 = b.name3
               THEN {_W['name'][0]} ELSE {_W['name'][1]} END) AS score
  FROM base a JOIN base b
    ON a.c_nationkey = b.c_nationkey
   AND a.blk BETWEEN b.blk - 1 AND b.blk + 1
   AND a.c_custkey < b.c_custkey
)
SELECT CASE WHEN score >= {_T_MATCH} THEN 'match'
            WHEN score >= {_T_POSSIBLE} THEN 'possible'
            ELSE 'nonmatch' END AS link_class,
       count(*) AS pairs,
       min(score) AS min_score,
       max(score) AS max_score,
       CAST(floor(avg(score)) AS BIGINT) AS avg_score_milli
FROM pairs
GROUP BY 1
ORDER BY link_class
"""


QUERIES = {
    "privacy_k_anonymity": (privacy_k_anonymity, K_ANONYMITY_SQL),
    "privacy_l_diversity": (privacy_l_diversity, L_DIVERSITY_SQL),
    "linkage_fellegi_sunter": (linkage_fellegi_sunter,
                               FELLEGI_SUNTER_SQL),
}


_T_CLOSE_MICRO = 250000   # t-closeness threshold t = 0.25
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]


def privacy_t_closeness(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007): for each
    quasi-identifier class, the ordered-category earth-mover distance
    between the class's sensitive-attribute distribution (order
    priority, 5 ordered values) and the GLOBAL distribution.  EMD for
    ordered categories = (1/(m-1)) * sum_k |cumP_class(k) −
    cumP_global(k)|; both cumulative fractions are rationals, so the
    distance is computed EXACTLY as the integer
    sum_k |cum_class(k)*N − cum_global(k)*n_class| scaled by
    n_class*N*(m-1) — no float until the final micro floor.

    Scale: one (QI) hash aggregation with 5 conditional sums (the
    sensitive domain is fixed), a 1-row global broadcast, a per-segment
    rollup.  Same single-shuffle shape as privacy_k_anonymity."""
    orders = t(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    joined = _qi(spark, sf).join(
        orders, F.col("c_custkey") == F.col("o_custkey"))
    conds = [F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
             .alias(f"c{i}") for i, p in enumerate(_PRIORITIES)]
    groups = (joined.groupBy("c_mktsegment", "c_nationkey", "bal_band")
              .agg(F.count(F.lit(1)).alias("n"), *conds))
    glob = groups.agg(
        F.sum("n").alias("gn"),
        *[F.sum(f"c{i}").alias(f"g{i}") for i in range(5)])
    j = groups.crossJoin(F.broadcast(glob))
    # cumulative counts (first 4 suffice: the 5th cum always matches)
    emd = None
    cg, cG = F.lit(0), F.lit(0)
    for i in range(4):
        cg = cg + F.col(f"c{i}")
        cG = cG + F.col(f"g{i}")
        term = F.abs(cg * F.col("gn") - cG * F.col("n"))
        emd = term if emd is None else emd + term
    t_micro = F.floor(
        emd.cast("double") * 1000000.0
        / (F.col("n") * F.col("gn") * 4).cast("double")).cast("long")
    scored = j.select("c_mktsegment", "n", t_micro.alias("t_micro"))
    return (scored.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.max("t_micro").alias("max_t_micro"),
                 F.sum(F.when(F.col("t_micro") > _T_CLOSE_MICRO, 1)
                       .otherwise(0)).alias("groups_above_t"),
                 F.sum(F.when(F.col("t_micro") > _T_CLOSE_MICRO,
                              F.col("n")).otherwise(0))
                 .alias("exposed_rows"))
            .orderBy("c_mktsegment"))


_TC_CONDS = ",\n         ".join(
    f"sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS c{i}"
    for i, p in enumerate(_PRIORITIES))
_TC_CUM = " + ".join(
    f"abs(({' + '.join(f'c{j}' for j in range(i + 1))}) * gn"
    f" - ({' + '.join(f'g{j}' for j in range(i + 1))}) * n)"
    for i in range(4))

T_CLOSENESS_SQL = f"""
WITH qi AS (
  SELECT c_custkey, c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band
  FROM customer
),
groups AS (
  SELECT c_mktsegment, c_nationkey, bal_band,
         CAST(count(*) AS BIGINT) AS n,
         {_TC_CONDS}
  FROM qi JOIN orders ON c_custkey = o_custkey
  GROUP BY 1, 2, 3
),
gtot AS (
  SELECT CAST(sum(n) AS BIGINT) AS gn,
         {", ".join(f"CAST(sum(c{i}) AS BIGINT) AS g{i}" for i in range(5))}
  FROM groups
),
scored AS (
  SELECT c_mktsegment, n,
         CAST(floor(CAST({_TC_CUM} AS DOUBLE) * 1000000.0
                    / CAST(n * gn * 4 AS DOUBLE)) AS BIGINT) AS t_micro
  FROM groups, gtot
)
SELECT c_mktsegment,
       count(*) AS n_groups,
       max(t_micro) AS max_t_micro,
       CAST(sum(CASE WHEN t_micro > {_T_CLOSE_MICRO} THEN 1 ELSE 0 END)
            AS BIGINT) AS groups_above_t,
       CAST(sum(CASE WHEN t_micro > {_T_CLOSE_MICRO} THEN n ELSE 0 END)
            AS BIGINT) AS exposed_rows
FROM scored
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES["privacy_t_closeness"] = (privacy_t_closeness, T_CLOSENESS_SQL)


_GEN_WIDTHS = [500, 1000, 2000, 4000]


def privacy_k_anonymity_generalization(spark: SparkSession,
                                       sf: str) -> DataFrame:
    """Generalization-lattice sweep (the Incognito/Mondrian knob): for
    each candidate balance-band width, the k-anonymity profile of the
    quasi-identifier (segment, nation, band) — minimum class size,
    violating classes, exposed rows.  Coarser bands trade attribute
    utility for anonymity; the sweep is ONE query (widths explode as a
    4-row literal, the grouping runs once per width).

    Scale: 4x one hash aggregation; the width dimension is a literal
    broadcast, so the sweep cost is a flat 4x of the k-anon audit."""
    widths = F.explode(F.array(*[F.lit(w) for w in _GEN_WIDTHS])) \
        .alias("width")
    rows = t(spark, sf, "customer").select(
        "c_mktsegment", "c_nationkey", "c_acctbal", widths)
    groups = (rows.select(
        "width", "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") / F.col("width")).cast("long")
        .alias("band"))
        .groupBy("width", "c_mktsegment", "c_nationkey", "band")
        .agg(F.count(F.lit(1)).alias("sz")))
    return (groups.groupBy("width")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.min("sz").alias("k_anonymity"),
                 F.sum(F.when(F.col("sz") < _K, 1).otherwise(0))
                 .alias("groups_below_k"),
                 F.sum(F.when(F.col("sz") < _K, F.col("sz"))
                       .otherwise(0)).alias("exposed_rows"))
            .orderBy("width"))


K_ANON_GENERALIZATION_SQL = f"""
WITH widths AS (SELECT unnest({_GEN_WIDTHS}) AS width),
groups AS (
  SELECT w.width, c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / w.width) AS BIGINT) AS band,
         count(*) AS sz
  FROM customer, widths w
  GROUP BY 1, 2, 3, 4
)
SELECT width,
       count(*) AS n_groups,
       min(sz) AS k_anonymity,
       CAST(sum(CASE WHEN sz < {_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k,
       CAST(sum(CASE WHEN sz < {_K} THEN sz ELSE 0 END) AS BIGINT)
         AS exposed_rows
FROM groups
GROUP BY width
ORDER BY width
"""


QUERIES["privacy_k_anonymity_generalization"] = (
    privacy_k_anonymity_generalization, K_ANON_GENERALIZATION_SQL)


_DP_EPS_MILLI = [100, 500, 1000, 2000]


def privacy_dp_noise_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Differential-privacy release PLANNING (no noise is drawn — the
    calibration itself is deterministic): for the "orders per nation"
    count release at user-level adjacency, the L1 sensitivity is the
    max orders any single customer contributes; for each epsilon on a
    literal grid, the Laplace scale b = sensitivity / eps and the
    worst relative error it implies against the smallest released
    group — the table a data owner reads to pick epsilon before
    turning the mechanism on.

    Scale: one per-customer count (keyed shuffle), a 1-row max
    reduce, a 25-row group count; the eps grid is a literal
    explode."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    per_cust = (o.join(c, o.o_custkey == c.c_custkey)
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("k"),
                     F.max("c_nationkey").alias("nat")))
    sens = per_cust.agg(F.max("k").alias("sensitivity"))
    per_nation = per_cust.groupBy("nat").agg(F.sum("k").alias("cnt"))
    mn = per_nation.agg(F.min("cnt").alias("min_count"),
                        F.count(F.lit(1)).alias("n_groups"))
    grid = (sens.crossJoin(F.broadcast(mn))
            .select("sensitivity", "min_count", "n_groups",
                    F.explode(F.array(*[F.lit(e) for e in _DP_EPS_MILLI]))
                    .alias("eps_milli")))
    d = "double"
    b = (F.col("sensitivity").cast(d)
         / (F.col("eps_milli").cast(d) / 1000.0))
    return (grid.select(
        "eps_milli", "sensitivity", "n_groups", "min_count",
        F.floor(b * 1000.0).cast("long").alias("laplace_scale_milli"),
        F.floor(b / F.col("min_count").cast(d) * 1000000.0)
        .cast("long").alias("worst_rel_err_ppm"))
        .orderBy("eps_milli"))


DP_CALIBRATION_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS k, max(c.c_nationkey) AS nat
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o_custkey
),
sens AS (SELECT CAST(max(k) AS BIGINT) AS sensitivity FROM per_cust),
per_nation AS (SELECT nat, CAST(sum(k) AS BIGINT) AS cnt
               FROM per_cust GROUP BY nat),
mn AS (SELECT min(cnt) AS min_count, count(*) AS n_groups
       FROM per_nation),
grid AS (
  SELECT s.sensitivity, m.min_count, m.n_groups, t.eps_milli
  FROM sens s CROSS JOIN mn m
  CROSS JOIN (SELECT unnest([{", ".join(map(str, _DP_EPS_MILLI))}])
              AS eps_milli) t
)
SELECT eps_milli, sensitivity, n_groups, min_count,
       CAST(floor(CAST(sensitivity AS DOUBLE)
                  / (CAST(eps_milli AS DOUBLE) / 1000.0) * 1000.0)
            AS BIGINT) AS laplace_scale_milli,
       CAST(floor(CAST(sensitivity AS DOUBLE)
                  / (CAST(eps_milli AS DOUBLE) / 1000.0)
                  / CAST(min_count AS DOUBLE) * 1000000.0)
            AS BIGINT) AS worst_rel_err_ppm
FROM grid
ORDER BY eps_milli
"""


QUERIES["privacy_dp_noise_calibration"] = (privacy_dp_noise_calibration,
                                           DP_CALIBRATION_SQL)
