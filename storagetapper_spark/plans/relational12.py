"""Batch 12: windowed rolling regression, term burstiness, and a
supplier scorecard mart query.

Exactness: rolling-slope sufficient statistics are frame sums of exact
integers (cents, day index); burstiness is a closed-form integer
rational; scorecard measures are integer cents/basis points — each
metric drops to DOUBLE exactly once (SCALE.md discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_ROLL_W = 14


def ts_rolling_slope(spark: SparkSession, sf: str) -> DataFrame:
    """14-day rolling OLS slope of daily revenue (cents/day) — the
    windowed-regression trend monitor (is revenue accelerating?).

    The day table is one map-side-combined agg; the day index comes
    from the scale-safe two-pass rank (no unpartitioned window over raw
    data), and every frame statistic is a ROWS-frame sum of exact
    integers, so the slope is one IEEE expression per day."""
    from storagetapper_spark.operators.ranks import two_pass_rank

    li = t(spark, sf, "lineitem")
    day = (li.groupBy(F.col("l_shipdate").cast("date").alias("day"))
           .agg(F.sum(F.round(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")) * 100)
                      .cast("long")).alias("cents")))
    idx = (two_pass_rank(day, [F.col("day")],
                         F.floor(F.unix_date(F.col("day")) / 256))
           .select("day", "cents", F.col("_rank").alias("x")))
    w = (Window.orderBy("x").rowsBetween(-(_ROLL_W - 1), 0))
    fr = idx.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("cents").over(w).alias("sy"),
        # x·cents approaches int64 at extreme scale and its window SUM
        # passes it — widen one operand so the sum rides decimal(38,0)
        # (oracle mirrors with HUGEINT).
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("cents"))
        .over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sx2"))
    slope = ((F.col("n") * F.col("sxy")
              - F.col("sx").cast("decimal(19,0)") * F.col("sy"))
             .cast("double")
             / (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
             .cast("double"))
    return (fr.filter(F.col("n") == _ROLL_W)
            .select("day", F.floor(slope * 1000000).cast("long")
                    .alias("slope_micro_cents_per_day"))
            .orderBy("day"))


ROLLING_SLOPE_SQL = f"""
WITH day AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
idx AS (
  SELECT day, cents,
         row_number() OVER (ORDER BY day) AS x
  FROM day
),
fr AS (
  SELECT day,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sx,
         CAST(sum(cents) OVER w AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * cents) OVER w AS sxy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sx2
  FROM idx
  WINDOW w AS (ORDER BY x ROWS BETWEEN {_ROLL_W - 1} PRECEDING
               AND CURRENT ROW)
)
SELECT day,
       CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(n * sx2 - sx * sx AS DOUBLE)
                  * 1000000) AS BIGINT) AS slope_micro_cents_per_day
FROM fr WHERE n = {_ROLL_W}
ORDER BY day
"""


QUERIES = {
    "ts_rolling_slope": (ts_rolling_slope, ROLLING_SLOPE_SQL),
}


_BURST_MIN_N = 100
_BURST_TOPK = 20


def text_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 bursty terms by Fano factor (variance-to-mean of per-doc
    counts over ALL docs, zeros included): burstiness separates topical
    terms (clumped in few docs) from function words at equal frequency
    — a quality/boilerplate signal the frequency-only views
    (vocab_coverage, text_idf_stopwords) can't see.

    Fano = (N·Σc² − n²)/(n·N) from three exact integers per term; the
    per-(doc, term) count table is the only wide stage."""
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
            " +", " ")), " ")).alias("tok"))
    per_doc = (toks.groupBy("tok", "doc_id")
               .agg(F.count(F.lit(1)).alias("c")))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    s = (per_doc.groupBy("tok")
         .agg(F.count(F.lit(1)).alias("df"),
              F.sum("c").alias("n"),
              F.sum(F.col("c") * F.col("c")).alias("sc2"))
         .filter(F.col("n") >= _BURST_MIN_N)
         .crossJoin(F.broadcast(nd)))
    fano = ((F.col("n_docs") * F.col("sc2") - F.col("n") * F.col("n"))
            .cast("double")
            / (F.col("n") * F.col("n_docs")).cast("double"))
    return (s.select("tok", "df", "n",
                     F.floor(fano * 1000000).cast("long")
                     .alias("fano_micro"))
            .orderBy(F.desc("fano_micro"), "tok")
            .limit(_BURST_TOPK))


BURSTINESS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')), ' ')) AS tok
  FROM documents
),
per_doc AS (
  SELECT tok, doc_id, count(*) AS c FROM toks GROUP BY 1, 2
),
nd AS (SELECT count(*) AS n_docs FROM documents),
s AS (
  SELECT tok, count(*) AS df, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM per_doc GROUP BY tok HAVING CAST(sum(c) AS BIGINT) >= {_BURST_MIN_N}
)
SELECT s.tok, s.df, s.n,
       CAST(floor(CAST(nd.n_docs * s.sc2 - s.n * s.n AS DOUBLE)
                  / CAST(s.n * nd.n_docs AS DOUBLE) * 1000000) AS BIGINT)
         AS fano_micro
FROM s CROSS JOIN nd
ORDER BY fano_micro DESC, s.tok
LIMIT {_BURST_TOPK}
"""


QUERIES["text_term_burstiness"] = (text_term_burstiness, BURSTINESS_SQL)


_SLA_D = 60
_SCORE_TOPK = 20


def supplier_scorecard(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 suppliers by net revenue, with the mart-style scorecard:
    items shipped, net revenue (exact cents), on-time share (shipped
    ≤ 60 days from order, floor-micro), mean discount in basis points,
    and the supplier's nation — one fact scan, dims broadcast."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name",
                                        "s_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    j = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey")))
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 100).cast("long")
    on_time = F.when(
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.col("o_orderdate").cast("date")) <= _SLA_D, 1
    ).otherwise(0)
    disc_bp = F.round(F.col("l_discount") * 10000).cast("long")
    agg = (j.groupBy("l_suppkey")
           .agg(F.count(F.lit(1)).alias("n_items"),
                F.sum(net).alias("revenue_cents"),
                F.sum(on_time).alias("n_on_time"),
                F.sum(disc_bp).alias("sum_disc_bp")))
    out = (agg.join(F.broadcast(s),
                    F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(n),
                 F.col("s_nationkey") == F.col("n_nationkey")))
    return (out.select(
        "s_name", F.col("n_name").alias("nation"), "n_items",
        "revenue_cents",
        F.floor(F.col("n_on_time") * 1000000 / F.col("n_items"))
        .cast("long").alias("on_time_micro"),
        F.floor(F.col("sum_disc_bp") / F.col("n_items"))
        .cast("long").alias("avg_disc_bp"))
        .orderBy(F.desc("revenue_cents"), "s_name")
        .limit(_SCORE_TOPK))


SCORECARD_SQL = f"""
WITH agg AS (
  SELECT l.l_suppkey, count(*) AS n_items,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                             * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         sum(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) <= {_SLA_D}
                  THEN 1 ELSE 0 END) AS n_on_time,
         CAST(sum(CAST(round(l.l_discount * 10000) AS BIGINT)) AS BIGINT)
           AS sum_disc_bp
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1
)
SELECT s.s_name, n.n_name AS nation, a.n_items, a.revenue_cents,
       CAST(floor(a.n_on_time * 1000000 / a.n_items) AS BIGINT)
         AS on_time_micro,
       CAST(floor(a.sum_disc_bp / a.n_items) AS BIGINT) AS avg_disc_bp
FROM agg a
JOIN supplier s ON s.s_suppkey = a.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY a.revenue_cents DESC, s.s_name
LIMIT {_SCORE_TOPK}
"""


QUERIES["supplier_scorecard"] = (supplier_scorecard, SCORECARD_SQL)
