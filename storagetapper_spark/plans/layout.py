"""Storage-layout analytics: zone-map pruning simulation — how much of
the fact table could a scan SKIP for a month predicate, under the
natural (insertion-order) layout vs a shipdate-sorted rewrite?

This is the decision query behind `OPTIMIZE ... ZORDER`-style layout
jobs: zone maps (per-chunk min/max) are what parquet row-group skipping
and Spark's data-source pruning consume, and the benefit of sorting is
exactly the prunable-share delta this query measures.

Plan shape: chunk ids come from the scale-safe two-pass global rank
(4096-row chunks; two INDEPENDENT rank passes over the scan — never
chained, per operators/ranks.py guidance), zone maps are one agg per
layout, and the month-predicate sweep is a broadcast of 6 rows against
the chunk-level table (thousands of rows at any corpus size ÷ 4096).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_CHUNK = 4096
_MONTHS = ["1995-03-01", "1996-01-01", "1996-09-01",
           "1997-06-01", "1998-02-01", "1998-12-01"]


def _zones(li, order_cols, bucket_col) -> DataFrame:
    from storagetapper_spark.operators.ranks import two_pass_rank

    ranked = two_pass_rank(li, order_cols, bucket_col)
    return (ranked.select(
        F.floor((F.col("_rank") - 1) / _CHUNK).alias("chunk"),
        "ship_day")
        .groupBy("chunk")
        .agg(F.min("ship_day").alias("zmin"),
             F.max("ship_day").alias("zmax")))


def layout_zone_map_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """For six sample month predicates: the share of 4096-row chunks a
    zone-map scan skips under the natural layout (orderkey order — low
    shipdate locality) vs a shipdate-sorted layout (near-perfect
    skipping).  The sorted-vs-natural delta is the measured case for a
    layout rewrite."""
    li = (t(spark, sf, "lineitem")
          .select("l_orderkey", "l_linenumber",
                  F.col("l_shipdate").cast("date").alias("ship_day")))
    nat = _zones(li, [F.col("l_orderkey"), F.col("l_linenumber")],
                 F.floor(F.col("l_orderkey") / 65536))
    srt = _zones(li, [F.col("ship_day"), F.col("l_orderkey"),
                      F.col("l_linenumber")],
                 F.floor(F.unix_date(F.col("ship_day")) / 64))
    months = spark.createDataFrame(
        [(m,) for m in _MONTHS], "m string").select(
        F.col("m").cast("date").alias("m_start"),
        F.add_months(F.col("m").cast("date"), 1).alias("m_end"))

    def sweep(z, label):
        miss = ((F.col("zmax") < F.col("m_start"))
                | (F.col("zmin") >= F.col("m_end")))
        return (z.crossJoin(F.broadcast(months))
                .groupBy("m_start")
                .agg(F.count(F.lit(1)).alias(f"n_chunks_{label}"),
                     F.sum(F.when(miss, 1).otherwise(0))
                     .alias(f"n_pruned_{label}")))

    a = sweep(nat, "nat")
    b = sweep(srt, "sorted")
    return (a.join(b, "m_start")
            .select(F.col("m_start").alias("month"),
                    "n_chunks_nat", "n_pruned_nat",
                    F.floor(F.col("n_pruned_nat") * 1000000
                            / F.col("n_chunks_nat")).cast("long")
                    .alias("prune_nat_micro"),
                    "n_chunks_sorted", "n_pruned_sorted",
                    F.floor(F.col("n_pruned_sorted") * 1000000
                            / F.col("n_chunks_sorted")).cast("long")
                    .alias("prune_sorted_micro"))
            .orderBy("month"))


_M_SQL = ", ".join(f"DATE '{m}'" for m in _MONTHS)

ZONE_MAP_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day
  FROM lineitem
),
nat AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY l_orderkey,
                                        l_linenumber) - 1)
                    / {_CHUNK}) AS BIGINT) AS chunk, ship_day
  FROM li
),
srt AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY ship_day, l_orderkey,
                                        l_linenumber) - 1)
                    / {_CHUNK}) AS BIGINT) AS chunk, ship_day
  FROM li
),
zn AS (SELECT chunk, min(ship_day) AS zmin, max(ship_day) AS zmax
       FROM nat GROUP BY chunk),
zs AS (SELECT chunk, min(ship_day) AS zmin, max(ship_day) AS zmax
       FROM srt GROUP BY chunk),
months AS (
  SELECT m_start, m_start + INTERVAL 1 MONTH AS m_end
  FROM (SELECT unnest([{_M_SQL}]) AS m_start)
),
an AS (
  SELECT m.m_start, count(*) AS n_chunks_nat,
         sum(CASE WHEN z.zmax < m.m_start OR z.zmin >= m.m_end
                  THEN 1 ELSE 0 END) AS n_pruned_nat
  FROM zn z CROSS JOIN months m GROUP BY m.m_start
),
asrt AS (
  SELECT m.m_start, count(*) AS n_chunks_sorted,
         sum(CASE WHEN z.zmax < m.m_start OR z.zmin >= m.m_end
                  THEN 1 ELSE 0 END) AS n_pruned_sorted
  FROM zs z CROSS JOIN months m GROUP BY m.m_start
)
SELECT an.m_start AS month,
       CAST(an.n_chunks_nat AS BIGINT) AS n_chunks_nat,
       CAST(an.n_pruned_nat AS BIGINT) AS n_pruned_nat,
       CAST(floor(an.n_pruned_nat * 1000000 / an.n_chunks_nat)
            AS BIGINT) AS prune_nat_micro,
       CAST(asrt.n_chunks_sorted AS BIGINT) AS n_chunks_sorted,
       CAST(asrt.n_pruned_sorted AS BIGINT) AS n_pruned_sorted,
       CAST(floor(asrt.n_pruned_sorted * 1000000 / asrt.n_chunks_sorted)
            AS BIGINT) AS prune_sorted_micro
FROM an JOIN asrt ON asrt.m_start = an.m_start
ORDER BY month
"""


# ------------------------------------------------------- compaction --

_TARGET_BYTES = 8 * 1024 * 1024   # compacted-file target
_ROW_BYTES = 64                   # synthetic manifest row-size estimate


def layout_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction planner: given a file manifest (synthesized
    here as one file per (order-day × status) — the shape the file
    sink's rotation produces, sinks/files.py), assign files to target-
    sized output bins with a cumulative-sum pass.

    bin = floor(running_bytes_before / target) within each partition
    key: contiguous day ranges land in the same output file (preserving
    the sort that makes zone maps work — see layout_zone_map_pruning),
    bins fill to ≥ target except the last, and the whole plan is
    MANIFEST-sized — the window runs over files, never rows, so the
    planner costs the same at 100 TB as at 100 MB."""
    o = t(spark, sf, "orders")
    manifest = (o.groupBy(F.col("o_orderstatus").alias("st"),
                          F.col("o_orderdate").cast("date").alias("day"))
                .agg(F.count(F.lit(1)).alias("n_rows")))
    w = (Window.partitionBy("st").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    files = manifest.select(
        "st", "day", "n_rows",
        (F.col("n_rows") * _ROW_BYTES).alias("bytes"),
        ((F.sum(F.col("n_rows") * _ROW_BYTES).over(w)
          - F.col("n_rows") * _ROW_BYTES) / _TARGET_BYTES)
        .cast("long").alias("bin"))
    return (files.groupBy("st", "bin")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("bytes").alias("bin_bytes"),
                 F.min("day").alias("day_min"),
                 F.max("day").alias("day_max"))
            .orderBy("st", "bin"))


COMPACTION_SQL = f"""
WITH manifest AS (
  SELECT o_orderstatus AS st, CAST(o_orderdate AS DATE) AS day,
         count(*) AS n_rows
  FROM orders GROUP BY 1, 2
),
files AS (
  SELECT st, day, n_rows, n_rows * {_ROW_BYTES} AS bytes,
         CAST((sum(n_rows * {_ROW_BYTES}) OVER w - n_rows * {_ROW_BYTES})
              / {_TARGET_BYTES} AS BIGINT) AS bin
  FROM manifest
  WINDOW w AS (PARTITION BY st ORDER BY day ROWS UNBOUNDED PRECEDING)
)
SELECT st, bin, count(*) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS bin_bytes,
       min(day) AS day_min, max(day) AS day_max
FROM files GROUP BY st, bin
ORDER BY st, bin
"""

# ---------------------------------------------------- bucketed join --

_N_BUCKETS = 8
_BUCKET_YEAR = 1995


def layout_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bucket-pruned shuffle-free join: write orders and lineitem
    bucketed+sorted by the join key (8 buckets, one year's slice), then
    join the bucketed tables — the SortMergeJoin consumes the bucket
    layout directly, with NO Exchange on either side (asserted in
    test_layout.py).

    This is the pre-shuffled layout a 100 TB deployment maintains so
    the every-day fact⋈fact join never pays its shuffle: co-located,
    co-sorted buckets turn the join into a per-bucket streaming merge.
    The hint('merge') pins SMJ so the demonstration doesn't degrade to
    a broadcast at small SF (at 100 TB neither side broadcasts).
    Values are layout-independent (oracle: the plain join)."""
    import tempfile

    o = (t(spark, sf, "orders")
         .filter(F.year("o_orderdate") == _BUCKET_YEAR)
         .select("o_orderkey", "o_orderpriority"))
    # r10 (guide §3.2): semi-join the fact side down to the filtered
    # year's orderkeys BEFORE paying the bucketed write — the inner
    # join discards those rows anyway, so the result is identical while
    # the written bucket files shrink to the year's slice (~1/7 of the
    # rows at any scale).  The broadcast side is the already-filtered
    # orderkey projection.
    li = (t(spark, sf, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(F.broadcast(o.select("o_orderkey")),
                F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"))
    base = tempfile.mkdtemp(prefix="stsp_bucketed_")
    for name, df, key in (("stsp_bkt_orders", o, "o_orderkey"),
                          ("stsp_bkt_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.format("parquet")
         .bucketBy(_N_BUCKETS, key).sortBy(key)
         .option("path", f"{base}/{name}")
         .mode("overwrite").saveAsTable(name))
    ob = spark.table("stsp_bkt_orders").hint("merge")
    lb = spark.table("stsp_bkt_lineitem")
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 100).cast("long")
    return (ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(net).alias("revenue_cents"))
            .orderBy("o_orderpriority"))


BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE year(o_orderdate) = {_BUCKET_YEAR}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------- z-order pruning --

_Z_BITS = 8
_DAY_LO, _DAY_HI = 8000.0, 10600.0   # unix-day bounds covering 1992-98
_PK_BUCKETS = 1024                   # partkey hash-bucket dim (SF-free)
_Z_PREDS = [("1995-03-01", 0, 127), ("1996-09-01", 256, 383),
            ("1997-06-01", 512, 639), ("1998-02-01", 768, 895)]


def _zq_sql(col: str, lo: float, hi: float) -> str:
    span = hi - lo
    return (f"least({(1 << _Z_BITS) - 1}, greatest(0, "
            f"CAST(floor((CAST({col} AS DOUBLE) - {lo!r}) / {span!r} "
            f"* {(1 << _Z_BITS) - 1}) AS BIGINT)))")


def _interleave_sql(qx: str, qy: str) -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({qx} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({qy} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def layout_zorder_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """Two-dimensional layout decision query: for (month × partkey-
    bucket-range) predicates, the share of 4096-row chunks a zone-map
    scan skips under a shipdate-SORTED layout vs a Z-ORDER layout over
    (ship_day, partkey-bucket).

    The single-column sort prunes the date dimension perfectly and the
    partkey dimension not at all; Morton interleaving trades date
    resolution for pruning on BOTH dims.  This is the DECISION query
    behind `OPTIMIZE ZORDER BY`, and on this fixture it returns a
    negative verdict: with ~150 chunks a month predicate is already
    95%-selective under the plain sort, and the z-layout's coarser
    date boxes lose more than its partkey boxes gain — exactly the
    result the query exists to surface before a layout rewrite (the
    z-order win regime — many chunks, balanced 2-D selectivity — is
    proven at file level in test_layout).  Z-values are pure
    shift/and/or (operators/layout.zvalue — codegen, no UDF) with the
    IDENTICAL unrolled interleave in the oracle; bounds are fixed
    literals (at scale they come from table stats, not a scan)."""
    from storagetapper_spark.operators.layout import zvalue

    li = (t(spark, sf, "lineitem")
          .select("l_orderkey", "l_linenumber",
                  F.unix_date(F.col("l_shipdate").cast("date"))
                  .alias("day"),
                  (F.col("l_partkey") % _PK_BUCKETS).alias("pkb")))
    z = zvalue([F.col("day"), F.col("pkb")],
               [(_DAY_LO, _DAY_HI), (0.0, float(_PK_BUCKETS - 1))],
               bits=_Z_BITS)

    def zones(order_cols, bucket):
        from storagetapper_spark.operators.ranks import two_pass_rank

        # bucket must be monotone in the LEADING sort key (the
        # two_pass_rank contract) — one bucketing per layout
        ranked = two_pass_rank(li.withColumn("z", z), order_cols, bucket)
        return (ranked.select(
            F.floor((F.col("_rank") - 1) / _CHUNK).alias("chunk"),
            "day", "pkb")
            .groupBy("chunk")
            .agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"),
                 F.min("pkb").alias("bmin"), F.max("pkb").alias("bmax")))

    srt = zones([F.col("day"), F.col("l_orderkey"),
                 F.col("l_linenumber")],
                F.floor(F.col("day") / 64))
    zord = zones([F.col("z"), F.col("l_orderkey"),
                  F.col("l_linenumber")],
                 F.shiftright(F.col("z"), 6))
    preds = spark.createDataFrame(
        [(m, b0, b1) for m, b0, b1 in _Z_PREDS],
        "m string, b0 long, b1 long").select(
        F.unix_date(F.col("m").cast("date")).alias("d0"),
        F.unix_date(F.add_months(F.col("m").cast("date"), 1)).alias("d1"),
        "b0", "b1", F.col("m").cast("date").alias("month"))

    def sweep(zn, label):
        miss = ((F.col("dmax") < F.col("d0"))
                | (F.col("dmin") >= F.col("d1"))
                | (F.col("bmax") < F.col("b0"))
                | (F.col("bmin") > F.col("b1")))
        return (zn.crossJoin(F.broadcast(preds))
                .groupBy("month", "b0")
                .agg(F.count(F.lit(1)).alias(f"n_chunks_{label}"),
                     F.sum(F.when(miss, 1).otherwise(0))
                     .alias(f"n_pruned_{label}")))

    a = sweep(srt, "sorted")
    b = sweep(zord, "zorder")
    return (a.join(b, ["month", "b0"])
            .select("month", "b0",
                    "n_chunks_sorted", "n_pruned_sorted",
                    "n_chunks_zorder", "n_pruned_zorder",
                    F.floor(F.col("n_pruned_zorder") * 1000000
                            / F.col("n_chunks_zorder")).cast("long")
                    .alias("prune_zorder_micro"))
            .orderBy("month"))


_ZQX = _zq_sql("day", _DAY_LO, _DAY_HI)
_ZQY = _zq_sql("pkb", 0.0, float(_PK_BUCKETS - 1))
_ZPRED_SQL = ", ".join(f"(DATE '{m}', {b0}, {b1})"
                       for m, b0, b1 in _Z_PREDS)

ZORDER_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         date_diff('day', DATE '1970-01-01',
                   CAST(l_shipdate AS DATE)) AS day,
         l_partkey % {_PK_BUCKETS} AS pkb
  FROM lineitem
),
zl AS (
  SELECT l_orderkey, l_linenumber, day, pkb,
         {_interleave_sql(f"({_ZQX})", f"({_ZQY})")} AS z
  FROM li
),
srt AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY day, l_orderkey,
                                        l_linenumber) - 1)
                    / {_CHUNK}) AS BIGINT) AS chunk, day, pkb
  FROM zl
),
zord AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY z, l_orderkey,
                                        l_linenumber) - 1)
                    / {_CHUNK}) AS BIGINT) AS chunk, day, pkb
  FROM zl
),
zs AS (SELECT chunk, min(day) AS dmin, max(day) AS dmax,
              min(pkb) AS bmin, max(pkb) AS bmax
       FROM srt GROUP BY chunk),
zz AS (SELECT chunk, min(day) AS dmin, max(day) AS dmax,
              min(pkb) AS bmin, max(pkb) AS bmax
       FROM zord GROUP BY chunk),
preds AS (
  SELECT CAST(m AS DATE) AS month,
         date_diff('day', DATE '1970-01-01', CAST(m AS DATE)) AS d0,
         date_diff('day', DATE '1970-01-01',
                   CAST(m AS DATE) + INTERVAL 1 MONTH) AS d1,
         b0, b1
  FROM (VALUES {_ZPRED_SQL}) AS v(m, b0, b1)
),
sa AS (
  SELECT p.month, p.b0, count(*) AS n_chunks_sorted,
         sum(CASE WHEN z.dmax < p.d0 OR z.dmin >= p.d1
                    OR z.bmax < p.b0 OR z.bmin > p.b1
                  THEN 1 ELSE 0 END) AS n_pruned_sorted
  FROM zs z CROSS JOIN preds p GROUP BY 1, 2
),
sb AS (
  SELECT p.month, p.b0, count(*) AS n_chunks_zorder,
         sum(CASE WHEN z.dmax < p.d0 OR z.dmin >= p.d1
                    OR z.bmax < p.b0 OR z.bmin > p.b1
                  THEN 1 ELSE 0 END) AS n_pruned_zorder
  FROM zz z CROSS JOIN preds p GROUP BY 1, 2
)
SELECT sa.month, sa.b0,
       CAST(sa.n_chunks_sorted AS BIGINT) AS n_chunks_sorted,
       CAST(sa.n_pruned_sorted AS BIGINT) AS n_pruned_sorted,
       CAST(sb.n_chunks_zorder AS BIGINT) AS n_chunks_zorder,
       CAST(sb.n_pruned_zorder AS BIGINT) AS n_pruned_zorder,
       CAST(floor(sb.n_pruned_zorder * 1000000 / sb.n_chunks_zorder)
            AS BIGINT) AS prune_zorder_micro
FROM sa JOIN sb ON sb.month = sa.month AND sb.b0 = sa.b0
ORDER BY sa.month
"""


QUERIES = {
    "layout_zone_map_pruning": (layout_zone_map_pruning, ZONE_MAP_SQL),
    "layout_compaction_plan": (layout_compaction_plan, COMPACTION_SQL),
    "layout_bucketed_join": (layout_bucketed_join, BUCKETED_JOIN_SQL),
    "layout_zorder_pruning": (layout_zorder_pruning, ZORDER_SQL),
}


_PA_CANDS = ["day", "month", "priority"]


def layout_partition_advisor(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-key advisor: for each candidate partition key of the
    orders fact (by day, by month, by priority) and each predicate in
    a literal 3-query workload (one month, a 30-day range, one
    priority class), the rows a partition-pruned scan must read — the
    what-if analysis behind choosing a table's partitioning before a
    100 TB backfill.  A predicate not aligned with the key prunes
    nothing (the advisor makes that cost visible as scan_ppm =
    1000000).

    All counts are exact integers from ONE pass per candidate key
    (partition value -> rows), with prunability decided per partition
    value; no data is actually re-laid-out."""
    o = t(spark, sf, "orders")
    day = F.to_date("o_orderdate")
    keys = {
        "day": day.cast("string"),
        "month": F.date_format(day, "yyyy-MM"),
        "priority": F.col("o_orderpriority"),
    }
    # literal workload predicates, expressed per candidate partition
    # value (v is the partition key value as a string)
    def may_match(cand: str, wl: str):
        v = F.col("v")
        if wl == "w_month":  # o_orderdate in 1997-03
            if cand == "day":
                return v.startswith("1997-03")
            if cand == "month":
                return v == "1997-03"
            return F.lit(True)
        if wl == "w_range":  # 1996-06-10 <= day < 1996-07-10
            if cand == "day":
                return (v >= "1996-06-10") & (v < "1996-07-10")
            if cand == "month":
                return v.isin("1996-06", "1996-07")
            return F.lit(True)
        # w_prio: priority = '1-URGENT'
        if cand == "priority":
            return v == "1-URGENT"
        return F.lit(True)

    outs = []
    for cand, expr in keys.items():
        per_v = (o.groupBy(expr.alias("v"))
                 .agg(F.count(F.lit(1)).alias("cnt")))
        agg = per_v.agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("cnt").alias("total_rows"),
            *[F.sum(F.when(may_match(cand, wl), F.col("cnt"))
                    .otherwise(0)).alias(wl)
              for wl in ("w_month", "w_range", "w_prio")])
        outs.append(agg.selectExpr(
            f"'{cand}' AS candidate_key", "n_partitions", "total_rows",
            "stack(3, 'month_eq', w_month, 'day_range', w_range, "
            "'priority_eq', w_prio) AS (workload, scanned_rows)"))
    u = outs[0].unionByName(outs[1]).unionByName(outs[2])
    return (u.select(
        "candidate_key", "workload", "n_partitions", "total_rows",
        "scanned_rows",
        F.floor(F.col("scanned_rows") * 1000000 / F.col("total_rows"))
        .cast("long").alias("scan_ppm"))
        .orderBy("candidate_key", "workload"))


PARTITION_ADVISOR_SQL = """
WITH keyed AS (
  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day_v,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month_v,
         o_orderpriority AS prio_v
  FROM orders
),
cands AS (
  SELECT 'day' AS candidate_key, day_v AS v, count(*) AS cnt
  FROM keyed GROUP BY 2
  UNION ALL
  SELECT 'month', month_v, count(*) FROM keyed GROUP BY 2
  UNION ALL
  SELECT 'priority', prio_v, count(*) FROM keyed GROUP BY 2
),
agg AS (
  SELECT candidate_key, count(*) AS n_partitions,
         CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(sum(CASE WHEN candidate_key = 'day'
                         THEN CASE WHEN v LIKE '1997-03%' THEN cnt
                              ELSE 0 END
                       WHEN candidate_key = 'month'
                         THEN CASE WHEN v = '1997-03' THEN cnt ELSE 0 END
                       ELSE cnt END) AS BIGINT) AS w_month,
         CAST(sum(CASE WHEN candidate_key = 'day'
                         THEN CASE WHEN v >= '1996-06-10'
                                   AND v < '1996-07-10' THEN cnt
                              ELSE 0 END
                       WHEN candidate_key = 'month'
                         THEN CASE WHEN v IN ('1996-06', '1996-07')
                                   THEN cnt ELSE 0 END
                       ELSE cnt END) AS BIGINT) AS w_range,
         CAST(sum(CASE WHEN candidate_key = 'priority'
                         THEN CASE WHEN v = '1-URGENT' THEN cnt
                              ELSE 0 END
                       ELSE cnt END) AS BIGINT) AS w_prio
  FROM cands GROUP BY 1
),
stacked AS (
  SELECT candidate_key, 'month_eq' AS workload, n_partitions,
         total_rows, w_month AS scanned_rows FROM agg
  UNION ALL
  SELECT candidate_key, 'day_range', n_partitions, total_rows, w_range
  FROM agg
  UNION ALL
  SELECT candidate_key, 'priority_eq', n_partitions, total_rows, w_prio
  FROM agg
)
SELECT candidate_key, workload, n_partitions, total_rows, scanned_rows,
       CAST(floor(scanned_rows * 1000000 / total_rows) AS BIGINT)
         AS scan_ppm
FROM stacked
ORDER BY candidate_key, workload
"""


QUERIES["layout_partition_advisor"] = (layout_partition_advisor,
                                       PARTITION_ADVISOR_SQL)


def layout_overlap_depth(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map OVERLAP DEPTH — the read-amplification number behind
    layout_zone_map_pruning's skip rates: for a point query on one
    ship day, how many 4096-row chunks must be read, as a
    time-weighted average and max over the calendar, natural layout
    vs shipdate-sorted.  A sorted layout's depth hugs 1-2 (only chunk
    boundaries straddle a day); the natural layout's depth approaches
    ALL chunks (every chunk spans most of the calendar) — this is the
    standard compaction/clustering health metric (cf. Delta/Iceberg
    clustering depth).

    Sweep-line, never chunk x day: each chunk contributes (+1 at zmin,
    -1 after zmax); per-layout prefix sums over the delta days give
    piecewise-constant depth, weighted by run length in days.  All
    exact integers.

    Scale: chunk tables are rows/4096; the sweep windows partition by
    layout over the delta-day domain (calendar-bounded)."""
    li = (t(spark, sf, "lineitem")
          .select("l_orderkey", "l_linenumber",
                  F.col("l_shipdate").cast("date").alias("ship_day")))
    # r10: measured persisting the two chunk tables and REVERTED it —
    # the three readouts share the rank exchanges via ReuseExchange, so
    # the caches only added materialization cost (interleaved A/B at
    # sf0.1: 3.3-3.9s unpersisted vs 4.0-4.5s persisted).
    nat = _zones(li, [F.col("l_orderkey"), F.col("l_linenumber")],
                 F.floor(F.col("l_orderkey") / 65536))
    srt = _zones(li, [F.col("ship_day"), F.col("l_orderkey"),
                      F.col("l_linenumber")],
                 F.floor(F.unix_date(F.col("ship_day")) / 64))
    layers = [("natural", nat), ("sorted", srt)]
    deltas = None
    for label, z in layers:
        d = (z.select(F.lit(label).alias("layout"),
                      F.unix_date(F.col("zmin")).alias("day"),
                      F.lit(1).alias("delta"))
             .unionByName(
                 z.select(F.lit(label).alias("layout"),
                          (F.unix_date(F.col("zmax")) + 1).alias("day"),
                          F.lit(-1).alias("delta"))))
        deltas = d if deltas is None else deltas.unionByName(d)
    per_day = (deltas.groupBy("layout", "day")
               .agg(F.sum("delta").alias("d")))
    w = Window.partitionBy("layout").orderBy("day")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = (per_day
            .withColumn("depth", F.sum("d").over(wc))
            .withColumn("span", F.lead("day").over(w) - F.col("day"))
            .filter(F.col("span").isNotNull()))
    per_layout = (runs.groupBy("layout")
                  .agg(F.max("depth").alias("max_depth"),
                       F.sum(F.col("depth") * F.col("span"))
                       .alias("depth_days"),
                       F.sum("span").alias("span_days")))
    n_chunks = None
    for label, z in layers:
        c = z.agg(F.lit(label).alias("layout"),
                  F.count(F.lit(1)).alias("n_chunks"))
        n_chunks = c if n_chunks is None else n_chunks.unionByName(c)
    return (per_layout.join(n_chunks, "layout")
            .select("layout", "n_chunks", "max_depth", "span_days",
                    F.floor(F.col("depth_days") * 1000
                            / F.col("span_days")).cast("long")
                    .alias("avg_depth_milli"))
            .orderBy("layout"))


OVERLAP_DEPTH_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1
           AS rn_nat,
         row_number() OVER (ORDER BY CAST(l_shipdate AS DATE),
                            l_orderkey, l_linenumber) - 1 AS rn_srt
  FROM lineitem
),
nat AS (
  SELECT rn_nat // 4096 AS chunk, min(ship_day) AS zmin,
         max(ship_day) AS zmax
  FROM base GROUP BY 1
),
srt AS (
  SELECT rn_srt // 4096 AS chunk, min(ship_day) AS zmin,
         max(ship_day) AS zmax
  FROM base GROUP BY 1
),
deltas AS (
  SELECT 'natural' AS layout, datediff('day', DATE '1970-01-01', zmin)
           AS day, 1 AS delta FROM nat
  UNION ALL
  SELECT 'natural', datediff('day', DATE '1970-01-01', zmax) + 1, -1
  FROM nat
  UNION ALL
  SELECT 'sorted', datediff('day', DATE '1970-01-01', zmin), 1 FROM srt
  UNION ALL
  SELECT 'sorted', datediff('day', DATE '1970-01-01', zmax) + 1, -1
  FROM srt
),
per_day AS (
  SELECT layout, day, CAST(sum(delta) AS BIGINT) AS d
  FROM deltas GROUP BY 1, 2
),
runs AS (
  SELECT layout, day,
         sum(d) OVER (PARTITION BY layout ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS depth,
         lead(day) OVER (PARTITION BY layout ORDER BY day) - day AS span
  FROM per_day
),
per_layout AS (
  SELECT layout, CAST(max(depth) AS BIGINT) AS max_depth,
         CAST(sum(depth * span) AS BIGINT) AS depth_days,
         CAST(sum(span) AS BIGINT) AS span_days
  FROM runs WHERE span IS NOT NULL
  GROUP BY layout
),
nc AS (
  SELECT 'natural' AS layout, count(*) AS n_chunks FROM nat
  UNION ALL SELECT 'sorted', count(*) FROM srt
)
SELECT p.layout, c.n_chunks, p.max_depth, p.span_days,
       CAST(floor(p.depth_days * 1000 / p.span_days) AS BIGINT)
         AS avg_depth_milli
FROM per_layout p JOIN nc c ON c.layout = p.layout
ORDER BY p.layout
"""


QUERIES["layout_overlap_depth"] = (layout_overlap_depth,
                                   OVERLAP_DEPTH_SQL)
