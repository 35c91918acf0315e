"""Semantic invariants of the round-4 query batches (the DuckDB oracle
checks value equality; these check the MEANING holds on the fixture)."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t, t
from storagetapper_spark.plans.registry import QUERIES


def test_gapfill_spine_is_complete(spark, sf_dir):
    out = QUERIES["gapfill_daily_locf"](spark, sf_dir)
    ev = events_t(spark, sf_dir)
    n_types = ev.select("event_type").distinct().count()
    days = ev.agg(
        (F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))) + 1)
        .alias("d")).collect()[0].d
    rows = out.collect()
    assert len(rows) == n_types * days
    # LOCF: after the first non-null, no null locf values remain
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.event_type, str(r.day))):
        seen = by_type.setdefault(r.event_type, False)
        if seen:
            assert r.locf_avg_value is not None
        if r.locf_avg_value is not None:
            by_type[r.event_type] = True


def test_transitions_count_totals(spark, sf_dir):
    out = QUERIES["event_transitions"](spark, sf_dir)
    ev = events_t(spark, sf_dir)
    total = ev.count()
    users = ev.select("user_id").distinct().count()
    assert (out.agg(F.sum("n_transitions")).collect()[0][0]
            == total - users)  # each user contributes len-1 transitions


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    out = QUERIES["q13_customer_distribution"](spark, sf_dir)
    dist = {r.c_count: r.custdist for r in out.collect()}
    cust = t(spark, sf_dir, "customer").count()
    assert sum(dist.values()) == cust  # every customer lands in a bucket


def test_reservoir_exact_k_per_group(spark, sf_dir):
    out = QUERIES["sample_reservoir_per_group"](spark, sf_dir)
    per_lang = {r.lang: r["count"] for r in
                out.groupBy("lang").count().collect()}
    docs_per_lang = {r.lang: r["count"] for r in
                     t(spark, sf_dir, "documents")
                     .groupBy("lang").count().collect()}
    for lang, n in per_lang.items():
        assert n == min(10, docs_per_lang[lang])
    # determinism: a second run picks the identical sample
    a = {(r.lang, r.doc_id) for r in out.collect()}
    b = {(r.lang, r.doc_id) for r in
         QUERIES["sample_reservoir_per_group"](spark, sf_dir).collect()}
    assert a == b


def test_q15_returns_the_true_max(spark, sf_dir):
    out = QUERIES["q15_top_supplier"](spark, sf_dir).collect()
    assert len(out) >= 1
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    best = (li.groupBy("l_suppkey")
              .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .alias("rev"))
              .orderBy(F.desc("rev")).limit(1).collect()[0])
    assert out[0].s_suppkey == best.l_suppkey


def test_quality_gate_reasons_match_flag(spark, sf_dir):
    rows = QUERIES["quality_gate"](spark, sf_dir).collect()
    for r in rows:
        assert r.keep == (r.drop_reasons == "")
