"""Streaming agreement (kappa) state: stream == batch bit-exactness
against the REGISTERED ml_cohen_kappa query, replay idempotence, and
the drift-alarm direction (perfect agreement feed -> kappa 1000)."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t
from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.streaming import agreement as AG


def test_streamed_kappa_equals_registered_batch_query(spark, sf_dir,
                                                      tmp_path):
    state = str(tmp_path / "ag")
    o = t(spark, sf_dir, "orders")
    for i in range(3):
        AG.ingest_batch(spark, o.filter(F.col("o_orderkey") % 3 == i),
                        i, state)
    got = AG.current_kappa(spark, state).collect()[0]
    want = QUERIES["ml_cohen_kappa"](spark, sf_dir).collect()[0]
    assert tuple(got) == tuple(want)


def test_replay_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ag")
    o = t(spark, sf_dir, "orders")
    first = o.filter(F.col("o_orderkey") % 3 == 0)
    AG.ingest_batch(spark, first, 0, state)
    before = sorted(tuple(r) for r in AG.current_cells(spark, state).collect())
    AG.ingest_batch(spark, first, 0, state)  # at-least-once redelivery
    after = sorted(tuple(r) for r in AG.current_cells(spark, state).collect())
    assert after == before


def test_perfect_agreement_saturates_kappa(spark, sf_dir, tmp_path):
    """A feed where rater B is forced equal to rater A must serve
    kappa_milli == 1000 — the fixed point the drift alarm decays from."""
    state = str(tmp_path / "ag")
    o = t(spark, sf_dir, "orders")
    # rig priorities so rater B reproduces rater A's tercile exactly
    rigged = o.withColumn(
        "o_orderpriority",
        F.when(F.col("o_totalprice") < 170000.0, "5-LOW")
        .when(F.col("o_totalprice") < 340000.0, "3-MEDIUM")
        .otherwise("1-URGENT"))
    AG.ingest_batch(spark, rigged, 0, state)
    row = AG.current_kappa(spark, state).collect()[0]
    assert row.kappa_milli == 1000
    assert row.agree == row.n
