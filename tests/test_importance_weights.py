"""DSIR-style importance weights (plans/datapipe5.sample_importance_weights).

The oracle hash-check pins exactness; these pin the SEMANTICS — target
docs must score higher than off-target docs — and the scale shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storagetapper_spark.plans.datapipe5 import sample_importance_weights

SF = "/root/testdata/sf0.001"


def test_target_docs_score_higher(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang")
    w = sample_importance_weights(spark, SF)
    joined = w.join(docs, "doc_id")
    rows = (joined.groupBy(F.col("lang") == "en")
            .agg(F.avg("weight_micro").alias("avg_w"))
            .collect())
    by_target = {r[0]: r["avg_w"] for r in rows}
    assert by_target[True] > by_target[False], by_target


def test_no_cartesian_no_python(spark):
    plan = (sample_importance_weights(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    # the only BNLJ allowed is the broadcast 1-row totals scalar
    # (the repo-wide convention, see test_plan_shapes)
    if "BroadcastNestedLoopJoin" in plan:
        assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "PythonUDF" not in plan
    # the 64-row ratio table must broadcast, not shuffle-join
    assert "BroadcastHashJoin" in plan
