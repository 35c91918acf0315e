"""Leakage-safe dataset split: near-duplicate clusters must never
straddle train/val/test (the benchmark-leakage failure mode a
per-document split cannot prevent) — the invariant behind the
`sample_split_leakage_safe` registry query."""


def test_leakage_safe_split_never_splits_a_cluster(spark, sf_dir):
    """The property the query exists for: every near-duplicate cluster
    lands wholly in ONE split (keyed by component, not doc), while the
    assignment stays disjoint + exhaustive over docs."""
    from pyspark.sql import functions as F

    from storagetapper_spark.operators import dedup as D
    from storagetapper_spark.operators.dedup import connected_components
    from storagetapper_spark.operators.sampling import split_assign
    from storagetapper_spark.plans.common import t

    docs = t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, bucket_cols=["lang", "source"],
                                  shingle_n=3, threshold=0.1)
    comp = connected_components(pairs, "id_a", "id_b")
    with_comp = (docs.join(comp, docs.doc_id == comp.node, "left")
                 .withColumn("component",
                             F.coalesce("comp", F.col("doc_id"))))
    assigned = split_assign(with_comp, "component").persist()
    n_docs = docs.count()
    assert assigned.count() == n_docs            # exhaustive
    straddling = (assigned.groupBy("component")
                  .agg(F.countDistinct("split").alias("ns"))
                  .where("ns > 1").count())
    assert straddling == 0                       # the leakage guarantee
    # and there IS at least one multi-doc cluster being protected
    assert (assigned.groupBy("component").count()
            .where("count > 1").count()) > 0
    assigned.unpersist()
