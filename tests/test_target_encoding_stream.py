"""Streaming target encoding: stream == batch bit-exactness against
the REGISTERED ml_target_encoding_loo query, replay idempotence, and
the inference-path prior-pull ordering."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t
from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.streaming import target_encoding as TE


def _base(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("p_brand",
                    (F.col("l_returnflag") == "R").cast("long").alias("y"),
                    "l_orderkey"))


def test_streamed_loo_table_equals_registered_batch_query(spark, sf_dir,
                                                          tmp_path):
    state = str(tmp_path / "te")
    base = _base(spark, sf_dir)
    for i in range(3):
        TE.ingest_batch(spark, base.filter(F.col("l_orderkey") % 3 == i),
                        i, state, "p_brand", "y")
    got = sorted(
        tuple(r) for r in
        TE.encoding_table(TE.current_moments(spark, state)).collect())
    want = sorted(
        tuple(r) for r in
        QUERIES["ml_target_encoding_loo"](spark, sf_dir).collect())
    assert got == want


def test_replay_idempotent_and_inference_path(spark, sf_dir, tmp_path):
    state = str(tmp_path / "te")
    base = _base(spark, sf_dir)
    first = base.filter(F.col("l_orderkey") % 3 == 0)
    TE.ingest_batch(spark, first, 0, state, "p_brand", "y")
    before = sorted(tuple(r) for r in
                    TE.current_moments(spark, state).collect())
    TE.ingest_batch(spark, first, 0, state, "p_brand", "y")  # replay
    assert sorted(tuple(r) for r in
                  TE.current_moments(spark, state).collect()) == before
    # inference path: smoothed mean sits strictly between the two LOO
    # values (it includes the row; LOO(y=1) <= mean <= LOO(y=0))
    mom = TE.current_moments(spark, state)
    inf = {r.cat: r.enc_micro
           for r in TE.encoding_table(mom, loo=False).collect()}
    loo = {}
    for r in TE.encoding_table(mom, loo=True).collect():
        loo.setdefault(r.cat, {})[r.y] = r.enc_micro
    for cat, encs in loo.items():
        if len(encs) == 2:
            assert encs[1] <= inf[cat] <= encs[0] + 1, cat
