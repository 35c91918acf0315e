"""Streaming conformal calibration: grid linearity (stream == batch),
replay idempotence, and threshold equality with the batch query's
two-pass-rank order statistic."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.streaming import conformal as C


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _calib(spark, sf_dir):
    # the batch query's calibration fold: even vec_ids
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .filter(F.col("vec_id") % 2 == 0))


def test_streaming_grid_equals_batch(spark, sf_dir, tmp_path):
    state = str(tmp_path / "conf")
    calib = _calib(spark, sf_dir)
    for i in range(3):
        C.ingest_batch(spark, calib.filter(F.col("vec_id") % 6 == 2 * i),
                       i, state)
    assert _rows(C.current_grid(spark, state)) == \
        _rows(C.batch_alpha_grid(calib))


def test_streaming_replay_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "conf")
    calib = _calib(spark, sf_dir)
    C.ingest_batch(spark, calib, 0, state)
    before = _rows(C.current_grid(spark, state))
    C.ingest_batch(spark, calib, 0, state)
    assert _rows(C.current_grid(spark, state)) == before


def test_streamed_threshold_equals_batch_order_statistic(
        spark, sf_dir, tmp_path):
    """min{alpha : cum >= k} over the folded grid must equal the batch
    query's k-th-smallest tau on the same calibration rows."""
    state = str(tmp_path / "conf")
    calib = _calib(spark, sf_dir)
    for i in range(3):
        C.ingest_batch(spark, calib.filter(F.col("vec_id") % 6 == 2 * i),
                       i, state)
    got = C.current_threshold(spark, state).collect()[0]
    want = QUERIES["ml_conformal_split"](spark, sf_dir).collect()[0]
    assert (got.n_cal, got.k, got.tau) == \
        (want.n_cal, want.k, want.tau)


def test_availablenow_conformal_sink(spark, sf_dir, tmp_path):
    """Real foreachBatch availableNow run: stream the calibration fold
    through conformal_sink, then recover the batch query's exact
    threshold from the landed state."""
    calib = _calib(spark, sf_dir)
    src = str(tmp_path / "src")
    calib.write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema).parquet(src))
    state = str(tmp_path / "state")
    q = (stream.writeStream
         .foreachBatch(C.conformal_sink(state))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = C.current_threshold(spark, state).collect()[0]
    want = QUERIES["ml_conformal_split"](spark, sf_dir).collect()[0]
    assert (got.n_cal, got.k, got.tau) == \
        (want.n_cal, want.k, want.tau)


def test_insufficient_calibration_emits_null_tau(spark, tmp_path):
    """k > n_cal (fewer than 9 positives at the default 10% level) must
    still emit exactly one (n_cal, k, tau=NULL) row — callers can tell
    'insufficient calibration data' from 'no threshold' (ADVICE r6)."""
    state = str(tmp_path / "conf")
    tiny = spark.createDataFrame(
        [(1, [0.5, 0.1]), (1, [0.25, 0.2]), (0, [0.9, 0.3])],
        "label int, embedding array<double>")
    C.ingest_batch(spark, tiny, 0, state)
    rows = C.current_threshold(spark, state).collect()
    assert len(rows) == 1
    got = rows[0]
    # 2 positives in state; k = ceil(3 * 0.9) = 3 > n_cal = 2
    assert (got.n_cal, got.k, got.tau) == (2, 3, None)
