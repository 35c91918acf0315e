"""Batch file ingestion (corrupt-record policy) and field-level AES."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from storagetapper_spark.functions.crypto import seal_columns, unseal_columns
from storagetapper_spark.sources.files import (
    read_csv_feed,
    read_json_feed,
    split_corrupt,
)

SCHEMA = T.StructType([T.StructField("pk", T.LongType()),
                       T.StructField("val", T.StringType())])


def test_json_feed_poison_lines_go_to_dlq(spark, tmp_path):
    p = tmp_path / "feed.json"
    p.write_text('{"pk": 1, "val": "a"}\n'
                 'not json at all\n'
                 '{"pk": 2, "val": "b"}\n'
                 '{"pk": "type-broken", "val": "c"}\n')
    good, bad = split_corrupt(read_json_feed(spark, str(p), SCHEMA))
    assert {r.pk for r in good.collect()} == {1, 2}
    raws = {r.raw for r in bad.collect()}
    assert "not json at all" in raws
    assert any("type-broken" in r for r in raws)


def test_csv_feed_malformed_rows(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("pk,val\n1,a\nnot-a-long,b\n2,c\n")
    good, bad = split_corrupt(read_csv_feed(spark, str(p), SCHEMA))
    assert {r.pk for r in good.collect()} == {1, 2}
    assert bad.count() == 1


def test_seal_unseal_roundtrip(spark):
    df = spark.createDataFrame([(1, "alice@example.com", "US"),
                                (2, "bob@example.com", "DE")],
                               "id long, email string, country string")
    key = "0123456789abcdef"  # 16-byte AES-128
    sealed = seal_columns(df, ["email"], key)
    vals = {r.email for r in sealed.collect()}
    assert "alice@example.com" not in vals  # actually encrypted
    back = unseal_columns(sealed, ["email"], key)
    assert ({(r.id, r.email) for r in back.collect()}
            == {(1, "alice@example.com"), (2, "bob@example.com")})
    # country column untouched
    assert {r.country for r in sealed.collect()} == {"US", "DE"}


def test_deterministic_mode_is_groupable(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")],
                               "id long, v string")
    key = "0123456789abcdef"
    sealed = seal_columns(df, ["v"], key, deterministic=True)
    counts = {r["count"] for r in sealed.groupBy("v").count().collect()}
    assert counts == {2, 1}  # equal plaintexts grouped together
    # whereas GCM randomizes: every ciphertext distinct
    gcm = seal_columns(df, ["v"], key)
    assert gcm.select("v").distinct().count() == 3


def test_wrong_key_fails_closed(spark):
    df = spark.createDataFrame([(1, "secret")], "id long, v string")
    sealed = seal_columns(df, ["v"], "0123456789abcdef")
    with pytest.raises(Exception):
        unseal_columns(sealed, ["v"], "fedcba9876543210").collect()
