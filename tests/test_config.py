"""Layered config merge (config/config.go analog): defaults < files <
env < per-table params, with type-coerced env overrides."""

import json

from storagetapper_spark.config import (
    DEFAULTS,
    for_table,
    load_config,
    spark_trigger,
    spark_writer_options,
)


def test_defaults_match_reference_knobs():
    cfg = load_config(env={})
    assert cfg["pipe"]["max_batch_size"] == 4096
    assert cfg["pipe"]["max_batch_size_bytes"] == 32 << 20
    assert cfg["kafka"]["max_message_bytes"] == 30 << 20
    assert cfg["changelog"]["seqno_save_interval"] == 1_000_000
    assert cfg["throttle"]["target_mb"] == 0


def test_file_then_env_then_table_precedence(tmp_path):
    base = tmp_path / "base.json"
    base.write_text(json.dumps(
        {"pipe": {"max_batch_size": 1000}, "output": {"format": "msgpack"}}))
    svc = tmp_path / "svc.yaml"
    svc.write_text("pipe:\n  max_batch_size: 2000\n")
    env = {"STSPARK__PIPE__MAX_BATCH_SIZE": "3000",
           "STSPARK__CHANGELOG__NO_DELETE_ON_UPDATE": "true",
           "UNRELATED": "x"}
    cfg = load_config([str(base), str(svc)], env=env)
    assert cfg["pipe"]["max_batch_size"] == 3000          # env wins files
    assert cfg["output"]["format"] == "msgpack"           # file wins default
    assert cfg["changelog"]["no_delete_on_update"] is True  # bool coercion
    assert cfg["pipe"]["max_file_size"] == 1 << 30        # default survives

    merged = for_table(cfg, {"output": {"pipe": "kafka"},
                             "pipe": {"max_batch_size": 9}})
    assert merged["output"]["pipe"] == "kafka"
    assert merged["pipe"]["max_batch_size"] == 9          # table wins all
    assert cfg["pipe"]["max_batch_size"] == 3000          # no mutation


def test_defaults_are_never_mutated():
    before = json.dumps(DEFAULTS, sort_keys=True)
    cfg = load_config(env={"STSPARK__PIPE__COMPRESSION": "false"})
    assert cfg["pipe"]["compression"] is False
    assert json.dumps(DEFAULTS, sort_keys=True) == before


def test_spark_translations():
    cfg = load_config(env={})
    assert spark_writer_options(cfg)["compression"] == "gzip"
    assert spark_trigger(cfg) == {"processingTime": "1.0 seconds"}


def test_config_drives_snapshot_job(spark, tmp_path, sf_dir):
    """Per-table params flow through the layered config into the sink
    (uncompressed output when the table's params turn compression off)."""
    import glob
    import os

    from storagetapper_spark.jobs import run_snapshot_job
    from storagetapper_spark.state import Registry, TableRegistration

    reg_store = Registry(str(tmp_path / "reg.json"))
    reg = reg_store.register(TableRegistration(
        service="s", cluster="c", db="tpch", table="nation",
        pk_cols=["n_nationkey"],
        params={"pipe": {"compression": False}}))
    src = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    cfg = load_config(env={})
    out = str(tmp_path / "out")
    run_snapshot_job(spark, reg_store, reg, src, out, config=cfg)
    files = glob.glob(os.path.join(out, "**", "part-*"), recursive=True)
    assert files and not any(f.endswith(".gz") for f in files)
