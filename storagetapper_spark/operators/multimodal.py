"""Multimodal (image/audio/video) column operators for training-data
pipelines.

Design: media is an opaque ``binary`` column plus typed metadata
(modality, format, width/height/duration, byte size, content hash).
All Spark-side plumbing — schemas, partitioning, Arrow batch shapes,
``mapInPandas`` signatures — is real and tested; only the *codec* step
(actual JPEG/WAV/MP4 decode) is behind ``MEDIA_CODECS``: the container
ships no image/audio libraries, so the default codec is a deterministic
fake that parses the tiny header format used by the tests, and a real
deployment registers Pillow/soundfile/PyAV decoders with the same
signature (clearly marked below).

Scale notes: decode/feature steps run over ``mapInPandas`` so a 100 TB
corpus streams through executors in Arrow batches without ever
collecting; ``spark.sql.files.maxPartitionBytes`` bounds the bytes per
task, and batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (media rows are large —
set it low, e.g. 64, in production jobs).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every media payload
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("modality", T.StringType()),    # image | audio | video
    T.StructField("format", T.StringType()),      # jpeg | png | wav | mp4 | fake
    T.StructField("byte_size", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),      # images/video
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),   # audio/video
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META_SCHEMA),
])

#: the deterministic fake codec's header: magic 'FAKE' + modality byte +
#: width/height/duration — lets tests exercise real parse/decode flow
_FAKE_MAGIC = b"FAKE"
_MODALITIES = {0: "image", 1: "audio", 2: "video"}


def make_fake_payload(modality: str, width: int = 0, height: int = 0,
                      duration_ms: int = 0, body: bytes = b"") -> bytes:
    """Build a payload in the fake container format (tests + fixtures)."""
    mod_code = {v: k for k, v in _MODALITIES.items()}[modality]
    return (_FAKE_MAGIC + struct.pack(">BIIQ", mod_code, width, height, duration_ms)
            + body)


def _decode_fake(payload: bytes) -> dict:
    """The default registered codec — parses the fake container.  A real
    deployment replaces this via MEDIA_CODECS with e.g. Pillow:
    ``Image.open(io.BytesIO(payload))`` returning the same dict keys."""
    if payload is None or len(payload) < 21 or payload[:4] != _FAKE_MAGIC:
        raise ValueError("unrecognized media container")
    mod_code, w, h, dur = struct.unpack(">BIIQ", payload[4:21])
    return {"modality": _MODALITIES[mod_code], "format": "fake",
            "width": w, "height": h, "duration_ms": dur,
            "body": payload[21:]}


#: codec registry (plugin map, like the reference's encoder registry
#: encoder/encoder.go:42-47).  Register real decoders here in production:
#:   MEDIA_CODECS["jpeg"] = pillow_decode
MEDIA_CODECS: dict[str, Callable[[bytes], dict]] = {"fake": _decode_fake}


def _decode(payload: bytes) -> dict:
    last_err = None
    for codec in MEDIA_CODECS.values():
        try:
            return codec(payload)
        except Exception as e:  # noqa: BLE001 — try next codec
            last_err = e
    raise NotImplementedError(
        "no registered codec recognized the payload; real image/audio "
        "decoding requires registering a library-backed codec in "
        f"MEDIA_CODECS (container has none). Last error: {last_err}")


def extract_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload → typed metadata struct via mapInPandas.

    Errors don't kill the job: undecodable payloads get modality=NULL
    (bad-record tolerance a 100 TB crawl needs)."""
    out_schema = T.StructType(list(df.schema.fields) +
                              [T.StructField("meta", MEDIA_META_SCHEMA)])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            metas = []
            for payload in pdf[payload_col]:
                try:
                    d = _decode(payload)
                    metas.append({
                        "modality": d["modality"], "format": d["format"],
                        "byte_size": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": d["width"] or None,
                        "height": d["height"] or None,
                        "duration_ms": d["duration_ms"] or None,
                    })
                except Exception:  # noqa: BLE001
                    metas.append({"modality": None, "format": None,
                                  "byte_size": len(payload) if payload else 0,
                                  "sha256": None, "width": None,
                                  "height": None, "duration_ms": None})
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(gen, out_schema)


def image_resize(df: DataFrame, target_w: int, target_h: int,
                 payload_col: str = "payload") -> DataFrame:
    """Resize images (non-images pass through untouched).  With the fake
    codec this rewrites the header dims and truncates the body
    proportionally — the real-codec version calls PIL's resize; the
    Spark plumbing (schema preservation, batch iteration) is identical."""
    schema = df.schema

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                try:
                    d = _decode(payload)
                    if d["modality"] != "image":
                        out.append(payload)
                        continue
                    scale = (target_w * target_h) / max(d["width"] * d["height"], 1)
                    body = d["body"][:max(1, int(len(d["body"]) * min(scale, 1.0)))]
                    out.append(make_fake_payload("image", target_w, target_h,
                                                 0, body))
                except Exception:  # noqa: BLE001
                    out.append(payload)
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(gen, schema)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """Video → sampled frames (one output row per frame): the fan-out
    shape (mapInPandas emitting more rows than it receives) that frame
    extraction needs at scale.  Fake codec: one synthetic frame per
    ``every_ms`` of duration; real codec: PyAV keyframe iteration."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    d = _decode(payload)
                except Exception:  # noqa: BLE001
                    continue
                if d["modality"] != "video":
                    continue
                n = max(int(d["duration_ms"] // every_ms), 1)
                for i in range(n):
                    ts = i * every_ms
                    rows.append((int(mid), i, ts,
                                 make_fake_payload("image", d["width"],
                                                   d["height"], 0,
                                                   f"frame{i}".encode())))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx",
                                              "frame_ts_ms", "frame"])

    return df.mapInPandas(gen, out_schema)


def media_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id", dim: int = 16) -> DataFrame:
    """Deterministic feature vector per payload (sha256-seeded) — the
    embedding-extraction slot (CLIP/whisper in production, same
    signature: binary in, array<float> out)."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                h = hashlib.sha256(payload or b"").digest()
                vec = [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
                rows.append((int(mid), vec))
            yield pd.DataFrame(rows, columns=[id_col, "feature"])

    return df.mapInPandas(gen, out_schema)
