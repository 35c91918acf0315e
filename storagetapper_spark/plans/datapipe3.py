"""Query batch: document chunking for training-context preparation —
fixed-width character windows with overlap and whitespace-token-budget
windows.  Both are narrow generator fan-outs (no shuffle) with exact
DuckDB oracles via generate_series."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from storagetapper_spark.operators import text as X
from storagetapper_spark.plans.common import t

_SIZE, _STRIDE, _TOKENS = 200, 150, 64


def text_chunk_fixed(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").select("doc_id", "text")
    return X.chunk_fixed(docs, size=_SIZE, stride=_STRIDE)


CHUNK_FIXED_SQL = f"""
SELECT d.doc_id,
       CAST((u.s - 1) // {_STRIDE} AS INT) AS chunk_id,
       CAST(u.s AS INT) AS chunk_start,
       CAST(length(substr(d.text, CAST(u.s AS INT), {_SIZE})) AS BIGINT)
         AS chunk_len,
       md5(substr(d.text, CAST(u.s AS INT), {_SIZE})) AS chunk_md5
FROM documents d,
     unnest(generate_series(1, greatest(1, length(d.text)), {_STRIDE}))
       AS u(s)
"""


def text_chunk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").select("doc_id", "text")
    return X.chunk_tokens(docs, tokens=_TOKENS)


CHUNK_TOKENS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
)
SELECT t.doc_id,
       CAST((u.s - 1) // {_TOKENS} AS INT) AS chunk_id,
       CAST(u.s AS INT) AS tok_start,
       CAST(len(w[CAST(u.s AS INT):CAST(u.s AS INT) + {_TOKENS - 1}])
            AS BIGINT) AS n_tokens,
       md5(array_to_string(w[CAST(u.s AS INT):CAST(u.s AS INT) + {_TOKENS - 1}],
                           ' ')) AS chunk_md5
FROM toks t,
     unnest(generate_series(1, greatest(1, len(t.w)), {_TOKENS})) AS u(s)
"""


QUERIES = {
    "text_chunk_fixed": (text_chunk_fixed, CHUNK_FIXED_SQL),
    "text_chunk_tokens": (text_chunk_tokens, CHUNK_TOKENS_SQL),
}
