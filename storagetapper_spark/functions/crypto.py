"""Field-level encryption: AES over individual columns via Spark's
built-in ``aes_encrypt``/``aes_decrypt`` expressions (JVM-side, no
UDF) — the column-granular complement of the file-level AES-256-GCM
chain in sinks/files.py (reference pipe/file.go:384-437 encrypts whole
files; modern pipelines also need per-field crypto so PII columns stay
sealed through intermediate storage while non-sensitive columns remain
queryable).

Mode choice: GCM (default) is authenticated and randomized — same
plaintext encrypts differently each call, so encrypted columns can't
be grouped/joined on.  ``deterministic=True`` switches to ECB, which
IS groupable/joinable (equal plaintexts → equal ciphertexts) at the
cost of leaking equality — the exact trade a tokenization pipeline
makes deliberately.  Keys must be 16/24/32 bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encrypt_col(col: Column, key: str, deterministic: bool = False) -> Column:
    """AES-encrypt a string column → binary ciphertext."""
    mode = "ECB" if deterministic else "GCM"
    return F.aes_encrypt(col.cast("string").cast("binary"),
                         F.lit(key).cast("binary"), F.lit(mode))


def decrypt_col(col: Column, key: str, deterministic: bool = False) -> Column:
    """Invert :func:`encrypt_col` → string plaintext."""
    mode = "ECB" if deterministic else "GCM"
    return F.aes_decrypt(col, F.lit(key).cast("binary"),
                         F.lit(mode)).cast("string")


def seal_columns(df: DataFrame, cols: list[str], key: str,
                 deterministic: bool = False) -> DataFrame:
    """Replace each named column with its ciphertext (base64 string so
    every sink format — json/csv/kafka — carries it safely)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.base64(encrypt_col(F.col(c), key, deterministic)))
    return out


def unseal_columns(df: DataFrame, cols: list[str], key: str,
                   deterministic: bool = False) -> DataFrame:
    """Invert :func:`seal_columns`."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, decrypt_col(F.unbase64(F.col(c)), key, deterministic))
    return out
