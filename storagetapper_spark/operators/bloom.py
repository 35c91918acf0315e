"""Bloom-filter join pruning — semi-join reduction for shuffle joins
whose build side is too large to broadcast exactly but whose KEY SET
compresses into a few KB of bitmap.

At 100 TB the classic shape is fact ⋈ filtered-dim where the filtered
dim still has 10⁷-10⁸ keys: too big for an exact broadcast-semi-join,
but a 2²⁰-bit Bloom filter (128 KiB) over those keys ships to every
executor for free and drops 90-99% of fact rows BEFORE the join
shuffle.  False positives only let extra rows through to the exact
join — the result is always exact; the filter is purely a shuffle-bytes
optimization (the same reasoning as Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` InjectRuntimeFilter rule,
which this operator makes explicit and tunable: the built-in rule only
fires on selective-filter heuristics and column stats, while a pipeline
that KNOWS its dim filter is selective can force the reduction).

Mechanics (pure DataFrame ops, one bounded collect):

1. build side → k bit positions per key (``xxhash64(key, seed_i) mod m``),
   OR-folded into 64-bit words with a map-side-combinable ``bit_or`` —
   the shuffle is at most m/64 rows regardless of build-side row count.
2. the m/64 words are collected (bounded: 1024 longs at the default
   m = 2¹⁶) and embedded as an array literal in the probe-side
   predicate; bit tests are ``element_at`` lookups against two literal
   arrays (words, and a 64-entry single-bit mask table — the DSL can't
   shift by a column, and a mask lookup is branch-free anyway).  The
   predicate sits directly above the probe scan, before any Exchange.
3. the exact equi-join then runs on the pruned probe side — false
   positives are eliminated there, so the answer never depends on fpp.

Reference parity: storagetapper ships every row to the sink and lets
consumers filter (pipe/kafka.go routes by key hash — same
hash-the-key primitive, used there for placement, here for pruning).
A Spark-first engine kills the rows at the scan instead.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MASKS[j] = 1 << j as a signed 64-bit long (MASKS[63] is Long.MIN_VALUE)
_MASKS = [(1 << j) - (1 << 64 if j == 63 else 0) for j in range(64)]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) per key value."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def md5_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions per key from salted md5 — slower than xxhash64
    but replayable in DuckDB, so the audit query
    (plans/sketches.sketch_bloom_fp_audit) and the streaming filter
    (streaming/bloom.py) share one definition the oracle can mirror."""
    return [
        F.pmod(F.conv(F.substring(F.md5(F.concat(
            key.cast("string"), F.lit(f":{i}"))), 1, 15), 16, 10)
            .cast("long"), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(build: DataFrame, key: str, m_bits: int = 1 << 16,
                k: int = 4) -> list[int]:
    """Aggregate the build side's keys into an m_bits Bloom bitmap,
    returned as a dense list of m_bits/64 signed 64-bit words.

    The collect is bounded by m_bits/64 (1024 rows at the default),
    never by the build-side row count — safe at any scale."""
    assert m_bits > 0 and m_bits % 64 == 0
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    words = (
        build.select(pos)
        .select((F.col("pos") / 64).cast("int").alias("word_idx"),
                F.element_at(F.lit(_MASKS),
                             (F.col("pos") % 64).cast("int") + 1).alias("bit"))
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    dense = [0] * (m_bits // 64)
    for row in words.collect():
        dense[row["word_idx"]] = row["word"]
    return dense


def bloom_might_contain(key: Column | str, words: list[int],
                        k: int = 4) -> Column:
    """Membership predicate over a bitmap from :func:`bloom_build`.
    No false negatives; false-positive rate ≈ (1 - e^(-k·n/m))^k."""
    m_bits = len(words) * 64
    key = F.col(key) if isinstance(key, str) else key
    words_lit = F.lit(words)
    masks_lit = F.lit(_MASKS)
    conds = []
    for pos in _positions(key, m_bits, k):
        word = F.element_at(words_lit, (pos / 64).cast("int") + 1)
        mask = F.element_at(masks_lit, (pos % 64).cast("int") + 1)
        conds.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, conds)


def bloom_prune_join(probe: DataFrame, build: DataFrame, probe_key: str,
                     build_key: str, m_bits: int = 1 << 16, k: int = 4,
                     how: str = "inner") -> DataFrame:
    """Exact equi-join with the probe side Bloom-pruned first.

    Size m_bits ≈ 10 × expected distinct build keys for ~2% fpp at
    k = 4; the bitmap costs m_bits/8 bytes on every task, so 2²⁰ bits
    (128 KiB) covers ~10⁷ keys comfortably.

    Only inner-flavored joins are exact under pre-filter pruning: an
    outer/anti ``how`` would need the dropped probe rows (they join to
    NULL / survive the anti), so those are rejected rather than
    silently losing rows."""
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_prune_join: how={how!r} is not exact under probe-side "
            "pruning (pruned rows would be needed for outer/anti output); "
            "use 'inner' or 'left_semi'")
    words = bloom_build(build, build_key, m_bits=m_bits, k=k)
    pruned = probe.filter(bloom_might_contain(probe_key, words, k=k))
    return pruned.join(build, pruned[probe_key] == build[build_key], how)
