"""Time-series subsequence similarity search — the UCR-style
z-normalized Euclidean sliding-window match (cf. the EDBT'19 streaming
time-series-similarity line of work in PAPERS.md), over the daily
event-count series.

Shape: one daily rollup (map-side combined), per-series sliding windows
via a 7-row frame collect_list (partitioned by series — bounded state),
a 1-row broadcast of the query window, then a narrow per-window
distance expression and a global top-k.  The corpus of windows never
self-joins; cost is O(total windows), the plan a matrix-profile-lite
scan wants at 100 TB of telemetry.

Exactness: window values are integer counts (exact in doubles), so
mean/variance agree bit-for-bit across engines; the distance leaves as
floor(dist·10⁶) so no half-rounding boundary can flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_W = 7          # window length (days)
_TOPK = 10
_QUERY_TYPE = "purchase"


def ts_similarity_search(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 windows most similar to the FIRST full 7-day window of
    the 'purchase' series, across all series and offsets (z-normalized
    ED, row-based windows — gaps in the calendar keep their row
    adjacency, identically in the oracle)."""
    ev = t(spark, sf, "events")
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.currentRow, _W - 1))
    wins = (daily.select("event_type", "day",
                         F.collect_list("cnt").over(w).alias("arr"))
            .filter(F.size("arr") == _W))
    s = F.aggregate("arr", F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate("arr", F.lit(0.0), lambda a, x: a + x * x)
    mu = (s / _W).alias("mu")
    sig = F.sqrt(s2 / _W - (s / _W) * (s / _W)).alias("sig")
    valid = wins.select("*", mu, sig).filter(F.col("sig") > 1e-9)
    q = (valid.filter(F.col("event_type") == _QUERY_TYPE)
         .orderBy("day").limit(1)
         .select(F.col("event_type").alias("qtype"),
                 F.col("day").alias("qday"),
                 F.col("arr").alias("qarr"),
                 F.col("mu").alias("qmu"),
                 F.col("sig").alias("qsig")))
    joined = (valid.crossJoin(F.broadcast(q))
              .filter(~((F.col("event_type") == F.col("qtype"))
                        & (F.col("day") == F.col("qday")))))
    diff2 = F.zip_with(
        "arr", "qarr",
        lambda x, y: ((x - F.col("mu")) / F.col("sig")
                      - (y - F.col("qmu")) / F.col("qsig")) ** 2)
    dist = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x))
    return (joined.select(
        "event_type", F.col("day").alias("window_start"),
        F.floor(dist * 1000000).cast("long").alias("dist_micro"))
        .orderBy("dist_micro", "event_type", "window_start")
        .limit(_TOPK))


TS_SIMILARITY_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1, 2
),
wins0 AS (
  SELECT event_type, day,
         list(cnt) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN CURRENT ROW
                                  AND {_W - 1} FOLLOWING) AS arr
  FROM daily
),
wins AS (
  SELECT event_type, day, arr,
         list_sum(arr) / {_W} AS mu,
         sqrt(list_sum(list_transform(arr, x -> x * x)) / {_W}
              - pow(list_sum(arr) / {_W}, 2)) AS sig
  FROM wins0 WHERE len(arr) = {_W}
),
valid AS (SELECT * FROM wins WHERE sig > 1e-9),
q AS (
  SELECT event_type AS qtype, day AS qday, arr AS qarr,
         mu AS qmu, sig AS qsig
  FROM valid WHERE event_type = '{_QUERY_TYPE}'
  ORDER BY day LIMIT 1
)
SELECT v.event_type, v.day AS window_start,
       CAST(floor(sqrt(list_sum(list_transform(range(1, {_W + 1}),
              i -> pow((v.arr[i] - v.mu) / v.sig
                       - (q.qarr[i] - q.qmu) / q.qsig, 2))))
            * 1000000) AS BIGINT) AS dist_micro
FROM valid v, q
WHERE NOT (v.event_type = q.qtype AND v.day = q.qday)
ORDER BY dist_micro, v.event_type, v.day
LIMIT {_TOPK}
"""


QUERIES = {
    "ts_similarity_search": (ts_similarity_search, TS_SIMILARITY_SQL),
}


_EXCL = 3  # trivial-match exclusion zone (windows overlapping ±3 rows)


def ts_discord_detection(spark: SparkSession, sf: str) -> DataFrame:
    """Matrix-profile discord: per series, the window FARTHEST from its
    nearest non-trivial neighbor (the classic anomaly definition of
    the matrix-profile line of work).  Windows index by row position;
    neighbors within ±3 positions are excluded as trivial matches.

    Scale shape: the self-join is WITHIN each series only — Σ(len²)
    over series, never across them; a 100 TB telemetry store has many
    series of bounded length, so per-series quadratic is the accepted
    matrix-profile cost (and the reason the join key is event_type).
    Distances reuse the exact-integer z-norm math of
    ts_similarity_search; output ships as floor(dist·10⁶)."""
    ev = t(spark, sf, "events")
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.currentRow, _W - 1))
    rk = Window.partitionBy("event_type").orderBy("day")
    wins = (daily.select("event_type", "day",
                         F.collect_list("cnt").over(w).alias("arr"))
            .filter(F.size("arr") == _W)
            .withColumn("idx", F.row_number().over(rk)))
    s = F.aggregate("arr", F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate("arr", F.lit(0.0), lambda a, x: a + x * x)
    valid = (wins.select(
        "*", (s / _W).alias("mu"),
        F.sqrt(s2 / _W - (s / _W) * (s / _W)).alias("sig"))
        .filter(F.col("sig") > 1e-9))
    a = valid.select("event_type", F.col("day").alias("a_day"),
                     F.col("idx").alias("a_idx"), F.col("arr").alias("a_arr"),
                     F.col("mu").alias("a_mu"), F.col("sig").alias("a_sig"))
    b = valid.select("event_type", F.col("idx").alias("b_idx"),
                     F.col("arr").alias("b_arr"),
                     F.col("mu").alias("b_mu"), F.col("sig").alias("b_sig"))
    pairs = a.join(b, "event_type").filter(
        F.abs(F.col("a_idx") - F.col("b_idx")) > _EXCL)
    diff2 = F.zip_with(
        "a_arr", "b_arr",
        lambda x, y: ((x - F.col("a_mu")) / F.col("a_sig")
                      - (y - F.col("b_mu")) / F.col("b_sig")) ** 2)
    dist = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))
    nn = (pairs.select("event_type", "a_day",
                       F.floor(dist * 1000000).cast("long").alias("d"))
          .groupBy("event_type", "a_day")
          .agg(F.min("d").alias("nn_dist_micro")))
    top = Window.partitionBy("event_type").orderBy(
        F.desc("nn_dist_micro"), "a_day")
    return (nn.withColumn("r", F.row_number().over(top))
            .filter(F.col("r") == 1)
            .select("event_type", F.col("a_day").alias("discord_day"),
                    "nn_dist_micro")
            .orderBy("event_type"))


TS_DISCORD_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1, 2
),
wins0 AS (
  SELECT event_type, day,
         list(cnt) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN CURRENT ROW
                                  AND {_W - 1} FOLLOWING) AS arr,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx
  FROM daily
),
valid AS (
  SELECT event_type, day, arr, idx,
         list_sum(arr) / {_W} AS mu,
         sqrt(list_sum(list_transform(arr, x -> x * x)) / {_W}
              - pow(list_sum(arr) / {_W}, 2)) AS sig
  FROM wins0 WHERE len(arr) = {_W}
    AND sqrt(list_sum(list_transform(arr, x -> x * x)) / {_W}
             - pow(list_sum(arr) / {_W}, 2)) > 1e-9
),
nn AS (
  SELECT a.event_type, a.day AS a_day,
         min(CAST(floor(sqrt(list_sum(list_transform(
               range(1, {_W + 1}),
               i -> pow((a.arr[i] - a.mu) / a.sig
                        - (b.arr[i] - b.mu) / b.sig, 2))))
             * 1000000) AS BIGINT)) AS nn_dist_micro
  FROM valid a JOIN valid b
    ON a.event_type = b.event_type AND abs(a.idx - b.idx) > {_EXCL}
  GROUP BY a.event_type, a.day
),
top AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY nn_dist_micro DESC, a_day) AS r
  FROM nn
)
SELECT event_type, a_day AS discord_day, nn_dist_micro
FROM top WHERE r = 1
ORDER BY event_type
"""


QUERIES["ts_discord_detection"] = (ts_discord_detection, TS_DISCORD_SQL)


_PATTERN = "view,click,purchase"


def events_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE-style CONTIGUOUS sequence detection: users whose
    event stream contains the exact consecutive triple
    view→click→purchase (no intervening events — stricter than the
    funnel queries, which allow gaps), with how many times it occurs.

    Spark lacks MATCH_RECOGNIZE; the idiomatic plan is: per-user
    ordered event-type string (array_sort of (ts, event_id, type)
    structs → the sort is deterministic under ts ties) + a substring
    occurrence count — one user-keyed agg, pattern matching as a
    narrow string expression.  Per-user state is the user's OWN event
    list (bounded), the shuffle is one row per user."""
    ev = t(spark, sf, "events")
    seq = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))),
        lambda s: s["event_type"])
    per_user = (ev.groupBy("user_id")
                .agg(F.array_join(seq, ",").alias("stream")))
    # occurrence count via the length/replace identity (portable, and
    # non-overlapping exactly like a MATCH_RECOGNIZE scan)
    n = ((F.length("stream")
          - F.length(F.regexp_replace(F.col("stream"),
                                      _PATTERN.replace(",", ","), "")))
         / F.lit(len(_PATTERN))).cast("long")
    return (per_user.select("user_id", n.alias("n_matches"))
            .filter(F.col("n_matches") > 0)
            .orderBy("user_id"))


EVENTS_PATTERN_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         string_agg(event_type, ',' ORDER BY ts, event_id) AS stream
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST((length(stream) - length(replace(stream, '{_PATTERN}', '')))
            / {len(_PATTERN)} AS BIGINT) AS n_matches
FROM per_user
WHERE length(stream) - length(replace(stream, '{_PATTERN}', '')) > 0
ORDER BY user_id
"""


QUERIES["events_pattern_match"] = (events_pattern_match, EVENTS_PATTERN_SQL)
