"""Property tests for the round-6 privacy/conformal/multimodal batch:
each new family is checked against an independent literal-Python (or
numpy) replay, plus the structural guarantees the designs promise
(multi-probe recall, banding pigeonhole, conformal threshold rank,
normalization fixed points)."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from storagetapper_spark.plans.registry import QUERIES


def test_conformal_threshold_is_the_exact_order_statistic(spark, sf_dir):
    row = QUERIES["ml_conformal_split"](spark, sf_dir).collect()[0]
    # k = ceil((n_cal + 1) * 0.9) exactly
    assert row.k == math.ceil((row.n_cal + 1) * 0.9)
    # replay tau in pure Python
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    alphas = sorted(
        (-math.floor(r.embedding[0] * 1000000), r.vec_id)
        for r in emb if r.vec_id % 2 == 0 and r.label == 1)
    assert alphas[row.k - 1][0] == row.tau
    # exchangeability guarantee holds with finite-sample slack
    assert 850000 <= row.coverage_micro <= 1000000


def test_linkage_multiprobe_finds_every_balance_close_pair(spark, sf_dir):
    """The adjacent-band probe must surface EVERY same-nation pair
    within the $25 tolerance (band straddlers included): the matched +
    possible classes together must count at least all such pairs that
    also agree on the other two fields (those score >= possible)."""
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cents = (cust.c_acctbal * 100).apply(math.floor)
    name3 = cust.c_name.str[-3:]
    import itertools
    rows = list(zip(cust.c_custkey, cust.c_nationkey, cents,
                    cust.c_mktsegment, name3))
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r[1], []).append(r)
    score_classes = {"match": 0, "possible": 0, "nonmatch": 0}
    for nation, rs in by_nation.items():
        for a, b in itertools.combinations(rs, 2):
            if abs(math.floor(a[2] / 50000) - math.floor(b[2] / 50000)) > 1:
                continue  # outside the probed bands
            s = (2248 if a[3] == b[3] else -4000) \
                + (4170 if abs(a[2] - b[2]) <= 2500 else -3248) \
                + (6615 if a[4] == b[4] else -5629)
            cls = ("match" if s >= 6000
                   else "possible" if s >= 0 else "nonmatch")
            score_classes[cls] += 1
    got = {r.link_class: r.pairs for r in
           QUERIES["linkage_fellegi_sunter"](spark, sf_dir).collect()}
    for cls, n_want in score_classes.items():
        assert got.get(cls, 0) == n_want, (cls, got, score_classes)


def test_ahash_banding_finds_all_hamming3_pairs(spark, sf_dir):
    """Pigeonhole: 4 bands of 16 bits guarantee recall for Hamming <= 3
    — brute-force pairs at that distance must all be in the result."""
    res = QUERIES["multimodal_ahash_neardup"](spark, sf_dir)
    found = {(r.doc_a, r.doc_b) for r in res.collect()}
    # brute-force over the hashed frame (tiny at test SF)
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    brute = con.execute("""
WITH sized AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 3 = 0
),
wdocs AS (
  SELECT doc_id, norm, greatest(1, length(norm) // 64) AS w FROM sized
),
pixed AS (
  SELECT doc_id, list_transform(range(0, 64),
    i -> CAST(('0x' || substring(md5(substring(norm, i * w + 1, w)),
                                 1, 2)) AS BIGINT)) AS pix
  FROM wdocs
),
summed AS (SELECT doc_id, pix, CAST(list_sum(pix) AS BIGINT) AS s
           FROM pixed),
hashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32),
           i -> CASE WHEN pix[i + 1] * 64 > s
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END))
           AS BIGINT) AS h1,
         CAST(list_sum(list_transform(range(32, 64),
           i -> CASE WHEN pix[i + 1] * 64 > s
                     THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END))
           AS BIGINT) AS h2
  FROM summed
)
SELECT a.doc_id, b.doc_id
FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 3
""").fetchall()
    for pair in brute:
        assert tuple(pair) in found, pair


def test_t_closeness_emd_matches_python_fold(spark, sf_dir):
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = cust.assign(bal_band=(cust.c_acctbal / 1000.0)
                       .apply(math.floor))
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    g = (j.groupby(["c_mktsegment", "c_nationkey", "bal_band"])
         .o_orderpriority.value_counts().unstack(fill_value=0)
         .reindex(columns=prios, fill_value=0))
    gn = int(g.values.sum())
    gcum = np.cumsum(g.values.sum(axis=0))[:4]
    want_max = {}
    for (seg, _, _), row in zip(g.index, g.values):
        n = int(row.sum())
        cum = np.cumsum(row)[:4]
        emd = int(np.abs(cum * gn - gcum * n).sum())
        t_micro = math.floor(emd * 1000000 / (n * gn * 4))
        want_max[seg] = max(want_max.get(seg, 0), t_micro)
    got = {r.c_mktsegment: r.max_t_micro for r in
           QUERIES["privacy_t_closeness"](spark, sf_dir).collect()}
    assert got == want_max


def test_hits_normalization_fixed_points(spark, sf_dir):
    rows = QUERIES["graph_hits"](spark, sf_dir).collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r.score_ppm)
    for role, scores in by_role.items():
        assert max(scores) == 1000000, role   # max normalizes to 1e6
        assert all(0 <= s <= 1000000 for s in scores), role
    assert len(by_role["authority"]) == 15
    assert len(by_role["hub"]) == 15


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    row = QUERIES["ml_linreg_normal"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x1 = li.l_quantity.apply(math.floor)
    x2 = (li.l_discount * 10000 + 0.5).apply(math.floor)
    y = (li.l_extendedprice + 0.5).apply(math.floor)
    X = np.column_stack([np.ones(len(li)), x1, x2]).astype(float)
    beta, *_ = np.linalg.lstsq(X, y.values.astype(float), rcond=None)
    # lstsq (SVD) vs closed form agree to ~1e-9 relative; micro floors
    # may differ by 1 ulp at the boundary — allow +-1 micro
    for got, want in zip((row.b0_micro, row.b1_micro, row.b2_micro),
                         beta):
        assert abs(got - math.floor(want * 1000000)) <= 1, (got, want)


def test_changepoint_matches_python_argmax(spark, sf_dir):
    row = QUERIES["ts_changepoint_mean_shift"](spark, sf_dir).collect()[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (orders.groupby(orders.o_orderdate.dt.date)
             .size().sort_index())
    y = daily.values.astype(int)
    days = list(daily.index)
    s_all, n_all = int(y.sum()), len(y)
    best = None
    s = 0
    for i in range(n_all - 1):
        s += int(y[i])
        n_l, n_r = i + 1, n_all - (i + 1)
        s_r = s_all - s
        score = math.floor((s * s * n_r + s_r * s_r * n_l)
                           / (n_l * n_r))
        if best is None or score > best[0]:
            best = (score, days[i])
    assert row.split_day == best[1]


def test_lift_gains_final_decile_is_identity(spark, sf_dir):
    rows = QUERIES["ml_lift_gains"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    last = rows[-1]
    assert last.recall_micro == 1000000
    assert last.lift_micro == 1000000
    # cumulative counts are non-decreasing down the table
    for a, b in zip(rows, rows[1:]):
        assert b.cum_n >= a.cum_n and b.cum_p >= a.cum_p


def test_boosted_stumps_sse_ladder_decreases(spark, sf_dir):
    row = QUERIES["ml_boosted_stumps"](spark, sf_dir).collect()[0]
    assert row.sse0 >= row.sse1 >= row.sse2
    assert row.sse1 < row.sse0  # stump 1 must actually cut SSE


def test_preference_pairs_match_python_fold(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    groups = {}
    for r in emb:
        s = math.floor(r.embedding[0] * 1000000)
        groups.setdefault(r.vec_id // 20, []).append((s, r.vec_id))
    want = {}
    for pid, rows in groups.items():
        hi = max(s for s, _ in rows)
        lo = min(s for s, _ in rows)
        if hi - lo >= 100000:
            chosen = min(v for s, v in rows if s == hi)
            rejected = min(v for s, v in rows if s == lo)
            want[pid] = (len(rows), chosen, rejected, hi - lo)
    got = {r.prompt_id: (r.n_candidates, r.chosen_vec, r.rejected_vec,
                         r.margin_micro)
           for r in QUERIES["sample_preference_pairs"](
               spark, sf_dir).collect()}
    assert got == want


def test_f1_sweep_matches_python_argmax(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    from collections import Counter
    per_v = Counter()
    pos_v = Counter()
    for r in emb:
        v = math.floor(r.embedding[0] * 1000000)
        per_v[v] += 1
        pos_v[v] += int(r.label == 1)
    n_pos = sum(pos_v.values())
    tp = fp = 0
    best = None
    for v in sorted(per_v, reverse=True):
        tp += pos_v[v]
        fp += per_v[v] - pos_v[v]
        fn = n_pos - tp
        f1 = math.floor(2.0 * tp / (2 * tp + fp + fn) * 1000000.0)
        if best is None or f1 > best[0] or (f1 == best[0] and v > best[1]):
            best = (f1, v, tp, fp, fn)
    row = QUERIES["ml_threshold_sweep_f1"](spark, sf_dir).collect()[0]
    assert (row.f1_micro, row.threshold, row.tp, row.fp, row.fn) == best


def test_generalization_sweep_consistent_with_k_anonymity(spark, sf_dir):
    """The width=1000 row of the lattice sweep must aggregate exactly
    the per-segment privacy_k_anonymity audit (same QI, same data)."""
    per_seg = QUERIES["privacy_k_anonymity"](spark, sf_dir).collect()
    sweep = {r.width: r for r in
             QUERIES["privacy_k_anonymity_generalization"](
                 spark, sf_dir).collect()}
    w1000 = sweep[1000]
    assert w1000.n_groups == sum(r.n_groups for r in per_seg)
    assert w1000.k_anonymity == min(r.k_anonymity for r in per_seg)
    assert w1000.groups_below_k == sum(r.groups_below_k for r in per_seg)
    assert w1000.exposed_rows == sum(r.exposed_rows for r in per_seg)
    # coarser bands can only merge classes: monotone group counts
    widths = sorted(sweep)
    for a, b in zip(widths, widths[1:]):
        assert sweep[b].n_groups <= sweep[a].n_groups


def test_knn_eval_confusion_is_consistent(spark, sf_dir):
    row = QUERIES["ml_knn_eval_ivf"](spark, sf_dir).collect()[0]
    assert row.tp + row.fp + row.fn + row.tn == row.n_scored
    assert row.n_scored <= row.n_test
    assert row.accuracy_micro == math.floor(
        (row.tp + row.tn) * 1000000.0 / row.n_scored)
    # python replay of the full IVF path with Spark's HALF_UP rounding
    from decimal import Decimal, ROUND_HALF_UP

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    import numpy as np
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64),
                       r.label == 1) for r in emb}

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))

    train = sorted(v for v in vecs if v % 2 == 0)
    test = sorted(v for v in vecs if v % 2 == 1 and v < 1000)
    cent = [(i, vecs[v][0]) for i, v in enumerate(train[:16])]
    assign = {}
    for v in train:
        ranked = sorted(((-r6(cos(vecs[v][0], cv)), ci)
                         for ci, cv in cent))
        assign.setdefault(ranked[0][1], []).append(v)
    tp = fp = fn = tn = 0
    for q in test:
        ranked = sorted(((-r6(cos(vecs[q][0], cv)), ci)
                         for ci, cv in cent))
        cand = [v for _, ci in ranked[:4] for v in assign.get(ci, [])]
        top = sorted(((-r6(cos(vecs[q][0], vecs[v][0])), v)
                      for v in cand))[:5]
        k_pos = sum(1 for _, v in top if vecs[v][1])
        pred = k_pos * 2 > len(top)
        truth = vecs[q][1]
        if pred and truth:
            tp += 1
        elif pred:
            fp += 1
        elif truth:
            fn += 1
        else:
            tn += 1
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
