"""Property tests for the spatial grid-join family and the MASE
backtest: brute-force pair replay (the grid join must find EXACTLY
the within-eps pairs), DBSCAN partition identity, plan-shape guard
(no cartesian), and a pandas MASE replay on the complete calendar."""

import numpy as np
import pandas as pd

from storagetapper_spark.plans.geo import _EPS, _MIN_PTS
from storagetapper_spark.plans.registry import QUERIES


def _points_pd(sf_dir):
    import hashlib
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey"])
    def coord(axis, k):
        h = hashlib.md5(f"{axis}:{k}".encode()).hexdigest()[:8]
        return int(h, 16) % 1000000
    return [(k, coord("x", k), coord("y", k)) for k in c.c_custkey]


def test_grid_join_finds_exactly_the_brute_force_pairs(spark, sf_dir):
    """Correct-by-construction check: cell edge == eps means every
    within-eps pair is cell-adjacent, so grid candidates ⊇ true pairs;
    the exact distance filter then makes the result == brute force."""
    pts = _points_pd(sf_dir)
    brute = sorted(
        ((a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2, a[0], b[0])
        for i, a in enumerate(pts) for b in pts[i + 1:]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= _EPS * _EPS)
    brute = [(min(a, b), max(a, b), d) for d, a, b in brute]
    got = [(r.id_a, r.id_b, r.dist2)
           for r in QUERIES["geo_grid_neighbors"](spark, sf_dir).collect()]
    want = sorted(brute, key=lambda t: (t[2], t[0], t[1]))[:50]
    assert got == want


def test_dbscan_partition_is_exhaustive_and_matches_brute_force(spark,
                                                                sf_dir):
    row = QUERIES["geo_dbscan_core"](spark, sf_dir).collect()[0]
    pts = _points_pd(sf_dir)
    n = len(pts)
    arr = np.array([(x, y) for _, x, y in pts], dtype=np.int64)
    d2 = ((arr[:, None, :] - arr[None, :, :]) ** 2).sum(-1)
    within = (d2 <= _EPS * _EPS) & ~np.eye(n, dtype=bool)
    core = within.sum(1) >= _MIN_PTS
    border = ~core & within[:, core].any(1)
    assert row.n_points == n
    assert row.n_core == int(core.sum())
    assert row.n_border == int(border.sum())
    assert row.n_noise == n - int(core.sum()) - int(border.sum())
    assert row.n_core + row.n_border + row.n_noise == row.n_points


def test_geo_pair_generators_never_go_cartesian(spark, sf_dir):
    for name in ("geo_grid_neighbors", "geo_dbscan_core"):
        plan = (QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_mase_replays_on_the_complete_calendar(spark, sf_dir):
    row = QUERIES["ts_forecast_backtest_mase"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
    per = o.groupby(o.o_orderdate.dt.normalize()).size()
    cal = per.reindex(
        pd.date_range(per.index.min(), per.index.max(), freq="D"),
        fill_value=0)
    c = cal.to_numpy()
    ae_naive = np.abs(c[7:] - c[6:-1]).sum()
    ae_snaive = np.abs(c[7:] - c[:-7]).sum()
    assert row.n_days == len(c) - 7
    assert row.abs_err_naive == ae_naive
    assert row.abs_err_snaive == ae_snaive
    assert row.mase_snaive_micro == int(
        np.floor(ae_snaive / ae_naive * 1e6))


def test_phash_banding_finds_all_hamming3_pairs(spark, sf_dir):
    """Pigeonhole: 4 bands of 16 bits guarantee recall for Hamming <= 3
    — a brute-force DuckDB replay of the quantized DCT pipeline must
    find no <=3 pair the banded query misses."""
    import duckdb

    from storagetapper_spark.plans.multimodal2 import PHASH_SQL

    res = QUERIES["multimodal_phash_dct"](spark, sf_dir)
    found = {(r.doc_a, r.doc_b): r.hamming for r in res.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    hashed_cte = PHASH_SQL.split(",\nbands AS")[0]  # WITH ... hashed
    brute = con.execute(hashed_cte + """
SELECT a.doc_id, b.doc_id,
       bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS ham
FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
""").fetchall()
    close = {(a, b): h for a, b, h in brute if h <= 3}
    for pair, h in close.items():
        assert pair in found and found[pair] == h, (pair, h)
    # and every returned pair's hamming is the true hash distance
    truth = {(a, b): h for a, b, h in brute}
    for pair, h in found.items():
        assert truth[pair] == h
