"""operators/graph.pagerank: mode equivalence and known-graph sanity."""

import math

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.graph import pagerank


@pytest.fixture(scope="module")
def star_edges(spark):
    # hub 0 connected to 1..5, plus a 6-7 appendage pair
    rows = [(0, i) for i in range(1, 6)] + [(6, 7)]
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def test_eager_and_lazy_agree_exactly(spark, star_edges):
    e = {r.node: r.pr for r in
         pagerank(star_edges, iterations=4, eager=True).collect()}
    l = {r.node: r.pr for r in
         pagerank(star_edges, iterations=4, eager=False).collect()}
    assert e.keys() == l.keys()
    for k in e:
        assert math.isclose(e[k], l[k], rel_tol=1e-12)


def test_rank_mass_conserved(spark, star_edges):
    out = pagerank(star_edges, iterations=6).collect()
    assert math.isclose(sum(r.pr for r in out), 1.0, rel_tol=1e-9)


def test_hub_outranks_leaves(spark, star_edges):
    pr = {r.node: r.pr for r in pagerank(star_edges, iterations=6).collect()}
    assert pr[0] > pr[1]                      # hub beats its leaves
    assert math.isclose(pr[6], pr[7], rel_tol=1e-12)  # symmetric pair
    leaves = [pr[i] for i in range(1, 6)]
    assert max(leaves) - min(leaves) < 1e-12  # leaves are interchangeable


def test_scaled_mean_is_one(spark, star_edges):
    out = pagerank(star_edges, iterations=3, scaled=True).collect()
    assert math.isclose(sum(r.pr for r in out) / len(out), 1.0, rel_tol=1e-9)


def test_dedup_false_requires_unique_edges(spark):
    # duplicate edge doubles the weight: dedup=True collapses it
    dup = spark.createDataFrame([(1, 2), (1, 2), (2, 3)], ["id_a", "id_b"])
    with_dedup = {r.node: r.pr for r in
                  pagerank(dup, iterations=3, dedup=True).collect()}
    uniq = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    baseline = {r.node: r.pr for r in
                pagerank(uniq, iterations=3, dedup=False).collect()}
    for k in baseline:
        assert math.isclose(with_dedup[k], baseline[k], rel_tol=1e-12)


def test_directed_pagerank_keeps_sources_sinks_and_mass(spark):
    """ADVICE r3: directed mode used to drop no-in-edge nodes after
    iteration 1 (losing their restart mass and out-contributions),
    exclude pure sinks from the node set, and never redistribute
    dangling mass.  On a chain-with-sink graph a→b→c, d→c: all four
    nodes must appear every iteration and Σpr must stay 1."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "c")], "id_a string, id_b string")
    for eager in (True, False):
        out = {r.node: r.pr for r in pagerank(
            edges, iterations=5, directed=True, eager=eager).collect()}
        assert set(out) == {"a", "b", "c", "d"}, out
        assert abs(sum(out.values()) - 1.0) < 1e-9
        # sources keep exactly the restart share (+ uniform dangling)
        assert out["a"] == out["d"]
        # the sink accumulates the most mass
        assert out["c"] == max(out.values())


def test_directed_personalized_pagerank_conserves_mass(spark):
    """Personalized directed: dangling mass restarts on the seed set;
    Σpr stays 1 and off-seed sources hold zero rank."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string")
    seed = spark.createDataFrame([("a", 1.0)], "node string, p0 double")
    out = {r.node: r.pr for r in pagerank(
        edges, iterations=8, directed=True, eager=True,
        personalization=seed).collect()}
    assert set(out) == {"a", "b", "c"}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["a"] > out["b"] > 0 and out["c"] > 0
