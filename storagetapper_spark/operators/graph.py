"""Iterative graph algorithms over edge DataFrames.

Complements operators/dedup.connected_components (min-label
propagation): pagerank() is the other graph primitive a large-corpus
pipeline needs — link-analysis scoring for quality weighting (the
web-corpus analog: rank pages/domains by citation structure before
sampling training data).

Execution model: the edge list is the ONLY thing that shuffles; node
payloads never move.  Each iteration is one join + one aggregate, with
the new rank generation persisted eagerly and the old retired —
without that, iteration k re-derives the whole k-deep lineage (same
hazard documented in connected_components).  At 100 TB the edge table
is bucketed by src so every iteration's join is co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, a_col: str = "id_a", b_col: str = "id_b",
             iterations: int = 5, damping: float = 0.85,
             directed: bool = False, dedup: bool = True,
             eager: bool = True, scaled: bool = False,
             weight_col: str | None = None,
             personalization: DataFrame | None = None) -> DataFrame:
    """PageRank over an edge list → (node, pr).

    ``directed=False`` (default) symmetrizes the edges first, which
    guarantees every node has out-degree ≥ 1 — no dangling-mass
    redistribution term needed.  Fixed ``iterations`` (not
    convergence-tested) keeps the result deterministic and
    oracle-checkable; 5 rounds is within ~1% of the fixed point on
    small-diameter co-occurrence graphs.

    ``dedup=False`` skips the symmetrized-edge distinct — pass it when
    the caller guarantees uniqueness (e.g. distinct pairs with a
    strict a<b orientation, whose two mirrored directions cannot
    collide).  That elides a full shuffle of the edge list.

    ``eager`` picks the iteration style.  True: persist + materialize
    each rank generation before retiring the last — mandatory for
    many/convergence-tested iterations, where unmaterialized lineage
    depth explodes.  False: build one lazy plan across all iterations
    — for a FIXED small count this is ~35% faster (measured 5.3s vs
    8.0s at sf0.1): Catalyst plans once, the rank side of every round
    is a chained broadcast join against the single persisted adjacency
    cache, and no per-generation action pays scheduler overhead.

    ``scaled=True`` multiplies pr by the node count before returning
    (≈1.0 under a uniform distribution) — done here because only the
    operator knows n without forcing callers to recount the lineage.

    ``weight_col`` names an edge-weight column: contributions become
    pr·w/strength(src) (strength = Σ out-weights) — co-occurrence
    counts, affinity scores, etc.

    ``personalization`` is a (node, p0) DataFrame for PERSONALIZED
    PageRank: the restart mass (1−d) lands on p0 (normalized here)
    instead of uniformly — the recommendation/seed-expansion form.
    Nodes outside the seed set start at 0 and only earn rank through
    link mass.  It must be small (it broadcasts into every iteration).

    Returns pr at full precision — callers round at the boundary.
    """
    if directed and not eager:
        # a directed round references the previous generation TWICE
        # (link contributions + the dangling-mass aggregate), so an
        # unmaterialized lazy plan doubles per iteration — 2^k lineage.
        # Directed mode therefore always iterates eagerly.
        eager = True
    cols = [F.col(a_col).alias("src"), F.col(b_col).alias("dst")] + (
        [F.col(weight_col).cast("double").alias("w")] if weight_col else [])
    if not directed:
        # r11 (guide §1.2): symmetrize with ONE explode instead of a
        # self-union — the union referenced the caller's (usually
        # unpersisted) edge subtree twice, so its final aggregate (the
        # pair-build distinct/groupBy) evaluated twice per run even
        # with ReuseExchange deduplicating the shuffle underneath.
        # Identical row multiset, just emitted map-side in one pass.
        w = ([("w", F.col(weight_col).cast("double"))]
             if weight_col else [])
        fwd = F.struct(F.col(a_col).alias("src"),
                       F.col(b_col).alias("dst"),
                       *[v.alias(k) for k, v in w])
        rev = F.struct(F.col(b_col).alias("src"),
                       F.col(a_col).alias("dst"),
                       *[v.alias(k) for k, v in w])
        sym = (edges.select(F.explode(F.array(fwd, rev)).alias("_e"))
               .select("_e.*"))
    else:
        sym = edges.select(*cols)
    if dedup:
        sym = sym.distinct()
    if not weight_col:
        sym = sym.withColumn("w", F.lit(1.0))
    # out-strength folded onto each edge once, outside the loop — the
    # loop then joins rank → edge on src only
    deg = sym.groupBy("src").agg(F.sum("w").alias("out_w"))
    adj = sym.join(deg, "src").persist()
    if directed:
        # the node set must include pure SINKS (dst-only nodes) — they
        # hold rank, receive link mass, and their dangling mass is
        # redistributed each round (ADVICE r3: building ranks only from
        # summed dst keys dropped no-in-edge nodes after iteration 1
        # and silently lost sink mass)
        nodes = (sym.select("src")
                 .unionByName(sym.select(F.col("dst").alias("src")))
                 .distinct().persist())
        n_nodes = nodes.count()
        sinks = nodes.join(adj.select("src").distinct(),
                           "src", "left_anti").persist()
    else:
        # symmetrized edges: src covers every node, no sinks exist
        nodes = adj.select("src").distinct()
        sinks = None
        if personalization is None or scaled:
            n_nodes = nodes.count()  # hits the cache
        else:
            # r10: unscaled personalized mode never reads n_nodes
            # (restart mass is p0-shaped, no uniform term) — a plain
            # count materializes the adjacency cache for the lazy loop
            # without paying a distinct aggregation nobody consumes
            n_nodes = None
            adj.count()

    if personalization is not None:
        p0 = personalization.select(F.col(personalization.columns[0])
                                    .alias("node"),
                                    F.col(personalization.columns[1])
                                    .cast("double").alias("p0"))
        tot = p0.agg(F.sum("p0").alias("t")).collect()[0].t
        p0 = F.broadcast(p0.select(
            "node", (F.col("p0") / F.lit(float(tot))).alias("p0")).persist())
        ranks = (nodes.join(p0, nodes.src == p0.node, "left")
                 .select(F.col("src").alias("node"),
                         F.coalesce("p0", F.lit(0.0)).alias("pr")))
        restart = F.lit(1.0 - damping) * F.coalesce(F.col("p0"), F.lit(0.0))
    else:
        p0 = None
        ranks = nodes.select(F.col("src").alias("node"),
                             F.lit(1.0 / n_nodes).alias("pr"))
        restart = F.lit((1.0 - damping) / n_nodes)
    if eager:
        ranks = ranks.persist()
        ranks.count()
    for _ in range(iterations):
        contribs = (adj.join(ranks, adj.src == ranks.node)
                    .select("dst", (F.col("pr") * F.col("w")
                                    / F.col("out_w")).alias("contrib")))
        summed = (contribs.groupBy("dst")
                  .agg((F.lit(damping) * F.sum("contrib")).alias("_link")))
        if sinks is not None:
            # dangling mass: rank sitting on out-degree-0 nodes this
            # round, redistributed (uniformly, or onto p0 when
            # personalized).  Collected as ONE scalar per round off the
            # cached rank generation (directed mode is always eager) —
            # keeping it a lazy aggregate would re-reference ranks and
            # double the plan every iteration.
            dm = (ranks.join(sinks, ranks.node == sinks.src)
                  .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm"))
                  .collect()[0]._dm)
        if p0 is not None and sinks is None:
            # r10 (guide §2.4): in undirected mode contribs emits one
            # row per edge regardless of rank value and the symmetrized
            # edge list gives every node an in-edge, so summed already
            # covers EVERY node — the per-round left-join against the
            # nodes distinct (one distinct aggregation over the cached
            # adjacency per iteration in the lazy plan) is redundant.
            # restart + _link is the identical float expression (every
            # summed row carries _link, so the former coalesce never
            # fired; no dangling term exists without sinks).
            new_ranks = (summed.join(p0, summed.dst == p0.node, "left")
                         .select(F.col("dst").alias("node"),
                                 (restart + F.col("_link")).alias("pr")))
        elif p0 is not None:
            # dangling mass lands back on the personalization vector in
            # directed mode — one build per round (a conditional rebuild
            # here used to leave a dead first assignment, ADVICE r4)
            dangling = F.lit(damping * dm) * F.coalesce("p0", F.lit(0.0))
            new_ranks = (nodes.join(summed, nodes.src == summed.dst, "left")
                         .join(p0, nodes.src == p0.node, "left")
                         .select(F.col("src").alias("node"),
                                 (restart
                                  + F.coalesce("_link", F.lit(0.0))
                                  + dangling)
                                 .alias("pr")))
        elif sinks is not None:
            new_ranks = (nodes.join(summed, nodes.src == summed.dst, "left")
                         .select(F.col("src").alias("node"),
                                 (restart
                                  + F.coalesce("_link", F.lit(0.0))
                                  + F.lit(damping * dm / n_nodes))
                                 .alias("pr")))
        else:
            new_ranks = summed.select(F.col("dst").alias("node"),
                                      (restart + F.col("_link")).alias("pr"))
        if eager:
            new_ranks = new_ranks.persist()
            new_ranks.count()  # materialize gen k before retiring k-1
            ranks.unpersist()
        ranks = new_ranks
    if eager:
        adj.unpersist()
        if directed:
            nodes.unpersist()
            sinks.unpersist()
    # lazy mode: adj stays persisted — the caller's single action
    # consumes it; unpersisting here would evict before execution
    if scaled:
        ranks = ranks.select("node",
                             (F.col("pr") * F.lit(float(n_nodes)))
                             .alias("pr"))
    return ranks
