"""Iterative graph algorithms beyond connected components (which lives
with its dedup consumers in operators/dedup.py).

PageRank here is the corpus-curation use: rank crawl sources/domains by
overlap centrality so corpus-merge decisions (which near-duplicate
crawl to keep, which source to down-weight) have a principled score —
the same role harmonic-centrality/PageRank plays in public web-corpus
quality pipelines.

Determinism contract: the iteration is FIXED-POINT INTEGER arithmetic
(rank mass in `unit` = 1e9 units, floor division everywhere), so the
result is bit-identical across engines, partitionings and runs — a
DuckDB oracle replays the exact same iterations with `//` where Spark
uses `div` (both truncate; all operands here are non-negative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pr_round(
    e: DataFrame,
    ranks: DataFrame,
    zeros: DataFrame,
    teleport: int,
    damping_pct: int,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """One PageRank round: the rank-side join onto the persisted
    (src, dst, w, wsum) edge frame, then the groupBy(dst) fold with the
    zero-contribution rows unioned in (dangling nodes settle at the
    teleport floor without any node-sized broadcast). Shared by the
    iteration loop in :func:`pagerank` and the plan-audit surface
    :func:`pagerank_loop_body` so the audited plan IS the executed
    round, by construction."""
    rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
    contrib = e.join(rank_side, e["src"] == ranks["node"]).select(
        F.col("dst").alias("node"), F.expr("(r * w) div wsum").alias("c")
    )
    return (
        contrib.unionByName(zeros)
        .groupBy("node")
        .agg(F.sum("c").alias("s"))
        .select(
            "node",
            (F.lit(teleport) + F.expr(f"({damping_pct} * s) div 100"))
            .cast("long")
            .alias("r"),
        )
    )


def pagerank_loop_body(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    damping_pct: int = 85,
    unit: int = 1_000_000_000,
    broadcast_ranks: bool = False,
    broadcast_wsum: bool = False,
    cache_inputs: bool = False,
) -> DataFrame:
    """Plan-audit surface (r15 verdict item 2): the UN-CHECKPOINTED
    frame of one iteration round, exactly as :func:`pagerank`'s loop
    builds it (the shared :func:`_pr_round` body), applied to the
    round-0 rank frame. ``explain()`` on the frame :func:`pagerank`
    RETURNS sees only a localCheckpoint scan — the lineage cut that
    keeps Catalyst analysis O(1) also blinds every plan audit to the
    loop body, which is where PageRank's actual per-round cost (one
    edges-sized join + one groupBy(dst) shuffle) lives. PLANS.md and
    tests/test_plans.py explain THIS frame instead.

    With ``cache_inputs=False`` (the pytest pins) nothing persists and
    no job runs: plan shape only, upstream lineage shown raw.
    ``cache_inputs=True`` (the PLANS.md rows) persists the precomputed
    edge and node frames exactly as :func:`pagerank` does, so the
    explained plan reads them as InMemoryRelation and shows ONLY the
    per-round cost — the number a capacity plan multiplies by the
    iteration count. Either way teleport/base divide by the
    driver-scalar node count, pinned to 1 here so no count() job runs
    (plan shape is independent of literal values); persists are
    registered with caching.track and released at the next registered-
    query boundary."""
    node_frame = nodes.select(F.col(id_col).alias("node"))
    wsum = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    wsum_side = F.broadcast(wsum) if broadcast_wsum else wsum
    # mirror pagerank()'s src pre-partitioning so the audited round
    # IS the executed round (the shared-_pr_round contract)
    e = (
        edges.join(wsum_side, "src")
        .select("src", "dst", "w", "wsum")
        .repartition("src")
    )
    if cache_inputs:
        from ..caching import track

        node_frame = track(node_frame.persist())
        e = track(e.persist())
    ranks = node_frame.withColumn("r", F.lit(unit).cast("long"))
    zeros = node_frame.select("node", F.lit(0).cast("long").alias("c"))
    teleport = (100 - damping_pct) * unit // 100
    return _pr_round(e, ranks, zeros, teleport, damping_pct, broadcast_ranks)


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    iterations: int = 12,
    damping_pct: int = 85,
    unit: int = 1_000_000_000,
    broadcast_ranks: bool = False,
    broadcast_wsum: bool = False,
) -> DataFrame:
    """Weighted PageRank over ``edges (src, dst, w BIGINT)`` and
    ``nodes (id_col)``: ``iterations`` fixed rounds of

        r'(v) = teleport + (damping_pct * sum_{u->v} (r(u)*w(u,v) div
                wsum(u))) div 100,
        teleport = ((100-damping_pct) * (unit div N)) div 100

    starting from r0 = unit div N. Dangling nodes (no out-edges)
    contribute nothing and settle at the teleport floor; their leaked
    mass is NOT redistributed (deterministic, documented — rank order
    is unaffected for the connected bulk).

    PRECONDITION: every edge endpoint (src AND dst) must appear in
    ``nodes``. A dst outside ``nodes`` emits a phantom rank row for it
    (the per-round groupBy folds zero rows for ``nodes`` only, it does
    not filter contributions), and a src outside ``nodes`` silently
    contributes nothing after round 0 — while N/teleport are computed
    from ``nodes`` alone either way. All in-repo callers derive nodes
    and edges from the same frame; external callers must too.

    Scale shape: the weighted-out-degree join is precomputed ONCE into
    a persisted (src, dst, w, wsum) frame; each round then costs one
    rank-frame join onto it plus one edges-sized groupBy(dst) shuffle —
    the inherent PageRank cost. ``broadcast_ranks`` controls the
    rank-side join strategy and defaults to FALSE: with no hint the
    planner (and AQE at runtime) picks the join, which localizes tiny
    rank frames anyway and — the scale contract — never plans a
    driver-side broadcast build of a billion-node rank frame. The
    hinted path additionally costs one broadcast-collect JOB per round
    (the hint forces a collect even when the frame is already cached),
    measured 6.6 s vs 3.8 s for the 12-round loop at sf0.1 — so the
    hint is off even for the bounded source-level query, and
    ``broadcast_ranks=True`` exists only for callers who have measured
    a plan where the static SMJ shuffle on the edge side dominates.
    N is a single-int driver scalar (same justification as the CC
    convergence probe). Rank frames are LAZY-localCheckpointed with an
    explicit count() as the materializing action (the CC loop's
    lifecycle, operators/dedup.py:_cc_labels — eager=True would run a
    job inside the RDD-id delta window and sweep the edge cache id,
    see _chk), and the cut runs in batches of CHK_EVERY=3 rounds, not
    every round: without any cut, round i's logical plan contains all
    i-1 predecessors and Catalyst re-analyzes the whole tree per
    round — measured 49 s for 12 rounds at sf0.1 vs ~4 s batched. The
    previous round's checkpoint blocks are dropped as soon as the new
    round is materialized (the loop holds two node-sized rank frames
    at most); the final round's blocks back the returned frame, so
    they are registered with caching.track_rdds and released at the
    next query boundary."""
    from ..caching import persistent_rdd_ids, track, track_rdds, unpersist_rdds

    sc = edges.sparkSession.sparkContext

    def _chk(df: DataFrame) -> "tuple[DataFrame, frozenset[int]]":
        # LAZY checkpoint: the RDD registers synchronously at the call
        # (the _cc_labels contract), so the id delta contains ONLY the
        # checkpoint RDD. An eager=True checkpoint runs a job inside
        # the delta window, and the first such job also materializes
        # the persisted edge frame — whose cache RDD id would then be
        # swept into `live` and destroyed at the next cut, silently
        # recomputing edges+wsum every round thereafter (r10
        # second-review finding). The caller materializes explicitly.
        before = persistent_rdd_ids(sc)
        out = df.localCheckpoint(eager=False)
        return out, frozenset(persistent_rdd_ids(sc) - before)

    node_frame = track(nodes.select(F.col(id_col).alias("node")).persist())
    n = node_frame.count()
    if n == 0:
        raise ValueError(
            "pagerank: empty node frame — nothing to rank (base rank "
            "unit div N is undefined)"
        )
    # loud precondition: every edge dst must be a declared node. The
    # old node_frame-LEFT-JOIN formulation silently DROPPED outside
    # dsts each round; the zeros-union rewrite would instead emit
    # phantom rank rows computed against the wrong N — neither is what
    # the caller meant, so fail at build time (one edges pass; the
    # loop pays an edges-sized join per round anyway). src endpoints
    # need no check: the inner rank join drops unknown srcs in both
    # formulations identically.
    dangling = edges.join(
        node_frame, edges["dst"] == node_frame["node"], "left_anti"
    )
    if dangling.limit(1).count():
        raise ValueError(
            "pagerank: edges reference dst nodes absent from `nodes` — "
            "pass a node frame covering every dst endpoint"
        )
    base = unit // n
    teleport = (100 - damping_pct) * base // 100

    # ONE-TIME setup join of the per-src weight sums onto the edges.
    # No broadcast hint by default (r16, the broadcast_ranks/e266ddc
    # discipline): wsum is NODE-COUNT-sized, so a forced broadcast is
    # a driver collect that dies on the 8 GB ceiling for a
    # billion-node graph, while AQE broadcasts it at runtime whenever
    # it is genuinely small (the bounded source-level query here) and
    # degrades to a co-partitioned shuffle otherwise — and both edge
    # frames are persisted, so either plan executes exactly once.
    # ``broadcast_wsum=True`` exists for callers who measured a static
    # plan where the SMJ sort on the edge side dominates setup.
    wsum = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    wsum_side = F.broadcast(wsum) if broadcast_wsum else wsum
    # pre-partitioned on src before the persist (r18, guide §2.4
    # "two operations keyed the same way can share one exchange") —
    # the CC loop's _sym_edges discipline applied here: every round
    # joins the rank frame on e.src, so a persisted hash(src) layout
    # lets the planner satisfy the join's edge-side distribution from
    # the cache instead of re-exchanging the (billion-edge at scale)
    # frame each of the `iterations` rounds; one extra setup exchange
    # buys `iterations` elided ones
    e = track(
        edges.join(wsum_side, "src")
        .select("src", "dst", "w", "wsum")
        .repartition("src")
        .persist()
    )
    ranks = node_frame.withColumn("r", F.lit(base).cast("long"))
    live: frozenset[int] = frozenset()
    # Checkpoint every CHK_EVERY rounds, not every round: the cut only
    # needs to keep the analyzed tree SHALLOW (depth <= 3 is cheap for
    # Catalyst), and results are identical wherever the lineage is cut
    # (pure integer arithmetic). With the rank broadcast hint off, the
    # loop's only job barriers are the CHK_EVERY materializations (4
    # for 12 rounds); measured cadence sweep at sf0.1 (3 trials, min):
    # chk2 4.0 s, chk3 3.7 s, chk4 3.7 s, chk6 4.3 s — flat around 3,
    # so CHK_EVERY=3 stands. (The hinted loop pays a broadcast-collect
    # job per round on top: 6.6 s at the same cadence.)
    CHK_EVERY = 3
    # zero-contribution rows folded into the per-round groupBy replace
    # the old `node_frame LEFT JOIN broadcast(summed)`: same integer
    # result (a dangling node's sum is the +0 row instead of a
    # coalesced NULL) with one less broadcast exchange per round and
    # no node-sized broadcast at all — the summed frame never crosses
    # the driver even for a billion-node graph.
    zeros = node_frame.select("node", F.lit(0).cast("long").alias("c"))
    for i in range(iterations):
        ranks = _pr_round(e, ranks, zeros, teleport, damping_pct, broadcast_ranks)
        if (i + 1) % CHK_EVERY == 0 or i + 1 == iterations:
            ranks, new_ids = _chk(ranks)
            ranks.count()  # materialize the new cut (a localCheckpoint
            # cannot be recomputed once its predecessor's blocks drop)
            unpersist_rdds(sc, live)
            live = new_ids
    track_rdds(live, sc=sc)
    return ranks.select("node", F.col("r").alias("rank_e9"))
