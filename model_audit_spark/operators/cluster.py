"""Duplicate-cluster resolution: near-dup pairs → connected components.

The dedup operators (dedup.py) emit verified near-duplicate PAIRS
(id_a, id_b). Retention policy needs CLUSTERS: if A~B and B~C, all three
are one duplicate group even when (A, C) was never a candidate pair.
This module closes that gap with a distributed connected-components pass —
the reference has no equivalent (its corpus fits in one Python list); the
algorithm is the standard iterative min-label propagation used by
large-scale dedup pipelines.

Scale notes (100 TB):
- Each iteration is ONE shuffle: edges ⋈ labels on the node key, then a
  min-aggregate. Both sides are hash-partitioned on the same key count so
  AQE/ReusedExchange can keep the edge side's layout across iterations.
- Iteration count is the graph DIAMETER. LSH duplicate graphs are
  near-cliques (every member collides with most others in some band), so
  2-4 iterations converge in practice; `max_iter` bounds pathological
  chains. For adversarial long-chain graphs, switch to the
  large-star/small-star variant (O(log n) rounds) — not needed for dedup
  workloads, where a >4-deep chain of pairwise-0.5-Jaccard docs is
  vanishingly rare.
- Convergence is checked with a driver-side count per iteration (the same
  O(rounds) tiny actions GraphX/Pregel performs); each iteration's labels
  are `localCheckpoint`ed so the LOGICAL plan is truncated every round —
  persist alone caches data but lets the analyzed plan grow by two joins
  per iteration, which turns Catalyst analysis super-linear after ~6
  rounds. On a real cluster with a fault-tolerance requirement, swap in
  `sparkContext.setCheckpointDir` + `.checkpoint()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from model_audit_spark.persistence import lazy_checkpoint_scope, track

__all__ = ["connected_components", "cluster_documents"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`.

    component = the minimum node id reachable through the undirected pair
    graph — deterministic, order-independent, and stable under any
    partitioning (min is commutative), so the result hash-matches a
    single-node transitive-closure oracle.
    """
    edges_fwd = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges = (
        edges_fwd.union(
            edges_fwd.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    # The INITIAL label relation checkpoints EAGERLY: round 1's
    # convergence count references it from BOTH join legs, and two AQE
    # stage threads racing to materialize the same un-materialized lazy
    # checkpoint is the scheduler deadlock documented at
    # persistence.lazy_checkpoint_scope. Every LATER round is safe lazy:
    # that round's count() is the single action that materializes its
    # own checkpoint before the next round's plan references it — so
    # the loop keeps AQE (whose coalescing measurably helps the tiny
    # per-round count jobs; the AQE-off form was A/B'd ~1s slower on
    # the CC-family queries at sf0.1).
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.withColumnRenamed("node", "src"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_labels = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce("nbr_comp", "comp")
                    ).alias("comp"),
                    (F.coalesce("nbr_comp", "comp") < F.col("comp")).alias(
                        "_changed"
                    ),
                )
                # LAZY localCheckpoint truncates the plan immediately; the
                # convergence count below is the round's ONE action and
                # materializes the checkpoint as a side effect
                .localCheckpoint(eager=False)
            )
            changed = new_labels.filter("_changed").count()
            labels = new_labels.drop("_changed")
            if changed == 0:
                break
        return labels
    finally:
        edges.unpersist()


def cluster_documents(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Per-document cluster assignment + retention verdict.

    Output: (doc_id, cluster_id, cluster_size, keep) for EVERY document —
    docs in no near-dup pair form singleton clusters of themselves. The
    retention rule keeps the minimum doc_id of each cluster (deterministic
    canonical representative; swap the ordering column for a quality score
    to keep the best-quality member instead).
    """
    comp = connected_components(pairs, max_iter=max_iter)
    assigned = (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        )
    )
    w_size = F.count("*").over(Window.partitionBy("cluster_id"))
    return assigned.select(
        id_col,
        "cluster_id",
        w_size.alias("cluster_size"),
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


def effective_corpus_size(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Dedup-aware corpus size per source — what deduplication buys:
    (source, n_docs, dup_docs, raw_tokens, effective_tokens_ppm).

    Each document's effective weight is 1/cluster_size (a doc sitting
    in a near-dup cluster of 4 contributes a quarter of its tokens —
    the standard "effective dataset size" accounting for repeated
    text). Summed integer-exactly as token_count·1e6 DIV cluster_size
    (ppm-tokens, BIGINT): raw_tokens·1e6 vs effective_tokens_ppm read
    directly as the duplication discount per source. `clusters` is any
    (id, cluster_size) relation — cluster_documents output, or a
    persisted assignment at 100 TB.

    Plan shape: one tokenize projection joined to the (id,
    cluster_size) relation, one source-keyed aggregate — no new
    corpus-sized shuffle beyond the join on the already-computed
    assignment. Per-doc token counts < 1e5 keep the ppm products
    < 1e11; the per-source BIGINT sum holds to ~1e8 docs/source —
    beyond that, widen the sum to DECIMAL(38,0) at the aggregate."""
    from model_audit_spark.functions.text import word_tokens

    toks = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.size(
            word_tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("_tok"),
    )
    j = toks.join(
        clusters.select(F.col(id_col), "cluster_size"), id_col
    )
    return j.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("cluster_size") > 1).cast("int"))
        .cast("bigint")
        .alias("dup_docs"),
        F.sum("_tok").cast("bigint").alias("raw_tokens"),
        F.sum(
            F.expr("CAST(_tok AS BIGINT) * 1000000 DIV cluster_size")
        )
        .cast("bigint")
        .alias("effective_tokens_ppm"),
    )


def incremental_cluster_documents(
    docs: DataFrame,
    assignment: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Fold a NEW batch of near-dup pairs into an EXISTING cluster
    assignment without re-walking the historical pair graph.

    Each old cluster collapses to a star (member → representative edge),
    which preserves its connectivity with |members| edges instead of the
    original pair set; min-label propagation then re-converges over
    star ∪ new_pairs — batch-sized work plus touched clusters, not the
    full history. Because the representative IS the old cluster's min
    id, the result is IDENTICAL to a full recompute over
    (historical pairs ∪ new pairs): the gate query's oracle is the
    full-recompute SQL, so the hash match certifies the incremental
    maintenance loses nothing. Output schema = cluster_documents.
    """
    star = assignment.filter(
        F.col(id_col) != F.col("cluster_id")
    ).select(
        F.col(id_col).alias("id_a"),
        F.col("cluster_id").alias("id_b"),
    )
    edges = star.unionByName(new_pairs.select("id_a", "id_b"))
    return cluster_documents(docs, edges, id_col, max_iter)


def cluster_retention_by_quality(
    docs: DataFrame,
    pairs: DataFrame,
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Quality-aware dedup retention: within each near-dup cluster keep
    the HIGHEST-quality member (tie → lowest id) instead of
    cluster_documents' canonical min-id — the production policy when
    near-dups differ in cleanliness (truncated vs full article, OCR vs
    clean text).

    Output: (id, cluster_id, cluster_size, quality, keep) for every doc.
    Same shuffle budget as cluster_documents: the components rounds plus
    ONE cluster-keyed window pass computing size and the (quality desc,
    id asc) argmax together. Deterministic: the argmax key is the unique
    (quality, -id) tuple; quality_col must be a cross-engine-stable
    value (doc_stats.quality_score is — it backs hash-green queries)."""
    comp = connected_components(pairs, max_iter=max_iter)
    assigned = (
        docs.select(F.col(id_col), F.col(quality_col))
        .join(comp, docs[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
            F.col(quality_col).alias("quality"),
        )
    )
    w = Window.partitionBy("cluster_id")
    best = F.max(
        F.struct(F.col("quality"), (-F.col(id_col)).alias("neg_id"))
    ).over(w)
    return assigned.select(
        id_col,
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        "quality",
        (F.col(id_col) == -best["neg_id"]).alias("keep"),
    )


def source_overlap(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Cross-source duplication report: for every unordered source pair,
    how many verified near-duplicate document pairs span it — the
    "which domains are mirrors of each other" rollup that decides
    whether to drop a whole source rather than dedup doc by doc.

    Output: (source_a, source_b, n_pairs) with source_a <= source_b,
    ordered for stable reading. Join shape: the pair relation (already
    candidate-bounded by LSH + verify) joins the (id, source) projection
    twice — source_a/source_b normalized with least/greatest so both
    directions of a pair collapse to one key.
    """
    src = docs.select(F.col(id_col), F.col(group_col))
    joined = (
        pairs.join(
            src.select(
                F.col(id_col).alias("id_a"),
                F.col(group_col).alias("_sa"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col(id_col).alias("id_b"),
                F.col(group_col).alias("_sb"),
            ),
            "id_b",
        )
    )
    return (
        joined.groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, n_triangles): how many triangles each node participates in
    — the local-density signal that separates tight near-dup/similarity
    clusters (mutually-similar groups ≈ complete subgraphs) from chains
    of borderline pairs that happen to share one member.

    Input edges may be directed/duplicated (e.g. the kNN graph's per-src
    top-k); they are normalized to distinct undirected (a < b) edges
    first, and that relation is PERSISTED — it feeds all three legs of
    the cyclic join, and without pinning it the upstream plan (LSH bands,
    cosine verify) would execute three times.

    Join shape (compact-forward with DEGREE-ORDERED orientation): each
    undirected edge points from its lower-(degree, id) endpoint, wedges
    pair the out-edges of each node — o(u,v)⋈o(u,w) with rank(v) <
    rank(w) — and close with the oriented edge o(v,w). Every triangle
    {x,y,z} with rank x<y<z is generated exactly once as the wedge at x.
    Under this orientation out-degrees are O(√m) amortized, so total
    wedge fan-out is bounded by O(m^1.5) REGARDLESS of hub skew — a
    boilerplate hub with 10⁶ near-dup neighbors contributes its edges to
    other nodes' small out-lists instead of 10¹² id-oriented wedges (the
    r1-r3 shape). Ranks compare as (deg, id) structs, mirrored in the
    SQL twin as row-value comparisons over a degree CTE.

    Cache lifecycle: the persisted undirected/oriented relations are
    registered with persistence.track(), so a long session evaluating
    many graph queries releases them via persistence.release_all()
    (spark.catalog.clearCache() between queries — the gate harness's
    convention — also works)."""
    und = track(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    o = track(_oriented_edges(und).persist())
    return _oriented_triangle_corners(o)


def _oriented_edges(und: DataFrame) -> DataFrame:
    """(u, v, dv): each distinct undirected (a < b) edge pointed from its
    lower-(degree, id) endpoint; dv carries the head's degree so the
    wedge join can compare ranks without re-joining degrees."""
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    withdeg = und.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    lower_first = F.struct(F.col("da"), F.col("a")) < F.struct(
        F.col("db"), F.col("b")
    )
    return withdeg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def _oriented_triangles(o: DataFrame) -> DataFrame:
    """(u, v, w): every triangle exactly once from a persisted
    oriented-edge relation — the out-wedge at the lowest-rank corner
    ((dv, v) struct order encodes the single-count invariant), closed by
    the oriented third edge. The ONE implementation both triangle_counts
    and graph_stats consume."""
    x, y = o.alias("x"), o.alias("y")
    wedges = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter(
            F.struct(F.col("x.dv"), F.col("x.v"))
            < F.struct(F.col("y.dv"), F.col("y.v"))
        )
        .select(
            F.col("x.u").alias("u"),
            F.col("x.v").alias("v"),
            F.col("y.v").alias("w"),
        )
    )
    return wedges.join(
        o.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
    )


def _oriented_triangle_corners(o: DataFrame) -> DataFrame:
    """(node, n_triangles): corners of _oriented_triangles exploded into
    the per-node count."""
    return (
        _oriented_triangles(o)
        .select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def graph_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One-row graph health report: (n_nodes, n_edges, max_degree,
    mean_degree, n_wedges, n_triangles, clustering_coeff).

    The global clustering coefficient 3T/W separates tight clique-like
    near-dup clusters (→1) from chains of borderline pairs (→0) — the
    single number that says whether a dedup threshold produced real
    groups or transitive mush. All inputs to the final division are
    exact integers (wedges = Σ deg·(deg−1)/2, triangles from the
    degree-ordered compact-forward join — the same O(m^1.5)-bounded
    orientation as triangle_counts), so the rounded ratio is bit-stable
    across engines. Same persisted undirected relation feeds degrees and
    the oriented edges.

    Cache lifecycle: the persisted undirected/oriented relations are
    registered with persistence.track(), so a long session evaluating
    many graph queries releases them via persistence.release_all()
    (spark.catalog.clearCache() between queries — the gate harness's
    convention — also works)."""
    und = track(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    dstats = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.max("deg").alias("max_degree"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
        F.sum("deg").alias("_degsum"),
    )
    o = track(_oriented_edges(und).persist())
    tri = _oriented_triangles(o).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    ecount = und.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        dstats.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(ecount))
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            F.round(
                F.col("_degsum") / F.greatest("n_nodes", F.lit(1)), 6
            ).alias("mean_degree"),
            "n_wedges",
            "n_triangles",
            F.round(
                3 * F.col("n_triangles")
                / F.greatest("n_wedges", F.lit(1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


PAGERANK_SCALE = 10**12  # integer "pico-mass"; total initial mass = SCALE


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    id_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-arithmetic PageRank: (node, pr) after `iterations` rounds,
    pr in pico-mass units (initial total = PAGERANK_SCALE).

    All mass movement is BIGINT floor division — contribution =
    pr DIV outdeg, dangling mass DIV N, damping as (85·x) DIV 100 — so
    the result is bit-identical under any partitioning AND in a plain-SQL
    engine (the oracle unrolls the same rounds as CTEs). Floor division
    leaks ≤1 pico-mass per division; both engines leak identically,
    which is the property that matters for verification. Iterative
    semantics otherwise standard: uniform init, dangling mass
    redistributed uniformly, teleport (100-damping)%.

    The dangling-node SET is static across rounds, so degrees are joined
    ONCE into a checkpointed (node, outdeg) relation and `pr` carries
    `outdeg` forward — each round is then one (src-keyed) join edges⋈pr,
    one dst-keyed aggregate, and ONE collected BIGINT scalar (the
    dangling mass, folded into the round expression as a literal — r12:
    the broadcast form deadlocked the scheduler against the
    broadcast-exchange thread over the lazy checkpoint; no per-round
    pr⋈out_deg join, no per-round persist/unpersist pair — the r2/r3
    shape spent a third of its wall-clock there). Each round's pr is
    localCheckpoint'ed so the analyzed plan stays one round deep
    (unrolled, Catalyst re-optimizes a growing tree every round and the
    3-round plan was measured 10× slower than the checkpointed one);
    every cached intermediate except the returned relation is released
    before returning.
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col(id_col), F.lit(0).cast("long").alias("pr")
        )
    base = PAGERANK_SCALE * (100 - damping_pct) // 100 // n_nodes
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).persist()
    # fill the edge cache under the session conf (AQE for the
    # corpus-sized upstream chain) before the AQE-off loop scope
    e.count()
    out_deg = e.groupBy(F.col("_u").alias("_du")).agg(
        F.count("*").alias("outdeg")
    )
    # AQE-off scope (persistence.lazy_checkpoint_scope): the round plans
    # compile without eager stage-materialization jobs, and the one
    # per-round action below (the dangling-mass collect) is a
    # single-threaded job that materializes the previous round's lazy
    # checkpoint BEFORE anything else references it. The old shape
    # crossJoin(F.broadcast(dang)) was the live deadlock caught under
    # jstack this round: the broadcast-exchange thread computing `dang`
    # raced the DAG scheduler over pr's un-materialized checkpoint
    # (RDDCheckpointData vs RDD lock ordering).
    with lazy_checkpoint_scope(nodes.sparkSession):
        node_info = (
            nodes.select(F.col(id_col).alias("_n"))
            .join(out_deg, F.col("_n") == F.col("_du"), "left")
            .select("_n", "outdeg")
            .localCheckpoint()
        )
        pr = node_info.select(
            "_n", "outdeg",
            F.lit(PAGERANK_SCALE // n_nodes).cast("long").alias("pr"),
        ).localCheckpoint(eager=False)
        for it in range(iterations):
            # dangling mass is ONE BIGINT scalar per round — collect it
            # (report-sized, the lloyd_kmeans precedent) and fold
            # d DIV n_nodes into a literal: the broadcast exchange and
            # the cross join disappear from every round, and the exact
            # integer math is unchanged (Python // == SQL DIV for the
            # non-negative mass sums).
            d = pr.filter(F.col("outdeg").isNull()).agg(
                F.coalesce(F.sum("pr"), F.lit(0)).cast("long").alias("d")
            ).collect()[0]["d"]
            dang_share = int(d) // n_nodes
            contrib = (
                e.join(
                    pr.filter(F.col("outdeg").isNotNull()).select(
                        F.col("_n").alias("_u2"),
                        F.expr("pr DIV outdeg").alias("share"),
                    ),
                    F.col("_u") == F.col("_u2"),
                )
                .groupBy(F.col("_v").alias("_n"))
                .agg(F.sum("share").cast("long").alias("c"))
            )
            pr = (
                node_info.join(contrib, "_n", "left")
                .select(
                    "_n", "outdeg",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({damping_pct} * (coalesce(c, 0) + "
                            f"{dang_share}L)) DIV 100"
                        )
                    ).cast("long").alias("pr"),
                )
                # intermediate rounds checkpoint LAZILY: Catalyst still
                # sees a one-round-deep plan per round, and the final
                # round stays eager so e can be unpersisted before
                # returning (a lazy tail would re-evaluate an expensive
                # caller edges relation 3×).
                .localCheckpoint(eager=(it == iterations - 1))
            )
    e.unpersist()
    return pr.select(F.col("_n").alias(id_col), "pr")


def dedup_decisions(
    docs_quality: DataFrame,
    verified_pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality_score",
) -> DataFrame:
    """Dedup audit trail: one row per REMOVED document, naming the
    member its cluster kept, both quality scores, and the direct
    verified Jaccard to the keeper when the pair was observed (NULL →
    the two docs are only transitively connected). The provenance a
    data steward reads before signing off a destructive dedup pass.

    Reuses the retention relation (components + one cluster-keyed
    window pass); the only additions are a cluster-keyed join of
    removed rows to their keeper and a left join back to the verified
    pair relation (both orientations).
    """
    ret = cluster_retention_by_quality(
        docs_quality,
        verified_pairs.select("id_a", "id_b"),
        quality_col=quality_col,
        id_col=id_col,
    )
    kept = ret.filter(F.col("keep")).select(
        "cluster_id",
        F.col(id_col).alias("kept_id"),
        F.col("quality").alias("kept_quality"),
    )
    removed = ret.filter(~F.col("keep")).select(
        "cluster_id",
        F.col(id_col).alias("removed_id"),
        F.col("quality").alias("removed_quality"),
        "cluster_size",
    )
    sym = verified_pairs.select(
        F.col("id_a").alias("_r"), F.col("id_b").alias("_k"), "jaccard"
    ).unionByName(
        verified_pairs.select(
            F.col("id_b").alias("_r"), F.col("id_a").alias("_k"), "jaccard"
        )
    )
    return (
        removed.join(kept, "cluster_id")
        .join(
            sym,
            (F.col("removed_id") == F.col("_r"))
            & (F.col("kept_id") == F.col("_k")),
            "left",
        )
        .select(
            "removed_id",
            "kept_id",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "removed_quality",
            "kept_quality",
            F.col("jaccard").alias("direct_jaccard"),
            F.col("jaccard").isNotNull().alias("direct"),
        )
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    id_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, community) after `rounds` SYNCHRONOUS label-propagation
    updates (Raghavan 2007) — the shuffle-per-round community detector
    that scales where modularity methods don't: each round is one
    edge⋈label join + one (node, label) count aggregate + one per-node
    argmax, all hash-partitioned on node id.

    Deterministic by construction, so the iterative loop hash-certifies
    against an unrolled SQL twin (the pagerank/kmeans discipline):
    synchronous updates (no update-order dependence), tie-break = least
    label id (argmax over (count DESC, label ASC) — computed as
    min(struct(-count, label)), one aggregate, no window), fixed round
    count (no float-threshold convergence test). Labels init to own id;
    nodes with neighbors take the modal neighbor label each round,
    isolated nodes keep their own. Synchronous LPA can 2-cycle on
    bipartite-ish regions — with a FIXED round budget that is still a
    deterministic, certified output; production use picks rounds ~4-5
    (communities stabilize in a few sweeps on near-dup graphs, whose
    clusters are clique-like per dup_graph_stats).

    vs dedup_clusters (connected components): CC merges everything
    reachable — one spurious cross-cluster pair fuses two clusters; LPA
    requires modal support, so thin bridges don't merge dense groups.
    The pair an operator reads side by side before a destructive dedup.

    Scale shape: `edges` (caller-symmetrized, both directions) persists
    once; per round the label relation is localCheckpoint'ed LAZILY so
    Catalyst sees a one-round-deep plan (eager on the final round so
    `edges` can be unpersisted before returning — the pagerank
    lifecycle, persistence release via the same discipline)."""
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).persist()
    # Materialize the edge cache UNDER THE SESSION CONF before entering
    # the AQE-off scope: the caller's edge chain (at the gate, the full
    # corpus-sized minhash verify) keeps AQE's skew-join/broadcast
    # handling; the scope below then governs only the graph-bounded
    # loop rounds, which scan the cached blocks.
    e.count()
    # AQE-off scope: intermediate rounds compile WITHOUT eager stage
    # materialization, so the final round's eager checkpoint is the ONE
    # job that computes the whole chained lineage single-threaded —
    # both the checkpoint-race fix and the per-round-jobs fix (see
    # persistence.lazy_checkpoint_scope).
    with lazy_checkpoint_scope(nodes.sparkSession):
        base = nodes.select(F.col(id_col).alias("_n")).localCheckpoint()
        lab = base.select("_n", F.col("_n").alias("lbl")).localCheckpoint(
            eager=False
        )
        for it in range(rounds):
            counts = (
                e.join(
                    lab.select(F.col("_n").alias("_v2"), "lbl"),
                    F.col("_v") == F.col("_v2"),
                )
                .groupBy(F.col("_u"), F.col("lbl"))
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            winner = (
                counts.groupBy("_u")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("cnt")).alias("nc"),
                            F.col("lbl").alias("l"),
                        )
                    ).alias("w")
                )
                .select(F.col("_u").alias("_wn"), F.col("w.l").alias("wl"))
            )
            lab = (
                base.join(winner, F.col("_n") == F.col("_wn"), "left")
                .select(
                    "_n", F.coalesce(F.col("wl"), F.col("_n")).alias("lbl")
                )
                .localCheckpoint(eager=(it == rounds - 1))
            )
    e.unpersist()
    return lab.select(
        F.col("_n").alias(id_col), F.col("lbl").alias("community")
    )


def k_core(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 2,
    rounds: int = 8,
    id_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, in_core, core_deg) after `rounds` synchronous k-core peel
    steps (Seidman 1983 cores; the Batagelj-Zaversnik peel, run
    breadth-synchronously): each step drops every node whose degree in
    the surviving induced subgraph is < k. What survives is the dense
    backbone of the near-dup graph — template farms and mirror sets
    that pairwise near-dup reports understate, and the part of the
    graph where destructive dedup needs a human look first.

    Certified-iteration discipline (the label_propagation/pagerank
    rules): FIXED round budget instead of a convergence test, integer
    degrees only, synchronous updates — so the loop hash-matches an
    unrolled SQL twin round for round whether or not the peel has
    reached its fixpoint. Peeling removes at least one node per
    non-converged round within each finite component chain, and LSH
    dup graphs are clique-like (dup_graph_stats), so the default 8
    rounds reaches the true k-core at every tested SF; the gate would
    surface a budget miss as a hash mismatch, not silent wrongness.

    core_deg is the node's degree inside the FINAL surviving subgraph
    (0 for peeled nodes) — the report column an operator sorts by to
    find the densest template cluster.

    Scale shape: `edges` (caller-symmetrized) persists once; the peel
    is SEEDED with the distinct edge endpoints, not the full node set —
    a node with no edge has induced degree 0 < k and can never enter a
    core, and a node absent from round-1's degree aggregate is dropped
    by the same inner join either way, so the survivor sets are
    IDENTICAL round for round while every loop relation is bounded by
    the dup GRAPH (tiny at any corpus scale), never the corpus. Each
    round is one edges⋈survivors semi-join per endpoint + one count
    aggregate, all hash-partitioned on node id; survivor relations are
    localCheckpoint'ed lazily (eager on the last round so `edges` can
    be released — the pagerank lifecycle). Rounds shrink the survivor
    relation monotonically, so per-round cost falls as the peel bites.
    The corpus-sized `nodes` relation appears only in the final report
    join (its small side broadcast by AQE), never inside the loop."""
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).persist()
    # fill the edge cache under the session conf (AQE for the
    # corpus-sized upstream chain) before the AQE-off loop scope
    e.count()
    base = nodes.select(F.col(id_col).alias("_n"))

    def _induced_deg(s: DataFrame) -> DataFrame:
        return (
            e.join(
                s.select(F.col("_n").alias("_su")),
                F.col("_u") == F.col("_su"),
            )
            .join(
                s.select(F.col("_n").alias("_sv")),
                F.col("_v") == F.col("_sv"),
            )
            .groupBy("_u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    # AQE-off scope: the peel compiles with zero construction jobs; the
    # last round's eager checkpoint materializes all 8 rounds as ONE
    # single-threaded job (checkpoint-race fix + per-round-jobs fix —
    # see persistence.lazy_checkpoint_scope).
    with lazy_checkpoint_scope(nodes.sparkSession):
        surv = (
            e.select("_u")
            .unionByName(e.select(F.col("_v").alias("_u")))
            .distinct()
            .withColumnRenamed("_u", "_n")
            .localCheckpoint(eager=False)
        )
        for it in range(rounds):
            surv = (
                _induced_deg(surv)
                .filter(F.col("deg") >= k)
                .select("_u")
                .withColumnRenamed("_u", "_n")
                .localCheckpoint(eager=(it == rounds - 1))
            )
        # Materialize the final-degree relation (survivor-sized) BEFORE
        # releasing `e` — lazily it would re-derive the caller's edge
        # chain (the full minhash verify at the gate) from source at
        # action time.
        final_deg = _induced_deg(surv).localCheckpoint()
    out = (
        base.join(
            surv.select(F.col("_n").alias("_in")),
            F.col("_n") == F.col("_in"),
            "left",
        )
        .join(
            final_deg.select(F.col("_u").alias("_dn"), "deg"),
            F.col("_n") == F.col("_dn"),
            "left",
        )
        .select(
            F.col("_n").alias(id_col),
            F.col("_in").isNotNull().alias("in_core"),
            F.coalesce(F.col("deg"), F.lit(0))
            .cast("long")
            .alias("core_deg"),
        )
    )
    e.unpersist()
    return out


def adamic_adar_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int = 1000,
    top_k: int = 100,
) -> DataFrame:
    """(id_a, id_b, n_common, aa_score): Adamic-Adar link prediction
    over an undirected graph — for every NON-adjacent pair sharing at
    least one neighbor, score = Σ_z 1/ln(deg z) over common neighbors z
    (Adamic & Adar 2003). On the near-dup graph this ranks "these two
    documents share many low-fanout near-dup neighbors but were never
    paired" — borderline duplicates the banding missed, and the standard
    link-prediction benchmark shape.

    Bit-stability: per-center weight w9 = 10^18 DIV ln9(deg), with ln9
    the nanonat-quantized ln over an exact integer degree — the whole
    score is an exact BIGINT sum, emitted once as aa9/1e9; the top-k cut
    orders by the unique (aa9 DESC, id_a, id_b) key.

    Skew: a wedge center of degree d contributes d² candidate pairs, so
    super-hubs (boilerplate docs connected to everything) are EXCLUDED
    above max_degree — principled here, not just pragmatic: 1/ln(deg)
    makes a 10⁶-degree hub contribute ≈0.07 per pair while costing 10¹²
    wedges. Bounded fan-out: Σ min(d, max_degree)² over centers.

    Join shape: one distinct undirected edge relation (persisted — it
    feeds the adjacency both ways AND the non-edge anti join), a
    degree aggregate, the wedge self-join keyed on the center, an anti
    join against the edge set, and one final (a, b) aggregate.
    Cache lifecycle: persisted relations registered with
    persistence.track() (triangle_counts convention)."""
    und = track(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    centers = (
        deg.filter((F.col("d") >= 2) & (F.col("d") <= int(max_degree)))
        .withColumn(
            "_ln9", F.round(F.ln("d") * F.lit(1000000000.0), 0).cast("long")
        )
        .select(
            "n",
            F.expr("CAST(1000000000000000000 AS BIGINT) DIV _ln9").alias(
                "w9"
            ),
        )
    )
    adj = und.select(
        F.col("a").alias("z"), F.col("b").alias("x")
    ).unionByName(und.select(F.col("b").alias("z"), F.col("a").alias("x")))
    adjc = adj.join(centers, adj.z == centers.n).select("z", "x", "w9")
    left = adjc.select(
        F.col("z"), F.col("x").alias("_xa"), F.col("w9")
    )
    right = adjc.select(F.col("z"), F.col("x").alias("_xb"))
    wedges = left.join(right, "z").filter(F.col("_xa") < F.col("_xb"))
    non_edges = wedges.join(
        und,
        (wedges._xa == und.a) & (wedges._xb == und.b),
        "left_anti",
    )
    scores = non_edges.groupBy("_xa", "_xb").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum("w9").alias("_aa9"),
    )
    return (
        scores.orderBy(F.desc("_aa9"), "_xa", "_xb")
        .limit(int(top_k))
        .select(
            F.col("_xa").alias("id_a"),
            F.col("_xb").alias("id_b"),
            "n_common",
            (F.col("_aa9").cast("double") / F.lit(1000000000.0)).alias(
                "aa_score"
            ),
        )
    )


def community_modularity(
    labels: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "community",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One row (n_communities, m_edges, modularity): Newman modularity
    Q of a node partition over an undirected graph — the standard "is
    this community structure real" score (Q near 0: no better than
    random; 0.3+: strong structure). Evaluates the label-propagation /
    connected-components output before any per-community action trusts
    it.

    Q = Σ_c (e_c/m − (d_c/2m)²). Computed exactly: the numerator
    Σ_c (4m·e_c − d_c²) and denominator 4m² stay in DECIMAL(38,0)
    integers (products bounded: m ≤ 10¹² edges keeps 4m² < 10²⁵) and
    divide once as bit-identical doubles. Nodes missing a label are
    excluded from both e_c and d_c (consistent on both sides).

    Shape at scale: one distinct undirected edge relation (persisted —
    feeds the within-community count AND the degree sum), two label
    joins, two tiny per-community aggregates, a single-row reduce."""
    und = track(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    lab = labels.select(
        F.col(id_col).alias("_n"), F.col(label_col).alias("_c")
    )
    both = (
        und.join(lab.select(F.col("_n").alias("a"), F.col("_c").alias("ca")), "a")
        .join(lab.select(F.col("_n").alias("b"), F.col("_c").alias("cb")), "b")
    )
    e_c = (
        both.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    d_c = (
        both.select(F.explode(F.array("ca", "cb")).alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).cast("long").alias("d_c"))
    )
    m = und.agg(F.count(F.lit(1)).cast("long").alias("m"))
    d38 = "decimal(38,0)"
    per = d_c.join(e_c, "_c", "left").select(
        "_c",
        F.coalesce("e_c", F.lit(0)).cast(d38).alias("e_c"),
        F.col("d_c").cast(d38).alias("d_c"),
    )
    return (
        per.crossJoin(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.max("m").cast("long").alias("m_edges"),
            F.round(
                F.sum(
                    F.lit(4).cast(d38) * F.col("m").cast(d38) * F.col("e_c")
                    - F.col("d_c") * F.col("d_c")
                ).cast("double")
                / (
                    F.lit(4.0)
                    * F.max("m").cast("double")
                    * F.max("m").cast("double")
                ),
                6,
            ).alias("modularity"),
        )
    )


def partition_label_nmi(
    labels: DataFrame,
    categories: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "community",
    cat_col: str = "source",
) -> DataFrame:
    """One row (n_labels, n_categories, n_docs, nmi): normalized mutual
    information between a node partition (e.g. near-dup communities)
    and a categorical column (e.g. source) — "are the duplicate
    communities source-aligned?" A high NMI says whole domains mirror
    each other (act on sources); near 0 says duplication is diffuse
    (act on documents).

    Integer-nanonat exact: every ln runs over an exact BIGINT count and
    quantizes immediately (round(ln·1e9)); per-cell pointwise MI uses
    the SUM of quantized lns (ln9 N + ln9 c_xy − ln9 c_x − ln9 c_y) —
    off by ≤2 nanonats from the true ln but IDENTICAL in both engines,
    which is what the hash gate needs. I9 and the two entropies reduce
    as exact BIGINT sums with one half-up division by N each;
    nmi = 2·I9/(H9x + H9y) divides two exact integers as doubles.
    Degenerate case (one label AND one category): NULL.

    Shape at scale: one (label, cat) contingency aggregate (bounded by
    |labels|·|cats|), two margin aggregates derived from it, a
    single-row reduce. The contingency relation is persisted (tracked)
    — it feeds the margins and the cell sum."""
    joined = labels.select(
        F.col(id_col).alias("_n"), F.col(label_col).alias("_x")
    ).join(
        categories.select(
            F.col(id_col).alias("_n"), F.col(cat_col).alias("_y")
        ),
        "_n",
    )
    cells = track(
        joined.groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .persist()
    )
    cx = cells.groupBy("_x").agg(F.sum("c_xy").cast("long").alias("c_x"))
    cy = cells.groupBy("_y").agg(F.sum("c_xy").cast("long").alias("c_y"))

    def ln9(col):
        return F.round(F.ln(col) * F.lit(1000000000.0), 0).cast("long")

    tot = cells.agg(F.sum("c_xy").cast("long").alias("n"))
    hx = (
        cx.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("_n"),
            F.sum(F.col("c_x") * ln9(F.col("c_x"))).alias("_s"),
            F.count(F.lit(1)).cast("long").alias("n_labels"),
        )
        .select(
            "n_labels",
            (ln9(F.col("_n")) - F.expr("(_s + _n DIV 2) DIV _n")).alias(
                "h9x"
            ),
        )
    )
    hy = (
        cy.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("_n"),
            F.sum(F.col("c_y") * ln9(F.col("c_y"))).alias("_s"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
        )
        .select(
            "n_categories",
            (ln9(F.col("_n")) - F.expr("(_s + _n DIV 2) DIV _n")).alias(
                "h9y"
            ),
        )
    )
    i9 = (
        cells.join(F.broadcast(cx), "_x")
        .join(F.broadcast(cy), "_y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("_n"),
            F.sum(
                F.col("c_xy")
                * (
                    ln9(F.col("n"))
                    + ln9(F.col("c_xy"))
                    - ln9(F.col("c_x"))
                    - ln9(F.col("c_y"))
                )
            ).alias("_s"),
        )
        .select(
            F.col("_n").alias("n_docs"),
            F.expr(
                "CASE WHEN _s >= 0 THEN (_s + _n DIV 2) DIV _n "
                "ELSE -((-_s + _n DIV 2) DIV _n) END"
            ).alias("i9"),
        )
    )
    return (
        hx.crossJoin(hy)
        .crossJoin(i9)
        .select(
            "n_labels",
            "n_categories",
            "n_docs",
            F.when(
                F.col("h9x") + F.col("h9y") > 0,
                F.round(
                    F.lit(2.0)
                    * F.col("i9").cast("double")
                    / (F.col("h9x") + F.col("h9y")).cast("double"),
                    6,
                ),
            ).alias("nmi"),
        )
    )
