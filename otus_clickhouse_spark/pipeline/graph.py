"""Link-graph ranking for corpus curation.

Web-scale training corpora weight documents by link-graph centrality
(Common Crawl publishes harmonic centrality / PageRank per host, and
curation pipelines use it as a crawl-quality prior alongside the
classifier scores in :mod:`otus_clickhouse_spark.pipeline.classify`).
This module provides the distributed primitive: power-iteration
PageRank over an edge DataFrame.

Scale shape (the whole point): one iteration is
``edges ⋈ rank (shuffle on src) → groupBy dst (shuffle on dst)`` —
the classic message-passing formulation; nothing ever collects the
graph driver-side, and a fixed iteration count bounds the lineage.
Per-iteration ``round(…, ndigits)`` pins the tiny float drift that
different reduce orders could introduce, so results are reproducible
across engines and partitionings (the DuckDB oracle replays the same
rounded recurrence exactly).

Dangling nodes (no out-edges) simply leak their mass, i.e. the
simplified PageRank used for relative ranking — fine for a quality
prior, documented here for honesty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    ndigits: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over ``edges(src, dst)``.

    Returns ``(node, pr)``. ``n_iter`` is deliberately small and fixed:
    curation wants a stable relative ordering, not convergence to 1e-12,
    and each extra iteration is two more shuffles over the edge list.
    """
    # r12 (guide §2.4/§5): the edge list, the node set and the
    # (src, dst, outdeg) relation are LOOP-INVARIANT — every iteration
    # re-derived all three from the caller's edge expression (3 extra
    # passes per iteration at 100 TB; measured in the r12 bench as the
    # bulk of x55's exchanges). Materialize each once: localCheckpoint
    # (blocks free on GC — the persist-leak rationale of
    # minhash_dedup_pairs) is exactly the "persist your edge list before
    # iterating" rule every distributed PageRank uses. The static
    # outdeg join is hoisted out of the loop: per iteration only the
    # rank join + one groupBy remain.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # one bounded driver scalar (like the k-means seed fetch): the node
    # count feeds the teleport constant
    n = nodes.count()
    ew = edges.join(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
    ).localCheckpoint()
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            ew.join(pr, ew["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = nodes.join(incoming, "node", "left").select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                ndigits,
            ).alias("pr"),
        )
    return pr
