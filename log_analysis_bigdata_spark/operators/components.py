"""Connected components by iterative min-label propagation — the
clustering step a dedup pipeline runs AFTER candidate pairs: near-dup
pairs are edges; each component keeps one canonical document.

This is the brief's "iterative algorithm" class: no single SQL statement
expresses transitive closure, so the driver loops label-propagation
rounds until a fixpoint (the DuckDB oracle replays it with a recursive
CTE, which is its own fixpoint loop). Each round is one shuffle
(join + min-aggregate); rounds needed = graph diameter in label-hops
(O(log n) for the star-ish clusters dedup produces, and pathological
chains are bounded by max_iter). Every round's result is cached and the
previous round unpersisted, so lineage stays O(1) deep instead of
accumulating an unexecutable plan — the standard Spark iterative-
algorithm discipline (same shape GraphX/GraphFrames uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is an undirected pair list; isolated self-loops are fine.
    Raises if the fixpoint is not reached within ``max_iter`` rounds
    (diameter larger than expected) rather than returning wrong labels.
    """
    # localCheckpoint (eager) rather than persist: it MATERIALIZES and
    # truncates lineage, so round N's plan doesn't re-derive the whole
    # upstream query (the input is often an expensive dedup pipeline)
    # and doesn't grow with the iteration count.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label for each node: min over its own and neighbors'
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a.alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"no fixpoint after {max_iter} rounds")
    return labels
