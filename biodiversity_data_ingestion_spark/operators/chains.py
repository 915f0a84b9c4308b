"""Iterative chain / graph-closure resolution (reference parity).

P4: metagenome records resolve their host by walking the ``sample
derived from`` relationship chain until a specimen-checklist sample is
reached (beam/src/dependencies/utils/map_functions.py:292-311 — a
while-loop of per-record BioSamples HTTP lookups). Spark-first: the
relationship table is data, so the walk is an ITERATIVE SELF-JOIN
computed once for all records — each round follows one hop for every
still-unresolved row simultaneously.

Scale: rounds = chain depth (bounded, typically <= 4 in BioSamples
derivations). Each round is one broadcast-or-shuffle join on the parent
key; resolved rows stop participating. This is the standard dataflow
transitive-closure shape (semi-naive iteration with a frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chain(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 8,
) -> DataFrame:
    """Resolve every node to its chain root (a node with no parent edge).

    edges: one row per (child, parent) hop. Returns (node, root, depth)
    for every node appearing as a child; depth = #hops to the root.
    Rows caught in a cycle or deeper than max_depth keep their furthest
    ancestor (depth = max_depth) — callers route those to a dead-letter
    channel like the reference's error outputs.
    """
    e = edges.select(F.col(child).alias("node"), F.col(parent).alias("cur")).where(
        F.col(child).isNotNull() & F.col(parent).isNotNull()
    )
    frontier = e.withColumn("depth", F.lit(1))
    parents = e.select(F.col("node").alias("p_child"), F.col("cur").alias("p_parent"))
    for _ in range(max_depth - 1):
        stepped = (
            frontier.join(parents, frontier.cur == parents.p_child, "left")
            .select(
                "node",
                F.coalesce("p_parent", "cur").alias("cur"),
                (F.col("depth") + F.when(F.col("p_parent").isNotNull(), 1).otherwise(0)).alias(
                    "depth"
                ),
            )
        )
        frontier = stepped
    return frontier.select("node", F.col("cur").alias("root"), "depth")
