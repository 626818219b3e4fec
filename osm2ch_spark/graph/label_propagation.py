"""GA3 — synchronous label propagation with deterministic tie-breaks.

Undirected semantics.  label(v) starts as v; each round every vertex
adopts the most frequent label among its neighbors, ties broken by MIN
label (deterministic — the async/random variants are not reproducible
and therefore untestable against an oracle).  Stops when no label
changed or max_iter.

Per round: edges ⋈ labels (on neighbor side) → count per (vertex,
label) → max_by((count, -label)) — all partial-aggregated, skew-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2ch_spark.graph.adjacency import undirected_edges
from osm2ch_spark.graph.checkpoint import CheckpointManager, localcheckpoint


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """Returns (vertex, label) at convergence (or max_iter)."""
    e = undirected_edges(edges)
    e = localcheckpoint(e)
    ckpt = CheckpointManager(checkpoint_dir, "label_propagation", every=checkpoint_every)

    start_iter = 0
    labels = None
    if resume and checkpoint_dir:
        got = ckpt.resume(e.sparkSession)
        if got is not None:
            labels, start_iter = got
    if labels is None:
        verts = e.select(F.col("u").alias("vertex")).distinct()
        labels = localcheckpoint(verts.select("vertex", F.col("vertex").alias("label")))

    for it in range(start_iter + 1, max_iter + 1):
        nbr_labels = e.join(
            labels.select(F.col("vertex").alias("v"), "label"), "v", "inner"
        ).select(F.col("u").alias("vertex"), "label")
        counted = nbr_labels.groupBy("vertex", "label").agg(F.count(F.lit(1)).alias("c"))
        # most frequent, tie → min label: max_by over (c, -label)
        best = counted.groupBy("vertex").agg(
            F.max_by("label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("new_label")
        )
        new_labels = (
            labels.join(best, "vertex", "left")
            .select("vertex", F.coalesce("new_label", "label").alias("label"))
        )
        # eager=False: the changed-count below materializes it
        new_labels = localcheckpoint(new_labels, eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.select("vertex", F.col("label").alias("old")), "vertex")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if checkpoint_dir and (ckpt.should_commit(it) or changed == 0):
            labels = ckpt.commit(labels, it, float(changed), labels.count())
        if changed == 0:
            break
    return labels
