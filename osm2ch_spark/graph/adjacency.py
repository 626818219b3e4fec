"""Partitioned CSR-like adjacency shards (SURVEY.md §2.9).

The edge table (source_vertex, target_vertex, weight, one_way) is
materialized once into bucketed neighbor-list shards:

  (src_bucket INT, source_vertex BIGINT, chunk INT,
   neighbors ARRAY<BIGINT>, weights ARRAY<DOUBLE>, out_degree BIGINT)

- ``src_bucket = pmod(hash(source_vertex), num_buckets)`` gives every
  iteration the same co-location, so the per-iteration rank⋈adjacency
  join shuffles only the (small) rank side once the shards are cached.
- Hub vertices (motorway junctions) produce huge neighbor lists; lists
  are CHUNKED to ≤ max_chunk so no single task/row explodes — this is
  the skew treatment for the explode stage (the groupBy(target).sum
  side is already skew-safe: partial map-side aggregation bounds any
  target's reduce input by the partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_adjacency(edges: DataFrame, num_buckets: int = 32, max_chunk: int = 4096,
                    with_weights: bool = True, narrow_ids: bool = False) -> DataFrame:
    """Group the edge table into chunked, bucketed adjacency shards.

    ``with_weights=False`` omits the weights lists: unweighted consumers
    (PageRank) never read them, and the second collect_list both doubles
    the aggregate's heap footprint (the CSR build is the engine's most
    GC-heavy stage at 10^8 edges) and doubles the cached shard bytes.

    ``narrow_ids=True`` stores neighbor ids as INT (4 B) instead of
    BIGINT (8 B) — the caller asserts every vertex id fits in int32
    (PageRank checks this from the vertex stats it already computes).
    This is the poor man's dictionary encoding: it halves the cached CSR
    bytes and the per-iteration explode/shuffle width, which matters
    because the iteration loop is partly DRAM-bandwidth-bound (this
    sandbox box's aggregate stream bandwidth does not grow from 8 to 32
    workers — tools/membw_calibration.py).  At true web scale ids exceed
    int32 and the flag stays False; a production variant would
    dictionary-encode vertex ids first."""
    tgt = F.col("target_vertex").cast("int") if narrow_ids else F.col("target_vertex")
    aggs = [F.collect_list(tgt).alias("nbrs")]
    if with_weights:
        aggs.append(F.collect_list("weight").alias("wts"))
    adj = (
        edges.groupBy("source_vertex")
        .agg(*aggs)
        .withColumn("out_degree", F.size("nbrs").cast("long"))
    )
    # chunk hub lists: slice(nbrs, k*max_chunk+1, max_chunk) per chunk k
    n_chunks = F.ceil(F.col("out_degree") / F.lit(max_chunk)).cast("int")
    adj = adj.withColumn("chunk", F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))))
    cols = [
        F.pmod(F.hash("source_vertex"), F.lit(num_buckets)).alias("src_bucket"),
        "source_vertex",
        "chunk",
        F.slice(F.col("nbrs"), F.col("chunk") * max_chunk + 1, max_chunk).alias("neighbors"),
    ]
    if with_weights:
        cols.append(F.slice(F.col("wts"), F.col("chunk") * max_chunk + 1, max_chunk).alias("weights"))
    adj = adj.select(*cols, "out_degree")
    # partition by the JOIN KEY (hash(source_vertex)): the cached scan
    # then satisfies the per-iteration rank⋈adjacency distribution
    # requirement, so iterations reshuffle only the small rank side.
    # (src_bucket == pmod(hash(source_vertex), P) documents the shard
    # layout; the physical partitioning below is what the planner sees.)
    return adj.repartition(num_buckets, "source_vertex")


def vertices_table(edges: DataFrame) -> DataFrame:
    """All vertices with a dangling flag (no outgoing edges).

    One aggregation: tag every endpoint occurrence with is-source, then
    ``max`` per vertex.  The previous shape (distinct(srcs), distinct
    (tgts), union-distinct, left join) spent four shuffles on the same
    answer (guide §2.4 — remove shuffles outright); the union rows are
    partial-aggregated map-side, so the single exchange carries at most
    2 × distinct(vertex) rows."""
    tagged = edges.select(
        F.col("source_vertex").alias("vertex"), F.lit(True).alias("has_out")
    ).unionAll(
        edges.select(F.col("target_vertex").alias("vertex"), F.lit(False).alias("has_out"))
    )
    return tagged.groupBy("vertex").agg(F.max("has_out").alias("has_out"))


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Distinct canonical (u < v) undirected pairs, self-loops removed.

    One scan of the edge table and one dedup exchange over N rows; the
    symmetric form used to dedup 2N rows after scanning the input twice
    (guide §2.3 — shuffle fewer bytes)."""
    return (
        edges.select(
            F.least("source_vertex", "target_vertex").alias("u"),
            F.greatest("source_vertex", "target_vertex").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Distinct symmetric (u, v) pairs, self-loops removed — shared by
    CC / LPA / triangles, which treat the graph as undirected.

    Built as canonical pairs ∪ their swaps: the dedup shuffle then runs
    over N canonicalized rows instead of 2N symmetric rows, and the
    input is scanned once instead of twice.  (A canonical pair and its
    swap are distinct rows, so the union needs no further dedup.)"""
    cp = canonical_edges(edges)
    return cp.unionAll(cp.select(F.col("v").alias("u"), F.col("u").alias("v")))
