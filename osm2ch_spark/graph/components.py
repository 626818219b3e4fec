"""GA2 — connected components via alternating small-star / large-star
(Kiveris et al., "Connected Components in MapReduce and Beyond").

Undirected semantics over the directed edge table.  Converges in
O(log n) rounds regardless of graph diameter (a min-propagation loop is
O(diameter) — unacceptable on road grids).  Each round is two
groupBy+explode passes; convergence is detected with a deterministic
(count, xor-of-hash, sum-of-hash) signature of the edge set — no
expensive set-difference join.

Result: (vertex BIGINT, component BIGINT) with component = min vertex id
of the component (exact, oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2ch_spark.graph.adjacency import undirected_edges
from osm2ch_spark.graph.checkpoint import CheckpointManager, localcheckpoint


def _large_star(e: DataFrame) -> DataFrame:
    """For each u over symmetric neighbors: connect strictly larger
    neighbors to m = min(Γ(u) ∪ {u}).  Join-based (a per-key min + an
    equi-join) — no collect_set arrays, so hub vertices cost O(degree)
    narrow rows instead of one giant list row."""
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # no distinct here: small_star's min-agg is duplicate-insensitive and
    # its final distinct restores set semantics — saves a shuffle per round
    return out.filter(F.col("u") != F.col("v"))


def _small_star(e: DataFrame) -> DataFrame:
    """Canonicalize so u = max: for each u connect all smaller-or-equal
    neighbors (and u itself) to their min."""
    canon = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        canon.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionAll(mins.select(F.col("u"), F.col("m").alias("v")))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame):
    """Deterministic set signature (count + two order-insensitive 64-bit
    hash XORs) — e is already distinct, no extra canonicalization pass.
    xxhash64 (not the 32-bit murmur F.hash) keeps the collision
    probability negligible; bit_xor (not SUM) is overflow-free under ANSI
    mode.  Convergence is still CONFIRMED exactly with one anti-join
    before the loop breaks (see connected_components)."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("s"),
        F.expr("bit_xor(xxhash64(v, u))").alias("s2"),
    ).collect()[0]
    return (row["n"], row["s"], row["s2"])


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """Returns (vertex, component) for every vertex of the edge table."""
    spark = edges.sparkSession
    verts = (
        edges.select(F.col("source_vertex").alias("vertex"))
        .unionAll(edges.select(F.col("target_vertex").alias("vertex")))
        .distinct()
        .persist()
    )
    ckpt = CheckpointManager(checkpoint_dir, "connected_components", every=checkpoint_every)

    start_iter = 0
    e = None
    if resume and checkpoint_dir:
        got = ckpt.resume(spark)
        if got is not None:
            e, start_iter = got
    if e is None:
        e = localcheckpoint(undirected_edges(edges))

    sig = _signature(e)
    for it in range(start_iter + 1, max_iter + 1):
        # eager=False: the signature aggregate below materializes it
        new_e = localcheckpoint(_small_star(_large_star(e)), eager=False)
        new_sig = _signature(new_e)
        if checkpoint_dir and ckpt.should_commit(it):
            new_e = ckpt.commit(new_e, it, float(abs(new_sig[0] - sig[0])), new_sig[0])
        if new_sig == sig:
            # signature says converged — confirm EXACTLY before breaking
            # (counts already equal, so one-sided anti-join suffices)
            if new_e.join(e, ["u", "v"], "left_anti").isEmpty():
                e = new_e
                break
        e = new_e
        sig = new_sig

    # at convergence every edge points a vertex at its component root
    roots = e.select(F.col("u").alias("vertex"), F.col("v").alias("component"))
    roots = roots.groupBy("vertex").agg(F.min("component").alias("component"))
    out = verts.join(roots, "vertex", "left").select(
        "vertex", F.coalesce("component", F.col("vertex")).alias("component")
    )
    verts.unpersist()
    return out
