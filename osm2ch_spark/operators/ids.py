"""Deterministic gapless 1-based sequential IDs in a distributed engine.

The reference assigns edge IDs with a driver-side counter in scan order
(`/root/reference/osm_loader.go:228-271`, invariant EdgeID == index+1 at
`osm_loader.go:305`) and expanded-edge IDs the same way
(`osm_loader.go:313-314`).  No Spark built-in produces gapless
input-ordered IDs across partitions.

This implementation is a two-level prefix sum:

  id = offset(group) + row_number() OVER (PARTITION BY group ORDER BY key)

where ``group`` is a caller-chosen column set that (a) is CONTIGUOUS in
the global order — all rows of a group sort together — and (b) has
bounded per-group size (here: one OSM source file, (repo, path)).  The
offsets are an exclusive running sum over the per-group counts table
(one row per FILE — metadata-scale), joined back on the group key.

The ranked table feeds two branches (the data branch and the counts
branch).  With ``materialize=True`` it is eagerly local-checkpointed:
the expensive input pipeline runs EXACTLY once, both branches scan the
materialized RDD, and the frozen rows also make the assigned IDs immune
to AQE re-planning between actions.  The alternatives measured worse:
  * ``persist()`` — concurrent AQE stage jobs race to build the same
    cache blocks; the losers block on cache-block locks while OCCUPYING
    task slots (a ~19 s non-scaling wall floor on the flagship run);
  * relying on exchange reuse — per-branch column pruning makes the
    "identical" exchanges canonically different, so AQE's stage cache
    misses and the subtree re-executes once per branch (measured 6×
    split-UDF runs).
Local checkpoint blocks are owned by the RDD and freed by the context
cleaner when the result DataFrame is dropped — no cache-manager entry
outlives the caller (the round-3 cache-lifetime leak).

Scale notes: the data-level windows are partitioned (parallel); only the
counts prefix-sum is a global window over per-group rows.  At 10^12
files that one window shards hierarchically (prefix-sum tree over
(repo-bucket, repo, path)); at sandbox scale a single level suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sequential_id(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    id_col: str,
    broadcast_offsets: bool = True,
    materialize: bool = False,
) -> DataFrame:
    """Add ``id_col`` = 1-based gapless rank under the total order
    ``(group_cols, order_cols)``, which must be duplicate-free.  Groups
    must be contiguous in that total order (true for per-file grouping
    when the order key starts with the file identity or with ids assigned
    in file order).

    ``broadcast_offsets``: True (default) asserts the caller's group key
    is METADATA-scale (one row per source file here) and broadcasts the
    offsets table — see the comment below for why the hint is load-
    bearing.  A caller numbering by a HIGH-CARDINALITY group key must
    pass False: broadcasting would collect every group onto the driver
    (the plain shuffled join it falls back to is the correct plan
    there).

    ``materialize``: True eagerly local-checkpoints the ranked table so
    the input pipeline runs exactly once (module docstring) — the right
    choice when ``df`` is expensive (a UDF pass or a big join).  False
    keeps the result fully lazy; the counts branch then re-executes the
    input subtree (fine for small/oracle-scale inputs).
    """
    w_local = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    if materialize:
        # explicit-N repartition on the window's partition keys: satisfies
        # the window's required distribution (no second exchange) AND pins
        # the checkpointed RDD's partition count — AQE would otherwise
        # coalesce the planner-inserted exchange below target parallelism
        # (observed 16 partitions feeding 32 cores), under-parallelizing
        # every later phase that scans the materialized table.
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartition(n, *[F.col(c) for c in group_cols])
    ranked = df.withColumn("_rk", F.row_number().over(w_local))
    if materialize:
        from osm2ch_spark.workerenv import materialize_df

        ranked = materialize_df(ranked)

    # per-group counts = max local rank — derived from the ranked table
    # (not from df) so the materialized path never re-runs the input.
    counts = ranked.groupBy(*group_cols).agg(F.max("_rk").alias("_grp_cnt"))
    w_off = (
        Window.orderBy(*[F.col(c) for c in group_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        F.coalesce(F.sum("_grp_cnt").over(w_off), F.lit(0)).alias("_grp_off"),
    )
    # BROADCAST the offsets: one row per group (metadata-scale by the
    # contract above).  Catalyst cannot estimate a window-over-aggregate
    # subtree and falls back to a sort-merge join, which SORTS the full
    # data table by the group key a second time — measured 2× the whole
    # stage's CPU on the 21M-row expansion table.  (At 10^12-file scale
    # the offsets table itself shards hierarchically — module docstring.)
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    out = (
        ranked.join(offsets, list(group_cols), "inner")
        .withColumn(id_col, (F.col("_grp_off") + F.col("_rk")).cast("long"))
        .drop("_grp_off", "_rk")
    )
    return out
