"""Deterministic gapless 1-based sequential IDs in a distributed engine.

The reference assigns edge IDs with a driver-side counter in scan order
(`/root/reference/osm_loader.go:228-271`, invariant EdgeID == index+1 at
`osm_loader.go:305`) and expanded-edge IDs the same way
(`osm_loader.go:313-314`).  No Spark built-in produces gapless
input-ordered IDs across partitions.

This implementation is a two-level prefix sum expressed ENTIRELY inside
one query plan, so it is deterministic across re-executions and immune to
AQE re-planning (a partition-id/broadcast-offset scheme is NOT: each
DataFrame action re-plans, and runtime-coalesced exchanges can move rows
between "partitions" across jobs — observed scrambling IDs in practice):

  id = offset(group) + row_number() OVER (PARTITION BY group ORDER BY key)

where ``group`` is a caller-chosen column set that (a) is CONTIGUOUS in
the global order — all rows of a group sort together — and (b) has
bounded per-group size (here: one OSM source file, (repo, path)).  The
offsets are an exclusive running sum over the per-group counts table
(one row per FILE — metadata-scale), joined back on the group key.

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
    persist_input: bool = True,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Add ``id_col`` = 1-based gapless rank under the total order
    ``(group_cols, order_cols)``, which must be duplicate-free.  Groups
    must be contiguous in that total order (true for per-file grouping
    when the order key starts with the file identity or with ids assigned
    in file order).

    ``persist_input``: the counts branch and the main branch both consume
    df; persisting computes it once.  Pass False when df is a cheap
    transform of already-persisted inputs — recomputing a narrow hash
    join is cheaper than caching millions of rows.

    ``broadcast_offsets``: True (default) asserts the caller's group key
    is METADATA-scale (one row per source file here) and broadcasts the
    offsets table — see the comment below for why the hint is load-
    bearing.  A caller numbering by a HIGH-CARDINALITY group key must
    pass False: broadcasting would collect every group onto the driver
    (the plain shuffled join it falls back to is the correct plan
    there)."""
    if persist_input:
        df = df.persist()

    w_local = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    local = F.row_number().over(w_local)

    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_grp_cnt"))
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
        df.join(offsets, list(group_cols), "inner")
        .withColumn(id_col, (F.col("_grp_off") + local).cast("long"))
        .drop("_grp_off")
    )
    return out
