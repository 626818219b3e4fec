"""The osm2ch pipeline as one lazy DataFrame DAG.

Stage map (reference file:line → here):
  use counts      osm_loader.go:204-221  → node_use_count (A1)
  way splitting   osm_loader.go:223-273  → split_ways_to_edges (W1, Arrow UDF)
  vertex filter   osm_loader.go:275-283  → filter_vertices_used (F4)
  edge expansion  osm_loader.go:285-343  → expand_edges (J3 + F5/F6 + ID2)
  "no" pass       osm_loader.go:348-389  → apply_no_restrictions (J4)
  "only" pass     osm_loader.go:390-432  → apply_only_restrictions (J5)
  geometry splice osm_loader.go:315-320  → splice_geometry (G6/G7, Arrow UDF)

Geometry is carried as two parallel ARRAY<DOUBLE> columns (geom_lons,
geom_lats) — Arrow-friendly, zero-copy into numpy inside the two
grouped UDFs; struct/WKT forms exist only at sinks.

Expanded-edge IDs are assigned BEFORE restriction deletion
(osm_loader.go:313-314 vs :348-432) so final IDs keep gaps — parity
requires numbering first, filtering second.  The expensive Python-side
geometry splice runs AFTER the anti-joins (deleted rows never pay it);
this reordering is observation-equivalent because the splice affects
neither IDs nor the deletion predicates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from osm2ch_spark import geom
from osm2ch_spark.operators.ids import with_sequential_id
from osm2ch_spark.sources import parse as P

# "no" / "only" restriction families — osm_loader.go:351, :393
NO_TYPES = ("no_left_turn", "no_right_turn", "no_straight_on")
ONLY_TYPES = ("only_left_turn", "only_right_turn", "only_straight_on")


def node_use_count(ways: DataFrame) -> DataFrame:
    """A1 — osm_loader.go:204-221: endpoints +2, interior +1, summed per
    node over all kept ways.  Output (node_id, use_count)."""
    wn = ways.select(F.col("way_id"), F.size("nodes").alias("n"), F.posexplode("nodes").alias("pos", "node_id"))
    w = wn.withColumn(
        "w", F.when((F.col("pos") == 0) | (F.col("pos") == F.col("n") - 1), F.lit(2)).otherwise(F.lit(1))
    )
    return w.groupBy("node_id").agg(F.sum("w").cast("long").alias("use_count"))


def missing_node_count(ways: DataFrame, nodes: DataFrame) -> int:
    """The reference hard-errors on a way node absent from the node scan
    (osm_loader.go:216-218).  Returns the violation count (0 = ok)."""
    refs = ways.select(F.explode("nodes").alias("node_id")).distinct()
    return refs.join(nodes, "node_id", "left_anti").count()


EDGE_SCHEMA = StructType(
    [
        StructField("way_id", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("seg_index", LongType(), False),
        StructField("direction", LongType(), False),
        StructField("source_node", LongType(), False),
        StructField("target_node", LongType(), False),
        StructField("was_oneway", BooleanType(), False),
        StructField("cost_km", DoubleType(), False),
        StructField("geom_lons", ArrayType(DoubleType()), False),
        StructField("geom_lats", ArrayType(DoubleType()), False),
    ]
)


def split_ways_to_edges(
    ways: DataFrame,
    nodes: DataFrame,
    use_counts: DataFrame,
    strict: bool = False,
    materialize: bool = False,
) -> DataFrame:
    """W1 + ID1 — osm_loader.go:223-273.

    One shuffle (the re-group by way) + one Arrow batch pass; all per-row
    math is numpy (haversine cumsum).  Emits forward edge then — for
    two-way ways — the reverse edge (reversed geometry, same cost,
    was_oneway=False), restarting accumulation at each split node, exactly
    as the reference loop does.  Edge IDs are 1-based sequential in
    (scan order, split order, direction) via two-phase numbering.

    ``strict=True`` enforces the reference's fail-fast on a way-node
    reference absent from the node scan (osm_loader.go:216-218) INSIDE
    this pass, for free: the node join becomes a left join and the Arrow
    pass raises on the resulting NaN coordinate — no separate validation
    job.  ``strict=False`` keeps the permissive inner join (missing nodes
    silently shorten the way, for pre-clipped extracts).
    """
    node_join_type = "left" if strict else "inner"
    wn = ways.select(
        "way_id", "oneway", "repo", "path", "seq", F.posexplode("nodes").alias("pos", "node_id")
    )
    wn = (
        wn.join(nodes, "node_id", node_join_type)
        .join(use_counts, "node_id", "left")
        .select(
            "way_id", "oneway", "repo", "path", "seq", "pos",
            "node_id", "lon", "lat", F.coalesce("use_count", F.lit(0)).alias("use_count"),
        )
    )
    # Re-group each way's rows CONTIGUOUSLY via repartition + partition-
    # local sort, NOT collect_list(struct)+array_sort: the struct-list
    # aggregate runs as ObjectHashAggregate with one growing object
    # buffer per way — profiled as a major GC source on the 30M-row
    # flagship — while the UnsafeRow sort stays codegen-compatible and
    # allocation-free.  (repo, path, seq) is the way's identity; pos
    # orders its nodes; the Arrow pass re-derives the way boundaries from
    # key changes and carries split ways across batch edges.
    n_part = int(ways.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    flat = wn.repartition(
        n_part, F.col("repo"), F.col("path"), F.col("seq")
    ).sortWithinPartitions("repo", "path", "seq", "pos")

    def split(batches):
        import pandas as pd

        from osm2ch_spark.udftrace import traced
        batches = traced("split", batches)

        def empty():
            return pd.DataFrame(
                {
                    "way_id": np.zeros(0, np.int64),
                    "repo": pd.Series([], dtype=object),
                    "path": pd.Series([], dtype=object),
                    "seq": np.zeros(0, np.int64),
                    "seg_index": np.zeros(0, np.int64),
                    "direction": np.zeros(0, np.int64),
                    "source_node": np.zeros(0, np.int64),
                    "target_node": np.zeros(0, np.int64),
                    "was_oneway": np.zeros(0, bool),
                    "cost_km": np.zeros(0, np.float64),
                    "geom_lons": pd.Series([], dtype=object),
                    "geom_lats": pd.Series([], dtype=object),
                }
            )

        def process(pdf):
            # Fully vectorized segmentation (no per-node Python) over FLAT
            # sorted way-node rows:
            #   1. way boundaries = (repo, path, seq) key changes — the
            #      rows arrive partition-sorted, so each way is one run
            #   2. ONE haversine over every consecutive flat pair (cross-
            #      way pairs are never read back)
            #   3. segment ends = flat positions with use_count>1 that are
            #      not a way's first node (osm_loader.go:240-244)
            #   4. per-segment left-to-right cost sums via column-wise
            #      accumulation over a (segments × max_len) padded matrix —
            #      bit-identical to the Go loop order (x+0.0 == x exactly,
            #      and haversines are non-negative so -0.0 never appears)
            flat_nids = pdf["node_id"].to_numpy(dtype=np.int64)
            flat_lons = pdf["lon"].to_numpy(dtype=np.float64)
            flat_lats = pdf["lat"].to_numpy(dtype=np.float64)
            flat_ucnt = pdf["use_count"].to_numpy(dtype=np.int64)
            seq_all = pdf["seq"].to_numpy(dtype=np.int64)
            repo_all = pdf["repo"].to_numpy()
            path_all = pdf["path"].to_numpy()
            if strict and np.isnan(flat_lons).any():
                bad = flat_nids[np.isnan(flat_lons)]
                raise ValueError(
                    f"way-node reference(s) missing from the node scan, e.g. "
                    f"node {bad[0]} (reference hard-errors here — "
                    "osm_loader.go:216-218); pass strict=False to proceed "
                    "on clipped inputs"
                )
            if len(flat_lons) > 1:
                all_d = geom.great_circle_distance(
                    flat_lons[:-1], flat_lats[:-1], flat_lons[1:], flat_lats[1:]
                )
            else:
                all_d = np.zeros(0)
            change = (
                np.flatnonzero(
                    (seq_all[1:] != seq_all[:-1])
                    | (path_all[1:] != path_all[:-1])
                    | (repo_all[1:] != repo_all[:-1])
                )
                + 1
            )
            offsets = np.concatenate([[0], change, [len(pdf)]])  # len = W+1
            way_first = offsets[:-1]
            is_start = np.zeros(len(flat_nids), dtype=bool)
            is_start[way_first] = True
            ends = np.flatnonzero((flat_ucnt > 1) & ~is_start)
            if len(ends) == 0:
                return None
            # way index of each segment end; segment start = previous end
            # within the same way, else the way's first node
            way_of = np.searchsorted(offsets, ends, side="right") - 1
            prev_end = np.concatenate([[-1], ends[:-1]])
            same_way = np.concatenate([[False], way_of[1:] == way_of[:-1]])
            starts = np.where(same_way, prev_end, offsets[way_of])
            # seg_index: rank of the end within its way
            idx = np.arange(len(ends))
            seg_index = idx - np.maximum.accumulate(np.where(~same_way, idx, 0))

            # per-segment left-to-right cost sums (distance slots
            # starts[k] .. ends[k]-1 of all_d)
            seg_lens = ends - starts
            S = len(ends)
            cost = np.zeros(S, dtype=np.float64)
            long_rows = np.flatnonzero(seg_lens > 512)
            short = seg_lens <= 512
            if short.any():
                sl = seg_lens[short]
                L = int(sl.max())
                mat = np.zeros((int(short.sum()), L), dtype=np.float64)
                row = np.repeat(np.arange(len(sl)), sl)
                cum = np.concatenate([[0], np.cumsum(sl)])
                within = np.arange(int(sl.sum())) - np.repeat(cum[:-1], sl)
                mat[row, within] = all_d[np.repeat(starts[short], sl) + within]
                acc = np.zeros(len(sl), dtype=np.float64)
                for j in range(L):
                    acc = acc + mat[:, j]
                cost[short] = acc
            for k in long_rows:  # rare giant segments: exact sequential sum
                c = 0.0
                for v in all_d[starts[k] : ends[k]]:
                    c += v
                cost[k] = c

            seg_first = way_first[way_of]  # first flat row of each seg's way
            way_ids = pdf["way_id"].to_numpy(dtype=np.int64)[seg_first]
            oneway = pdf["oneway"].to_numpy(dtype=bool)[seg_first]
            repo = repo_all[seg_first]
            path = path_all[seg_first]
            seq = seq_all[seg_first]
            src = flat_nids[starts]
            tgt = flat_nids[ends]
            g_lons = [flat_lons[s : e + 1] for s, e in zip(starts, ends)]
            g_lats = [flat_lats[s : e + 1] for s, e in zip(starts, ends)]

            # reverse rows for two-way ways (osm_loader.go:255-268); output
            # order is irrelevant — IDs are assigned by sort keys downstream
            rev = ~oneway
            out = pd.DataFrame(
                {
                    "way_id": np.concatenate([way_ids, way_ids[rev]]),
                    "repo": np.concatenate([repo, repo[rev]]),
                    "path": np.concatenate([path, path[rev]]),
                    "seq": np.concatenate([seq, seq[rev]]),
                    "seg_index": np.concatenate([seg_index, seg_index[rev]]),
                    "direction": np.concatenate(
                        [np.zeros(S, np.int64), np.ones(int(rev.sum()), np.int64)]
                    ),
                    "source_node": np.concatenate([src, tgt[rev]]),
                    "target_node": np.concatenate([tgt, src[rev]]),
                    "was_oneway": np.concatenate([oneway, np.zeros(int(rev.sum()), bool)]),
                    "cost_km": np.concatenate([cost, cost[rev]]),
                    "geom_lons": g_lons + [a[::-1] for a, r in zip(g_lons, rev) if r],
                    "geom_lats": g_lats + [a[::-1] for a, r in zip(g_lats, rev) if r],
                }
            )
            return out

        # Arrow slices a partition into ~10k-row batches with no respect
        # for way boundaries; carry the trailing (possibly incomplete) way
        # into the next batch.  Rows are partition-sorted by the way key,
        # so a way is always a contiguous run within one partition.
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            seq_all = pdf["seq"].to_numpy(dtype=np.int64)
            repo_all = pdf["repo"].to_numpy()
            path_all = pdf["path"].to_numpy()
            change = (
                np.flatnonzero(
                    (seq_all[1:] != seq_all[:-1])
                    | (path_all[1:] != path_all[:-1])
                    | (repo_all[1:] != repo_all[:-1])
                )
                + 1
            )
            if len(change) == 0:
                carry = pdf  # the whole batch is one (unfinished) way
                continue
            cut = int(change[-1])
            carry = pdf.iloc[cut:]
            out = process(pdf.iloc[:cut].reset_index(drop=True))
            yield out if out is not None else empty()
        if carry is not None and len(carry):
            out = process(carry.reset_index(drop=True))
            yield out if out is not None else empty()

    segments = flat.mapInPandas(split, EDGE_SCHEMA)
    # _idb buckets the per-file group so numbering stays parallel even
    # when one file dominates (order-aligned: floor(seq/256) is monotone
    # in seq, so (repo, path, _idb) groups are contiguous in the global
    # (repo, path, seq, seg, dir) order).
    segments = segments.withColumn("_idb", F.floor(F.col("seq") / 256))
    out = with_sequential_id(
        segments, ["repo", "path", "_idb"], ["seq", "seg_index", "direction"],
        "edge_id", materialize=materialize,
    )
    return out.drop("_idb")


def filter_vertices_used(nodes: DataFrame, use_counts: DataFrame) -> DataFrame:
    """F4 — osm_loader.go:275-283: keep nodes with use_count > 1."""
    return (
        nodes.join(use_counts, "node_id", "inner")
        .filter(F.col("use_count") > 1)
        .select("node_id", "lon", "lat", "use_count")
    )


def expand_edges(edges: DataFrame, materialize: bool = False) -> DataFrame:
    """J3 + F5 + F6 + ID2 — osm_loader.go:285-343 (pre-splice).

    Decide with small rows, explode late (optimization guide §8): the
    dst side is pre-aggregated into ONE row per source node holding the
    candidate out-edges as an array SORTED by edge id (the reference's
    ``edgesBySourceNodeID`` lists, osm_loader.go:289-292).  The join
    then runs at EDGE granularity (N rows), F5 (self pair) and F6
    (exact-geometry U-turn, raw float equality) filter the array
    in-place, and the pair table only comes into existence in the final
    ``posexplode`` — whose position IS the pair's rank among its source
    edge's surviving continuations.  The previous shape joined first and
    ranked the exploded pairs with a window, which shuffled AND sorted
    the full pair table (avg-degree × more rows than this plan moves;
    measured 5.6–6.8 s of wall per headline query in the window sort
    stage alone at sf0.1).

    IDs: expanded_id = group offset (broadcast two-level prefix sum over
    floor(src_edge_id/2048) buckets — contiguous under the global
    (src_edge_id, dst_edge_id) order since edge ids are globally
    sequential) + per-source-edge running sum of surviving-candidate
    counts within the bucket (a window over EDGE-level rows) + the
    0-based posexplode position + 1.  Value-identical to ranking the
    exploded pairs directly.

    Skew note: hub intersections make the per-node candidate arrays
    long, but a node's array length is bounded by node degree (not by
    pair count), and the explode emits pairs streaming — no per-pair
    shuffle exists for skew to concentrate.

    edges is consumed twice (array side and edge side) — the caller is
    expected to pass a materialized table so the upstream work runs
    once.  With ``materialize=True`` the joined edge-level table (arrays
    attached, filters applied, ranks assigned) is eagerly checkpointed;
    consumers re-run only the broadcast probe + explode per action.
    """
    from pyspark.sql import Window

    # candidate struct: dst edge id FIRST so array_sort orders by it
    # (ids are unique — later fields never break ties)
    cand = edges.groupBy(F.col("source_node").alias("_node")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("edge_id").alias("did"),
                    F.col("way_id").alias("tway"),
                    F.col("source_node").alias("dsn"),
                    F.col("target_node").alias("dtn"),
                    F.col("cost_km").alias("dcost"),
                    F.element_at("geom_lons", 1).alias("dlon0"),
                    F.element_at("geom_lats", 1).alias("dlat0"),
                    F.element_at("geom_lons", -1).alias("dlon1"),
                    F.element_at("geom_lats", -1).alias("dlat1"),
                )
            )
        ).alias("_cands")
    )
    e1 = edges.select(
        F.col("edge_id").alias("src_edge_id"),
        F.col("way_id").alias("source_way"),
        F.col("source_node").alias("src_source_node"),
        F.col("target_node").alias("src_target_node"),
        F.col("was_oneway").alias("one_way"),
        F.col("cost_km").alias("src_cost"),
        F.element_at("geom_lons", 1).alias("s_lon0"),
        F.element_at("geom_lats", 1).alias("s_lat0"),
        F.element_at("geom_lons", -1).alias("s_lon1"),
        F.element_at("geom_lats", -1).alias("s_lat1"),
    )
    j = e1.join(cand, F.col("src_target_node") == F.col("_node"), "inner").drop("_node")
    # F5 (self pair, osm_loader.go:302-304) + F6 (U-turn: exact float
    # equality on endpoint pairs, osm_loader.go:306-312) applied INSIDE
    # the candidate array — same EqualTo semantics as the row filters
    j = j.withColumn(
        "_cands",
        F.filter(
            "_cands",
            lambda c: (c["did"] != F.col("src_edge_id"))
            & ~(
                (F.col("s_lon0") == c["dlon1"])
                & (F.col("s_lat0") == c["dlat1"])
                & (F.col("s_lon1") == c["dlon0"])
                & (F.col("s_lat1") == c["dlat0"])
            ),
        ),
    ).drop("s_lon0", "s_lat0", "s_lon1", "s_lat1")
    # the four endpoint doubles exist only for the F6 filter above — strip
    # them before the ranking exchange / checkpoint so the materialized
    # candidate arrays carry 5 fields instead of 9 (guide §2.3: project
    # before the exchange; the explode below never reads them either)
    j = j.withColumn(
        "_cands",
        F.transform(
            "_cands",
            lambda c: F.struct(
                c["did"].alias("did"),
                c["tway"].alias("tway"),
                c["dsn"].alias("dsn"),
                c["dtn"].alias("dtn"),
                c["dcost"].alias("dcost"),
            ),
        ),
    )
    j = j.withColumn("_idb", F.floor(F.col("src_edge_id") / 2048))
    j = j.withColumn("_n", F.size("_cands"))
    if materialize:
        # pin the partition count before the ranking window — same
        # rationale as with_sequential_id (AQE would coalesce below
        # target parallelism and the checkpoint would freeze that)
        n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        j = j.repartition(n_part, F.col("_idb"))
    w_src = (
        Window.partitionBy("_idb")
        .orderBy("src_edge_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = j.withColumn("_src_off", F.coalesce(F.sum("_n").over(w_src), F.lit(0)))
    if materialize:
        from osm2ch_spark.workerenv import materialize_df

        ranked = materialize_df(ranked)
    # bucket offsets: exclusive running sum over per-bucket pair counts
    # (metadata-scale — one row per 2048 source edges), broadcast back
    counts = ranked.groupBy("_idb").agg(F.sum("_n").alias("_grp_cnt"))
    w_off = Window.orderBy("_idb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = F.broadcast(
        counts.select(
            "_idb", F.coalesce(F.sum("_grp_cnt").over(w_off), F.lit(0)).alias("_grp_off")
        )
    )
    out = (
        ranked.join(offsets, "_idb")
        .select(
            F.col("src_edge_id"),
            "source_way",
            "src_source_node",
            "src_target_node",
            "one_way",
            (F.col("_grp_off") + F.col("_src_off") + F.lit(1)).alias("_base"),
            "src_cost",
            F.posexplode("_cands").alias("_pos", "_c"),
        )
        .select(
            (F.col("_base") + F.col("_pos")).alias("expanded_id"),
            "src_edge_id",
            "source_way",
            "src_source_node",
            "src_target_node",
            "one_way",
            F.col("_c.did").alias("dst_edge_id"),
            F.col("_c.tway").alias("target_way"),
            F.col("_c.dsn").alias("dst_source_node"),
            F.col("_c.dtn").alias("dst_target_node"),
            ((F.col("src_cost") + F.col("_c.dcost")) / F.lit(2.0)).alias("weight"),
        )
    )
    return out


def ways_seen(ways: DataFrame) -> DataFrame:
    """waysSeen — osm_loader.go:229-232: every kept way id."""
    return ways.select("way_id").distinct()


def _valid_rules(restrictions: DataFrame, seen: DataFrame, types) -> DataFrame:
    """Shared member-shape + waysSeen gating of J4/J5
    (osm_loader.go:354-371 and :396-413)."""
    r = restrictions.filter(
        F.col("rtype").isin(list(types))
        & (F.col("from_type") == "way")
        & (F.col("to_type") == "way")
        & (F.col("via_type") == "node")
    )
    r = r.join(seen.withColumnRenamed("way_id", "from_id"), "from_id", "left_semi")
    r = r.join(seen.withColumnRenamed("way_id", "to_id"), "to_id", "left_semi")
    return r


def apply_no_restrictions(expanded: DataFrame, restrictions: DataFrame, seen: DataFrame) -> DataFrame:
    """J4 — osm_loader.go:348-389: delete expanded edges whose
    (source_way, target_way) matches a no_* rule.  Via node NOT checked —
    a reference quirk we reproduce.  Broadcast anti-join (rules tiny)."""
    rules = _valid_rules(restrictions, seen, NO_TYPES).select(
        F.col("from_id").alias("source_way"), F.col("to_id").alias("target_way")
    )
    # no broadcast hint: real restriction tables are tiny and Catalyst
    # broadcasts them on its own; a forced hint breaks down when a caller
    # passes a large rules table (AQE then picks shuffled hash join)
    return expanded.join(rules, ["source_way", "target_way"], "left_anti")


def apply_only_restrictions(expanded: DataFrame, restrictions: DataFrame, seen: DataFrame) -> DataFrame:
    """J5 — osm_loader.go:390-432: for only_* rules keep just the mandated
    continuation: delete rows with source_way==from AND target_way!=to AND
    src_target_node==via."""
    rules = _valid_rules(restrictions, seen, ONLY_TYPES).select(
        F.col("from_id").alias("r_from"), F.col("to_id").alias("r_to"), F.col("via_id").alias("r_via")
    )
    cond = (
        (F.col("source_way") == F.col("r_from"))
        & (F.col("target_way") != F.col("r_to"))
        & (F.col("src_target_node") == F.col("r_via"))
    )
    return expanded.join(rules, cond, "left_anti")


EXPANDED_GEOM_FIELDS = [
    StructField("geom_lons", ArrayType(DoubleType()), False),
    StructField("geom_lats", ArrayType(DoubleType()), False),
    StructField("geom_wkt", StringType(), False),
]

_PARTS_SCHEMA = StructType(
    [
        StructField("edge_id", LongType(), False),
        StructField("geom_lons", ArrayType(DoubleType()), False),
        StructField("geom_lats", ArrayType(DoubleType()), False),
        StructField("bi", LongType(), False),
        StructField("mid_lon", DoubleType(), False),
        StructField("mid_lat", DoubleType(), False),
        StructField("src_str", StringType(), False),
        StructField("dst_str", StringType(), False),
    ]
)


def edge_geom_parts(edges: DataFrame) -> DataFrame:
    """Per-EDGE midpoint + pre-formatted WKT fragments (G6, the Python
    half of G7).

    The midpoint walk runs once per distinct edge, not once per expanded
    pair — an edge with out-degree k previously paid k midpoint walks.
    One Arrow pass, fully vectorized (find_middle_point_many); the only
    per-edge Python is the join of pre-formatted point strings.  WKT
    points are formatted HERE with Python's Go-parity %.6f: Java's
    format_string rounds the SHORTEST repr HALF_UP, which can differ from
    correct rounding of the true double (converter_wkt.go:9-15).

    Output: the edge geometry passed through plus
      bi       — index before the middle (find_middle_point)
      mid_*    — the middle point
      src_str  — "mid, geom[bi+1:]" formatted  (this edge as FROM side)
      dst_str  — "geom[:bi+1], mid" formatted  (this edge as TO side)
    """

    def parts(batches):
        import pandas as pd

        from osm2ch_spark.udftrace import traced
        batches = traced("parts", batches)

        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                yield pd.DataFrame({f.name: [] for f in _PARTS_SCHEMA.fields})
                continue
            lens = pdf["geom_lons"].map(len).to_numpy(dtype=np.int64)
            offsets = np.concatenate([[0], np.cumsum(lens)])
            if offsets[-1] > 0:
                flat_lons = np.concatenate(
                    [np.asarray(x, dtype=np.float64) for x in pdf["geom_lons"]]
                )
                flat_lats = np.concatenate(
                    [np.asarray(x, dtype=np.float64) for x in pdf["geom_lats"]]
                )
            else:
                flat_lons = np.zeros(0)
                flat_lats = np.zeros(0)
            bi, mlon, mlat = geom.find_middle_point_many(flat_lons, flat_lats, offsets)
            # one '%.6f' pass over every point — the same correctly-
            # rounded conversion as Go's fmt %f (np.char.mod was measured
            # 4x slower than plain Python formatting here)
            pts = ["%.6f %.6f" % ab for ab in zip(flat_lons, flat_lats)]
            mid_s = ["%.6f %.6f" % ab for ab in zip(mlon, mlat)]
            src_str = [
                ",".join([m] + pts[o + b + 1 : o + n])
                for m, o, b, n in zip(mid_s, offsets[:-1], bi, lens)
            ]
            dst_str = [
                ",".join(pts[o : o + b + 1] + [m])
                for m, o, b in zip(mid_s, offsets[:-1], bi)
            ]
            yield pd.DataFrame(
                {
                    "edge_id": pdf["edge_id"],
                    "geom_lons": pdf["geom_lons"],
                    "geom_lats": pdf["geom_lats"],
                    "bi": bi,
                    "mid_lon": mlon,
                    "mid_lat": mlat,
                    "src_str": src_str,
                    "dst_str": dst_str,
                }
            )

    return edges.select("edge_id", "geom_lons", "geom_lats").mapInPandas(
        parts, _PARTS_SCHEMA
    )


def splice_geometry(expanded: DataFrame, edges: DataFrame,
                    materialize: bool = False) -> DataFrame:
    """G6 + G7 — osm_loader.go:315-320,337: expanded-edge geometry =
    [from-middle] ++ from.Geom[i+1:] ++ to.Geom[:j+1] ++ [to-middle].

    The midpoint work is hoisted to the per-EDGE side (edge_geom_parts);
    the per-EXPANDED-row splice is pure JVM array/string concatenation —
    no Python touches the big table.  The constituent-edge geometries are
    re-joined here (kept out of the expansion shuffle on purpose).

    The parts table feeds both the src and dst side of the splice join;
    with ``materialize=True`` it is eagerly local-checkpointed so the
    midpoint Arrow pass runs once and its blocks are freed with the
    DataFrame (a persist here leaked cache lifetime and made the two
    branches race on cache-block locks on first use; exchange reuse
    misses because the branches prune different columns)."""
    p = edge_geom_parts(edges)
    if materialize:
        from osm2ch_spark.workerenv import materialize_df
        p = materialize_df(p)
    tail_len = F.greatest(F.lit(0), F.size("geom_lons") - F.col("bi") - 1)
    src = p.select(
        F.col("edge_id").alias("src_edge_id"),
        F.concat(
            F.array(F.col("mid_lon")), F.slice("geom_lons", F.col("bi") + 2, tail_len)
        ).alias("_s_lons"),
        F.concat(
            F.array(F.col("mid_lat")), F.slice("geom_lats", F.col("bi") + 2, tail_len)
        ).alias("_s_lats"),
        F.col("src_str").alias("_s_str"),
    )
    dst = p.select(
        F.col("edge_id").alias("dst_edge_id"),
        F.concat(
            F.slice("geom_lons", 1, F.col("bi") + 1), F.array(F.col("mid_lon"))
        ).alias("_d_lons"),
        F.concat(
            F.slice("geom_lats", 1, F.col("bi") + 1), F.array(F.col("mid_lat"))
        ).alias("_d_lats"),
        F.col("dst_str").alias("_d_str"),
    )
    keep = list(expanded.columns)
    out = expanded.join(src, "src_edge_id").join(dst, "dst_edge_id")
    return out.select(
        *keep,
        F.concat("_s_lons", "_d_lons").alias("geom_lons"),
        F.concat("_s_lats", "_d_lats").alias("geom_lats"),
        F.concat(
            F.lit("LINESTRING("), F.col("_s_str"), F.lit(","), F.col("_d_str"), F.lit(")")
        ).alias("geom_wkt"),
    )


def build_expanded(source: DataFrame, entity: str = P.DEFAULT_ENTITY,
                   tag_whitelist: list[str] | None = None,
                   strict: bool = True) -> DataFrame:
    """Full pipeline: source table → final expanded-edge DataFrame.

    Columns: expanded_id, source_vertex, target_vertex, weight (km),
    one_way, source_way, target_way, src_source_node, src_target_node,
    dst_source_node, dst_target_node, geom_lons, geom_lats, geom_wkt.

    ``strict=True`` mirrors the reference's fail-fast contract: a way
    node absent from the node scan is a hard error (osm_loader.go:216-218)
    rather than a silently shorter geometry.  The check is folded into
    the W1 node join (left join + NaN raise inside the Arrow pass) — no
    extra job beyond the pipeline's own materialization barriers.  Note
    build_expanded eagerly materializes its fan-out barriers (slim /
    split / expand / splice), so Spark jobs run during this call and a
    strict violation raises HERE, not on the caller's first action
    (cli.py relies on this).
    """
    records = parse_source(source)
    # The pipeline materializes its fan-out tables with EAGER LOCAL
    # CHECKPOINTS, never persist():  persisted fan-outs made concurrent
    # AQE stage jobs race on cache-block locks, the losers OCCUPYING task
    # slots — a ~19 s non-scaling wall floor on the 768-file flagship run
    # — and relying on exchange reuse instead fails because per-branch
    # column pruning de-canonicalizes the shared exchanges (measured 6×
    # split-UDF re-execution).  Checkpointed RDD blocks are read lock-
    # free by every consumer stage and freed by the context cleaner when
    # the result DataFrame is dropped (no cache-manager lifetime leak).
    #
    # slim: the JSON parse runs ONCE here; the repartition spreads the
    # per-file line blow-up over the full shuffle-partition width before
    # the checkpoint pins it (the hash key is unique per line — even
    # balance at any partition count).
    n_part = int(source.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    from osm2ch_spark.workerenv import materialize_df

    slim = materialize_df(
        P.slim_records(records, entity).repartition(
            n_part, F.col("repo"), F.col("path"), F.col("seq")
        )
    )
    ways = P.scan_ways_slim(slim, tag_whitelist)
    restrictions = P.scan_restrictions_slim(slim)
    counts = node_use_count(ways)
    # membership probe rides the counts aggregation (same node_id keys) —
    # no separate explode+distinct subtree
    nodes = P.scan_nodes_slim(slim, ways, use_counts=counts)
    # edges feeds the expansion twice (e1/e2) and the splice geometry
    # join; materialize=True checkpoints the ranked split output — the
    # split UDF runs once.
    edges = split_ways_to_edges(ways, nodes, counts, strict=strict,
                                materialize=True)
    # the numbered pair table feeds the two anti-join probes and the
    # splice; materialize=True runs the self-join once.
    expanded = expand_edges(edges, materialize=True)
    seen = ways_seen(ways)
    expanded = apply_no_restrictions(expanded, restrictions, seen)
    expanded = apply_only_restrictions(expanded, restrictions, seen)
    expanded = splice_geometry(expanded, edges, materialize=True)
    return expanded.select(
        "expanded_id",
        F.col("src_edge_id").alias("source_vertex"),
        F.col("dst_edge_id").alias("target_vertex"),
        "weight",
        "one_way",
        "source_way",
        "target_way",
        "src_source_node",
        "src_target_node",
        "dst_source_node",
        "dst_target_node",
        "geom_lons",
        "geom_lats",
        "geom_wkt",
    )


def parse_source(source: DataFrame) -> DataFrame:
    """Parse + cache hint: the three scans share one parsed-records CTE."""
    return P.parse_records(source)


def edge_table(expanded: DataFrame) -> DataFrame:
    """The engine's canonical edge table for the graph algorithms:
    (source_vertex, target_vertex, weight, one_way)."""
    return expanded.select("source_vertex", "target_vertex", "weight", "one_way")
