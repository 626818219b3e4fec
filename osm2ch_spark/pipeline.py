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


def split_ways_to_edges(ways: DataFrame, nodes: DataFrame, use_counts: DataFrame) -> DataFrame:
    """W1 + ID1 — osm_loader.go:223-273.

    One shuffle (the re-group by way) + one Arrow batch pass; all per-row
    math is numpy (haversine cumsum).  Emits forward edge then — for
    two-way ways — the reverse edge (reversed geometry, same cost,
    was_oneway=False), restarting accumulation at each split node, exactly
    as the reference loop does.  Edge IDs are 1-based sequential in
    (scan order, split order, direction) via two-phase numbering.
    """
    wn = ways.select(
        "way_id", "oneway", "repo", "path", "seq", F.posexplode("nodes").alias("pos", "node_id")
    )
    wn = (
        wn.join(nodes, "node_id", "inner")
        .join(use_counts, "node_id", "left")
        .select(
            "way_id", "oneway", "repo", "path", "seq", "pos",
            "node_id", "lon", "lat", F.coalesce("use_count", F.lit(0)).alias("use_count"),
        )
    )
    grouped = wn.groupBy("way_id", "oneway", "repo", "path", "seq").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "node_id", "lon", "lat", "use_count"))
        ).alias("pts")
    )
    # ship four parallel primitive arrays across Arrow (struct access from
    # pandas is dict-of-row — an order of magnitude slower per element)
    grouped = grouped.select(
        "way_id", "oneway", "repo", "path", "seq",
        F.transform("pts", lambda p: p.node_id).alias("nids"),
        F.transform("pts", lambda p: p.lon).alias("lons"),
        F.transform("pts", lambda p: p.lat).alias("lats"),
        F.transform("pts", lambda p: p.use_count).alias("ucnts"),
    )

    def split(batches):
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in EDGE_SCHEMA.fields}
            # ONE vectorized haversine over every consecutive pair of every
            # way in the batch (per-way kernel calls have fixed numpy
            # overhead that dominates on short ways); pairs that cross way
            # boundaries are never read back.
            lens = pdf["nids"].map(len).to_numpy()
            if len(lens) == 0:
                yield pd.DataFrame(out)
                continue
            flat_lons = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["lons"]])
            flat_lats = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["lats"]])
            if len(flat_lons) > 1:
                all_d = geom.great_circle_distance(
                    flat_lons[:-1], flat_lats[:-1], flat_lons[1:], flat_lats[1:]
                )
            else:
                all_d = np.zeros(0)
            offsets = np.concatenate([[0], np.cumsum(lens)])
            for row_i, (way_id, oneway, repo, path, seq, nids, pucnt) in enumerate(zip(
                pdf["way_id"], pdf["oneway"], pdf["repo"], pdf["path"], pdf["seq"],
                pdf["nids"], pdf["ucnts"],
            )):
                node_ids = np.asarray(nids, dtype=np.int64)
                ucnt = np.asarray(pucnt, dtype=np.int64)
                n = len(node_ids)
                if n == 0:
                    continue
                o = offsets[row_i]
                lons = flat_lons[o : o + n]
                lats = flat_lats[o : o + n]
                dists = all_d[o : o + n - 1] if n > 1 else np.zeros(0)
                start = 0
                seg = 0
                for i in range(1, n):
                    if ucnt[i] > 1:
                        g_lons = lons[start : i + 1]
                        g_lats = lats[start : i + 1]
                        # left-to-right accumulation == Go loop order
                        cost = 0.0
                        for v in dists[start:i]:
                            cost += v
                        cost = float(cost)
                        out["way_id"].append(way_id)
                        out["repo"].append(repo)
                        out["path"].append(path)
                        out["seq"].append(seq)
                        out["seg_index"].append(seg)
                        out["direction"].append(0)
                        out["source_node"].append(node_ids[start])
                        out["target_node"].append(node_ids[i])
                        out["was_oneway"].append(bool(oneway))
                        out["cost_km"].append(cost)
                        out["geom_lons"].append(g_lons.tolist())
                        out["geom_lats"].append(g_lats.tolist())
                        if not oneway:
                            out["way_id"].append(way_id)
                            out["repo"].append(repo)
                            out["path"].append(path)
                            out["seq"].append(seq)
                            out["seg_index"].append(seg)
                            out["direction"].append(1)
                            out["source_node"].append(node_ids[i])
                            out["target_node"].append(node_ids[start])
                            out["was_oneway"].append(False)
                            out["cost_km"].append(cost)
                            out["geom_lons"].append(g_lons[::-1].tolist())
                            out["geom_lats"].append(g_lats[::-1].tolist())
                        start = i
                        seg += 1
            yield pd.DataFrame(out)

    segments = grouped.mapInPandas(split, EDGE_SCHEMA)
    # _idb buckets the per-file group so numbering stays parallel even
    # when one file dominates (order-aligned: floor(seq/256) is monotone
    # in seq, so (repo, path, _idb) groups are contiguous in the global
    # (repo, path, seq, seg, dir) order).
    segments = segments.withColumn("_idb", F.floor(F.col("seq") / 256))
    out = with_sequential_id(
        segments, ["repo", "path", "_idb"], ["seq", "seg_index", "direction"], "edge_id"
    )
    return out.drop("_idb")


def filter_vertices_used(nodes: DataFrame, use_counts: DataFrame) -> DataFrame:
    """F4 — osm_loader.go:275-283: keep nodes with use_count > 1."""
    return (
        nodes.join(use_counts, "node_id", "inner")
        .filter(F.col("use_count") > 1)
        .select("node_id", "lon", "lat", "use_count")
    )


def expand_edges(edges: DataFrame) -> DataFrame:
    """J3 + F5 + F6 + ID2 — osm_loader.go:285-343 (pre-splice).

    Self hash-equi-join on e1.target_node == e2.source_node; skip self
    pairs (F5) and exact-geometry U-turn pairs (F6, raw float equality);
    number surviving pairs in (e1.edge_id, e2.edge_id) order — the
    reference's scan×index order, since edgesBySourceNodeID lists are in
    ascending edge-id order (osm_loader.go:289-292).

    Skew note: hub intersections make target_node skewed; AQE skew-join
    handles the build side at scale (session.py turns it on).
    """
    # edges is consumed twice (build and probe side of the self-join);
    # persist so the split UDF + numbering run once (cacheManager dedups
    # if the caller persisted the same plan already).
    edges = edges.persist()
    # Only endpoint SCALARS travel through the join/numbering/anti-joins
    # (the F6 check needs just the first/last geometry points); the full
    # arrays are re-joined at splice time — this keeps the big shuffles
    # narrow (order-of-magnitude less shuffle volume at scale).
    e1 = edges.select(
        F.col("edge_id").alias("src_edge_id"),
        F.col("repo").alias("src_repo"),
        F.col("path").alias("src_path"),
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
    e2 = edges.select(
        F.col("edge_id").alias("dst_edge_id"),
        F.col("way_id").alias("target_way"),
        F.col("source_node").alias("dst_source_node"),
        F.col("target_node").alias("dst_target_node"),
        F.col("cost_km").alias("dst_cost"),
        F.element_at("geom_lons", 1).alias("d_lon0"),
        F.element_at("geom_lats", 1).alias("d_lat0"),
        F.element_at("geom_lons", -1).alias("d_lon1"),
        F.element_at("geom_lats", -1).alias("d_lat1"),
    )
    j = e1.join(e2, F.col("src_target_node") == F.col("dst_source_node"), "inner")
    # F5 — osm_loader.go:302-304
    j = j.filter(F.col("src_edge_id") != F.col("dst_edge_id"))
    # F6 — osm_loader.go:306-312: exact float equality on endpoint pairs
    cyc = (
        (F.col("s_lon0") == F.col("d_lon1"))
        & (F.col("s_lat0") == F.col("d_lat1"))
        & (F.col("s_lon1") == F.col("d_lon0"))
        & (F.col("s_lat1") == F.col("d_lat0"))
    )
    j = j.filter(~cyc)
    j = j.drop("s_lon0", "s_lat0", "s_lon1", "s_lat1", "d_lon0", "d_lat0", "d_lon1", "d_lat1")
    j = j.withColumn("weight", (F.col("src_cost") + F.col("dst_cost")) / F.lit(2.0))
    # ID2 grouping: edge ids are file-contiguous (assigned in (repo, path)
    # order), so pairs grouped by (e1's file, floor(src_edge_id/2048)) are
    # contiguous under the global (src_edge_id, dst_edge_id) order; the
    # bucket keeps numbering parallel when one file dominates.
    j = j.withColumn("_idb", F.floor(F.col("src_edge_id") / 2048))
    out = with_sequential_id(
        j,
        ["src_repo", "src_path", "_idb"],
        ["src_edge_id", "dst_edge_id"],
        "expanded_id",
        # j is a narrow hash join of the persisted edges table — cheaper
        # to recompute for the counts branch than to cache millions of rows
        persist_input=False,
    )
    return out.drop("_idb")


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


def splice_geometry(expanded: DataFrame, edges: DataFrame) -> DataFrame:
    """G6 + G7 — osm_loader.go:315-320,337: expanded-edge geometry =
    [from-middle] ++ from.Geom[i+1:] ++ to.Geom[:j+1] ++ [to-middle].

    Re-joins the constituent-edge geometries (kept out of the expansion
    shuffle on purpose), then one Arrow batch pass; per-row numpy.  Also
    emits the WKT string here with Python's Go-parity %.6f (Java's
    format_string rounds HALF_UP and can differ on exact half-boundary
    doubles)."""
    g = edges.select("edge_id", "geom_lons", "geom_lats")
    expanded = (
        expanded.join(
            g.select(
                F.col("edge_id").alias("src_edge_id"),
                F.col("geom_lons").alias("src_lons"),
                F.col("geom_lats").alias("src_lats"),
            ),
            "src_edge_id",
        )
        .join(
            g.select(
                F.col("edge_id").alias("dst_edge_id"),
                F.col("geom_lons").alias("dst_lons"),
                F.col("geom_lats").alias("dst_lats"),
            ),
            "dst_edge_id",
        )
    )
    keep = [c for c in expanded.columns if c not in ("src_lons", "src_lats", "dst_lons", "dst_lats")]
    schema = StructType(
        [expanded.schema[c] for c in keep] + EXPANDED_GEOM_FIELDS
    )

    def splice(batches):
        import pandas as pd

        for pdf in batches:
            lons_out, lats_out, wkt_out = [], [], []
            for slons, slats, dlons, dlats in zip(
                pdf["src_lons"], pdf["src_lats"], pdf["dst_lons"], pdf["dst_lats"]
            ):
                fg = np.column_stack([np.asarray(slons), np.asarray(slats)])
                tg = np.column_stack([np.asarray(dlons), np.asarray(dlats)])
                bi, fmid = geom.find_middle_point(fg)
                bj, tmid = geom.find_middle_point(tg)
                pts = np.concatenate(
                    [
                        np.array([fmid]),
                        fg[bi + 1 :],
                        tg[: bj + 1],
                        np.array([tmid]),
                    ]
                )
                lons_out.append(pts[:, 0].tolist())
                lats_out.append(pts[:, 1].tolist())
                wkt_out.append(
                    "LINESTRING(%s)" % ",".join(f"{p[0]:.6f} {p[1]:.6f}" for p in pts)
                )
            res = pdf[keep].copy()
            res["geom_lons"] = lons_out
            res["geom_lats"] = lats_out
            res["geom_wkt"] = wkt_out
            yield res

    return expanded.mapInPandas(splice, schema)


def build_expanded(source: DataFrame, entity: str = P.DEFAULT_ENTITY,
                   tag_whitelist: list[str] | None = None) -> DataFrame:
    """Full pipeline: source table → final expanded-edge DataFrame.

    Columns: expanded_id, source_vertex, target_vertex, weight (km),
    one_way, source_way, target_way, src_source_node, src_target_node,
    dst_source_node, dst_target_node, geom_lons, geom_lats, geom_wkt.
    """
    records = parse_source(source)
    # ways feeds four subtrees (node semi-join, use counts, split, seen)
    ways = P.scan_ways(records, entity, tag_whitelist).persist()
    nodes = P.scan_nodes(records, ways)
    restrictions = P.scan_restrictions(records)
    counts = node_use_count(ways)
    # edges feeds the expansion twice (e1/e2) and the splice geometry join
    edges = split_ways_to_edges(ways, nodes, counts).persist()
    expanded = expand_edges(edges)
    seen = ways_seen(ways)
    expanded = apply_no_restrictions(expanded, restrictions, seen)
    expanded = apply_only_restrictions(expanded, restrictions, seen)
    expanded = splice_geometry(expanded, edges)
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
