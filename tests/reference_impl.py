"""Independent single-threaded reimplementation of osm_loader.go semantics.

This is the tests' stand-in for the reference binary (its example pbf is
missing from the checkout — SURVEY.md §5).  It follows the Go control flow
of /root/reference/osm_loader.go stage by stage over plain record dicts,
using the same geometry kernel module the engine uses (which is itself
golden-tested against geomath_test.go).  Deliberately naive: python
loops, dicts — it exists to be OBVIOUSLY faithful, not fast.
"""

from __future__ import annotations

import numpy as np

from osm2ch_spark import geom

NO_TYPES = ("no_left_turn", "no_right_turn", "no_straight_on")
ONLY_TYPES = ("only_left_turn", "only_right_turn", "only_straight_on")

DEFAULT_TAGS = (
    "motorway,primary,primary_link,road,secondary,secondary_link,residential,"
    "tertiary,tertiary_link,unclassified,trunk,trunk_link,motorway_link"
).split(",")


def run(records, entity="highway", tags=None):
    """records: list of dicts in scan order (the reference scans the same
    file thrice; one ordered list models that).  Returns dict with ways,
    nodes, edges, expanded (list of dicts mirroring ExpandedEdge)."""
    tags = tags if tags is not None else DEFAULT_TAGS

    # --- way scan (osm_loader.go:27-73)
    ways = []
    nodes_seen = set()
    for r in records:
        if r["type"] != "way":
            continue
        tmap = r.get("tags") or {}
        t = tmap.get(entity)
        if t is None or t not in tags:
            continue
        oneway = tmap.get("oneway") in ("yes", "1")
        ways.append({"id": r["id"], "nodes": list(r["nodes"]), "oneway": oneway})
        nodes_seen.update(r["nodes"])

    # --- node scan (osm_loader.go:80-103) — first wins via delete-from-set
    nodes = {}
    for r in records:
        if r["type"] != "node":
            continue
        if r["id"] in nodes_seen:
            nodes_seen.discard(r["id"])
            nodes[r["id"]] = {"lon": r["lon"], "lat": r["lat"], "use": 0}

    # --- restriction scan (osm_loader.go:110-202)
    restrictions = {}  # rtype -> (from_id,from_t) -> (to_id,to_t) -> (via_id,via_t)
    for r in records:
        if r["type"] != "relation":
            continue
        rtag = (r.get("tags") or {}).get("restriction")
        if rtag is None:
            continue
        members = r.get("members") or []
        if len(members) != 3:
            continue
        first = (-1, "")
        second = (-1, "")
        third = (-1, "")
        for m in members:  # later roles overwrite (Go switch per member)
            if m["role"] == "from":
                first = (m["ref"], m["type"])
            elif m["role"] == "to":
                second = (m["ref"], m["type"])
            elif m["role"] == "via":
                third = (m["ref"], m["type"])
        d = restrictions.setdefault(rtag, {}).setdefault(first, {})
        if second not in d:
            d[second] = third

    # --- use counts (osm_loader.go:204-221)
    for w in ways:
        for i, nid in enumerate(w["nodes"]):
            if nid not in nodes:
                raise ValueError(f"Missing node with id: {nid}")
            nodes[nid]["use"] += 2 if (i == 0 or i == len(w["nodes"]) - 1) else 1

    # --- way splitting (osm_loader.go:223-273)
    edges = []
    ways_seen = set()
    total = 0
    for w in ways:
        ways_seen.add(w["id"])
        source = None
        geometry = []
        for i, nid in enumerate(w["nodes"]):
            nd = nodes[nid]
            if i == 0:
                source = nid
                geometry = [(nd["lon"], nd["lat"])]
            else:
                geometry.append((nd["lon"], nd["lat"]))
                if nd["use"] > 1:
                    total += 1
                    cost = geom.spherical_length(np.array(geometry))
                    edges.append(
                        {
                            "id": total,
                            "way": w["id"],
                            "src": source,
                            "dst": nid,
                            "cost": cost,
                            "geom": list(geometry),
                            "oneway": w["oneway"],
                        }
                    )
                    if not w["oneway"]:
                        total += 1
                        edges.append(
                            {
                                "id": total,
                                "way": w["id"],
                                "src": nid,
                                "dst": source,
                                "cost": cost,
                                "geom": list(reversed(geometry)),
                                "oneway": False,
                            }
                        )
                    source = nid
                    geometry = [(nd["lon"], nd["lat"])]

    # --- expansion (osm_loader.go:285-343)
    by_src = {}
    for e in edges:
        by_src.setdefault(e["src"], []).append(e["id"])
    expanded = []
    xid = 0
    for e1 in edges:
        for out_id in by_src.get(e1["dst"], []):
            if out_id == e1["id"]:
                continue
            e2 = edges[out_id - 1]
            if e1["geom"][0] == e2["geom"][-1] and e1["geom"][-1] == e2["geom"][0]:
                continue
            xid += 1
            bi, fmid = geom.find_middle_point(np.array(e1["geom"]))
            fhalf = [tuple(fmid)] + [tuple(p) for p in e1["geom"][bi + 1 :]]
            bj, tmid = geom.find_middle_point(np.array(e2["geom"]))
            thalf = [tuple(p) for p in e2["geom"][: bj + 1]] + [tuple(tmid)]
            expanded.append(
                {
                    "id": xid,
                    "source": e1["id"],
                    "target": e2["id"],
                    "src_way": e1["way"],
                    "dst_way": e2["way"],
                    "src_src_node": e1["src"],
                    "src_dst_node": e1["dst"],
                    "dst_src_node": e2["src"],
                    "dst_dst_node": e2["dst"],
                    "cost": (e1["cost"] + e2["cost"]) / 2.0,
                    "oneway": e1["oneway"],
                    "geom": fhalf + thalf,
                }
            )

    # --- "no" pass (osm_loader.go:348-389)
    for rtype, k in restrictions.items():
        if rtype not in NO_TYPES:
            continue
        for (fid, ft), v in k.items():
            if ft != "way" or fid not in ways_seen:
                continue
            for (tid, tt), (vid, vt) in v.items():
                if tt != "way" or vt != "node" or tid not in ways_seen:
                    continue
                expanded = [
                    x for x in expanded if not (x["src_way"] == fid and x["dst_way"] == tid)
                ]

    # --- "only" pass (osm_loader.go:390-432)
    for rtype, k in restrictions.items():
        if rtype not in ONLY_TYPES:
            continue
        for (fid, ft), v in k.items():
            if ft != "way" or fid not in ways_seen:
                continue
            for (tid, tt), (vid, vt) in v.items():
                if tt != "way" or vt != "node" or tid not in ways_seen:
                    continue
                expanded = [
                    x
                    for x in expanded
                    if not (
                        x["src_way"] == fid
                        and x["dst_way"] != tid
                        and x["src_dst_node"] == vid
                    )
                ]

    return {"ways": ways, "nodes": nodes, "edges": edges, "expanded": expanded}


def expanded_csv_rows(expanded, units="km"):
    """cmd/osm2ch/main.go:97-156 — the `;`-joined edge CSV rows (no header),
    in expanded order, skipping geoms with <2 points (F7)."""
    rows = []
    for x in expanded:
        cost = x["cost"] * 1000.0 if units == "m" else x["cost"]
        if len(x["geom"]) < 2:
            continue
        wkt = "LINESTRING(%s)" % ",".join(f"{p[0]:.6f} {p[1]:.6f}" for p in x["geom"])
        rows.append(
            ";".join(
                [
                    str(x["source"]),
                    str(x["target"]),
                    f"{cost:.6f}",
                    wkt,
                    "true" if x["oneway"] else "false",
                    str(x["id"]),
                    str(x["src_way"]),
                    str(x["dst_way"]),
                    str(x["src_src_node"]),
                    str(x["src_dst_node"]),
                    str(x["dst_src_node"]),
                    str(x["dst_dst_node"]),
                ]
            )
        )
    return rows
