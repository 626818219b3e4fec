"""GA1–GA4 vs numpy oracles on fixture-derived and seeded graphs,
plus the checkpoint/resume contract (FIXTURES.md §4)."""

import numpy as np
import pytest

from osm2ch_spark import fixtures, pipeline
from osm2ch_spark.graph import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
    triangles_per_vertex,
)
from osm2ch_spark.graph.adjacency import build_adjacency
from tests import graph_oracle as O


def edge_df(spark, edge_list):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0, False) for u, v in edge_list],
        "source_vertex long, target_vertex long, weight double, one_way boolean",
    )


@pytest.fixture(scope="module")
def graphs(spark):
    out = {
        "power_law": O.seeded_graph("power_law"),
        "multi_component": O.seeded_graph("multi_component"),
    }
    # expanded line graph of the t_junction fixture
    src = fixtures.micrograph_source(spark, ["t_junction", "split_shared_node"])
    exp = pipeline.build_expanded(src)
    out["expanded_fixture"] = [
        (r["source_vertex"], r["target_vertex"]) for r in exp.collect()
    ]
    return out


GRAPH_KEYS = ["power_law", "multi_component", "expanded_fixture"]


@pytest.mark.parametrize("key", GRAPH_KEYS)
def test_pagerank_allclose(spark, key, graphs):
    edges = graphs[key]
    oracle = O.pagerank_oracle(edges)
    got = {r["vertex"]: r["rank"] for r in pagerank(edge_df(spark, edges)).collect()}
    assert set(got) == set(oracle)
    g = np.array([got[v] for v in sorted(got)])
    o = np.array([oracle[v] for v in sorted(oracle)])
    assert np.allclose(g, o, atol=1e-6), f"{key}: max diff {np.abs(g - o).max()}"
    assert abs(g.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("key", GRAPH_KEYS)
def test_connected_components_exact(spark, key, graphs):
    edges = graphs[key]
    oracle = O.cc_oracle(edges)
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edge_df(spark, edges)).collect()
    }
    assert got == oracle


@pytest.mark.parametrize("key", GRAPH_KEYS)
def test_connected_components_dedup_cadence(spark, key, graphs, monkeypatch):
    """OSM2CH_CC_DEDUP_EVERY=2 (distinct + convergence check every other
    round) must be result-identical to the every-round default — the star
    passes are duplicate-insensitive set functions."""
    monkeypatch.setenv("OSM2CH_CC_DEDUP_EVERY", "2")
    edges = graphs[key]
    oracle = O.cc_oracle(edges)
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edge_df(spark, edges)).collect()
    }
    assert got == oracle


@pytest.mark.parametrize("key", ["multi_component", "expanded_fixture"])
def test_label_propagation_exact(spark, key, graphs):
    edges = graphs[key]
    oracle = O.lpa_oracle(edges, max_iter=20)
    got = {
        r["vertex"]: r["label"]
        for r in label_propagation(edge_df(spark, edges), max_iter=20).collect()
    }
    # oracle only covers vertices with neighbors; ours covers the same set
    assert got == oracle


@pytest.mark.parametrize("key", GRAPH_KEYS)
def test_triangle_count_exact(spark, key, graphs):
    edges = graphs[key]
    assert triangle_count(edge_df(spark, edges)) == O.triangles_oracle(edges)


def test_triangles_per_vertex(spark, graphs):
    edges = graphs["power_law"]
    per_v = {
        r["vertex"]: r["triangles"]
        for r in triangles_per_vertex(edge_df(spark, edges)).collect()
    }
    # sum over vertices counts each triangle 3 times
    assert sum(per_v.values()) == 3 * O.triangles_oracle(edges)


def test_triangles_skewed_hub(spark):
    """Degree-orientation keeps hub wedge work bounded: a degree-200 hub
    with low vertex id would pay C(200,2)=19900 wedges under
    id-orientation; oriented low-degree→high-degree the hub receives the
    edges instead and generates ZERO wedges.  Count stays exact."""
    from osm2ch_spark.graph.triangles import _canonical, _oriented

    hub = 0  # lowest id — the id-orientation worst case
    spokes = list(range(1, 201))
    edges = [(hub, s) for s in spokes]
    # a few closures among spokes → triangles through the hub
    edges += [(1, 2), (3, 4), (5, 6)]
    assert O.triangles_oracle(edges) == 3
    df = edge_df(spark, edges)
    assert triangle_count(df) == 3
    oe = _oriented(_canonical(df))
    out_deg = {
        r["x"]: r["cnt"]
        for r in oe.groupBy("x").count().withColumnRenamed("count", "cnt").collect()
    }
    # every spoke points AT the hub; the hub has no out-edges at all
    assert out_deg.get(hub, 0) == 0
    assert max(out_deg.values()) <= 3


def test_adjacency_chunking(spark):
    # a hub with 10 out-edges, chunk size 4 → 3 chunks, degree preserved
    edges = edge_df(spark, [(1, t) for t in range(2, 12)])
    adj = build_adjacency(edges, num_buckets=4, max_chunk=4).collect()
    hub = [r for r in adj if r["source_vertex"] == 1]
    assert len(hub) == 3
    assert all(r["out_degree"] == 10 for r in hub)
    assert sorted(sum((r["neighbors"] for r in hub), [])) == list(range(2, 12))


def test_pagerank_resume(spark, tmp_path, graphs):
    """Kill after k iterations, resume from checkpoint → identical result."""
    edges = graphs["multi_component"]
    df = edge_df(spark, edges)
    full = {r["vertex"]: r["rank"] for r in pagerank(df, max_iter=12, tol=0.0).collect()}

    ck = str(tmp_path / "ck")
    pagerank(df, max_iter=5, tol=0.0, checkpoint_dir=ck, checkpoint_every=1)
    resumed = {
        r["vertex"]: r["rank"]
        for r in pagerank(
            df, max_iter=12, tol=0.0, checkpoint_dir=ck, checkpoint_every=1, resume=True
        ).collect()
    }
    g = np.array([full[v] for v in sorted(full)])
    r = np.array([resumed[v] for v in sorted(resumed)])
    assert np.allclose(g, r, atol=1e-12)


def test_lineage_rows(spark, tmp_path, graphs):
    import json
    import os

    ck = str(tmp_path / "ck2")
    pagerank(edge_df(spark, graphs["multi_component"]), max_iter=4, tol=0.0,
             checkpoint_dir=ck, checkpoint_every=2)
    lineage = [
        json.loads(l)
        for l in open(os.path.join(ck, "pagerank", "lineage.json"))
        if l.strip()
    ]
    assert [m["iteration"] for m in lineage] == [2, 4]
    for m in lineage:
        assert m["rows"] > 0 and m["checkpoint_path"] and "delta" in m and m["partitions"] > 0
        # per-partition lineage (north rule): one entry per committed
        # parquet part with its row count, summing to the state total
        assert m["partition_rows"], "per-partition lineage missing"
        assert sum(p["rows"] for p in m["partition_rows"]) == m["rows"]


def test_resume_skips_torn_lineage_tail(spark, tmp_path, graphs):
    """A crash mid-append can tear lineage.json's last line; resume must
    fall back to the previous complete row instead of raising."""
    import json
    import os

    from osm2ch_spark.graph.checkpoint import CheckpointManager

    ck = str(tmp_path / "torn")
    pagerank(edge_df(spark, graphs["multi_component"]), max_iter=4, tol=0.0,
             checkpoint_dir=ck, checkpoint_every=2)
    lineage_path = os.path.join(ck, "pagerank", "lineage.json")
    with open(lineage_path, "a") as f:
        f.write('{"algorithm": "pagerank", "iteration": 6, "rows"')  # torn
    mgr = CheckpointManager(ck, "pagerank")
    meta = mgr.latest()
    assert meta is not None and meta["iteration"] == 4
    state, it = mgr.resume(spark)
    assert it == 4 and state.count() > 0


def test_ckpt_storage_level_rejects_typo(monkeypatch):
    import pytest

    from osm2ch_spark.workerenv import ckpt_storage_level

    monkeypatch.setenv("OSM2CH_CKPT_LEVEL", "serialized")
    with pytest.raises(ValueError, match="serialized"):
        ckpt_storage_level("ser")


def test_partition_rows_tolerates_nonlocal_path():
    from osm2ch_spark.graph.checkpoint import CheckpointManager

    # non-local URI: os.listdir raises; lineage enrichment must degrade
    # to [] instead of killing the run
    assert CheckpointManager._partition_rows("hdfs://nn/ck/iter=1") == []


def test_cc_lpa_resume(spark, tmp_path, graphs):
    """Resume mid-run → identical final state (CC edge-set, LPA labels)."""
    edges = graphs["multi_component"]
    df = edge_df(spark, edges)

    full_cc = {r["vertex"]: r["component"] for r in connected_components(df).collect()}
    ck = str(tmp_path / "cc")
    connected_components(df, max_iter=1, checkpoint_dir=ck, checkpoint_every=1)
    resumed_cc = {
        r["vertex"]: r["component"]
        for r in connected_components(
            df, checkpoint_dir=ck, checkpoint_every=1, resume=True
        ).collect()
    }
    assert resumed_cc == full_cc

    full_lpa = {r["vertex"]: r["label"] for r in label_propagation(df, max_iter=8).collect()}
    ck2 = str(tmp_path / "lpa")
    label_propagation(df, max_iter=3, checkpoint_dir=ck2, checkpoint_every=1)
    resumed_lpa = {
        r["vertex"]: r["label"]
        for r in label_propagation(
            df, max_iter=8, checkpoint_dir=ck2, checkpoint_every=1, resume=True
        ).collect()
    }
    assert resumed_lpa == full_lpa
