"""Physical-plan audits: the optimizations SURVEY.md §4 claims must
actually appear in the executed plans (pushdown, broadcast anti-joins,
Arrow-only Python, partial aggregation)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from osm2ch_spark import fixtures, pipeline
from osm2ch_spark import tpch_world as W

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_source_scan_pushdown(spark):
    from osm2ch_spark.driver_queries import QUERIES

    p = plan_of(QUERIES["source_table"](spark, SF))
    # filter reaches the parquet scan; only needed columns are read
    assert "PushedFilters" in p and "lang" in p
    assert "ReadSchema" in p
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema  # column pruning: text not read


def test_restriction_antijoin_broadcasts(spark):
    edges = W.tpch_edges(spark, SF)
    expanded = pipeline.expand_edges(edges)
    rules = W.tpch_rules(expanded)
    seen = pipeline.ways_seen(W.tpch_ways(spark, SF))
    p = plan_of(pipeline.apply_no_restrictions(expanded, rules, seen))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_no_row_python_udfs(spark):
    """All Python is Arrow-batched (MapInPandas); BatchEvalPython (row
    pickling) must never appear in the pipeline plan."""
    src = fixtures.micrograph_source(spark, ["t_junction"])
    p = plan_of(pipeline.build_expanded(src))
    assert "BatchEvalPython" not in p
    assert "MapInPandas" in p or "mapInPandas" in p.lower()


def test_use_count_partial_aggregation(spark):
    """groupBy sum must partial-aggregate map-side (two HashAggregate
    nodes) — the skew-safety claim for A1/PageRank contribs."""
    counts = pipeline.node_use_count(W.tpch_ways(spark, SF))
    p = plan_of(counts)
    assert p.count("HashAggregate") >= 2


def test_semi_join_used_for_nodes_seen(spark):
    from osm2ch_spark.driver_queries import QUERIES

    p = plan_of(QUERIES["semi_join_nodes_seen"](spark, SF))
    assert "LeftSemi" in p


def test_whole_stage_codegen_present(spark):
    from osm2ch_spark.driver_queries import QUERIES

    df = QUERIES["agg_node_use_count"](spark, SF)
    df.collect()  # AQE finalizes the executed plan only after a run
    executed = df._jdf.queryExecution().executedPlan().toString()
    # "*(N)" prefixes mark whole-stage-codegen'd operators
    assert "*(" in executed
    # map-side partial aggregation (skew-safety for A1/PageRank sums)
    assert "partial_sum" in executed
