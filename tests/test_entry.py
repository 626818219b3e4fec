"""Driver-contract smoke: entry() runs, queries() have matching oracle
keys, and a sample of queries runs against testdata + DuckDB."""

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "expanded_id", "src_edge_id", "dst_edge_id", "source_way",
        "target_way", "weight", "one_way",
    ]


def test_registry_shape():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 50
    # every oracle key must have a query
    assert set(os_) <= set(qs)
    # the non-oracled set is the explicitly iterative/stub set
    assert set(qs) - set(os_) == {"multimodal_decode_stub"}


@pytest.mark.parametrize(
    "name",
    ["agg_node_use_count", "self_join_edge_expansion", "dedup_minhash_lsh",
     "embedding_cosine_topk", "pagerank", "geom_way_scalars"],
)
def test_query_matches_oracle(spark, ducks, name):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare

    qs, os_ = E.queries(), E.oracle_sql()
    sdf = qs[name](spark, SF).toPandas()
    odf = ducks.execute(os_[name]).fetchdf()
    assert compare(name, sdf, odf) == []


def test_cli_parser_defaults():
    """Flag parity with cmd/osm2ch/main.go:16-23 (names re-spelled for the
    table-source world; -contract scope-excluded)."""
    from osm2ch_spark.cli import DEFAULT_TAGS, build_parser

    p = build_parser()
    a = p.parse_args(["--source", "/x/y"])
    assert a.geomf == "wkt" and a.units == "km" and a.out == "my_graph.csv"
    assert "residential" in DEFAULT_TAGS and "motorway_link" in DEFAULT_TAGS
    assert len(DEFAULT_TAGS.split(",")) == 13  # same 13-tag default set
    a2 = p.parse_args(["--source", "/x", "--geomf", "geojson", "--units", "m"])
    assert a2.geomf == "geojson" and a2.units == "m"


def test_cli_sink_autoswitch():
    """The CLI auto-selects the distributed sink above the row threshold
    (driver-side collect would OOM at scale); --single-file forces the
    reference-parity single file, --distributed-sink forces parts."""
    from osm2ch_spark.cli import build_parser, pick_distributed

    a = build_parser().parse_args(["--source", "/x"])
    assert a.sink_threshold == 5_000_000 and not a.single_file
    assert pick_distributed(100, False, False, 5_000_000) is False
    assert pick_distributed(5_000_001, False, False, 5_000_000) is True
    assert pick_distributed(5_000_001, True, False, 5_000_000) is False  # forced parity
    assert pick_distributed(100, False, True, 5_000_000) is True  # forced dist
