"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data ops) with DuckDB twins; see
osm2ch_spark/driver_queries.py and osm2ch_spark/data_ops.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full osm2ch pipeline (use-count → Arrow-UDF way
    splitting → line-graph expansion → turn-restriction anti-joins) over
    the TPC-H-projected OSM world at sf0.001, returning the final
    expanded-edge table."""
    from osm2ch_spark import tpch_world as W

    return W.tpch_final_expanded(spark, "/root/testdata/sf0.001").select(
        "expanded_id",
        "src_edge_id",
        "dst_edge_id",
        "source_way",
        "target_way",
        "weight",
        "one_way",
    )


# Queries evaluated LAST by the driver gate (it records at most ~50
# entries, in dict order): the rows-only stub and the bonus degree query
# are the least informative losses if the cap bites.
_TAIL = ("degree_distribution", "multimodal_decode_stub")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osm2ch_spark.data_ops import QUERIES as DATA_QUERIES
    from osm2ch_spark.driver_queries import QUERIES as CORE_QUERIES

    out = dict(CORE_QUERIES)
    out.update(DATA_QUERIES)
    for name in _TAIL:
        if name in out:
            out[name] = out.pop(name)  # move to the end, keep registered
    return out


def oracle_sql() -> dict[str, str]:
    from osm2ch_spark.data_ops import ORACLES as DATA_ORACLES
    from osm2ch_spark.driver_queries import ORACLES as CORE_ORACLES

    out = dict(CORE_ORACLES)
    out.update(DATA_ORACLES)
    return out
