"""osm2ch_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the full pipeline of the reference (LdDl/osm2ch, Go) as lazy
DataFrame transforms: parse OSM-style way/node/relation records out of an
Iceberg-style source table ``(repo, path, commit, lang, content)``, split
ways into edges at high-use nodes, expand to the line graph, apply turn
restrictions as anti-joins — then run iterative PageRank / connected
components / label propagation / triangle counting over the resulting edge
table.  See SURVEY.md for the operator-by-operator mapping.
"""

from osm2ch_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
