"""Benchmark harness (driver contract + scaling mode).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: run the same job in two subprocesses at local[8] and
local[32] on the same input and report throughput at both plus the
scaling efficiency (the sandbox proxy for N vs 4N executors —
BASELINE.md); writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def headline_queries():
    """name -> fn(spark) -> rows_processed (forces full computation)."""
    from pyspark.sql import functions as F

    from osm2ch_spark import fixtures, pipeline
    from osm2ch_spark import tpch_world as W
    from osm2ch_spark.graph import pagerank, connected_components, triangle_count

    def q_edge_pipeline(spark):
        # full pipeline over the TPC-H-projected world (W1 UDF + IDs +
        # expansion + restrictions)
        return W.tpch_final_expanded(spark, SF_DIR).count()

    def q_osm_parse_pipeline(spark):
        # OSM-native path incl. JSON parse, on the synthetic grid source
        src = fixtures.synth_source(spark, n_files=48, grid=10)
        return pipeline.build_expanded(src).count()

    def q_pagerank(spark):
        # PageRank over the line graph produced by the pipeline (large)
        edges = pipeline.edge_table(
            W.tpch_expanded(spark, SF_DIR).select(
                F.col("src_edge_id").alias("source_vertex"),
                F.col("dst_edge_id").alias("target_vertex"),
                "weight",
                "one_way",
            )
        )
        edges = edges.localCheckpoint(eager=True)
        n_edges = edges.count()
        pagerank(edges, max_iter=5, tol=0.0).count()
        return n_edges * 5  # edge-visits processed

    def q_connected_components(spark):
        edges = W.tpch_expanded(spark, SF_DIR).select(
            F.col("src_edge_id").alias("source_vertex"),
            F.col("dst_edge_id").alias("target_vertex"),
        ).withColumn("weight", F.lit(1.0)).withColumn("one_way", F.lit(False))
        edges = edges.localCheckpoint(eager=True)
        connected_components(edges).count()
        return edges.count()

    def q_triangles(spark):
        return triangle_count(W.tpch_edge_graph(spark, SF_DIR))

    def q_dedup_minhash(spark):
        from osm2ch_spark.data_ops import QUERIES

        return QUERIES["dedup_minhash_lsh"](spark, SF_DIR).count()

    def q_cosine_topk(spark):
        from osm2ch_spark.data_ops import QUERIES

        return QUERIES["embedding_cosine_topk"](spark, SF_DIR).count()

    return {
        "edge_pipeline": q_edge_pipeline,
        "osm_parse_pipeline": q_osm_parse_pipeline,
        "pagerank5": q_pagerank,
        "connected_components": q_connected_components,
        "triangles": q_triangles,
        "dedup_minhash": q_dedup_minhash,
        "cosine_topk": q_cosine_topk,
    }


def run_once(cpus: int) -> dict:
    from osm2ch_spark import get_spark

    spark = get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"queries": {}, "rows": {}}
    total = 0.0
    for name, fn in headline_queries().items():
        t0 = time.perf_counter()
        rows = fn(spark)
        dt = time.perf_counter() - t0
        out["queries"][name] = round(dt, 3)
        out["rows"][name] = rows
        total += dt
    out["total_sec"] = round(total, 3)
    spark.stop()
    return out


def main():
    if "--worker" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--worker") + 1])
        print("BENCH_RESULT " + json.dumps(run_once(cpus)))
        return

    if "--scaling" in sys.argv:
        results = {}
        for cpus in (8, 32):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("BENCH_RESULT ")]
            if not line:
                print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                sys.exit(1)
            results[cpus] = json.loads(line[-1][len("BENCH_RESULT "):])
        t8, t32 = results[8]["total_sec"], results[32]["total_sec"]
        eff = (t8 / t32) / 4.0
        report = {
            "local8_sec": t8,
            "local32_sec": t32,
            "speedup": round(t8 / t32, 3),
            "scaling_efficiency": round(eff, 3),
            "queries_local8": results[8]["queries"],
            "queries_local32": results[32]["queries"],
            "rows": results[32]["rows"],
        }
        print(json.dumps(report, indent=2))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/scaling.json", "w") as f:
            json.dump(report, f, indent=2)
        return

    res = run_once(CPUS)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": res["total_sec"],
                "unit": "sec",
                "queries": res["queries"],
                "sf": _sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
