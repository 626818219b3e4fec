"""Phase-isolation benchmarks (guide §1.4) — NOT the driver contract.

bench.py is frozen for measurement; this file answers "where inside each
headline query does the wall go" by timing sub-phases with the noop sink
and by counting Spark jobs per phase.  Run:

    python bench_extra.py phases        # phase breakdown of the big three
    python bench_extra.py cc_iters      # per-round CC timings
    python bench_extra.py pr_iters      # per-iteration PageRank timings

Same session config as bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions max(cpus, 8)), same sf dir ($SPARK_GRAFT_SF_DIR), untimed
sf0.01 warmup of the same paths first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from osm2ch_spark import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


class Phase:
    """Times a phase and counts the Spark jobs it launched."""

    def __init__(self, spark, out):
        self.spark = spark
        self.out = out

    def run(self, name, fn):
        st = self.spark.sparkContext.statusTracker()
        j0 = len(st.getJobIdsForGroup(None) or [])
        self.spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        j1 = len(self.spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
        self.spark.sparkContext.setJobDescription(None)
        self.out[name] = {"sec": round(dt, 3), "jobs": j1 - j0}
        print(f"  {name:40s} {dt:8.3f} s  ({j1 - j0} jobs)", flush=True)
        return r


def settle(spark):
    import gc

    from osm2ch_spark import tpch_world as W

    W.reset_world()
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def warmup(spark):
    """Same untimed warmup as bench.run_once, restricted to the used paths."""
    import bench

    for name, fn in bench.headline_queries(WARM_DIR).items():
        if name in ("edge_pipeline", "osm_parse_pipeline", "pagerank5",
                    "connected_components", "triangles"):
            fn(spark)
    settle(spark)


def phases(spark):
    from pyspark.sql import functions as F

    from osm2ch_spark import fixtures, pipeline
    from osm2ch_spark import tpch_world as W

    out = {}
    p = Phase(spark, out)
    print("== edge_pipeline phase split ==", flush=True)
    settle(spark)
    p.run("ways (memo materialize)", lambda: W._memo(spark, SF_DIR, "ways", lambda: W.tpch_ways(spark, SF_DIR)).count())
    p.run("edges (split_ways W1+ID1)", lambda: W.tpch_edges(spark, SF_DIR).count())
    p.run("expanded (J3+ID2, memo)", lambda: W._memo(spark, SF_DIR, "expanded", lambda: W.tpch_expanded(spark, SF_DIR)).count())
    p.run("final (rules+anti-joins+splice)", lambda: W.tpch_final_expanded(spark, SF_DIR).count())

    print("== connected_components phase split ==", flush=True)
    settle(spark)
    p.run("cc: expanded rebuild", lambda: W.tpch_expanded(spark, SF_DIR).count())
    edges = W.tpch_expanded(spark, SF_DIR).select(
        F.col("src_edge_id").alias("source_vertex"),
        F.col("dst_edge_id").alias("target_vertex"),
    ).withColumn("weight", F.lit(1.0)).withColumn("one_way", F.lit(False))
    edges = edges.localCheckpoint(eager=True)
    from osm2ch_spark.graph import connected_components

    p.run("cc: loop only", lambda: connected_components(edges).count())

    print("== pagerank5 phase split ==", flush=True)
    settle(spark)
    p.run("pr: expanded rebuild", lambda: W.tpch_expanded(spark, SF_DIR).count())
    pe = pipeline.edge_table(
        W.tpch_expanded(spark, SF_DIR).select(
            F.col("src_edge_id").alias("source_vertex"),
            F.col("dst_edge_id").alias("target_vertex"),
            "weight", "one_way",
        )
    ).localCheckpoint(eager=True)
    pe.count()
    from osm2ch_spark.graph import pagerank

    p.run("pr: pagerank(5) only", lambda: pagerank(pe, max_iter=5, tol=0.0).count())

    print("== osm_parse_pipeline phase split ==", flush=True)
    settle(spark)
    src = fixtures.synth_source(spark, n_files=48, grid=10)
    p.run("parse: build_expanded", lambda: pipeline.build_expanded(src).count())
    return out


def cc_iters(spark):
    """Time each round of the CC loop separately."""
    from pyspark.sql import functions as F

    from osm2ch_spark import tpch_world as W
    from osm2ch_spark.graph.adjacency import canonical_edges
    from osm2ch_spark.graph.checkpoint import localcheckpoint
    from osm2ch_spark.graph.components import _large_star, _signature, _small_star

    settle(spark)
    edges = W.tpch_expanded(spark, SF_DIR).select(
        F.col("src_edge_id").alias("source_vertex"),
        F.col("dst_edge_id").alias("target_vertex"),
    ).withColumn("weight", F.lit(1.0)).withColumn("one_way", F.lit(False))
    edges = edges.localCheckpoint(eager=True)
    out = {}
    p = Phase(spark, out)
    e = p.run("cc0: canonical+ckpt", lambda: localcheckpoint(canonical_edges(edges), level="deser"))
    sig = p.run("cc0: signature", lambda: _signature(e))
    for it in range(1, 30):
        new_e = localcheckpoint(_small_star(_large_star(e)), eager=False, level="deser")
        new_sig = p.run(f"cc{it}: stars+sig", lambda: _signature(new_e))
        if new_sig == sig:
            p.run(f"cc{it}: confirm anti-join",
                  lambda: new_e.join(e, ["u", "v"], "left_anti").isEmpty())
            e = new_e
            break
        sig = new_sig
        e = new_e
    return out


def pr_iters(spark):
    from pyspark.sql import functions as F

    from osm2ch_spark import pipeline
    from osm2ch_spark import tpch_world as W
    from osm2ch_spark.graph.adjacency import build_adjacency, vertices_table
    from osm2ch_spark.graph.checkpoint import localcheckpoint

    settle(spark)
    pe = pipeline.edge_table(
        W.tpch_expanded(spark, SF_DIR).select(
            F.col("src_edge_id").alias("source_vertex"),
            F.col("dst_edge_id").alias("target_vertex"),
            "weight", "one_way",
        )
    ).localCheckpoint(eager=True)
    pe.count()
    out = {}
    p = Phase(spark, out)
    verts = vertices_table(pe).persist()
    stats = p.run("pr: vstats (verts agg)", lambda: verts.agg(
        F.count("vertex").alias("n"), F.min("vertex"), F.max("vertex")).collect()[0])
    n = stats["n"]
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = build_adjacency(pe, num_buckets=nb, with_weights=False).persist()
    p.run("pr: adjacency materialize", lambda: adj.count())
    ranks = localcheckpoint(verts.select("vertex", "has_out", (F.lit(1.0) / n).alias("rank")))
    dangling = p.run("pr: initial dangling", lambda: ranks.filter(~F.col("has_out")).agg(F.sum("rank")).collect()[0][0] or 0.0)
    base = (1.0 - 0.85) / n
    for it in range(1, 6):
        contribs = (
            adj.join(ranks.select("vertex", "rank").hint("shuffle_hash"),
                     adj.source_vertex == F.col("vertex"), "inner")
            .select(F.explode("neighbors").alias("tgt"),
                    (F.col("rank") / F.col("out_degree")).alias("c"))
            .groupBy("tgt").agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            verts.join(contribs.hint("shuffle_hash"), verts.vertex == contribs.tgt, "left")
            .select("vertex", "has_out",
                    (F.lit(base) + F.lit(0.85)
                     * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))).alias("rank"))
        )
        new_ranks = localcheckpoint(new_ranks, eager=False)
        dangling = p.run(f"pr: iter {it}", lambda: new_ranks.filter(~F.col("has_out")).agg(F.sum("rank")).collect()[0][0] or 0.0)
        ranks = new_ranks
    adj.unpersist()
    verts.unpersist()
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    spark = get_session()
    warmup(spark)
    fn = {"phases": phases, "cc_iters": cc_iters, "pr_iters": pr_iters}[mode]
    out = fn(spark)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
