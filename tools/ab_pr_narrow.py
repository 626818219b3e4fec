"""Interleaved A/B: int64 vs int32 CSR neighbor ids on the big PageRank.

The VERDICT's round-4 item 2 asks to substantiate the claim that
pagerank3_big's residual 8→32 gap is memory-bandwidth-bound — either
with counters (no perf binary in this sandbox) or with a
byte-narrowing change that moves the number.  This is that change:
``narrow_ids`` halves the cached CSR neighbor bytes and the exploded
contribution rows' key width.  If the @32 wall moves materially, the
loop is traffic-bound (bytes are the constraint, not instructions).

Interleaved wide/narrow passes in ONE session (same JVM, same host
window), min-of-rounds per arm.

Run:  python tools/ab_pr_narrow.py [rounds]   (local[32], v4 big input)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from osm2ch_spark import get_spark  # noqa: E402
from osm2ch_spark.graph.pagerank import pagerank  # noqa: E402


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab-pr-narrow", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    path = bench.big_edges_path(spark, bench.SF_DIR)
    big = spark.read.parquet(path)

    def run(narrow: bool) -> float:
        import gc

        from osm2ch_spark import tpch_world as W

        W.reset_world()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        t0 = time.perf_counter()
        pagerank(big, max_iter=3, tol=0.0, narrow_ids=narrow).count()
        return round(time.perf_counter() - t0, 2)

    # untimed fault-warm pass (first-touch pages cost ~100us each here)
    run(False)

    walls: dict[str, list] = {"wide": [], "narrow": []}
    for _ in range(rounds):
        walls["wide"].append(run(False))
        walls["narrow"].append(run(True))
    print(json.dumps({
        "cpus": cpus,
        "rounds": rounds,
        "wide_walls_s": walls["wide"],
        "narrow_walls_s": walls["narrow"],
        "wide_min_s": min(walls["wide"]),
        "narrow_min_s": min(walls["narrow"]),
        "narrow_vs_wide": round(min(walls["narrow"]) / min(walls["wide"]), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
