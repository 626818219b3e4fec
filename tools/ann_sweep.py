"""ANN recall-vs-candidate-volume operating curve (VERDICT r4 item 7).

Sweeps the two knobs that trade recall for candidate volume at fixed
code length — the per-bucket corpus cap (_ANN_CAP) and the number of
OR-ed hash tables (_ANN_TABLES) — and records, per combo:
mean recall@5 vs the brute-force cosine baseline, candidate-pair count,
and candidate volume as a fraction of all query×corpus pairs.

The shipped default (tables=8, cap=128) stays; this artifact lets a user
pick a different operating point with numbers instead of folklore.

Usage: python tools/ann_sweep.py [sf_dir] [--out BENCH/ann_sweep.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "BENCH/ann_sweep.json"
if "--out" in sys.argv:
    OUT = sys.argv[sys.argv.index("--out") + 1]

CAPS = (32, 64, 128, 256)
TABLES = (4, 8, 12)


def main():
    from pyspark.sql import functions as F

    from osm2ch_spark import data_ops, get_spark

    spark = get_spark(app_name="ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    n_corpus = data_ops.T(spark, SF_DIR, "embeddings").count()
    exact = data_ops.q_embedding_cosine_topk(spark, SF_DIR).select(
        "query_id", "neighbor_id"
    )
    exact.persist().count()
    n_queries = exact.select("query_id").distinct().count()
    all_pairs = n_queries * (n_corpus - 1)

    rows = []
    for tables in TABLES:
        for cap in CAPS:
            data_ops._ANN_TABLES = tables
            data_ops._ANN_CAP = cap
            cand = data_ops._ann_candidates(spark, SF_DIR)
            cand.persist()
            n_cand = cand.count()
            hits = exact.join(cand, ["query_id", "neighbor_id"], "left_semi").count()
            cand.unpersist()
            recall = hits / (n_queries * 5)
            rows.append({
                "tables": tables,
                "cap": cap,
                "recall_at_5": round(recall, 4),
                "candidates": n_cand,
                "candidate_fraction": round(n_cand / all_pairs, 6),
            })
            print(f"tables={tables:2d} cap={cap:3d}: recall@5={recall:.3f} "
                  f"cands={n_cand} ({n_cand / all_pairs:.4%})", flush=True)
    data_ops._ANN_TABLES = 8
    data_ops._ANN_CAP = 128

    out = {
        "what": "ANN recall@5 vs candidate volume, sweeping per-bucket cap "
                "and OR-ed table count at fixed 8-bit codes, Hamming<=2 probes",
        "sf_dir": SF_DIR,
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "default": {"tables": 8, "cap": 128},
        "sweep": rows,
    }
    print(json.dumps(out, indent=2))
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
