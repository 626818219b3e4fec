"""Interleaved A/B of spark.sql.join.preferSortMergeJoin for
connected_components (VERDICT r2 'What's wrong #2': the engine-wide
shuffled-hash preference shipped without a CC A/B while CC regressed
57->89 s r1->r2).

Runs the headline connected_components query in subprocesses,
alternating config A (preferSortMergeJoin=false, the shipped setting)
and config B (Spark default true) for N rounds; reports min/median per
config.  Usage: python tools/ab_cc.py [rounds] [query]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker():
    qname = os.environ.get("AB_QUERY", "connected_components")
    prefer = os.environ["AB_PREFER_SMJ"]
    from osm2ch_spark import get_spark
    import bench

    spark = get_spark(
        app_name=f"ab-cc-{prefer}",
        extra_conf={"spark.sql.join.preferSortMergeJoin": prefer},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.headline_queries(bench.WARMUP_SF_DIR)[qname](spark)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    bench.headline_queries()[qname](spark)
    print("AB_RESULT", round(time.perf_counter() - t0, 3))
    spark.stop()


def main():
    if "--worker" in sys.argv:
        worker()
        return
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    qname = sys.argv[2] if len(sys.argv) > 2 else "connected_components"
    res = {"false": [], "true": []}
    for r in range(rounds):
        for prefer in ("false", "true"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                capture_output=True, text=True,
                env={**os.environ, "AB_PREFER_SMJ": prefer, "AB_QUERY": qname},
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("AB_RESULT")]
            if not lines:
                print(p.stdout[-1500:], p.stderr[-1500:], file=sys.stderr)
                sys.exit(1)
            t = float(lines[-1].split()[1])
            res[prefer].append(t)
            print(f"round {r} preferSMJ={prefer}: {t}s", flush=True)
    out = {
        "query": qname,
        "rounds": rounds,
        "shj (preferSortMergeJoin=false)": {"all": res["false"], "min": min(res["false"])},
        "smj (default true)": {"all": res["true"], "min": min(res["true"])},
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
