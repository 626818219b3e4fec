"""Memory-bandwidth ceiling calibration: 8 vs 32 concurrent streams.

The scaling gate compares local[8] to local[32] on ONE box.  A real
N -> 4N executor scale-up multiplies memory channels and LLC capacity by
4x along with the cores; this box multiplies neither.  CPU-bound code
therefore scales here like it would on a cluster (measured by
``bench.cpu_calibration`` — ALU spin loops), but DRAM-traffic-bound code
(shuffle hash aggregation, CSR gather/scatter, GC tracing) is capped by
the SHARED memory subsystem.  This tool measures that cap directly: the
aggregate STREAM-like triad throughput of 8 vs 32 concurrent processes.

If the 8->32 bandwidth ratio lands well under the CPU ratio, any
workload whose inner loop is a memory stream cannot scale past it on
this box — and the honest cluster prediction uses the bandwidth ratio,
not 4x, as the single-box ceiling for those phases.

Run:  python tools/membw_calibration.py [--mb 256] [--secs 3]
Emits one JSON line with per-level aggregate GB/s and the ratio.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _stream_worker(mb: int, secs: float, out):
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.ones(n)
    c = np.zeros(n)
    # warm: touch every page so the timed loop measures steady-state
    # bandwidth, not this host's ~100us first-touch faults
    c[:] = a
    c[:] = b
    t_end = time.perf_counter() + secs
    passes = 0
    while time.perf_counter() < t_end:
        # triad: c = a + 2*b  — reads a,b; writes c (3 arrays of traffic)
        np.add(a, b, out=c)
        np.add(c, b, out=c)
        passes += 1
    # bytes moved per pass: 2 adds x (2 reads + 1 write) x n x 8
    out.put(passes * 6 * n * 8)


def aggregate_gbps(procs: int, mb: int, secs: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_stream_worker, args=(mb, secs, q)) for _ in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    return total / wall / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256, help="array MB per stream buffer")
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--rounds", type=int, default=3,
                    help="bracketed A/B rounds; max aggregate per level is kept "
                         "(drift-robust: a slow host window can only lower both)")
    args = ap.parse_args()

    g8, g32 = [], []
    for _ in range(args.rounds):
        g8.append(aggregate_gbps(8, args.mb, args.secs))
        g32.append(aggregate_gbps(32, args.mb, args.secs))
    best8, best32 = max(g8), max(g32)
    print(json.dumps({
        "streams8_gbps": round(best8, 2),
        "streams32_gbps": round(best32, 2),
        "bw_speedup_8_to_32": round(best32 / best8, 3),
        "rounds8_gbps": [round(x, 2) for x in g8],
        "rounds32_gbps": [round(x, 2) for x in g32],
        "note": "aggregate STREAM-triad throughput; the 8->32 ratio is this "
                "box's scaling ceiling for DRAM-bound phases (a 4N-executor "
                "cluster scales channels with cores; this box does not)",
    }))


if __name__ == "__main__":
    main()
