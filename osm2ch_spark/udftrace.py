"""Env-gated per-batch UDF tracing (perf diagnosis aid).

With OSM2CH_UDF_TRACE set to a directory, every traced mapInPandas
generator appends one line per batch to <dir>/<pid>.log:
  name pid wait=<s> body=<s> rows=<n>
where wait is the time blocked reading the NEXT input batch from the
Arrow pipe (JVM feed + deserialization) and body is the time between
handing a batch to the wrapped body and being asked for the next one
(compute + output serialization + pipe write back to the JVM).  Zero
cost when the env var is unset.
"""

from __future__ import annotations

import os
import resource
import time


def traced(name: str, batches):
    trace_dir = os.environ.get("OSM2CH_UDF_TRACE")
    if not trace_dir:
        yield from batches
        return
    pid = os.getpid()
    path = os.path.join(trace_dir, f"{pid}.log")
    it = iter(batches)
    try:
        os.makedirs(trace_dir, exist_ok=True)
        f = open(path, "a")
    except OSError:
        # a typo'd/unwritable trace dir must not turn a debug aid into a
        # job-killer — fall back to untraced
        yield from it
        return
    with f:
        while True:
            t0 = time.perf_counter()
            try:
                pdf = next(it)
            except StopIteration:
                return
            t1 = time.perf_counter()
            r1 = resource.getrusage(resource.RUSAGE_SELF)
            yield pdf
            t2 = time.perf_counter()
            r2 = resource.getrusage(resource.RUSAGE_SELF)
            f.write(
                f"{name} {pid} wait={t1 - t0:.4f} body={t2 - t1:.4f} rows={len(pdf)}"
                f" u={r2.ru_utime - r1.ru_utime:.4f} s={r2.ru_stime - r1.ru_stime:.4f}"
                f" minflt={r2.ru_minflt - r1.ru_minflt} nivcsw={r2.ru_nivcsw - r1.ru_nivcsw}"
                f" nvcsw={r2.ru_nvcsw - r1.ru_nvcsw}\n"
            )
            f.flush()
