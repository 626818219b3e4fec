"""Python-worker memory hygiene for fault-expensive hosts.

This sandbox VM provisions pages lazily through the hypervisor: a minor
page fault costs ~100 µs (measured via udftrace rusage deltas — 18k
faults/batch ≈ 3 s of SYSTEM time per split-UDF batch), which is why
``-XX:+AlwaysPreTouch`` is load-bearing on the JVM side.  Python workers
have the same problem: every Arrow batch allocates tens of MB of numpy
temporaries and Arrow buffers, and if the allocator returns those pages
to the kernel between batches, every batch re-faults them — a cost that
does NOT shrink with more cores (fault handling contends), i.e. a direct
scaling killer.

Two-part fix:
  * ``get_spark`` exports MALLOC_MMAP_THRESHOLD_/MALLOC_TRIM_THRESHOLD_
    so glibc serves large allocations from the retained brk heap instead
    of transient mmaps and never trims it back;
  * ``prewarm()`` (called once per worker process from the hot UDFs)
    faults a block of heap in up front, so steady-state batches run
    fault-free.
"""

from __future__ import annotations

# glibc tunables exported to every worker (set before the JVM starts so
# the Python worker daemon inherits them; executorEnv carries them to
# real clusters).  256 MB: larger than any single UDF-batch allocation,
# so numpy/Arrow buffers stay on the retained heap.
MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(256 * 1024 * 1024),
    "MALLOC_TRIM_THRESHOLD_": str(256 * 1024 * 1024),
    # Route CPython object allocation through glibc malloc as well:
    # pymalloc's 1 MB arenas are mmap'd/munmap'd directly (the MALLOC_*
    # tunables can't retain them), and object-heavy Arrow batches cycle
    # arenas every batch.  Interleaved A/B on the flagship: split-UDF
    # batch body 96 s -> 14.6 s, sys_cpu 69.9 s -> 0.0 s.
    "PYTHONMALLOC": "malloc",
}

_PREWARMED = False


def prewarm(mb: int = 128) -> None:
    """Fault ``mb`` MB of heap into this process once and release it back
    to the (never-trimmed) allocator, so subsequent batch allocations
    reuse already-mapped pages.  No-op after the first call; ~40 ms on
    this host, amortized across every later batch."""
    global _PREWARMED
    if _PREWARMED:
        return
    _PREWARMED = True
    # bytearray zero-fills via memset — touches every page.  Must stay
    # below MALLOC_MMAP_THRESHOLD_ so it comes from (and returns to) the
    # brk heap rather than a transient mmap.
    block = bytearray(mb << 20)
    del block
