"""SparkSession factory with scale-oriented defaults.

All knobs that matter at 100 TB are set here once: AQE (runtime join
re-planning + skew-join splitting), a broadcast threshold sized for
dimension tables, Arrow for every pandas-UDF boundary, and shuffle
partitions parameterized by environment so the same code runs on
``local[8]`` / ``local[32]`` in the sandbox and on a 1000-executor
cluster via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def make_pyfiles_zip(out_dir: str | None = None) -> str:
    """Zip this package for ``spark-submit --py-files`` / addPyFile.

    Returns the zip path.  Deterministic content (the package source);
    written to a temp dir by default.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out_dir = out_dir or tempfile.mkdtemp(prefix="osm2ch_spark_pyfiles_")
    base = os.path.join(out_dir, "osm2ch_spark")
    # zip root must contain the package directory itself
    return shutil.make_archive(base, "zip", os.path.dirname(pkg_dir), "osm2ch_spark")


def _default_local_dir() -> str:
    """Scratch-space placement for shuffle files and DISK_ONLY blocks.

    Priority: $OSM2CH_LOCAL_DIR (cluster operators point this at their
    NVMe scratch array) > a RAM-backed dir when /dev/shm is writable
    with ≥32 GB free (this sandbox's virtual disk is the I/O floor
    otherwise) > Spark's own default (java.io.tmpdir)."""
    override = os.environ.get("OSM2CH_LOCAL_DIR")
    if override:
        return override
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= 32 * 1024**3 and os.access(shm, os.W_OK):
            path = os.path.join(shm, "osm2ch-spark-local")
            os.makedirs(path, exist_ok=True)
            return path
    except OSError:
        pass
    return tempfile.gettempdir()


def get_spark(
    app_name: str = "osm2ch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # pyarrow's default jemalloc pool madvise-purges aggressively; with
    # many concurrent Python workers the resulting kernel-side page churn
    # (zone lock + memcg accounting) burned ~1.6s of SYSTEM time per
    # Arrow batch at 32-way — measured 39s -> 26s wall on the flagship
    # pipeline just from switching workers to the plain system allocator.
    # Set before the JVM starts so the Python worker daemon inherits it;
    # executorEnv carries it to real multi-executor clusters.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    # Retain worker heap between Arrow batches: this host's minor page
    # faults cost ~100 µs (lazily provisioned VM pages), so transient
    # mmap/munmap of large numpy/Arrow buffers burned ~3 s of SYSTEM
    # time per UDF batch and did not shrink with cores (workerenv.py).
    from osm2ch_spark.workerenv import MALLOC_ENV

    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    extra_conf = dict(extra_conf or {})
    mem = extra_conf.pop(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g")
    )
    # OSM2CH_AQE=0 disables adaptive execution for A/B runs: every AQE
    # stage materialization is a separate job with driver round-trips
    # (~34 stage jobs on the flagship pipeline — a fixed ~10 s serial
    # term, perf_notes_r04 §5), and with shuffle partitions pinned the
    # runtime re-planning may not pay for itself.  Default stays ON.
    aqe = os.environ.get("OSM2CH_AQE", "1") != "0"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting, join re-planning.
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow on every JVM<->Python boundary (grouped-map UDFs W1/J3).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Dimension tables (restrictions, tag whitelists) broadcast freely.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge: every join in this engine
        # is an equi-join with bounded per-partition build sides (the
        # reference itself is pure hash joins — SURVEY §2.5), and SMJ was
        # measured re-SORTING the cached adjacency and the 14M-row rank
        # update join EVERY PageRank iteration.  AQE skew-join still
        # applies; partition counts bound build-side memory at scale.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # …and let AQE convert residual SMJs to shuffled-hash at runtime
        # when the per-partition build side is small (0 = off by default).
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", str(128 * 1024 * 1024))
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL",
                os.environ["ARROW_DEFAULT_MEMORY_POOL"])
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
                os.environ["MALLOC_MMAP_THRESHOLD_"])
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_",
                os.environ["MALLOC_TRIM_THRESHOLD_"])
        .config("spark.executorEnv.PYTHONMALLOC", os.environ["PYTHONMALLOC"])
        # Shuffle-file deletion runs synchronously with the GC-triggered
        # ContextCleaner instead of on its async thread: the bench harness
        # forces System.gc() between reps, and an async delete racing a
        # still-draining stage produced mid-run FileNotFoundException on
        # shuffle data files (3 worker losses in one degraded-window
        # scaling run).  Blocking deletes close that window at a small
        # (not zero) steady-state cost: ContextCleaner's weak refs can be
        # enqueued by ANY GC and it also runs a periodic GC, so long-lived
        # sessions serialize shuffle deletes on the cleaner thread too —
        # scope via extra_conf if production cleaner latency ever matters.
        .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
        # Shuffle files AND DISK_ONLY checkpoint blocks live in
        # spark.local.dir; point it at the fastest local storage
        # available (guide §2.1: "local disk bandwidth for shuffle files
        # can be the tighter limit ... check both").  This sandbox's
        # root disk writes at ~135 MB/s while /dev/shm streams at
        # ~1.4 GB/s, and the engine moves GBs of shuffle + barrier
        # blocks per query — interleaved A/B on headline CC
        # (BENCH/ab_localdir_r6.json): tmpfs 48.6/48.8 s vs disk
        # 69.5/102.6 s in the two clean rounds.  Every byte is still
        # recomputed from the parquet inputs each run — this changes
        # WHERE scratch bytes go, not what is computed.  On a real
        # cluster set OSM2CH_LOCAL_DIR to the NVMe scratch array (RAM-
        # backed dirs trade memory for I/O and need headroom, hence the
        # 32 GB free-space guard before tmpfs is chosen by default).
        .config("spark.local.dir", _default_local_dir())
        # Timestamps in parquet testdata are µs; keep them stable.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM hosts all executor threads — size it
        # for (cpus × per-task hash maps + cached shards); must be set
        # before the JVM starts.  Pre-sizing the heap (-Xms == -Xmx) and
        # ParallelGC remove multi-second GC/heap-growth stalls observed
        # under 32-thread shuffle+window load in this sandbox.
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                # This VM provisions first-touch memory at ~250 MB/s
                # through the hypervisor.  Round 3 fought that with
                # -XX:+AlwaysPreTouch (4 KB faults cost ~100 µs → ~26 s/GB
                # faulted mid-run, a 3× slowdown on the 127M-edge
                # PageRank), but at an 80 g heap the pretouch itself now
                # burns 5+ minutes of pure kernel time per JVM launch.
                # Transparent huge pages cut the first-touch cost ~6×
                # (measured 4.2 s/GB), cheap enough to fault LAZILY: the
                # untimed warmup touches the pages a workload actually
                # needs and startup stays instant — no pretouch.
                f"-Xms{mem} -XX:+UseParallelGC -XX:+UseTransparentHugePages",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Executor Python workers unpickle UDF closures that reference this
    # package; ship it so imports resolve regardless of the caller's cwd
    # (same mechanism as spark-submit --py-files).
    spark.sparkContext.addPyFile(make_pyfiles_zip())
    return spark
