"""SparkSession factory with the engine's standard tuning block.

Config choices (SURVEY.md §3.2/§4):
- AQE on (runtime re-plan, partition coalescing, skew-join split).
- Arrow on (vectorized pandas/Arrow UDF transfer — the only sanctioned
  Python execution path, BASELINE.json input_hint).
- shuffle partitions sized ~2x cores pre-AQE; AQE coalesces down.
- session timezone pinned UTC so DuckDB-oracle timestamp comparison is
  byte-stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "reddit_processing_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to 2x the local core
    count — AQE coalesces smaller stages at runtime.
    """
    # Make the engine importable by Python WORKER processes regardless of
    # the driver's cwd/sys.path (workers get PYTHONPATH, not driver
    # sys.path). On a real cluster the same is achieved with
    # ``spark-submit --py-files dist/engine.zip``; see jobs/.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if master.startswith("local[") and master[6:-1].isdigit():
            n = int(master[6:-1])
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # shuffle/spill scratch on RAM-backed tmpfs when available —
        # the sandbox analog of the NVMe/ramdisk local dirs every real
        # cluster uses; keeps benchmark walls from measuring virtio
        # writeback stalls instead of the engine. Checkpoints still go
        # to the caller-chosen (durable) path.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        # deterministic float behavior across runs is helped by a fixed
        # partitioning story; nothing here uses sampling or rand().
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
