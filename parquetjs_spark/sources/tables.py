"""Session + testdata loading.

The scan path is the reference's openFile/cursor (SURVEY.md S8-S9)
re-expressed as ``spark.read.parquet`` — footer parsing, schema
reconstruction and column pruning are Catalyst's job, not ours."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def get_spark(
    app: str = "parquetjs_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # glibc malloc tuning inherited by the forked Python workers: without
    # it, transient per-chunk buffers are mmap'd/munmap'd per allocation
    # and 32-way parallel encode spends most of its CPU in the kernel
    # (measured: 75% system time). Must be set before the JVM launches.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 << 20))
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches sized to the chunk row count so one batch ~= one
        # row group (/root/reference/lib/writer.js:26 analogue)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # a crashed Python worker otherwise reports only "exited
        # unexpectedly" with no traceback — keep the faulthandler on so
        # a segfault/OOM in a vectorized stage is diagnosable post-hoc
        .config("spark.python.worker.faulthandler.enabled", "true")
    )
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
