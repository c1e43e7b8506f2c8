"""SparkSession factory with the engine's standard tuning.

Scale notes (100 TB / 1000 executors):
- AQE on: post-shuffle coalescing + skew-join splitting as a safety net
  (explicit salting in the index build is still required -- AQE cannot
  split a single hot groupBy key).
- Arrow on: every per-row kernel is an Arrow-batched pandas UDF.
- shuffle.partitions defaults to cores locally; on a cluster set it to
  2-3x total cores (or rely on AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# one task = one core: stop BLAS/OMP from spawning ncpu threads per python
# worker (N workers x 32 BLAS threads thrashes the box and anti-scales)
_WORKER_THREAD_ENV = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "chavinha-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    for k, v in _WORKER_THREAD_ENV.items():
        os.environ.setdefault(k, v)  # local mode: workers inherit driver env
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # the non-native Hadoop local FS fork+execs `chmod` per committed
        # file; posix_spawn avoids duplicating the JVM's page tables on
        # each exec (measured ~25% faster partitioned writes at 16g heap)
        .config("spark.driver.extraJavaOptions",
                "-Djdk.lang.Process.launchMechanism=POSIX_SPAWN")
        # File-commit algorithm: v1 (serial driver-side rename at job
        # commit) measured FASTER at high parallelism on this local FS --
        # round-3 A/B at 3.84M pages/local[16]: v1 725.3 s vs v2 772.9-
        # 842.2 s (postings 385 vs 416-478, attributes 26 vs 47-62).  v2
        # moves the renames to task commit, so 16 task threads fork+exec
        # chmod concurrently from one large-heap JVM -- fork cost scales
        # with JVM page tables, and concurrent forks contend; v1 pays one
        # serial loop instead.  On HDFS/S3A+Iceberg the committer story is
        # different anyway (no per-file chmod forks); this knob is a
        # sandbox-FS tuning, overridable via SPARK_GRAFT_COMMITTER_ALGO.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
                os.environ.get("SPARK_GRAFT_COMMITTER_ALGO", "1"))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        # On a real cluster an Iceberg catalog is attached here; this repo's
        # table layer (sources/tables.py) falls back to parquet when absent:
        #   .config("spark.sql.extensions",
        #           "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        #   .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
