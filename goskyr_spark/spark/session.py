"""SparkSession factory with the engine's required settings."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app="goskyr_spark", master=None, shuffle_partitions=None,
              extra_conf=None):
    """local[$SPARK_GRAFT_CPUS] by default; UTC session tz (date parity),
    AQE on (skew joins at scale), Arrow enabled."""
    # make the package importable in executor Python workers regardless of
    # the caller's cwd (equivalent of spark-submit --py-files for local mode)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{repo_root}:{pp}" if pp else repo_root

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # html-heavy tables: a 128 MB parquet split explodes to minutes of
        # kernel CPU — smaller input splits keep every core fed
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # write-path overhead: the crawl commits 4-5 snapshot appends
        # per round, so per-write committer fixed costs multiply.
        # _SUCCESS markers and parquet summary files are dead weight
        # under manifest-based tables (the manifest IS the commit), and
        # the v2 committer moves files once instead of twice. Measured:
        # 172 → 120 ms per small write.
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".marksuccessfuljobs", "false")
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .config("spark.hadoop.parquet.summary.metadata.level", "NONE")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
