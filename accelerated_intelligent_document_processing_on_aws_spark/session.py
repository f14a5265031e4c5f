"""SparkSession factory with scale-oriented defaults.

The same builder is used by tests, bench, and the pipeline entrypoints so
plan-shaping config (AQE, Arrow batching, shuffle partitions) is uniform.
On a real cluster this is driven by spark-submit conf; locally we default
to local[*] with 32 shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "idp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("IDP_SHUFFLE_PARTITIONS", cpus if cpus != "*" else "32")
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("IDP_DRIVER_MEM", "8g"))
        # Many distinct codegen'd queries in one session overflow the JVM's
        # default 240 MB JIT code cache -> compiler disables itself and every
        # subsequent stage runs interpreted (observed 10-40x slowdowns late
        # in a bench run).  Large cache + flushing keeps codegen compiled.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"
            " -XX:MaxMetaspaceSize=2g",
        )
        # Long sessions running many DISTINCT Python-UDF queries (the bench
        # suite, notebooks) accumulate idle pyspark.daemon workers — one
        # pool per UDF shape — observed 60+ idle pythons after 15 queries,
        # degrading every later Arrow stage (fork cost + memory pressure).
        # Cap the idle pool; LRU eviction keeps the hot shapes warm.
        .config("spark.python.factory.idleWorkerMaxPoolSize", "64")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
