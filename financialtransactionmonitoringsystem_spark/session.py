"""SparkSession construction.

Local mode is a single JVM with N executor threads; on a real cluster the
same configs apply per executor.  Everything here is sized so the plans we
produce survive a 100 TB / 1000-executor scale-up:

* AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion/promotion).
* ``spark.sql.shuffle.partitions`` ~ cores locally; on a cluster this is
  AQE-coalesced upward from ``initialPartitionNum``.
* UTC session timezone so event-time semantics match the DuckDB oracle and
  are reproducible across clusters.
* Arrow enabled for the few Pandas-UDF code paths (similarity/multimodal).
* ``nanosAsLong`` so parquet TIMESTAMP(NANOS) columns (the ``events``
  table) are readable; ``tables.load_table`` converts ns->us explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 128 MiB input splits: good parallelism for parquet scans at any SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "fintxmon-spark", cpus: int | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default tuning."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(cpus)
    # local[N] runs driver + all executor threads in ONE JVM whose default
    # heap is 1g -- far too small for 32-thread shuffles at sf0.1.  At 12g
    # a long multi-query session (the bench, the parity run) spends its
    # tail in GC once checkpoint + broadcast blocks accumulate, inflating
    # late queries 3-4x; 48g keeps the old-gen churn off the measured
    # path on the 128 GiB box.  A cap, not an allocation; on a real
    # cluster this maps to per-executor memory instead.
    confs["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEMORY", "48g")
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally built session.

    The verification driver builds its own SparkSession; every ``queries()``
    entry routes through here so reads behave identically (UTC event time,
    nanos handling, AQE).
    """
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        # runtime-settable: a vanilla session defaults to 200 shuffle
        # partitions, which is pure task overhead at test scale.
        "spark.sql.shuffle.partitions",
    ):
        spark.conf.set(key, DEFAULT_CONFS.get(key, "true"))
    return spark
