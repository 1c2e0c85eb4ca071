"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings -- one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scale notes (100 TB design): these are plain ``spark.read.parquet`` scans,
so Catalyst predicate pushdown / column pruning / partition pruning all
apply unchanged when the single file becomes a partitioned directory tree
on object storage.  Nothing here collects to the driver.

The ``events`` table's ``ts`` column has shipped in two physical forms
across testdata generations: parquet TIMESTAMP(NANOS) (read as raw int64
via ``spark.sql.legacy.parquet.nanosAsLong`` and truncated to micros) and
plain TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ).  Either
way DuckDB sees a naive microsecond TIMESTAMP, so ``_normalize_events_ts``
dispatches on the physical type and lands both on session-UTC
``TimestampType`` -- value-identical to the oracle's view of the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import apply_runtime_confs

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Land ``ts`` on session-UTC TimestampType whatever its physical form.

    int64 = legacy TIMESTAMP(NANOS) surfaced by ``nanosAsLong``: truncate
    to micros exactly as DuckDB's reader does.  TIMESTAMP_NTZ = native
    micros with no zone: with the engine's UTC session timezone the cast
    is a pure type relabel, identical instants.
    """
    t = df.schema["ts"].dataType
    if isinstance(t, T.LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if not isinstance(t, T.TimestampType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with engine-canonical types."""
    apply_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views (used by SQL-form queries and notebooks)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def scan_wide(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition ``df`` on ``keys`` up to the session's shuffle
    width IF its physical plan is narrower than that width -- the
    shared narrow-input parallelism guard (r17 optimization round;
    generalizes ``dedup._pinned_repartition_if_narrow``, which now
    delegates here so there is exactly one copy of the rationale).

    Why it exists: a parquet ROW GROUP is the unit of scan parallelism
    (the vectorized reader cannot split one), and the sf-scale testdata
    tables are each written as ONE row group -- so ANY per-row work
    fused into a scan stage (gram hashing, JSON parsing, decimal
    arithmetic, a partial aggregate) runs as ONE task no matter how
    many cores the session has.  This is the classic "one huge
    unsplittable input" skew: the fix is to repartition immediately
    after the read, paying one narrow exchange of only the scanned
    columns to unlock full-width parallelism for the per-row work.

    Why gated, and why this survives 100 TB: the partition count is
    read from the frame's physical plan (no job runs -- deterministic
    for a given file set + split config, so retried stages replan
    identically).  At real input widths (a 100 TB table arrives as
    many thousands of splits) the guard sees >= width partitions and
    returns ``df`` unchanged -- the production plan has no extra
    exchange.  The width is the session's shuffle parallelism, never a
    constant.  Callers pass a UNIFORM key (row identity like doc_id /
    event_id, or a hash), never a Zipfian payload key -- the
    q_dedup_prefix lesson: hashing a skewed key concentrates, not
    spreads (PLANS r17).
    """
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(k) for k in keys])
