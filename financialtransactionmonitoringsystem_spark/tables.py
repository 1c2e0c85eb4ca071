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

import os

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


# Conf key + default for scan_wide's ``min_bytes=LIGHT_WORK`` callers:
# the compressed-input size below which the guard exchange cannot pay
# for LIGHT per-row work.  Rationale (r18 optimization round, VERDICT
# r17 #1): the guard's cost at bench scale is not shuffle bytes but the
# EXTRA STAGE (scheduling width-many tasks + a codegen boundary,
# ~0.2-0.5 s at local[32]); its payoff is parallelizing the fused
# per-row work.  For heavy per-row operators (gram hashing, MinHash
# folds) that payoff exists at ANY corpus size, so they call with the
# default min_bytes=0.  For light per-row work (a regex projection, a
# distinct-map probe) the serial cost of a few-MB input is below one
# stage's overhead, so the exchange only pays once the input outgrows
# this threshold.  4 MiB compressed (~10x that in memory) sits at the
# measured crossover: interleaved A/Bs (OPTIMIZATION_r18.md) show the
# light keys losing 0.1-0.5 s with the guard at sf0.1 (<= 2 MB inputs)
# and winning 1.9-10x with it on the 10x/50x replicas (>= 5.8 MB).
# Conf-settable (spark.fintxmon.scanWide.lightMinBytes) so a cluster
# deployment can retune without a code change; at real input widths
# the width gate no-ops first and this threshold never evaluates.
SCAN_WIDE_LIGHT_MIN_BYTES_CONF = "spark.fintxmon.scanWide.lightMinBytes"
SCAN_WIDE_LIGHT_MIN_BYTES = 4 << 20

# Sentinel for callers declaring their per-row work LIGHT (see above).
LIGHT_WORK = -1


def _input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of ``df``'s input files, plan-time (no job:
    ``inputFiles()`` reads the already-resolved file index).  ``None``
    when any file's size cannot be read locally (e.g. an object-store
    URI) -- callers treat unknown as "big" so behavior degrades to the
    plain width-gated guard, never to a silently serial scan."""
    from urllib.parse import urlparse

    total = 0
    for uri in df.inputFiles():
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(p.path)
        except OSError:
            return None
    return total


def scan_wide(df: DataFrame, *keys: str, min_bytes: int = 0) -> DataFrame:
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

    ``min_bytes`` (r18 optimization round): callers whose fused
    per-row work is LIGHT pass ``min_bytes=LIGHT_WORK`` (or an explicit
    byte count) and the guard additionally no-ops while the compressed
    input is smaller than the threshold -- below it, one extra stage
    costs more than the serial work it parallelizes (see
    :data:`SCAN_WIDE_LIGHT_MIN_BYTES`).  Size comes from the input
    file listing (plan-time, deterministic for a file set); when it
    cannot be read (remote URIs) the guard conservatively treats the
    input as big.  Heavy-work callers keep the default 0: their
    exchange pays at any size that reaches this gate.
    """
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    if min_bytes:
        if min_bytes == LIGHT_WORK:
            min_bytes = int(spark.conf.get(
                SCAN_WIDE_LIGHT_MIN_BYTES_CONF,
                str(SCAN_WIDE_LIGHT_MIN_BYTES)))
        size = _input_bytes(df)
        if size is not None and size < min_bytes:
            return df
    return df.repartition(n, *[F.col(k) for k in keys])
