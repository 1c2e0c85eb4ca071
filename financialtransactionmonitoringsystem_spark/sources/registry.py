"""Source/sink registry: the engine's I/O surface beyond the default
parquet path (SURVEY.md §2.2 "Scans / sources / sinks").

Parquet is the canonical columnar format (pushdown + pruning + vectorized
reader); CSV/JSON exist for ingest interchange and always take an explicit
schema (inference is a full extra pass and non-deterministic types at
scale).  Connector formats that need extra jars (Delta/Iceberg/Kafka/JDBC
drivers) are import-gated and raise a clear error in this environment.

Writes: ``write_partitioned`` demonstrates the layout the 100 TB tx table
wants -- hive-partitioned by event date so date-ranged monitoring queries
get static + dynamic partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

READERS = ("parquet", "orc", "json", "csv")


def read_table(spark: SparkSession, fmt: str, path: str,
               schema: T.StructType | str | None = None,
               **options) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READERS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} requires an explicit schema (no inference at scale)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_table(df: DataFrame, fmt: str, path: str, mode: str = "overwrite",
                **options) -> None:
    if fmt == "csv":
        options.setdefault("header", "true")
    df.write.format(fmt).mode(mode).options(**options).save(path)


def write_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                      mode: str = "overwrite") -> None:
    """Write hive-partitioned by event date: the layout that makes
    date-range predicates prune partitions at any scale."""
    (df.withColumn("dt", F.to_date(F.col(ts_col)))
       .write.partitionBy("dt").mode(mode).parquet(path))


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int = 8, mode: str = "overwrite") -> None:
    """Write as a bucketed (hash-partitioned-on-disk) table: both sides of
    a recurring equi-join bucketed on the join key by the same bucket
    count join with NO shuffle exchange -- the co-located join layout for
    fact tables too big to broadcast.  ``sortBy`` additionally lets the
    sort-merge join skip its per-bucket sort when each bucket is one file.
    """
    (df.write.bucketBy(n_buckets, key).sortBy(key)
       .option("path", path).mode(mode).format("parquet").saveAsTable(table))


def read_kafka(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """Kafka streaming source (production ingest; the jar is not in this
    environment, so this raises with instructions rather than failing
    deep inside Spark)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .load()
        )
    except Exception as exc:  # pragma: no cover - jar absent here
        raise NotImplementedError(
            "kafka source requires the spark-sql-kafka package on the "
            "classpath (--packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        ) from exc


# The exact record schema the kafka connector emits (Structured Streaming
# Kafka integration guide); synthetic frames with this schema exercise
# everything downstream of the connector without a broker.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def parse_kafka_transactions(raw: DataFrame) -> DataFrame:
    """Decode a Kafka wire frame (``KAFKA_WIRE_SCHEMA``, as produced by
    :func:`read_kafka` or any synthetic/test frame with the same shape)
    into typed transactions.

    This is the half of the Kafka pipeline that contains actual logic --
    value bytes -> JSON -> typed columns, plus the ingest sequence -- so
    it is factored off the connector and attested without a broker (the
    env-gated broker test covers the connector itself).  ``ingest_seq``
    is derived from (partition, offset): dense per partition, globally
    unique, totally ordered within a partition -- the production
    replacement for the driver-side max()+1 sequence (api.py scale
    note; Kafka only orders within a partition, so this is exactly the
    ordering guarantee the source provides, no more).  The packing is
    ``partition * 2^48 + offset`` with ``assert_true`` guards on both
    fields -- 2^15 partitions x 2^48 offsets fills int64 exactly, and a
    topic exceeding either bound fails loudly instead of silently
    colliding sequences across partitions.

    Works identically on batch and streaming frames: every expression is
    a stateless projection, so the streaming query inherits the
    connector's micro-batch boundaries untouched.
    """
    from ..schemas import TRANSACTION_JSON_SCHEMA
    from .json_ingest import with_derived

    parsed = raw.select(
        F.col("partition"), F.col("offset"),
        F.col("timestamp").alias("broker_ts"),
        F.from_json(F.col("value").cast("string"),
                    TRANSACTION_JSON_SCHEMA).alias("t"),
    ).select("t.*", "partition", "offset", "broker_ts")
    # NULL partition/offset (a hand-built frame; the connector never
    # emits them) degrades to a NULL ingest_seq -- the same
    # row-preserving policy as a malformed value -- while a NON-NULL
    # field outside the packing bounds fails loudly (assert_true raises
    # on false; the isNull arms make NULL fields pass the assert).
    ok = F.assert_true(
        F.col("partition").isNull() | F.col("offset").isNull()
        | ((F.col("partition") >= 0) & (F.col("partition") < F.lit(1 << 15))
           & (F.col("offset") >= 0) & (F.col("offset") < F.lit(1 << 48))),
        F.lit("ingest_seq packing overflow: partition >= 2^15 or "
              "offset >= 2^48"))
    seq = F.when(
        ok.isNull() & F.col("partition").isNotNull()
        & F.col("offset").isNotNull(),
        F.col("partition").cast("bigint") * F.lit(1 << 48) + F.col("offset"))
    # shared canonical derivation (metadata_json, event-time ts): the
    # Kafka route lands on the canonical table schema PLUS one extra
    # source-metadata column, broker_ts (broker append time -- the
    # ingest-lag observability a monitoring pipeline wants).  A union
    # with another ingest route must either carry it (unionByName with
    # allowMissingColumns) or .drop("broker_ts") first (ADVICE r5).
    return with_derived(parsed, ingest_seq=seq).drop("partition", "offset")


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source (reference's 'move this to Redis or TigerBeetle'
    durability note, main.rs:24 -- a real DB behind JDBC is the Spark
    answer).  Driver jars are not in this environment."""
    try:
        return spark.read.format("jdbc").option("url", url) \
            .option("dbtable", table).options(**options).load()
    except Exception as exc:  # pragma: no cover - driver absent here
        raise NotImplementedError(
            "jdbc source requires a database driver jar on the classpath"
        ) from exc
