"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings -- one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scale notes (100 TB design): these are plain ``spark.read.parquet`` scans,
so Catalyst predicate pushdown / column pruning / partition pruning all
apply unchanged when the single file becomes a partitioned directory tree
on object storage.  Nothing here collects to the driver.

The ``events`` table is written with parquet TIMESTAMP(NANOS), which Spark
does not read natively (DuckDB truncates it to microseconds on read).  We
read it as raw int64 nanoseconds (``spark.sql.legacy.parquet.nanosAsLong``)
and truncate to microseconds with integer arithmetic -- bit-identical to
DuckDB's view of the same file, which the oracle comparison relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with engine-canonical types."""
    apply_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        # int64 nanoseconds -> TimestampType (microseconds), truncating like
        # DuckDB's parquet reader does for TIMESTAMP(NANOS).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views (used by SQL-form queries and notebooks)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
