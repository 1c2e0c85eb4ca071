"""User-facing facade: the reference's entire service surface as one
class over a durable table.

A user of the reference talks to two HTTP services (``POST /transactions``,
``GET /transactions``, ``GET /transactions/{id}``) whose state is a
process-local array lost on restart (``monitoring-service/src/main.rs:24-25``).
``TransactionStore`` is the drop-in Spark equivalent: same three verbs,
same observable semantics (duplicates allowed, insertion order preserved,
lookup returns the first match -- SURVEY.md §2.1), but parquet-durable,
restart-safe, and unbounded in size.

Scale notes:
* ``ingest_seq`` is a global insertion sequence.  Here it continues from
  the stored maximum per batch (exact reference parity at fixture scale);
  at production ingest rates the sequence comes from the streaming source
  offset (Kafka partition+offset), which is what ``streaming.pipeline``
  demonstrates -- a driver-side max() per batch would serialize ingest.
* Point lookups scan parquet with the id predicate pushed to row-group
  stats; for hot serving, ``streaming.pipeline.compact_latest_to``
  maintains a compacted keyed table instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import json_ingest


class TransactionStore:
    """Append / list-all / point-lookup over a durable transactions table
    (the reference's full query surface, ``main.go:96-99`` routes)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- O1: POST /transactions ------------------------------------------
    def append(self, rows: list[dict]) -> DataFrame:
        """Ingest JSON-shaped rows; returns the echoed batch (the
        reference echoes each stored row back, ``main.rs:85``)."""
        base = self._max_seq() + 1
        batch = json_ingest.ingest_rows(self.spark, rows) \
            .withColumn("ingest_seq", F.col("ingest_seq") + F.lit(base))
        batch.write.mode("append").parquet(self.path)
        return batch

    # -- O2: GET /transactions -------------------------------------------
    def list_all(self) -> DataFrame:
        """Every row, insertion order (``main.go:51-53``)."""
        return self._table().orderBy("ingest_seq")

    # -- O3: GET /transactions/{id} --------------------------------------
    def lookup(self, transaction_id: str) -> DataFrame:
        """First row matching the id in ingest order, else empty
        (``main.rs:94-98``; duplicates allowed, first match wins)."""
        return (
            self._table()
            .filter(F.col("transaction_id") == transaction_id)
            .orderBy("ingest_seq")
            .limit(1)
        )

    def count(self) -> int:
        return self._table().count()

    def _table(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame(
                [], json_ingest.with_derived(
                    self.spark.createDataFrame([], json_ingest.TRANSACTION_JSON_SCHEMA)
                ).schema)

    def _max_seq(self) -> int:
        df = self._table()
        row = df.agg(F.max("ingest_seq").alias("m")).first()
        return int(row.m) if row.m is not None else -1
