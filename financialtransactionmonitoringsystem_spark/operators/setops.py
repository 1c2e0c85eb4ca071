"""Set operations + exact dedup (SURVEY.md §2.2).

``q_dedup`` is the ingest invariant the reference *lacks*: duplicate
``transaction_id`` values are appended unconditionally and lookups return
the first match (``user-service/main.go:67-71``).  Dedup here keeps the
first row by a deterministic key order -- the distributed restatement of
"first by insertion order".

Scale notes: union is metadata-only (no shuffle); intersect/except and
dedup shuffle once on the full row / dedup key respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table


def _cust_ids(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))


def _supp_ids(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two homogenized projections + per-source counts."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("kind"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lit("supplier").alias("kind"))
    return c.unionByName(s).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that have both customers and suppliers."""
    return _cust_ids(spark, sf_dir).intersect(_supp_ids(spark, sf_dir))


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (EXCEPT distinct)."""
    return _cust_ids(spark, sf_dir).subtract(_supp_ids(spark, sf_dir))


def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping first by deterministic order: one row per
    (o_custkey, o_orderstatus), lowest o_orderkey wins."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderstatus", "o_orderkey", "o_totalprice")
    )


ORACLES: dict[str, str] = {
    "q_union": """
        SELECT kind, COUNT(*) AS n FROM (
          SELECT c_custkey AS id, 'customer' AS kind FROM customer
          UNION ALL
          SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
        ) GROUP BY kind
    """,
    "q_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "q_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "q_dedup": """
        SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice
        FROM (
          SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                    ORDER BY o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
}

QUERIES = {
    name: fn for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
    and getattr(fn, "__module__", None) == __name__  # not re-exported imports
}
