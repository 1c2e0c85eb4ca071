"""Sorts, limits and top-k (SURVEY.md §2.2).

Scale notes: a global ``orderBy().limit(k)`` compiles to
``TakeOrderedAndProject`` -- each partition keeps its local top-k and only
k rows per partition reach the driver-side merge, so it never materializes
a global sort.  Top-k per group is a window + filter: one shuffle on the
group key.  Tie-breaking on a unique key makes the selected row set
deterministic (a bare LIMIT over ties is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table


def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering + deterministic limit."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 largest orders (TakeOrderedAndProject)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


ORACLES: dict[str, str] = {
    "q_sort_multi": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        ORDER BY o_orderstatus ASC NULLS LAST, o_totalprice DESC NULLS LAST, o_orderkey ASC
        LIMIT 100
    """,
    "q_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "q_topk_per_group": """
        SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn
        FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
          FROM part
        ) WHERE rn <= 3
    """,
}

QUERIES = {
    name: fn for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
    and getattr(fn, "__module__", None) == __name__  # not re-exported imports
}
