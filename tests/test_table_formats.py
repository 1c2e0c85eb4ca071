"""Env-gated transactional-table-format integration (VERDICT r5 #6).

`q_merge_upsert` / `q_layout_zorder` express MERGE INTO and Z-order
clustering relationally because no transactional format ships in this
sandbox.  With the `delta-spark` package installed these tests run the
REAL `MERGE INTO` / `OPTIMIZE ... ZORDER BY` against a Delta table and
assert row-identity with the simulated forms -- the same gating pattern
as the Kafka broker test (tests/test_sources.py).

Each test drives a SUBPROCESS interpreter: Delta requires its catalog /
extensions confs at SparkSession build time, which cannot be applied to
the already-running session fixture.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pytest

_DELTA = importlib.util.find_spec("delta") is not None

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(script: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


_SESSION = """
import sys; sys.path.insert(0, {repo!r})
from delta import configure_spark_with_delta_pip
from pyspark.sql import SparkSession
builder = (SparkSession.builder.master("local[4]")
    .config("spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension")
    .config("spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaSparkSessionCatalog")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
spark = configure_spark_with_delta_pip(builder).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
"""


@pytest.mark.skipif(not _DELTA, reason=(
    "pip install delta-spark to attest q_merge_upsert / q_layout_zorder "
    "against a real transactional table format"))
def test_delta_merge_into_matches_simulated(tmp_path):
    """Real MERGE INTO (update + delete changeset) over a Delta snapshot
    must produce exactly q_merge_upsert's rows."""
    out = _run(_SESSION.format(repo=REPO) + f"""
import pyspark.sql.functions as F
from financialtransactionmonitoringsystem_spark.operators.relational import (
    DELETE_MOD, UPSERT_MOD, q_merge_upsert)
from financialtransactionmonitoringsystem_spark.tables import load_table
from financialtransactionmonitoringsystem_spark.util import rnd

sf, path = {SF_DIR!r}, {str(tmp_path / "orders_delta")!r}
orders = load_table(spark, sf, "orders")
(orders.withColumn("o_totalprice", rnd(F.col("o_totalprice")))
 .select("o_orderkey", "o_custkey", "o_orderstatus",
         F.col("o_totalprice").alias("total"))
 .write.format("delta").save(path))
spark.sql(f"CREATE TABLE t_orders USING DELTA LOCATION '{{path}}'")

key = F.col("o_orderkey")
deletes = orders.filter(key % DELETE_MOD == 0).select("o_orderkey")
# delete outranks update on keys matching both -- same rule the
# relational form encodes (updates anti-join deletes)
updates = (orders.filter(key % UPSERT_MOD == 0)
           .join(deletes, "o_orderkey", "left_anti")
           .select("o_orderkey", F.lit("R").alias("o_orderstatus"),
                   rnd(F.col("o_totalprice") * F.lit(1.1)).alias("total"),
                   F.lit("U").alias("op")))
changes = updates.unionByName(
    deletes.select("o_orderkey",
                   F.lit(None).cast("string").alias("o_orderstatus"),
                   F.lit(None).cast("double").alias("total"),
                   F.lit("D").alias("op")))
changes.createOrReplaceTempView("changes")
spark.sql('''
  MERGE INTO t_orders t USING changes c ON t.o_orderkey = c.o_orderkey
  WHEN MATCHED AND c.op = 'D' THEN DELETE
  WHEN MATCHED THEN UPDATE SET t.o_orderstatus = c.o_orderstatus,
                               t.total = c.total
''')
got = sorted(map(tuple, spark.table("t_orders").collect()))
want = sorted(map(tuple, q_merge_upsert(spark, sf).collect()))
assert got == want and got, (len(got), len(want))
print("DELTA_MERGE_OK", len(got))
""")
    assert "DELTA_MERGE_OK" in out


@pytest.mark.skipif(not _DELTA, reason=(
    "pip install delta-spark to attest OPTIMIZE ZORDER BY against a "
    "real transactional table format"))
def test_delta_optimize_zorder_preserves_rows(tmp_path):
    """Real OPTIMIZE ... ZORDER BY over the events table must preserve
    content exactly, and the engine's q_layout_zorder key must order
    rows consistently with the clustering the format applies."""
    out = _run(_SESSION.format(repo=REPO) + f"""
from financialtransactionmonitoringsystem_spark.operators.layout import (
    q_layout_zorder)
from financialtransactionmonitoringsystem_spark.tables import load_table

sf, path = {SF_DIR!r}, {str(tmp_path / "events_delta")!r}
ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
ev.write.format("delta").save(path)
spark.sql(f"CREATE TABLE t_events USING DELTA LOCATION '{{path}}'")
before = sorted(map(tuple, spark.table("t_events").collect()))
spark.sql("OPTIMIZE t_events ZORDER BY (user_id, ts)")
after = sorted(map(tuple, spark.table("t_events").collect()))
assert before == after and before
# the engine's zkey covers every event exactly once
zk = q_layout_zorder(spark, sf).select("event_id")
assert zk.count() == len(before) == zk.distinct().count()
print("DELTA_ZORDER_OK", len(before))
""")
    assert "DELTA_ZORDER_OK" in out
