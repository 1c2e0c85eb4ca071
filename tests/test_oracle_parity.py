"""Local replica of the driver's t2 correctness gate: every declared
oracle query runs on Spark and DuckDB at sf0.001 and must match
(row count + columns + order-insensitive values)."""

from __future__ import annotations

import pytest

from financialtransactionmonitoringsystem_spark import queries as registry

from .compare import assert_frames_match

ALL = registry.all_queries()
ORACLES = registry.all_oracles()


def test_every_oracle_key_has_a_query():
    missing = set(ORACLES) - set(ALL)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(key, spark, duck, sf_dir):
    sdf = ALL[key](spark, sf_dir)
    spdf = sdf.toPandas()
    dpdf = duck.execute(ORACLES[key]).df()
    assert_frames_match(spdf, dpdf, key)


@pytest.mark.parametrize("key", sorted(set(ALL) - set(ORACLES)))
def test_rows_only_queries_run(key, spark, sf_dir):
    """Keys without an oracle still must run and be deterministic."""
    df = ALL[key](spark, sf_dir)
    n1 = df.count()
    n2 = ALL[key](spark, sf_dir).count()
    assert n1 == n2
    assert n1 >= 0


def test_hll_sketch_estimates_bounded_error_and_lossless_merge(spark, sf_dir):
    """HLL estimates within 5% of exact; union-of-sketches == sketch of union."""
    from pyspark.sql import functions as F

    from financialtransactionmonitoringsystem_spark.operators import aggregates
    from financialtransactionmonitoringsystem_spark.tables import load_table

    est = {r.event_type: r.n_users_est
           for r in aggregates.q_agg_hll(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact) | {"ALL"}
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(1, 0.05 * e), (k, est[k], e)
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")).first().n
    assert est["ALL"] == direct
