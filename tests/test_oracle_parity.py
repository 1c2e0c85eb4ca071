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
