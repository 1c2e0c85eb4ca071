"""Property-based tests (hypothesis) for the custom join helpers: the
union+window as-of join and the bucketed interval join must agree with
DuckDB's native ASOF JOIN / theta join on arbitrary inputs, including the
partition-boundary and timestamp-tie cases that point fixtures miss
(SURVEY.md §7 hard-part 3)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from financialtransactionmonitoringsystem_spark.operators.relational import (
    asof_join, interval_join_bucketed)

# (key, ts) unique on the right side: at identical (key, ts) the matched
# right row is ambiguous in both engines, so that case is excluded.
pairs = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40)),
    min_size=0, max_size=25, unique=True,
)


def _mk(spark, rows, cols):
    schema = ", ".join(f"{c} long" for c in cols)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame([tuple(r) for r in rows], schema)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=pairs, right=pairs)
def test_asof_join_matches_duckdb(spark, left, right):
    lrows = [(k, t, 100 + i) for i, (k, t) in enumerate(sorted(left))]
    rrows = [(k, t, 200 + i) for i, (k, t) in enumerate(sorted(right))]
    ldf = _mk(spark, lrows, ["k", "ts", "lv"])
    rdf = _mk(spark, rrows, ["k", "ts", "rv"])
    got = asof_join(ldf, rdf, "k", "ts", "ts", ["rv"]) \
        .select("k", "ts", "lv", "r_rv").toPandas()

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["k", "ts", "lv"]))
    con.register("r", pd.DataFrame(rrows, columns=["k", "ts", "rv"]))
    want = con.execute("""
        SELECT l.k, l.ts, l.lv, r.rv AS r_rv
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
    """).df()
    con.close()

    norm = lambda df: sorted(
        (int(r.k), int(r.ts), int(r.lv), None if pd.isna(r.r_rv) else int(r.r_rv))
        for r in df.itertuples())
    assert norm(got) == norm(want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=pairs, right=pairs, interval=st.integers(1, 7))
def test_interval_join_matches_duckdb(spark, left, right, interval):
    lrows = [(k, t, 100 + i) for i, (k, t) in enumerate(sorted(left))]
    rrows = [(k, t, 200 + i) for i, (k, t) in enumerate(sorted(right))]
    # interval_join_bucketed buckets via unix_timestamp -> needs timestamps
    from pyspark.sql import functions as F

    ldf = _mk(spark, lrows, ["k", "t", "lv"]).withColumn(
        "lts", F.timestamp_seconds(F.col("t"))).drop("t")
    rdf = _mk(spark, rrows, ["k", "t", "rv"]).withColumn(
        "rts", F.timestamp_seconds(F.col("t"))).drop("t")
    got = interval_join_bucketed(ldf, rdf, "k", "lts", "rts", interval) \
        .select("lv", "rv").toPandas()

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["k", "t", "lv"]))
    con.register("r", pd.DataFrame(rrows, columns=["k", "t", "rv"]))
    want = con.execute(f"""
        SELECT l.lv, r.rv FROM l JOIN r
        ON l.k = r.k AND r.t >= l.t AND r.t < l.t + {interval}
    """).df()
    con.close()

    norm = lambda df: sorted((int(r.lv), int(r.rv)) for r in df.itertuples())
    assert norm(got) == norm(want)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=pairs, right=pairs)
def test_asof_forward_matches_duckdb(spark, left, right):
    from financialtransactionmonitoringsystem_spark.operators.relational import (
        asof_join_forward)

    lrows = [(k, t, 100 + i) for i, (k, t) in enumerate(sorted(left))]
    rrows = [(k, t, 200 + i) for i, (k, t) in enumerate(sorted(right))]
    ldf = _mk(spark, lrows, ["k", "ts", "lv"])
    rdf = _mk(spark, rrows, ["k", "ts", "rv"])
    got = asof_join_forward(ldf, rdf, "k", "ts", "ts", ["rv"]) \
        .select("k", "ts", "lv", "r_rv").toPandas()

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["k", "ts", "lv"]))
    con.register("r", pd.DataFrame(rrows, columns=["k", "ts", "rv"]))
    # forward as-of: earliest right with r.ts >= l.ts per key
    want = con.execute("""
        SELECT l.k, l.ts, l.lv, arg_min(r.rv, r.ts) AS r_rv
        FROM l LEFT JOIN r ON l.k = r.k AND r.ts >= l.ts
        GROUP BY l.k, l.ts, l.lv
    """).df()
    con.close()

    norm = lambda df: sorted(
        (int(r.k), int(r.ts), int(r.lv), None if pd.isna(r.r_rv) else int(r.r_rv))
        for r in df.itertuples())
    assert norm(got) == norm(want)
