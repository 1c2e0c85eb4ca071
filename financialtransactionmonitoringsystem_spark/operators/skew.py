"""Skew-handling operators (SURVEY.md "salting for skew"; README design
stance).

The events table keys on ``user_id`` with only ~150 distinct users --
every per-user shuffle hashes 10k+ rows into 150 reducer keys, so a few
hot keys own entire tasks.  At 100 TB this is the classic straggler: one
executor grinds a single key while the rest idle.  Two mitigations, both
oracle-checked to produce byte-identical results to the unsalted plans:

* **Salted two-phase aggregation** (`q_agg_salted`): aggregate on
  (key, salt) first -- hot keys split across ``N_SALTS`` reducers -- then
  combine the partials per key.  The second shuffle moves only
  |keys| * N_SALTS rows.  (Spark's partial/map-side aggregation already
  does this *within* a partition; salting extends it across the reducer
  boundary, which matters when one key exceeds a single reducer.)

* **Salted shuffle join** (`q_join_salted`): the big skewed side gets a
  deterministic salt in [0, N_SALTS); the small side is replicated once
  per salt value; the join key becomes (key, salt) so a hot key spreads
  over N_SALTS reducers.  This is the fallback when the small side is
  too big to broadcast (broadcast is always the first answer to join
  skew, `q_join_broadcast`) and complements AQE's runtime skew-join
  splitting (`spark.sql.adaptive.skewJoin.enabled`, on in session.py),
  which only kicks in above partition-size thresholds.

Salts are **deterministic** (hash of a row-identity column, not
``rand()``) so plans stay reproducible and retries/speculative tasks see
stable values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from ..util import rnd, sql_round as R

N_SALTS = 8


def salt_of(identity: Column, n_salts: int = N_SALTS) -> Column:
    """Deterministic salt in [0, n_salts) from a row-identity column."""
    return F.pmod(F.xxhash64(identity), F.lit(n_salts)).cast("int")


def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event count + total value via salted two-phase
    aggregation; result identical to the direct groupBy (the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("__salt", salt_of(F.col("event_id")))
        .groupBy("user_id", "__salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv"))
    )
    return (
        partial.groupBy("user_id")
        .agg(F.sum("pn").alias("n_events"), rnd(F.sum("pv")).alias("total_value"))
    )


def salted_join(big: DataFrame, small: DataFrame, big_key: str, small_key: str,
                identity: str, n_salts: int = N_SALTS) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated n_salts times, so one hot key spans n_salts reducers."""
    b = big.withColumn("__salt", salt_of(F.col(identity), n_salts))
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return (
        b.join(s, (F.col(big_key) == F.col(small_key)) & (b.__salt == s.__salt))
        .drop("__salt")
    )


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to customer on the skewed user key via salting, then
    rolled up by market segment.  ``merge`` hint forces the shuffle join
    the salting is for (Catalyst would otherwise broadcast customer at
    this sf, which is the *other* skew answer)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").hint("merge") \
        .select("c_custkey", "c_mktsegment")
    joined = salted_join(ev, cust, "user_id", "c_custkey", "event_id")
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), rnd(F.sum("value")).alias("total_value"))
    )


ORACLES: dict[str, str] = {
    "q_agg_salted": f"""
        SELECT user_id, COUNT(*) AS n_events, {R('SUM(value)')} AS total_value
        FROM events GROUP BY user_id
    """,
    "q_join_salted": f"""
        SELECT c.c_mktsegment, COUNT(*) AS n_events, {R('SUM(e.value)')} AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
}

QUERIES = {
    name: fn for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
    and getattr(fn, "__module__", None) == __name__  # not re-exported imports
}
