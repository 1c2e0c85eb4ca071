"""Window functions (SURVEY.md §2.2): ranking, lag/lead, running frames,
distribution functions.  These power the monitoring use-cases the
reference gestures at: velocity checks (inter-transaction gap), running
balances, top-merchant-per-user.

Scale notes: a window is one shuffle on its partition keys; the per-user
/ per-flag queries partition on low-cardinality-safe keys.  The ONE
deliberate exception is ``q_win_ntile``: ntile/percent_rank/cume_dist
are global-rank functions, so their window is unpartitioned by
definition and Spark serializes it onto a single task -- correct at the
customer-dim cardinality it targets, and the SQL surface under
attestation.  At fact-table scale the same quantities come from a
two-pass count + range partitioning (the `_ranged_running_sum` pattern
in curate.py) rather than a global window.  Ordering columns always end
with a unique key so ranks are deterministic (oracle-hash requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from ..util import rnd, sql_round as R


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 suppliers per return flag by revenue: row_number/rank/dense_rank."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_returnflag", "l_suppkey")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    w = W.partitionBy("l_returnflag").orderBy(F.col("revenue").desc(), F.col("l_suppkey").asc())
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .withColumn("rk", F.rank().over(w))
        .withColumn("drk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 5)
    )


def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user in seconds (velocity monitoring)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance + 3-row moving average per user."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = w.rowsBetween(-2, W.currentRow)
    return ev.select(
        "event_id", "user_id", "ts",
        rnd(F.sum("value").over(running)).alias("running_value"),
        rnd(F.avg("value").over(moving)).alias("moving_avg3"),
        F.count(F.lit(1)).over(running).alias("n_so_far"),
    )


def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions over customer balances."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return cust.select(
        "c_custkey", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cume"),
    )


ROLLING_WINDOW_US = 24 * 3_600_000_000  # 24h in microseconds


def q_win_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour per-user totals: a TIME-based RANGE frame (sum /
    count of the user's events in the last 24h at each event) -- the
    'velocity over a sliding horizon' primitive of every fraud rule,
    distinct from row frames (``q_win_frame``) and value-range frames
    (``q_win_range``).  The frame is expressed over exact integer
    microseconds so both engines bound it identically."""
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-(ROLLING_WINDOW_US - 1), 0))
    return ev.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        rnd(F.sum("value").over(w)).alias("sum_24h"),
    )


ORACLES: dict[str, str] = {
    "q_win_timerange": f"""
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_24h,
               {R('SUM(value) OVER w')} AS sum_24h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {ROLLING_WINDOW_US - 1} PRECEDING
                     AND CURRENT ROW)
    """,
    "q_win_rank": f"""
        SELECT l_returnflag, l_suppkey, revenue,
               CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk, CAST(drk AS BIGINT) AS drk
        FROM (
          SELECT l_returnflag, l_suppkey, revenue,
                 row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
          FROM (
            SELECT l_returnflag, l_suppkey,
                   {R("SUM(l_extendedprice * (1 - l_discount))")} AS revenue
            FROM lineitem GROUP BY l_returnflag, l_suppkey
          )
          WINDOW w AS (PARTITION BY l_returnflag ORDER BY revenue DESC, l_suppkey ASC)
        ) WHERE rn <= 5
    """,
    "q_win_lag": """
        SELECT event_id, user_id, ts,
               (epoch_us(ts) // 1000000) - (epoch_us(lag(ts) OVER w) // 1000000) AS gap_s,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_win_frame": f"""
        SELECT event_id, user_id, ts,
               {R('''SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_value,
               {R('''AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')} AS moving_avg3,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
        FROM events
    """,
    "q_win_ntile": f"""
        SELECT c_custkey, c_acctbal,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               {R("percent_rank() OVER w", 6)} AS pct_rank,
               {R("cume_dist() OVER w", 6)} AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
}

QUERIES = {
    name: fn for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
    and getattr(fn, "__module__", None) == __name__  # not re-exported imports
}
