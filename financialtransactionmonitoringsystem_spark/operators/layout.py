"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the fastest scan is the one that never reads a file: parquet
row-group min/max stats prune scans only when rows with similar key
values sit in the same files.  Sorting clusters ONE dimension perfectly
and scatters every other; a Z-order (Morton) curve interleaves the bits
of several dimensions so a contiguous key range maps to a small
hyper-rectangle in all of them at once -- the layout behind Delta/
Iceberg ``OPTIMIZE ZORDER BY``.  Spark-side this is just a derived
column + ``repartitionByRange``: the curve math is exact integer
arithmetic (oracle-checkable), and the locality property -- each range
partition touches a bounded window of BOTH dimensions -- is asserted in
tests/test_plans.py against a single-dimension sort baseline.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

Z_BITS = 10  # 10 bits per dimension -> 20-bit Morton key


def _interleave(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative longs:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i.  Pure
    integer shifts/masks -- identical in any engine."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                                 2 * i))
    return reduce(lambda x, y: x + y, terms)


def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (user bucket, hour bucket) for the
    events table: the write-side layout op that makes BOTH
    ``user_id = ?`` and time-range predicates prunable from the same
    file layout.  ``ub`` keeps the user's low bits (a user's rows land
    in one bucket), ``hb`` the absolute hour's low bits (adjacent hours
    stay adjacent modulo the wrap), and ``zkey`` interleaves them.

    The query itself is a pure projection (zero shuffle); the layout
    effect comes from writing with ``repartitionByRange(zkey)`` +
    ``sortWithinPartitions(zkey)``, asserted as a locality property in
    tests (each partition then spans a bounded window of both
    dimensions, where an hour-sorted layout scatters users across every
    partition).

    r17 measured NO-GUARD verdict: the bit-interleave projection is
    too cheap for tables.scan_wide to pay (A/B: 0.40 vs 0.78 s at 10x,
    1.33 vs 3.06 at 50x AGAINST the guard) -- the pure-projection
    zero-shuffle claim above stays literal at every width.
    """
    ev = load_table(spark, sf_dir, "events")
    mask = (1 << Z_BITS) - 1
    ub = F.col("user_id").bitwiseAND(F.lit(mask))
    hb = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)) \
        .bitwiseAND(F.lit(mask))
    return ev.select(
        "event_id",
        ub.alias("ub"),
        hb.alias("hb"),
        _interleave(F.col("user_id"),
                    F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)))
        .alias("zkey"),
    )


def _interleave_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"((({b} >> {i}) & 1) * {1 << (2 * i)})")
    return " + ".join(terms)


ORACLES: dict[str, str] = {
    "q_layout_zorder": f"""
        SELECT event_id,
               (user_id & {(1 << Z_BITS) - 1}) AS ub,
               (CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                & {(1 << Z_BITS) - 1}) AS hb,
               {_interleave_sql('user_id',
                                'CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)')}
                 AS zkey
        FROM events
    """,
}

QUERIES = {
    name: fn for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
    and getattr(fn, "__module__", None) == __name__  # not re-exported imports
}
