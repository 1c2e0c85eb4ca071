"""Operator library: one ``q_*`` function per SURVEY.md §2.2 inventory row.

Every function has the signature ``(spark, sf_dir) -> DataFrame`` and a
matching DuckDB oracle SQL string in its module's ``ORACLES`` dict (omitted
only for genuinely non-SQL-expressible ops, which the driver then checks
rows-only).  Column aliases match the oracle exactly -- the driver's
comparison sorts columns by name before hashing values.
"""
