"""The full query registry consumed by ``__spark_entry__.py``.

Each operator module contributes a ``QUERIES`` dict (``q_name -> (spark,
sf_dir) -> DataFrame``) and an ``ORACLES`` dict (``q_name -> DuckDB SQL``).
Keys without an oracle are genuinely non-SQL-expressible (approximate,
probabilistic, or custom-stateful) and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .functions import scalar
from .operators import aggregates, relational, setops, topk, windows

_MODULES = [relational, aggregates, windows, setops, topk, scalar]

# Extended modules land as milestones complete; import-guarded so a broken
# module never takes down the whole registry during development.
for _name in ("streaming.batch_twins", "operators.text", "operators.dedup",
              "operators.similarity", "operators.multimodal",
              "operators.extras", "operators.skew", "sources.txfeed"):
    try:
        import importlib

        _MODULES.append(
            importlib.import_module(f"{__package__}.{_name}"))
    except ImportError:
        pass


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for key, fn in getattr(mod, "QUERIES", {}).items():
            assert key not in out, f"duplicate query key {key}"
            out[key] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
