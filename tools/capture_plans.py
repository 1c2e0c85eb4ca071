"""Dump ``.explain("formatted")`` for registry keys (optimization-round
evidence: ``plans/r{N}/<key>_<tag>.txt``).

Usage:
    python tools/capture_plans.py TAG KEY [KEY ...]
    python tools/capture_plans.py TAG all          # every HEADLINE key

TAG is the file suffix ("before" / "after").  Plans are captured at the
bench scale factor (``$SPARK_GRAFT_SF_DIR``, default sf0.1) on the same
session config the bench runs, with corpus artifacts pre-built so the
plan shows the artifact-probe shape the bench times (not the inline
build).  Output dir: ``plans/r17/`` (override with $PLANS_DIR).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tag = sys.argv[1]
keys = sys.argv[2:]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.environ.get(
    "PLANS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "plans", "r17"))
os.makedirs(out_dir, exist_ok=True)

from financialtransactionmonitoringsystem_spark.session import get_spark
from financialtransactionmonitoringsystem_spark import queries as registry
from financialtransactionmonitoringsystem_spark.artifacts import corpus_builders

spark = get_spark("fintxmon-plans")
qs = registry.all_queries()

if keys == ["all"]:
    import bench
    keys = [k for k in bench.HEADLINE if k in qs]

for name, build in corpus_builders().items():
    try:
        build(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"capture_plans: {name} build FAILED ({exc!r})", file=sys.stderr)

for key in keys:
    fn = qs.get(key)
    if fn is None:
        print(f"capture_plans: {key} not registered, skipped", file=sys.stderr)
        continue
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = os.path.join(out_dir, f"{key}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")

spark.stop()
