"""Property test: _wordgrams (zip_with chain) == the obvious Python
n-gram definition for arbitrary token counts and n, including docs
shorter than n (the sequence(1,0)-counts-down trap the guard exists
for)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financialtransactionmonitoringsystem_spark.operators.text import _wordgrams

token = st.text(alphabet="abcxyz", min_size=1, max_size=3)
docs = st.lists(st.lists(token, min_size=0, max_size=12), min_size=1, max_size=8)


def ref_grams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs, n=st.integers(2, 6))
def test_wordgrams_match_python_reference(spark, docs, n):
    rows = [(" ".join(toks),) for toks in docs]
    df = spark.createDataFrame(rows, "text string")
    got = [r.g for r in df.select(_wordgrams(F.col("text"), n).alias("g")).collect()]
    # split(" ") on an empty string yields [""], one empty token -- mirror it
    want = [ref_grams(t.split(" "), n) for (t,) in rows]
    assert got == want
