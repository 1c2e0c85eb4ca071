"""Cross-engine property test for the PII scrub: for generated token
streams mixing valid email shapes, near-misses (bare '@', doubled '@',
uppercase locals the lowercase-only pattern must NOT match), digit runs
straddling the 4+ threshold, and plain words, Spark's
regexp_count/regexp_replace and DuckDB's regexp_extract_all/
regexp_replace('g') must agree on the counts AND the redacted text --
the q_text_pii oracle only ever sees corpus-generated text, so the
near-miss input class lives here (the URL-property precedent: parity
residuals hide on inputs the fixture never generates)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financialtransactionmonitoringsystem_spark.operators.text import (
    PII_EMAIL, PII_LONGNUM)

_word = st.text(alphabet="abcXY.z_", min_size=1, max_size=6)
_digits = st.integers(1, 8).map(lambda n: "1234567890"[:n])
_token = st.one_of(
    _word,
    _digits,
    st.sampled_from([
        "a@b.co", "user.name_1@sub.dom.co", "a@b", "x@", "@x", "x@@y.z",
        "UPPER@CASE.CO", "Mixed@case.co", "a..b@c..d", "1234@5678",
        "pre1234post", "12 34", "a@b.co@c.d", ".@.",
    ]))
_text = st.lists(_token, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_text, min_size=1, max_size=25))
def test_pii_scrub_cross_engine_property(spark, duck, texts):
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    duck.register("prop_pii", pdf)
    try:
        oracle = duck.execute(f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
                        AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{PII_LONGNUM}'))
                        AS INTEGER) AS n_longnums,
                   regexp_replace(regexp_replace(text,
                       '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_LONGNUM}', '<NUM>', 'g') AS redacted
            FROM prop_pii""").df()
        want = {int(t.doc_id): (t.n_emails, t.n_longnums, t.redacted)
                for t in oracle.itertuples()}
    finally:
        duck.unregister("prop_pii")

    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
        PII_LONGNUM, "<NUM>")
    rows = spark.createDataFrame(pdf).select(
        "doc_id", "text",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_LONGNUM)).alias("n_longnums"),
        redacted.alias("redacted")).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert (r.n_emails, r.n_longnums, r.redacted) == want[r.doc_id], \
            (r.text, (r.n_emails, r.n_longnums, r.redacted), want[r.doc_id])
