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


def ref_novelty(rows: list[tuple[int, str]]):
    """Pure-Python reference of the novelty operator: distinct word
    5-grams per candidate doc vs the union of reference-doc grams."""
    from financialtransactionmonitoringsystem_spark.operators.text import (
        DECONTAM_NGRAM, NOVELTY_REF_MOD, NOVELTY_REF_REM)

    def grams(text: str) -> set[str]:
        toks = text.split(" ")
        return set(ref_grams(toks, DECONTAM_NGRAM))

    ref = set()
    for doc_id, text in rows:
        if doc_id % NOVELTY_REF_MOD == NOVELTY_REF_REM:
            ref |= grams(text)
    out = {}
    for doc_id, text in rows:
        if doc_id % NOVELTY_REF_MOD == NOVELTY_REF_REM:
            continue
        g = grams(text)
        n_seen = len(g & ref)
        out[doc_id] = (len(g), len(g) - n_seen)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.lists(token, min_size=0, max_size=12)
                      .map(" ".join), min_size=1, max_size=14))
def test_novelty_core_matches_python_reference(spark, texts):
    """The bloom-prefiltered novelty plan == the obvious Python set
    arithmetic for arbitrary small corpora -- including corpora whose
    reference slice is EMPTY (every gram novel; the bloom is all
    zeros) and docs shorter than the gram width (0 grams, rate 0).
    Counts compare exactly: the bloom may only cost shuffle rows,
    never change answers, and the tiny alphabet makes gram collisions
    across docs (the seen path) common."""
    from financialtransactionmonitoringsystem_spark.operators.text import (
        _novelty_core)

    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_novel)
           for r in _novelty_core(docs).collect()}
    assert got == ref_novelty(rows)


def _domain_cap_python(rows):
    """Independent Python reference for curate._domain_cap over
    (doc_id, source, text) rows: per-domain totals, the
    rank-ceil(3n/4) cap, best-ttr-first keeps."""
    import math

    docs = []
    for doc_id, source, text in rows:
        toks = text.split(" ")
        docs.append((doc_id, source, len(toks),
                     len(set(toks)) / len(toks)))
    dom = {}
    for _, s, n, _ in docs:
        a = dom.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += n
    totals = sorted(v[1] for v in dom.values())
    cap = totals[math.ceil(3 * len(totals) / 4) - 1]
    out = {}
    for s, (n_docs, tok_total) in dom.items():
        run, n_kept, tokens_kept = 0, 0, 0
        for doc_id, src, n, ttr in sorted(
                docs, key=lambda d: (-d[3], d[0])):
            if src != s:
                continue
            run += n
            if run <= cap:
                n_kept += 1
                tokens_kept += n
        out[s] = (n_docs, tok_total, cap, n_kept, tokens_kept,
                  tok_total > cap)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.tuples(st.sampled_from("abcde"),
              st.lists(st.sampled_from(["x", "y", "z", "w"]),
                       min_size=1, max_size=9)),
    min_size=1, max_size=20))
def test_domain_cap_matches_python_reference(spark, docs):
    """curate._domain_cap (the rank-P75 cap + best-ttr keeps shared by
    both mixture-cap twins) == an independent Python implementation on
    arbitrary domain/doc distributions -- including single-domain
    corpora, all-tied totals, and runs that land exactly on the cap.

    The per-domain running sum is global best-ttr order filtered to the
    domain (equivalent to per-domain order since the sum only advances
    on the domain's own docs) -- mirrored in the reference."""
    from financialtransactionmonitoringsystem_spark.operators import curate

    rows = [(i, src, " ".join(toks))
            for i, (src, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: (r.n_docs, r.tok_total, r.cap, r.n_kept,
                      r.tokens_kept, r.capped)
           for r in curate._mixture_cap_core(df).collect()}
    assert got == _domain_cap_python(rows)
