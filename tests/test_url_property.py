"""Cross-engine property test for URL canonicalization: for arbitrary
component-generated URLs (mixed-case schemes/hosts, multi-'@' userinfo,
ports with and without defaults, trailing slashes, utm params, empty
param segments, fragments), the Spark expression `canonical_url` and
the DuckDB oracle canonicalizer (`url_canon_sql` -- the SAME text the
q_dedup_url oracle embeds) must agree byte-for-byte, the result must be
idempotent, and no credential fragment / tracking param / fragment may
survive into the dedup key.  Three rounds of ADVICE residuals (userinfo
keep, first-vs-last '@') were exactly cross-engine drift on inputs the
fixture never generated -- this test generates them."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financialtransactionmonitoringsystem_spark.operators import dedup

_alnum = st.text(alphabet="abcDEf01", min_size=1, max_size=6)

scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Https", "hTTp"])
# userinfo may contain ':' and '@' freely (the greedy-strip surface);
# '/', '?', '#' are structurally excluded by RFC 3986 authority rules
userinfo = st.one_of(
    st.just(""),
    st.text(alphabet="ab9:@", min_size=1, max_size=8).map(lambda s: s + "@"))
www = st.sampled_from(["", "www.", "WWW.", "wwwx."])
host = st.lists(_alnum, min_size=1, max_size=3).map(".".join)
port = st.sampled_from(["", ":80", ":443", ":8443", ":0443"])
path = st.tuples(
    st.lists(_alnum, min_size=0, max_size=3),
    st.booleans(),
).map(lambda t: "".join("/" + s for s in t[0]) + ("/" if t[1] and t[0] else ""))
params = st.lists(
    st.tuples(st.sampled_from(["a", "b", "page", "utm_source", "utm_x", ""]),
              _alnum),
    min_size=0, max_size=4,
).map(lambda ps: "?" + "&".join(f"{k}={v}" if k else "" for k, v in ps)
      if ps else "")
fragment = st.sampled_from(["", "#x", "#sec2"])

url = st.tuples(scheme, userinfo, www, host, port, path, params, fragment) \
    .map(lambda t: f"{t[0]}://{t[1]}{t[2]}{t[3]}{t[4]}{t[5]}{t[6]}{t[7]}")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(urls=st.lists(url, min_size=1, max_size=30, unique=True))
def test_url_canonicalization_cross_engine_property(spark, duck, urls):
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
    duck.register("prop_urls", pdf)
    try:
        oracle = duck.execute("WITH " + dedup.url_canon_sql("prop_urls")
                              + " SELECT doc_id, canon FROM c").df()
        want = {int(t.doc_id): t.canon for t in oracle.itertuples()}
    finally:
        duck.unregister("prop_urls")

    c1 = dedup.canonical_url(F.col("url"))
    rows = spark.createDataFrame(pdf).select(
        "doc_id", "url", c1.alias("c1"),
        dedup.canonical_url(c1).alias("c2")).collect()
    assert len(rows) == len(urls)
    for r in rows:
        assert r.c1 == want[r.doc_id], (r.url, r.c1, want[r.doc_id])
        assert r.c2 == r.c1, (r.url, r.c1, r.c2)          # idempotent
        assert "@" not in r.c1, (r.url, r.c1)             # no credential
        assert "utm_" not in r.c1, (r.url, r.c1)          # no tracking
        assert "#" not in r.c1, (r.url, r.c1)             # no fragment
