"""Cross-engine property tests: hash60 — the parity foundation every
oracle rests on — agrees three ways (Python int(md5[:15],16), Spark
conv(substring(md5)), DuckDB ('0x'||substr(md5))::BIGINT) on
hypothesis-generated unicode, and URL canonicalization is idempotent
(a canonical form that re-canonicalizes differently would split dedup
groups between a crawl's first pass and a recrawl)."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from standard_data_quality_framework_spark.functions.hashing import (
    hash60, hash60_sql)
from standard_data_quality_framework_spark.functions.urlnorm import (
    normalize_url)

_SETTINGS = dict(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(st.lists(st.text(max_size=40), min_size=1, max_size=80))
@settings(**_SETTINGS)
def test_hash60_three_way_parity(spark, strings):
    py = [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
          for s in strings]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    sp = [r["h"] for r in
          df.select(hash60(F.col("s")).alias("h")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(strings)))
    dk = [r[0] for r in con.execute(
        f"SELECT {hash60_sql('s')} FROM t ORDER BY i").fetchall()]
    assert py == sp == dk


_URLISH = st.one_of(
    st.text(max_size=60),
    st.builds(
        lambda scheme, host, port, path, q, frag:
        f"{scheme}://{host}{port}{path}{q}{frag}",
        st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9%._~\-]{0,8}){0,4}/?", fullmatch=True),
        st.sampled_from(["", "?a=1", "?utm_source=x&a=1", "?b=2&a=1&"]),
        st.sampled_from(["", "#frag", "#"])))


@given(st.lists(_URLISH, min_size=1, max_size=80))
@settings(**_SETTINGS)
def test_normalize_url_idempotent(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    out = df.select(
        normalize_url(F.col("u")).alias("once")).select(
        "once", normalize_url(F.col("once")).alias("twice")).collect()
    bad = [(r["once"], r["twice"]) for r in out if r["once"] != r["twice"]]
    assert not bad, bad[:5]
