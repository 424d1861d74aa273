"""URL/domain curation (operators/urls.py): extraction, parsing,
suffix-semantics blocklist, per-domain audit."""

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.urls import (
    domain_stats,
    extract_urls,
    filter_blocked_domains,
    url_domain,
    url_features,
)


def _url_rows(spark):
    return spark.createDataFrame(
        [
            (1, "https://news.example.com/world/story?id=9"),
            (2, "http://user:pw@Sub.Bad.ORG:8080/a/b/c#frag"),
            (3, "https://bad.org"),
            (4, "https://deep.sub.bad.org/x"),
            (5, "https://goodbad.org/x"),  # NOT a subdomain of bad.org
            (6, "https://ok.io/"),
        ],
        "doc_id long, url string",
    )


def test_extract_urls_array_and_empty(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://a.example.com/x and http://b.io/y."),
            (2, "no links here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: list(r.urls) for r in extract_urls(df).collect()}
    assert out[1][0] == "https://a.example.com/x"
    assert out[1][1].startswith("http://b.io/y")
    assert out[2] == [] and out[3] == []


def test_url_features_parsing(spark):
    out = {r.doc_id: r for r in url_features(_url_rows(spark)).collect()}
    assert out[1].domain == "news.example.com"
    assert out[1].registered_domain == "example.com"
    assert out[1].path_depth == 2 and out[1].has_query
    # userinfo + port + fragment stripped; lowercased
    assert out[2].domain == "sub.bad.org"
    assert out[2].path_depth == 3 and not out[2].has_query
    assert out[3].path_depth == 0
    assert out[6].path_depth == 0


def test_blocklist_subdomain_semantics(spark):
    blocklist = spark.createDataFrame([("bad.org",)], "domain string")
    kept = {r.doc_id for r in filter_blocked_domains(_url_rows(spark), blocklist).collect()}
    # 2 (sub.bad.org), 3 (bad.org), 4 (deep.sub.bad.org) blocked;
    # 5 (goodbad.org) must SURVIVE — suffix match, not substring
    assert kept == {1, 5, 6}
    blocked = {r.doc_id for r in filter_blocked_domains(
        _url_rows(spark), blocklist, keep=False).collect()}
    assert blocked == {2, 3, 4}


def test_blocklist_join_is_broadcast_no_cartesian(spark):
    blocklist = spark.createDataFrame([("bad.org",)], "domain string")
    plan = filter_blocked_domains(
        _url_rows(spark), blocklist
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_domain_stats(spark):
    rows = _url_rows(spark).union(
        spark.createDataFrame([(7, "https://other.example.com/z")], "doc_id long, url string")
    )
    out = {r.registered_domain: (r.n_urls, r.n_docs) for r in domain_stats(rows).collect()}
    assert out["example.com"] == (2, 2)
    assert out["bad.org"] == (3, 3)


def test_url_domain_column_form(spark):
    df = spark.createDataFrame([("HTTPS://A.B.C/x?q",)], "u string")
    assert df.select(url_domain("u").alias("d")).collect()[0].d == "a.b.c"


def test_blocklist_single_label_host_passes_through(spark):
    # review finding: single-label hosts (localhost, bare TLD) built a
    # descending sequence -> Spark runtime error; they must pass
    # through (can never match a >=2-label blocklist entry)
    blocklist = spark.createDataFrame([("bad.org",)], "domain string")
    df = spark.createDataFrame(
        [(1, "http://localhost/admin"), (2, "https://x.bad.org/a")],
        "doc_id long, url string",
    )
    kept = {r.doc_id for r in filter_blocked_domains(df, blocklist).collect()}
    assert kept == {1}


def test_blocklist_deep_subdomain_nesting_cannot_bypass(spark):
    # review finding: the max_labels bound used to keep the LONGEST
    # suffixes, so 6+ nested labels bypassed the blocklist entirely
    blocklist = spark.createDataFrame([("bad-ads.org",)], "domain string")
    df = spark.createDataFrame(
        [(1, "http://a.b.c.d.e.f.bad-ads.org/x"), (2, "https://fine.example.com/y")],
        "doc_id long, url string",
    )
    kept = {r.doc_id for r in filter_blocked_domains(df, blocklist).collect()}
    assert kept == {2}
