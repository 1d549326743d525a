"""URL/domain-plane curation operator tests (operators/url.py)."""

from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.operators import url as U


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    rows = df.select("i", U.url_canonicalize(F.col("url")).alias("c")).collect()
    return [r.c for r in sorted(rows, key=lambda r: r.i)]


def test_url_canonicalize_rules(spark):
    """Every canonicalization rule on constructed URLs: case, default
    ports, fragments, trailing slashes, empty paths, tracking params
    (stripped wherever they sit), param sorting, path case preserved,
    non-default ports kept."""
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&ref=y&id=3",
            "http://Host.example:80/p?b=2&utm_campaign=z&a=1",
            "https://host.example/path#frag",
            "https://host.example",
            "https://host.example:8443/x",
            "http://host.example:8080/?fbclid=abc&gclid=def&keep=1",
            "https://host.example/CaseSensitive/Path/",
            "https://host.example/?utm_a=1&utm_b=2&ref=x",
        ],
    )
    assert got == [
        "https://www.example.com/A/b?id=3",
        "http://host.example/p?a=1&b=2",
        "https://host.example/path",
        "https://host.example/",
        "https://host.example:8443/x",
        "http://host.example:8080/?keep=1",
        "https://host.example/CaseSensitive/Path",
        "https://host.example/",
    ]


def test_url_curation_decisions_semantics(spark):
    """Decision-table semantics on a constructed crawl: re-crawls of
    one canonical page collapse to the smallest doc_id, the domain
    quota is a hash gate with rate min(R, max(1, floor(R*q/n))) out
    of R = 2^30, the
    blocklist drops its domains regardless, and kept = the AND of all
    three gates."""
    rows = [
        # three re-crawls of ONE page (tracking/fragment variants)
        (1, "https://a.example/page?utm_source=x"),
        (2, "https://a.example/page#top"),
        (3, "https://a.example/page/"),
        # a second distinct page on the same domain
        (4, "https://a.example/other"),
        # blocklisted domain
        (5, "https://www.src00.example.com/x"),
        # big domain to exercise the quota rate
        *[(10 + i, f"https://big.example/p{i}") for i in range(30)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in U.url_curation_decisions(df, quota=15).collect()}
    assert not got[1].is_url_dup and got[2].is_url_dup and got[3].is_url_dup
    assert not got[4].is_url_dup
    # dups never kept; the canonical survivor passes (quota rate 100%
    # on a 2-doc domain)
    assert got[1].kept and not got[2].kept and not got[3].kept
    assert got[1].n_domain_docs == 2 and got[1].keep_rate == U.QUOTA_RESOLUTION
    # blocklist dominates
    assert got[5].blocklisted and not got[5].kept and got[5].quota_kept
    # quota: 30 distinct pages, q=15 -> keep rate = RESOLUTION/2; the
    # md5 gate keeps a strict, deterministic subset
    big = [got[10 + i] for i in range(30)]
    assert all(
        b.keep_rate == U.QUOTA_RESOLUTION // 2 and b.n_domain_docs == 30
        for b in big
    )
    n_kept = sum(b.kept for b in big)
    assert 0 < n_kept < 30
    # deterministic: a second run gives the identical decision set
    again = {r.doc_id: r.kept for r in U.url_curation_decisions(df, quota=15).collect()}
    assert again == {k: v.kept for k, v in got.items()}


def test_url_gate_matches_decisions(spark):
    """The pipeline-composition FILTER form keeps exactly the rows the
    decision table marks kept, carrying the payload columns through."""
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
        F.concat(
            F.lit("https://d"), (F.col("id") % 7).cast("string"),
            F.lit(".example/p"), (F.col("id") % 40).cast("string"),
        ).alias("url"),
    )
    want = {
        r.doc_id
        for r in U.url_curation_decisions(docs, quota=15).collect()
        if r.kept
    }
    gated = U.url_curation_gate(docs, quota=15)
    assert "url" not in gated.columns
    got = {r.doc_id: r.text for r in gated.collect()}
    assert set(got) == want
    assert all(v == f"payload-{k}" for k, v in got.items())


def test_url_unparseable_annotated_null(spark):
    """Scheme-less/malformed URLs must canonicalize to NULL and come
    out of the decision table annotated NULL (never dup-flagged, never
    collapsed onto a shared bogus key), and the filter form must drop
    them conservatively."""
    rows = [
        (1, "example.com/a"),         # scheme-less
        (2, "foo.org/b"),             # scheme-less, DIFFERENT page
        (3, "https://ok.example/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in U.url_curation_decisions(df).collect()}
    assert len(got) == 3
    for bad in (1, 2):
        r = got[bad]
        assert r.canonical_url is None and r.domain is None
        assert r.is_url_dup is False  # no page identity -> never a dup
        assert r.kept is None and r.quota_kept is None  # annotated NULL
    assert got[3].kept
    gated = U.url_curation_gate(
        df.withColumn("payload", df.doc_id * 2)
    )
    assert {r.doc_id for r in gated.collect()} == {3}


def test_quota_rate_never_floors_to_zero(spark):
    """The 100-TB hot-domain case: a domain with far more than
    100*quota docs must still keep documents (percent granularity
    would floor its rate to 0 and DROP the domain entirely). The
    2^30-resolution rate with the >=1 clamp keeps ~quota docs."""
    from pyspark.sql import functions as F

    n = 4000  # >> 100 * quota(15) -- percent rate would be 0
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://hot.example/p"), F.col("id").cast("string")
        ).alias("url"),
    )
    rows = U.url_curation_decisions(df, quota=15).collect()
    assert all(r.keep_rate == (U.QUOTA_RESOLUTION * 15) // n for r in rows)
    n_kept = sum(r.kept for r in rows)
    assert 0 < n_kept, "hot domain must not be dropped entirely"
    assert n_kept < 100  # ~quota expected, far below the corpus
