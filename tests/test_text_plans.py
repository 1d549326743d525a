

def test_pack_sequences_manifest_invariants(spark):
    """Packing manifest: contiguous pack ids per shard, token totals
    reconcile with the corpus, and every pack except the last in each
    shard comes within one document of the 512-token budget (floor-of-
    cumsum chunking can undershoot by at most the largest single doc,
    because a pack's start may sit past its 512k boundary when the
    previous doc overshot)."""
    from pyspark.sql import functions as F

    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import token_count
    from streamprocessing_kafka_finlight_news_dashboard_spark.plans import CATALOG
    from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    max_doc = docs.select(F.max(token_count(F.col("text")))).first()[0]
    total_tokens = docs.select(F.sum(token_count(F.col("text")))).first()[0]
    rows = CATALOG["doc_pack_sequences"].builder(spark, SF_SMOKE).collect()
    assert sum(r.pack_tokens for r in rows) == total_tokens
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, packs in by_lang.items():
        ids = sorted(p.pack_id for p in packs)
        assert ids == list(range(len(ids))), f"{lang}: non-contiguous {ids}"
        last = max(ids)
        for p in packs:
            if p.pack_id != last:
                assert p.pack_tokens >= 512 - max_doc, (lang, p.pack_id, p.pack_tokens)
                assert p.pack_tokens + max_doc > 512


def test_pii_scrub_redacts_and_counts(spark):
    """PII scrub on constructed rows: typed placeholders land in the
    output, per-family counts attribute each span to exactly one
    family (ordered counting), clean/null/empty text passes through
    with zero counts, and counts always sum to the placeholders
    present in the scrubbed text."""
    from pyspark.sql import functions as F

    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import pii_scrub

    rows = [
        (1, "contact bob.smith+x@corp.example.co for details"),
        (2, "ssn 123-45-6789 leaked with ip 10.0.255.7 yesterday"),
        (3, "call +1 (415) 555-0137 or 020-7946-0958 now"),
        (4, "no pii here at all"),
        (5, ""),
        (6, None),
        (7, "two mails a@b.io c@d.org one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}

    assert got[1].n_email == 1 and "<EMAIL>" in got[1].scrubbed_text
    assert "@" not in got[1].scrubbed_text
    # SSN claimed by the ssn family, not double-counted by phone
    assert got[2].n_ssn == 1 and got[2].n_phone == 0
    assert got[2].n_ipv4 == 1
    assert "<SSN>" in got[2].scrubbed_text and "<IPV4>" in got[2].scrubbed_text
    assert got[3].n_phone == 2 and got[3].scrubbed_text.count("<PHONE>") == 2
    assert got[4].n_redactions == 0 and got[4].scrubbed_text == rows[3][1]
    assert got[5].n_redactions == 0 and got[5].scrubbed_text == ""
    assert got[6].scrubbed_text is None
    assert got[7].n_email == 2 and got[7].n_ipv4 == 1 and got[7].n_redactions == 3
    # counts reconcile with placeholders for every row
    for r in got.values():
        if r.scrubbed_text is None:
            continue
        n_ph = sum(
            r.scrubbed_text.count(f"<{fam.upper()}>")
            for fam in ("email", "ssn", "ipv4", "phone")
        )
        assert n_ph == r.n_redactions, r
