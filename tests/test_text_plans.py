

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
