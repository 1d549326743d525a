"""Compaction + post-compaction ingest for the composed curation store
(streaming/curation.py): compacting all families into one ledgered
partition each must change NO read, the incremental stores must keep
deduplicating correctly when ingest CONTINUES against compacted
partitions, and a crash inside the marker→cleanup window must heal
without double-counting."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.streaming import curation as C
from streamprocessing_kafka_finlight_news_dashboard_spark.streaming import pipeline as P

#: exactly 7 tokens — BELOW substr_k=8, so an exact copy has NO span
#: windows and can only be caught by the fingerprint store. Engineered
#: to pass the Gopher top-n-gram caps, which elect the
#: LEXICOGRAPHICALLY-smallest gram among count-1 ties: the four
#: 2-char alphabet-start tokens win every election, so top-4-gram
#: coverage is 8/56 = 0.143 < the 0.16 cap (a uniform-token short doc
#: would fail — a 4-gram covers ~4/n_tok of its characters).
_SHORT = "aa ab ac ad verylongtokennn1 verylongtokennn2 verylongtokennn3"


def _mini_corpus(spark):
    """36 tiny docs over 3 id-ordered waves of 12, with planted
    CROSS-WAVE duplicates, one per incremental store: a canonical-URL
    re-crawl (urlcanon), a sub-k-token exact-text dup (fps — the one
    shape ExactSubstr cannot shadow), and a repeated 8-token span
    (spans). Fillers are unique per doc so the only cross-doc overlap
    is planted. Docs with i % 7 == 0 land on the blocklisted
    www.src00 domain (14 is re-pointed at src02 by its plant)."""
    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = []
    for i in range(36):
        filler = " ".join(f"w{i:02d}q{j:02d}" for j in range(30))
        text = filler
        url = f"http://www.src{i % 7:02d}.example.com/p/{i}"
        if i in (14, 26):  # re-crawl of doc 2's URL (wave 1 and 2)
            url = "http://www.src02.example.com/p/2"
        if i in (9, 17, 33):  # short exact dups: 9 canonical, 17/33 dups
            text = _SHORT
        if i in (8, 20, 32):  # repeated 8-token span across waves
            text = f"{span} {filler}"
        rows.append((i, "en", text, url))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, url string"
    )


def test_curation_store_compaction_and_continued_ingest(spark, tmp_path):
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators import url as UU

    corpus = _mini_corpus(spark)
    rates = UU.epoch_domain_rates(corpus)
    drops = str(tmp_path / "drops")
    for w in range(2):  # waves 0..1 first
        corpus.filter(
            (F.col("doc_id") >= w * 12) & (F.col("doc_id") < (w + 1) * 12)
        ).coalesce(1).write.mode("append").parquet(drops)
    schema = spark.read.parquet(drops).schema
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")

    def drain(checkpoint):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
        )
        q = C.write_stream_curation_pipeline(
            stream, store, checkpoint, rates=rates, eval_docs=None, eval_mod=0
        )
        q.awaitTermination(600)

    drain(ck)
    mid_ids = {r.doc_id for r in C.read_curation_store_docs(spark, store).collect()}
    # wave-0/1 plants: 14 url-dup of 2, 17 fp-dup of 9, 20 span-cut
    # survivor; 0/7 blocklisted
    assert {2, 9, 20}.issubset(mid_ids)
    assert {0, 7, 14, 17}.isdisjoint(mid_ids)
    before_docs = {
        tuple(r) for r in C.read_curation_store_docs(spark, store).collect()
    }
    before_manifest = {
        tuple(r) for r in C.read_curation_store_manifest(spark, store).collect()
    }
    before_mix = {
        tuple(r) for r in P.read_mixture_stats(spark, store + "/stats").collect()
    }

    # ---- compact: every read identical, one partition per family ----
    n_main, n_stats = C.compact_curation_store(spark, store)
    assert n_main == 2 and n_stats == 2
    for fam in ("urlcanon", "spans", "fps", "docs", "bands"):
        parts = [
            e for e in os.listdir(f"{store}/{fam}") if e.startswith("batch_id=")
        ]
        assert len(parts) == 1 and parts[0].startswith("batch_id=compact-"), fam
    assert {
        tuple(r) for r in C.read_curation_store_docs(spark, store).collect()
    } == before_docs
    assert {
        tuple(r) for r in C.read_curation_store_manifest(spark, store).collect()
    } == before_manifest
    assert {
        tuple(r) for r in P.read_mixture_stats(spark, store + "/stats").collect()
    } == before_mix

    # ---- wave 2 lands AGAINST the compacted stores: each planted
    # cross-wave dup must still be caught by its (compacted) store ----
    corpus.filter(F.col("doc_id") >= 24).coalesce(1).write.mode("append").parquet(
        drops
    )
    drain(ck)
    after = C.read_curation_store_docs(spark, store)
    ids = {r.doc_id for r in after.collect()}
    assert 26 not in ids, "compacted urlcanon store missed a re-crawl"
    assert 33 not in ids, "compacted fp store missed a short exact dup"
    # doc 32's repeated span is CUT against the compacted span store:
    # the doc survives, minus the 8 span tokens
    t32 = after.filter(F.col("doc_id") == 32).first()
    assert t32 is not None and "alpha bravo" not in t32.text
    # every other wave-2 doc arrived (28/35 are blocklisted src00)
    assert {24, 25, 27, 29, 30, 31, 32, 34}.issubset(ids)
    assert {28, 35}.isdisjoint(ids)

    # ---- crash inside the marker→cleanup window, then heal ----
    n_main2, _ = C.compact_curation_store(spark, store, _crash_after_marker=True)
    assert n_main2 >= 2
    # window state: the compact partition AND the batches it replaced
    # coexist; the manifest-aware reader must not double-count
    assert {
        r.doc_id for r in C.read_curation_store_docs(spark, store).collect()
    } == ids
    # the next writer start heals (finishes the compaction), and a
    # fresh-checkpoint full replay is a content no-op
    drain(str(tmp_path / "ck2"))
    assert {
        r.doc_id for r in C.read_curation_store_docs(spark, store).collect()
    } == ids
    # post-heal invariant: every surviving partition dir is committed
    ledger = f"{store}/_ledger"
    for fam in ("urlcanon", "spans", "fps", "docs", "bands"):
        for e in os.listdir(f"{store}/{fam}"):
            if e.startswith("batch_id="):
                part = e.split("=", 1)[1]
                assert os.path.exists(os.path.join(ledger, f"batch-{part}")), e
