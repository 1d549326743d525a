"""Composed streaming curation flagship (r12 verdict item 1): the FULL
ingest chain — url gate → line/quality/repetition gate →
decontamination → incremental ExactSubstr → exact dedup → LSH canonical
store → stats stores → selection manifest — driven through ONE
foreachBatch pipeline, certified end-to-end against the batch curation
flagship's kept set and manifest on the same corpus, including a
mid-stream stop/resume and fabricated crash leftovers."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.operators import text as X
from streamprocessing_kafka_finlight_news_dashboard_spark.operators import url as UU
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table
from streamprocessing_kafka_finlight_news_dashboard_spark.streaming import curation as C
from streamprocessing_kafka_finlight_news_dashboard_spark.streaming import pipeline as P
from tests.conftest import SF_SMOKE


def _corpus_with_urls(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "text",
        UU.synthetic_url(F.col("doc_id"), F.col("source")).alias("url"),
    )


def test_composed_curation_stream_matches_batch_flagship(spark, tmp_path):
    """Drain-parity for the composed chain: after streaming the corpus
    in id-ordered micro-batches — across TWO writer restarts, with
    fabricated crash leftovers healed in between — the store's kept
    canonicals equal the batch flagship's s4 curated set, the read-side
    manifest equals s5, the mixture/domain stats stores reconcile, and
    a full replay under a fresh checkpoint adds nothing."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.plans.text import curation_stage_frames

    corpus = _corpus_with_urls(spark)
    raw = load_table(spark, SF_SMOKE, "documents")

    # ---- batch reference: the flagship's own stage frames ----
    frames = curation_stage_frames(spark, SF_SMOKE)
    want_curated = {
        (r.doc_id, r.lang, r.n_tokens)
        for r in frames["s4_lsh_cluster_canon"].collect()
    }
    want_manifest = {
        (r.split, r.lang, r.n_docs, r.n_packs, r.total_tokens)
        for r in frames["s5_split_pack_manifest"].collect()
    }
    assert len(want_curated) > 50, "degenerate batch reference"

    # ---- epoch-frozen inputs, derived once from the same corpus ----
    rates = UU.epoch_domain_rates(corpus)
    eval_docs = raw.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    drift_feats = ("n_tokens", "quality")

    def annotate(df):
        # emits the drift features PLUS the trend period (synthetic
        # time buckets over doc_id — the drift_period_col contract:
        # any column derivable from the kept docs)
        t = F.col("text")
        return df.select(
            X.token_count(t).alias("n_tokens"),
            X.quality_score(t).alias("quality"),
            F.concat(
                F.lit("p"), F.floor(F.col("doc_id") / 200).cast("string")
            ).alias("period"),
        )

    drift_edges, drift_base_counts = X.drift_reference(
        annotate(raw), drift_feats
    )

    # ---- id-ordered drops: wave 1 (2 files), wave 2 (2 files) ----
    drops = str(tmp_path / "drops")
    bounds = [0, 125, 250, 375, 1 << 60]
    for i in range(2):
        corpus.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1).write.mode("append").parquet(drops)
    schema = spark.read.parquet(drops).schema
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
        )
        q = C.write_stream_curation_pipeline(
            stream, store, ck, rates=rates, eval_docs=eval_docs,
            drift_edges=drift_edges, drift_features=drift_feats,
            drift_annotate=annotate, drift_period_col="period",
        )
        q.awaitTermination(600)

    t0 = time.perf_counter()
    drain()  # wave 1: batches 0..1
    wave1_s = time.perf_counter() - t0
    kept_mid = C.read_curation_store_docs(spark, store)
    n_mid = kept_mid.count()
    assert 0 < n_mid < len(want_curated), "mid-stream store not partial"

    # ---- fabricate crash leftovers before the resume ----
    # an uncommitted foreign-generation spans partition...
    committed = sorted(os.listdir(store + "/spans"))
    orphan = store + "/spans/batch_id=deadbeef-9"
    shutil.copytree(store + "/spans/" + committed[0], orphan)
    # ...and a stats marker whose main marker never landed
    with open(store + "/stats/_ledger/batch-deadbeef-9", "w") as fh:
        fh.write("committed")
    # give the orphan real mixture partials too — the exact
    # stats-before-main crash window. A LIVE reader through the
    # generic stats reader (stats ledger only) over-counts it; the
    # main-ledger-intersected curation reader masks it.
    mix_committed = sorted(
        e
        for e in os.listdir(store + "/stats/mixture")
        if e.startswith("batch_id=")
    )
    shutil.copytree(
        store + "/stats/mixture/" + mix_committed[0],
        store + "/stats/mixture/batch_id=deadbeef-9",
    )
    n_generic = sum(
        r.n_docs
        for r in P.read_mixture_stats(spark, store + "/stats").collect()
    )
    n_masked = sum(
        r.n_docs
        for r in C.read_curation_stats(spark, store, "mixture").collect()
    )
    assert n_masked == n_mid, (n_masked, n_mid)
    assert n_generic > n_masked, (n_generic, n_masked)

    # ---- wave 2 lands; the SAME checkpoint resumes mid-stream ----
    for i in range(2, 4):
        corpus.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1).write.mode("append").parquet(drops)
    t0 = time.perf_counter()
    drain()  # batches 2..3 only (checkpoint resume)
    wave2_s = time.perf_counter() - t0
    assert not os.path.exists(orphan), "heal did not remove the crash leftover"
    assert not os.path.exists(store + "/stats/_ledger/batch-deadbeef-9")

    # ---- kept-set parity with the batch flagship ----
    got_curated = {
        (r.doc_id, r.lang, r.n_tokens)
        for r in C.read_curation_store_docs(spark, store)
        .select("doc_id", "lang", X.token_count(F.col("text")).alias("n_tokens"))
        .collect()
    }
    assert got_curated == want_curated

    # ---- manifest parity (ONE shared split/pack/manifest definition)
    got_manifest = {
        (r.split, r.lang, r.n_docs, r.n_packs, r.total_tokens)
        for r in C.read_curation_store_manifest(spark, store).collect()
    }
    assert got_manifest == want_manifest

    # ---- stats stores reconcile with the batch kept set ----
    got_mix = {
        (r.lang, r.n_docs, r.n_tokens)
        for r in P.read_mixture_stats(spark, store + "/stats").collect()
    }
    want_mix = {
        (r.lang, r.n_docs, r.n_tokens)
        for r in frames["s4_lsh_cluster_canon"]
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    }
    assert got_mix == want_mix
    # domain store feeds next epoch's rates: merged first-occurrence
    # counts equal the batch epoch-rates population
    got_rates = {
        (r.domain, r.keep_rate)
        for r in UU.domain_keep_rates(
            P.read_domain_stats(spark, store + "/stats")
        ).collect()
    }
    want_rates = {(r.domain, r.keep_rate) for r in rates.collect()}
    assert got_rates == want_rates
    # drift family: summed per-batch histograms of the kept canonicals
    # equal one batch pass over the drained kept corpus (mergeable
    # sufficient statistics under the frozen epoch edges)
    got_drift = {
        tuple(r) for r in P.read_drift_counts(spark, store + "/stats").collect()
    }
    want_drift = {
        tuple(r)
        for r in X.feature_bucket_counts(
            annotate(C.read_curation_store_docs(spark, store)),
            drift_edges,
            drift_feats,
        ).collect()
    }
    assert got_drift == want_drift and got_drift
    # post-heal the intersected curation reader and the generic stats
    # reader agree on every family (no orphan left to mask)
    got_drift_masked = {
        tuple(r) for r in C.read_curation_stats(spark, store, "drift").collect()
    }
    assert got_drift_masked == got_drift
    # drift TREND family (composed-pipeline twin of the stats writer's):
    # merged per-period histograms of the kept canonicals equal one
    # batch period-keyed pass over the drained kept corpus, and the
    # per-period PSI report is well-formed over >=2 periods
    got_trend = {
        tuple(r)
        for r in C.read_curation_stats(spark, store, "drift_trend").collect()
    }
    want_trend = {
        tuple(r)
        for r in X.feature_bucket_counts(
            annotate(C.read_curation_store_docs(spark, store)),
            drift_edges,
            drift_feats,
            period_col="period",
        ).collect()
    }
    assert got_trend == want_trend and got_trend
    trend_report = X.psi_trend_from_counts(
        drift_base_counts, C.read_curation_stats(spark, store, "drift_trend")
    ).collect()
    trend_periods = {r.period for r in trend_report}
    assert len(trend_periods) >= 2, trend_periods
    assert all(
        r.psi >= 0 and r.drift in ("stable", "moderate_shift", "major_shift")
        for r in trend_report
    )

    # ---- per-stage attrition funnel: the store-fed funnel equals the
    # batch doc_curation_funnel row-for-row on the drained corpus
    # (stages 0-7 from summed per-batch survivor partials, stage 8
    # from the read-side manifest) ----
    from streamprocessing_kafka_finlight_news_dashboard_spark.plans import CATALOG

    want_funnel = [
        tuple(r)
        for r in CATALOG["doc_curation_funnel"].builder(spark, SF_SMOKE)
        .orderBy("stage_ord")
        .collect()
    ]
    got_funnel = [
        tuple(r) for r in C.read_curation_funnel(spark, store).collect()
    ]
    assert got_funnel == want_funnel

    # ---- full replay under a fresh checkpoint: ledger + stores make
    # it a no-op (every doc now collides with its stored self) ----
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
    )
    q = C.write_stream_curation_pipeline(
        stream, store, str(tmp_path / "ck_replay"), rates=rates, eval_docs=eval_docs
    )
    q.awaitTermination(600)
    got_after = {
        (r.doc_id, r.lang, r.n_tokens)
        for r in C.read_curation_store_docs(spark, store)
        .select("doc_id", "lang", X.token_count(F.col("text")).alias("n_tokens"))
        .collect()
    }
    assert got_after == want_curated
    # funnel semantics under the replay: the gates really did
    # re-process every row (fresh generation, new committed batches),
    # so the INGEST-FLOW stages double — honest at-least-once work
    # accounting — while the store-backed tail (LSH canon, manifest)
    # is unchanged: every replayed doc collided with its stored self.
    replay_funnel = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in C.read_curation_funnel(spark, store).collect()
    }
    base_funnel = {r[1]: (r[2], r[3]) for r in want_funnel}
    assert replay_funnel["raw"][0] == 2 * base_funnel["raw"][0]
    assert replay_funnel["lsh_cluster_canon"] == base_funnel["lsh_cluster_canon"]
    assert replay_funnel["split_pack"] == base_funnel["split_pack"]
    print(
        f"\ncomposed-curation drain: wave1 {wave1_s:.1f}s (2 batches), "
        f"wave2 {wave2_s:.1f}s (2 batches)"
    )
