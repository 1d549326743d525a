"""Two-arm scale A/B for the r16 kappa-report confusion-matrix fold.

Arms (both over the SAME fused dual scoring pass, scaled corpus from
tools/scale_smoke.scaled_docs):

  old  — r15 shape: localCheckpoint the corpus-sized (doc, lang,
         classifier, pred_lang) relation, then per classifier scan it
         three times (confusion scalars + the two-way marginal union).
  new  — r16 shape: one (classifier, lang, pred_lang) count with
         map-side partial aggregation; only the tiny matrix is
         checkpointed and every tail scalar derives from it.

Run: python tools/kappa_fold_ab.py [mult ...]   (default 25 50)
Prints per-arm wall-clock (alternating arms, 2 reps) + jobs/run and
asserts the two arms return identical rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark import get_spark
from streamprocessing_kafka_finlight_news_dashboard_spark.operators import text as X
from tools.scale_smoke import scaled_docs


def _tail_from_parts(parts):
    return parts[0].unionByName(parts[1]).orderBy("classifier")


def _row(conf, pe_num, name):
    po = F.col("n_agree") * F.lit(1.0) / F.col("n")
    pe = F.col("pe_num") * F.lit(1.0) / (F.col("n") * F.col("n"))
    return conf.crossJoin(F.broadcast(pe_num)).select(
        F.lit(name).alias("classifier"),
        F.col("n").alias("n_docs"),
        "n_agree",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.when(F.col("pe_num") == F.col("n") * F.col("n"), F.lit(None))
        .otherwise(F.round((po - pe) / (F.lit(1.0) - pe), 6))
        .alias("cohen_kappa"),
    )


def kappa_old(d):
    dual = X.langid_dual_predictions(d).localCheckpoint(eager=False)
    parts = []
    for name in ("bigram", "nb"):
        p = dual.filter(F.col("classifier") == name).select("lang", "pred_lang")
        conf = p.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("pred_lang") == F.col("lang")).cast("long"))
            .cast("long")
            .alias("n_agree"),
        )
        marg = (
            p.select(F.col("lang").alias("l"), F.lit(1).alias("gold"), F.lit(0).alias("pred"))
            .unionByName(
                p.select(F.col("pred_lang").alias("l"), F.lit(0).alias("gold"), F.lit(1).alias("pred"))
            )
            .groupBy("l")
            .agg(F.sum("gold").cast("long").alias("n_gold"), F.sum("pred").cast("long").alias("n_pred"))
        )
        pe_num = marg.agg(F.sum(F.col("n_gold") * F.col("n_pred")).cast("long").alias("pe_num"))
        parts.append(_row(conf, pe_num, name))
    return _tail_from_parts(parts)


def kappa_new(d):
    cm = (
        X.langid_dual_predictions(d)
        .groupBy("classifier", "lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    parts = []
    for name in ("bigram", "nb"):
        p = cm.filter(F.col("classifier") == name)
        conf = p.agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("pred_lang") == F.col("lang"), F.col("c")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_agree"),
        )
        marg = (
            p.select(F.col("lang").alias("l"), F.col("c").alias("gold"), F.lit(0).cast("long").alias("pred"))
            .unionByName(
                p.select(F.col("pred_lang").alias("l"), F.lit(0).cast("long").alias("gold"), F.col("c").alias("pred"))
            )
            .groupBy("l")
            .agg(F.sum("gold").cast("long").alias("n_gold"), F.sum("pred").cast("long").alias("n_pred"))
        )
        pe_num = marg.agg(F.sum(F.col("n_gold") * F.col("n_pred")).cast("long").alias("pe_num"))
        parts.append(_row(conf, pe_num, name))
    return _tail_from_parts(parts)


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [25, 50]
    spark = get_spark(app_name="kappa-fold-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    sf = "/root/testdata/sf0.1"
    spark.range(0, 1000, 1, 32).mapInPandas(lambda it: it, "id long").count()
    for mult in mults:
        d = scaled_docs(spark, sf, mult).localCheckpoint(eager=True)
        n = d.count()
        print(f"# mult={mult}: {n} docs, load={os.getloadavg()[0]:.1f}", flush=True)
        ra = [r.asDict() for r in kappa_new(d).collect()]  # warm both paths once
        rb = [r.asDict() for r in kappa_old(d).collect()]
        assert ra == rb, f"ARM MISMATCH at {mult}x: {ra} vs {rb}"
        print(f"# arms identical: {ra}", flush=True)
        for rep in range(2):
            for arm, fn in (("old", kappa_old), ("new", kappa_new)):
                grp = f"ab-{mult}-{arm}-{rep}"
                spark.sparkContext.setJobGroup(grp, grp)
                t0 = time.perf_counter()
                fn(d).collect()
                dt = time.perf_counter() - t0
                jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(grp))
                print(f"mult={mult} rep={rep} arm={arm}: {dt:.2f}s {jobs} jobs", flush=True)


if __name__ == "__main__":
    main()
