"""Scale-up smoke: run the heaviest document operators on an N×
re-keyed union of the sf0.1 corpus and report wall-clock scaling.

The driver's correctness inputs stay untouched — this synthesizes a
LARGER copy purely to answer the scale question the small SFs cannot:
does each operator's cost grow ~linearly with corpus size (shuffle on
uniform keys, bounded buckets), or is something quadratic hiding below
the test sizes?

Run: python tools/scale_smoke.py [multiplier] (default 20 → 100k docs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark import get_spark
from streamprocessing_kafka_finlight_news_dashboard_spark.operators import dedup as D
from streamprocessing_kafka_finlight_news_dashboard_spark.operators import text as X
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table


def scaled_docs(spark, sf_dir: str, mult: int):
    base = load_table(spark, sf_dir, "documents")
    # stride by max(id)+1, not count: a sparse id space would otherwise
    # collide copies onto the same doc_id
    n = base.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    # Re-key so ids stay unique, and MUTATE every 3rd token with a
    # copy-specific suffix. A weak perturbation (one appended token —
    # the pre-r4 version) left all N copies of a doc mutual near-dups,
    # so candidate pairs grew quadratically BY CONSTRUCTION and the
    # smoke measured constructed duplicates, not operator cost. The
    # every-3rd-token mutation kills cross-copy shingle/simhash
    # similarity while leaving each copy's INTERNAL dup structure
    # (identical mutation within a copy) at the base corpus's density,
    # so candidate volume should scale ~linearly with the multiplier.
    toks = F.split(F.col("text"), " ")
    mutated = F.array_join(
        # 2-arg transform lambda = (element, index) in Spark
        F.transform(
            toks,
            lambda t, i: F.when(
                i % 3 == 0, F.concat(t, F.lit("~"), F.col("copy").cast("string"))
            ).otherwise(t),
        ),
        " ",
    )
    return (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
            "lang",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(mutated).alias("text"),
        )
    )


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(app_name="scale-smoke")
    spark.range(0, 1000, 1, 32).mapInPandas(lambda it: it, "id long").count()

    for m in (1, mult):
        docs = scaled_docs(spark, sf_dir, m).localCheckpoint(eager=True)
        n = docs.count()
        print(f"\n=== corpus × {m} = {n} docs ===", flush=True)
        for label, thunk in [
            ("langid", lambda d=docs: X.langid_predictions(d).count()),
            ("minhash_lsh", lambda d=docs: D.minhash_lsh_candidates_portable(d).count()),
            ("simhash_pairs", lambda d=docs: D.simhash_hamming_pairs(d).count()),
            (
                "dup_clusters",
                lambda d=docs: D.connected_components(
                    D.simhash_hamming_pairs(d).select("id_a", "id_b"),
                    d.select("doc_id"),
                ).count(),
            ),
            ("tfidf", lambda d=docs: X.tfidf_top_terms(d).count()),
        ]:
            t0 = time.perf_counter()
            rows = thunk()
            print(f"{label}: {time.perf_counter() - t0:.1f}s ({rows} rows)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
