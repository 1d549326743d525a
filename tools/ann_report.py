"""ANN tier evaluation: recall@k vs the exact scan and wall-clock for
every search tier the engine ships, at a given SF.

    python tools/ann_report.py [/root/testdata/sf0.1]

Writes the table to stdout; the committed snapshot lives in
ANN_REPORT.md. Recall is measured against the exact brute-force
top-k on the same query set, so the report is self-contained and
reproducible (all tiers are deterministic — no RNG state anywhere).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark import get_spark
from streamprocessing_kafka_finlight_news_dashboard_spark.operators import similarity as S
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table

K = 5
QUERY_IDS = list(range(10))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann-report")
    # warm the Python worker pool so the first Arrow tier isn't charged
    # the ~3 s fork cost (same warmup bench.py applies)
    spark.range(0, 1000, 1, 32).mapInPandas(lambda it: it, "id long").count()
    e = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = e.count()

    def run(label, thunk):
        t0 = time.perf_counter()
        rows = thunk()
        dt = time.perf_counter() - t0
        got = {}
        for r in rows:
            qid = r.query_id if hasattr(r, "query_id") else r[0]
            nid = r.neighbor_id if hasattr(r, "neighbor_id") else r[1]
            got.setdefault(qid, set()).add(nid)
        return label, dt, got

    exact_label, exact_dt, exact = run(
        "exact HOF scan", lambda: S.cosine_topk(e, QUERY_IDS, k=K).collect()
    )
    tiers = [
        (exact_label, exact_dt, exact),
        run(
            "exact Arrow BLAS scan",
            lambda: S.cosine_topk_arrow(e, QUERY_IDS, k=K).collect(),
        ),
        run(
            "IVF label cells nprobe=3",
            lambda: S.ivf_topk(e, QUERY_IDS, k=K, nprobe=3).collect(),
        ),
        run(
            "IVF kmeans cells nprobe=3",
            lambda: S.ivf_topk(
                e,
                QUERY_IDS,
                k=K,
                nprobe=3,
                centroids=S.kmeans_centroids(e, k=8, iters=3).select(
                    F.col("cell").alias("label"), "centroid"
                ),
            ).collect(),
        ),
        run(
            "PQ-ADC label codebooks",
            lambda: S.pq_adc_topk(e, QUERY_IDS, k=K).collect(),
        ),
        run(
            "RP-16 projected scan",
            lambda: S.cosine_topk(
                S.rp_project(e, out_dim=16), QUERY_IDS, k=K, vec_col="pvec"
            ).collect(),
        ),
    ]
    total_exact = sum(len(v) for v in exact.values())
    print(f"# ANN tier report — {sf_dir} ({n} vectors, {len(QUERY_IDS)} queries, k={K})")
    print("| tier | recall@5 | wall s |")
    print("|---|---|---|")
    for label, dt, got in tiers:
        hit = sum(len(exact[q] & got.get(q, set())) for q in exact)
        print(f"| {label} | {hit / total_exact:.2f} | {dt:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
