"""Similarity-search catalog queries over ``embeddings``
(beyond-reference surface; operators in operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamprocessing_kafka_finlight_news_dashboard_spark.operators import similarity as S
from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table

_QUERY_IDS = list(range(10))


@query(
    "emb_cosine_topk",
    oracle="""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, vec AS qvec FROM base WHERE vec_id < 10
        ), scored AS (
            SELECT q.query_id, b.vec_id AS neighbor_id,
                   round(
                       list_sum(list_transform(list_zip(q.qvec, b.vec),
                                               s -> s[1] * s[2]))
                       / (sqrt(list_sum(list_transform(q.qvec, x -> x * x)))
                          * sqrt(list_sum(list_transform(b.vec, x -> x * x)))), 6
                   ) AS cos_sim
            FROM q JOIN base b ON b.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, rank, cos_sim
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored
        ) t WHERE rank <= 5
    """,
    survey_ops="similarity brute-force cosine top-k (beyond-reference)",
    doc="Exact top-5 cosine neighbors for 10 query vectors: broadcast "
    "queries × streamed corpus, JVM-side zip_with/aggregate dot "
    "product in double precision, per-query top-k window with "
    "deterministic tie-break.",
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(e, _QUERY_IDS, k=5)


@query(
    "emb_nearest_centroid",
    oracle="""
        WITH base AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        ), ex AS (
            SELECT label,
                   unnest(range(1, len(vec) + 1)) AS pos,
                   unnest(vec)                    AS v
            FROM base
        ), cents AS (
            SELECT label AS clabel, list(mean_v ORDER BY pos) AS centroid
            FROM (SELECT label, pos, avg(v) AS mean_v FROM ex GROUP BY label, pos) p
            GROUP BY label
        ), scored AS (
            SELECT b.vec_id, b.label, c.clabel,
                   round(
                       list_sum(list_transform(list_zip(b.vec, c.centroid),
                                               s -> s[1] * s[2]))
                       / (sqrt(list_sum(list_transform(b.vec, x -> x * x)))
                          * sqrt(list_sum(list_transform(c.centroid, x -> x * x)))), 6
                   ) AS cos_sim
            FROM base b CROSS JOIN cents c
        )
        SELECT vec_id, label, clabel AS pred_label, cos_sim AS centroid_sim,
               clabel = label AS label_match
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY cos_sim DESC, clabel) AS rn
            FROM scored
        ) t WHERE rn = 1
    """,
    survey_ops="similarity IVF/coarse-quantizer probe (beyond-reference)",
    doc="Nearest label-centroid assignment (the IVF probe step): "
    "posexplode→per-dimension mean→reassembled centroid vectors "
    "(tiny, broadcast), cosine argmax per vector.",
)
def emb_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.nearest_centroid(e)
