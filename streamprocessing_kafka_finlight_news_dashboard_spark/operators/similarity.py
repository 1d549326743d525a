"""Similarity search over the ``embeddings`` table (array<float> vectors).

Beyond-reference surface: approximate-nearest-neighbor over an
embedding column. Two tiers:

- **Brute-force cosine top-k** — exact baseline: broadcast the (small)
  query set against every candidate row, dot/norm via JVM-side
  ``aggregate``/``zip_with`` (no Python), window top-k per query.
  Scales as |queries| × |corpus| — fine when queries are few; the
  corpus side stays fully distributed and never shuffles until the
  per-query top-k (keyed by query_id, k rows each).
- **IVF (inverted-file) bucketed** — scale path: k-means-style coarse
  quantizer approximated by label centroids (or any partition
  assignment), probe only the nearest bucket(s). Candidate set shrinks
  by the bucket fan-out; the only wide op is a broadcast join against
  the centroid table.

All math is done in double precision after an explicit cast so results
are reproducible against the DuckDB oracle (float32 accumulation order
would not be).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dvec(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    The query side is tiny → broadcast; candidates stream by without a
    shuffle until the final per-query top-k window (partition key =
    query_id, so the sort is k·|queries| not global).
    """
    base = embeddings.select(F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cvec"))
    queries = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qvec"))
    )
    scored = base.join(F.broadcast(queries), F.col("cid") != F.col("query_id")).select(
        "query_id",
        F.col("cid").alias("neighbor_id"),
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label — the coarse quantizer for the
    IVF path. posexplode → groupBy(label, pos) avg → re-assemble sorted
    by position. One shuffle keyed by (label, pos): perfectly uniform."""
    exploded = embeddings.select(
        F.col(label_col).alias("label"), F.posexplode(_dvec(F.col(vec_col))).alias("pos", "v")
    )
    per_dim = exploded.groupBy("label", "pos").agg(F.avg("v").alias("mean_v"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_v"))), lambda s: s.mean_v
            ).alias("centroid")
        )
    )


def nearest_centroid(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest label centroid by cosine —
    both the IVF probe step and a 1-NN classifier over the label
    column. Centroid table is tiny → broadcast nested-loop over it,
    then top-1 window per vector."""
    cents = label_centroids(embeddings, label_col, vec_col)
    vecs = embeddings.select(
        F.col(id_col), F.col(label_col), _dvec(F.col(vec_col)).alias("vec")
    )
    scored = vecs.crossJoin(F.broadcast(cents.select(F.col("label").alias("clabel"), "centroid")))
    scored = scored.select(
        id_col,
        label_col,
        "clabel",
        F.round(cosine(F.col("vec"), F.col("centroid")), 6).alias("cos_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("clabel"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(
            id_col,
            label_col,
            F.col("clabel").alias("pred_label"),
            F.col("cos_sim").alias("centroid_sim"),
            (F.col("clabel") == F.col(label_col)).alias("label_match"),
        )
    )
