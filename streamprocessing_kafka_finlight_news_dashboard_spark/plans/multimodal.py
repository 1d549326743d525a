"""Multimodal catalog queries (beyond-reference surface; operators in
operators/multimodal.py).

No media table exists in the driver's test lake, so these run over the
deterministic synthetic media table (seeded payload bytes — stable
schema and row counts across runs). They are rows-only checks: binary
payload processing has no DuckDB-expressible oracle, but every stage's
Spark-side plumbing (binary columns, Arrow mapInPandas batches,
metadata pruning) is the real production path; only the decode inside
the batch function is stubbed (no image/audio libs in this
environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamprocessing_kafka_finlight_news_dashboard_spark.operators import multimodal as M
from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query


@query(
    "media_feature_extract",
    oracle=None,  # binary decode — not SQL-expressible; rows-only check
    survey_ops="multimodal decode/feature-extract via Arrow mapInPandas "
    "(beyond-reference)",
    doc="Feature extraction over opaque binary media payloads: Arrow "
    "batches through mapInPandas, sha-256 content id, stubbed decode "
    "producing a float feature vector, binary column dropped from the "
    "output. The plumbing a real decoder (PIL/libvips/ffmpeg) plugs "
    "into unchanged. The catalog entry projects the feature vector to "
    "scalar summaries (dim + L2 norm) so every output column is "
    "orderable; downstream users call operators.multimodal."
    "extract_features directly for the raw array<float> column.",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    feats = M.extract_features(M.synthetic_media(spark))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "payload_sha",
        F.size("feat").alias("feat_dim"),
        F.round(
            F.sqrt(F.aggregate("feat", F.lit(0.0), lambda s, x: s + x * x)), 6
        ).alias("feat_l2"),
        "decode_ok",
    )


@query(
    "media_dedup_content",
    oracle=None,  # operates on the synthetic media table, not lake parquet
    survey_ops="multimodal exact dedup — sha2 over binary column "
    "(beyond-reference)",
    doc="Exact multimodal dedup: JVM-side sha2(payload) groupBy — the "
    "binary bytes never enter Python; one shuffle on the uniform "
    "256-bit key.",
)
def media_dedup_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_dedup_by_content(M.synthetic_media(spark))


@query(
    "media_frame_sample",
    oracle=None,
    survey_ops="multimodal frame-sampling fan-out (UDTF-shaped, "
    "beyond-reference)",
    doc="Video frame-sampling plan: explode each video row into its "
    "1s-grid frame timestamps from metadata only — column pruning "
    "drops the binary payload from the scan entirely.",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.frame_sample_plan(M.synthetic_media(spark))


@query(
    "media_resize",
    oracle=None,  # binary pixel path stubbed (no image libs); rows-only
    survey_ops="multimodal resize plumbing — metadata-side target dims "
    "+ Arrow batch pixel stub (beyond-reference)",
    doc="Aspect-preserving resize into a 256px square: target "
    "dimensions are JVM-side metadata arithmetic (codegen'd, no "
    "Python); the pixel pass is the same mapInPandas plumbing as "
    "feature extraction with the decode/resize body stubbed. "
    "Images only; never upscales.",
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.resize_plan(M.synthetic_media(spark))
