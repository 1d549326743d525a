"""Multimodal column plumbing (beyond-reference surface).

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata structs; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages.
The decode step itself is STUBBED in this container (no image/audio
libs — see ``_decode_image_batch``); everything Spark-side — schema,
batch shape, partitioning, UDF signatures — is real and tested.

Scale notes: binary payloads dominate partition size, so the operators
repartition by a content-hash bucket before any wide stage and keep
per-batch row counts low (``spark.sql.execution.arrow.maxRecordsPerBatch``
governs Arrow chunking). Metadata-only plans never touch the bytes —
column pruning drops the binary column at the scan."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_sha string, "
    "feat array<float>, decode_ok boolean"
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded random
    bytes; metadata plausible per kind."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import (
        ensure_workers_can_import,
    )

    ensure_workers_can_import(spark)
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.integers(0, 512)))
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": int(rng.integers(16, 512)) if kind != "audio" else None,
            "height": int(rng.integers(16, 512)) if kind != "audio" else None,
            "duration_ms": int(rng.integers(1000, 60000)) if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def _decode_image_batch(payloads: pd.Series) -> pd.Series:
    """STUB decode: real deployments plug PIL/libvips here. This
    container has no image libs, so we derive a deterministic fake
    'decoded' feature from the bytes themselves — the Spark plumbing
    (Arrow batches in, vector column out) is exactly what a real
    decoder uses."""
    def fake(b: bytes | None):
        if b is None or len(b) == 0:
            return None
        arr = np.frombuffer(b[:64], dtype=np.uint8).astype(np.float32)
        return (arr / 255.0).tolist()

    return payloads.map(fake)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: one Arrow
    batch per iteration, bytes never round-trip through Python row by
    row. Returns a compact feature table (binary column dropped)."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feat": feats,
                    "decode_ok": feats.notna(),
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def media_dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact multimodal dedup: group on sha256 of the payload —
    JVM-side F.sha2 over the binary column, no Python."""
    return (
        media.select("media_id", "kind", F.sha2("payload", 256).alias("payload_sha"))
        .groupBy("payload_sha", "kind")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("media_id").alias("canonical_id"),
        )
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode each video row into the
    frame timestamps a decoder would extract (the decode itself is the
    stub above). Demonstrates the UDTF-shaped fan-out with metadata
    only — the binary column is pruned from this plan entirely."""
    # greatest(…, 0): sequence with a positive step THROWS when stop <
    # start, so a corrupt negative duration_ms must clamp to a single
    # frame at t=0 rather than kill the scan (the sequence-bounds
    # discipline from the rolling-hash guard).
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def resize_plan(
    media: DataFrame, max_side: int = 256
) -> DataFrame:
    """Image-resize plumbing: target dimensions are pure metadata
    arithmetic (JVM-side, codegen'd — aspect-ratio-preserving fit into
    a ``max_side`` square, never upscaled), and the pixel work is an
    Arrow batch stub exactly like the decode step: a real backend
    (PIL/libvips) replaces ``_resize_batch``'s body, nothing else
    changes. Images only — non-image rows are EXCLUDED from the output
    (resize is undefined for audio; video resize happens per frame
    after frame sampling), matching the catalog entry's contract."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    sized = media.filter(F.col("kind") == "image").select(
        "media_id",
        "kind",
        "payload",
        F.col("meta.width").alias("src_width"),
        F.col("meta.height").alias("src_height"),
        F.greatest(F.floor(F.col("meta.width") * scale), F.lit(1))
        .cast("int")
        .alias("dst_width"),
        F.greatest(F.floor(F.col("meta.height") * scale), F.lit(1))
        .cast("int")
        .alias("dst_height"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "src_width": pdf["src_width"],
                    "src_height": pdf["src_height"],
                    "dst_width": pdf["dst_width"],
                    "dst_height": pdf["dst_height"],
                    # STUB pixel path (no image libs in this container):
                    # a real backend decodes payload, resizes to
                    # (dst_width, dst_height), re-encodes. The stub
                    # emits a deterministic payload-sized marker so the
                    # batch shape and schema are the production ones.
                    "resized_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "resized_ok": pdf["payload"].notna(),
                }
            )

    return sized.mapInPandas(
        op,
        "media_id long, kind string, src_width int, src_height int, "
        "dst_width int, dst_height int, resized_bytes long, resized_ok boolean",
    )
