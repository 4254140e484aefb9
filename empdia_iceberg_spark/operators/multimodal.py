"""Multimodal column plumbing (driver north star; SURVEY.md §2.B).

Design: media assets are opaque ``binary`` payload columns with a typed
metadata struct alongside — the lakehouse-native layout (payload stays
columnar-compressed in parquet; metadata is prunable/filterable without
touching bytes). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the bytes cross the JVM↔Python boundary once per
batch, never per row.

The container ships no image/audio codecs, so the decode step is a
clearly marked STUB (`decode_media` raises NotImplementedError for real
codecs; the registered query uses `fake_decode_features`, a
deterministic byte-histogram "feature" so the full Spark plumbing —
schema, batching, partitioning — is real and testable). The synthetic
asset table is derived from `documents` (payload = UTF-8 bytes of the
text, modality assigned round-robin) so every scale factor has one.

At 100 TB: payloads dominate bytes — the asset table should be
partitioned by modality (partition pruning per decoder) and the feature
pass is embarrassingly parallel with no shuffle at all (map-only plan).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

MODALITIES = ("image", "audio", "video")
N_FEATURES = 8


def asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic multimodal asset table:
    (asset_id, modality, payload BINARY, meta STRUCT<width,height,duration_ms,n_bytes>)."""
    docs = load(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    n_bytes = F.octet_length("text")
    meta = F.struct(
        (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        (n_bytes * 20).cast("bigint").alias("duration_ms"),
        n_bytes.cast("bigint").alias("n_bytes"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


def decode_media(payload: bytes, modality: str):
    """Real decode path — requires codec libs not present in this
    container. Kept as the documented integration point."""
    if modality == "image":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no codec libs here
            raise NotImplementedError(
                "image decode requires Pillow; not available in this environment"
            ) from exc
    raise NotImplementedError(f"no decoder wired for modality {modality!r}")


def fake_decode_features(payload: np.ndarray) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: an 8-bin byte
    histogram, L1-normalized. Exercises the real batch shape (bytes in,
    fixed-width float vector out)."""
    out = np.zeros((len(payload), N_FEATURES), dtype=np.float64)
    for i, buf in enumerate(payload):
        arr = np.frombuffer(buf, dtype=np.uint8)
        if arr.size:
            hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
            out[i] = hist / arr.size
    return out


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = fake_decode_features(pdf["payload"].to_numpy())
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"].astype("int64"),
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": list(feats),
            }
        )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           count(*)                                  AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           CAST(min(doc_id % 640 + 64) AS INT)       AS min_width
    FROM documents
    GROUP BY 1
    ORDER BY modality
    """,
    doc="Typed-metadata scan over binary media payloads: per-modality "
    "byte totals without decoding (metadata-only pruning path).",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = asset_table(spark, sf_dir)
    return (
        assets.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
            F.max(F.octet_length("payload")).cast("bigint").alias("max_bytes"),
            F.min("meta.width").cast("int").alias("min_width"),
        )
        .orderBy("modality")
    )


@register(
    "multimodal_feature_extract",
    oracle=None,  # stubbed decode (numpy histogram) — rows-only; the
    # deterministic feature values are unit-tested instead.
    doc="Arrow-batched decode→feature pipeline over binary payloads via "
    "mapInPandas (map-only plan, no shuffle); decode itself is a "
    "documented deterministic stub (no codec libs in this container).",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = asset_table(spark, sf_dir).select("asset_id", "modality", "payload")
    out = assets.mapInPandas(
        _extract,
        schema="asset_id long, modality string, n_bytes long, feature array<double>",
    )
    return out.orderBy("asset_id").limit(500)
