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
    """Real decode path for compressed codecs — requires codec libs not
    present in this container. Kept as the documented integration point.
    Uncompressed container formats (PPM images, PCM WAV audio) decode
    with no external libs at all — see `decode_ppm` / `decode_wav`,
    which the feature-extract query uses for REAL decoding."""
    if modality == "image":
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no codec libs here
            raise NotImplementedError(
                "compressed image decode requires Pillow; not available here"
            ) from exc
    if modality == "audio" and payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(f"no decoder wired for modality {modality!r}")


# ------------------------------------------------- real numpy-only codecs
#
# PPM (P6) and PCM WAV are uncompressed formats whose decode is pure
# byte-layout parsing — implementable with numpy alone, no codec libs.
# The synthetic asset table ENCODES deterministic media from each doc's
# text bytes and the feature pass DECODES them for real: the full
# encode→binary column→Arrow batch→decode→feature path is genuinely
# exercised, leaving only compressed codecs (JPEG/MP3/H.264) stubbed.


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Raises ValueError on a
    malformed header, like any real decoder."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    maxval, data = int(parts[2]), parts[3]
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return np.frombuffer(data[: h * w * 3], dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → PCM WAV bytes (RIFF header + data chunk)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 samples, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = struct.unpack("<I", payload[24:28])[0]
    n = struct.unpack("<I", payload[40:44])[0]
    return np.frombuffer(payload[44 : 44 + n], dtype="<i2"), rate


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
    # Features come out as N_FEATURES scalar double columns (f0..f7), not
    # one array<double> column: scalar columns keep the result hashable by
    # plain pandas tooling and prunable/filterable column-by-column.
    for pdf in batches:
        feats = fake_decode_features(pdf["payload"].to_numpy())
        feats = np.floor(feats * 1e6 + 0.5) / 1e6
        out = {
            "asset_id": pdf["asset_id"].astype("int64"),
            "modality": pdf["modality"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
        }
        for j in range(N_FEATURES):
            out[f"f{j}"] = feats[:, j]
        yield pd.DataFrame(out)


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


_IMG_W, _IMG_H = 8, 8  # synthetic image dims: 8×8 RGB = 192 payload bytes


def _text_to_media(text: str, modality: str) -> bytes:
    """Deterministic media encoder: doc text bytes → a REAL container
    payload (P6 PPM for images, PCM WAV for audio; video stays an opaque
    byte blob — its compressed codecs are the documented stub)."""
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if modality == "image":
        need = _IMG_W * _IMG_H * 3
        px = np.resize(raw if raw.size else np.zeros(1, np.uint8), need)
        return encode_ppm(px.reshape(_IMG_H, _IMG_W, 3))
    if modality == "audio":
        samples = (
            raw.astype(np.int16) - 128 if raw.size else np.zeros(1, np.int16)
        ) * 256
        return encode_wav(samples)
    return raw.tobytes()


def media_asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset table whose image/audio payloads are REAL encoded media
    (decodable PPM/WAV), built with one Arrow-batched encode pass."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            modality = [MODALITIES[int(d) % 3] for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].astype("int64"),
                    "modality": modality,
                    "payload": [
                        _text_to_media(t, m) for t, m in zip(pdf["text"], modality)
                    ],
                }
            )

    return docs.mapInPandas(
        encode, schema="asset_id long, modality string, payload binary"
    )


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "asset_id": pdf["asset_id"].astype("int64"),
            "modality": pdf["modality"],
            "decoded": [],
            "width": [],
            "height": [],
            "n_samples": [],
            "mean_level": [],
        }
        for payload, modality in zip(pdf["payload"], pdf["modality"]):
            try:
                if modality == "image":
                    px = decode_ppm(bytes(payload))
                    out["decoded"].append(True)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["n_samples"].append(px.size)
                    out["mean_level"].append(float(px.mean()))
                elif modality == "audio":
                    samples, _rate = decode_wav(bytes(payload))
                    out["decoded"].append(True)
                    out["width"].append(0)
                    out["height"].append(0)
                    out["n_samples"].append(len(samples))
                    out["mean_level"].append(
                        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    )
                else:  # video: compressed-codec stub — no decode claimed
                    out["decoded"].append(False)
                    out["width"].append(0)
                    out["height"].append(0)
                    out["n_samples"].append(len(payload))
                    out["mean_level"].append(0.0)
            except ValueError:
                out["decoded"].append(False)
                out["width"].append(0)
                out["height"].append(0)
                out["n_samples"].append(0)
                out["mean_level"].append(0.0)
        pdf_out = pd.DataFrame(out)
        pdf_out["mean_level"] = np.floor(pdf_out["mean_level"] * 1e6 + 0.5) / 1e6
        yield pdf_out


@register(
    "multimodal_decode_features",
    # Full value oracle: the PPM/WAV codecs are deterministic byte
    # arithmetic, so DuckDB can recompute every decoded feature straight
    # from the source text bytes (hex-digit expansion): image mean = mean
    # of the 192 np.resize-cycled bytes, audio RMS = sqrt(mean(((b-128)
    # *256)²)), video = undecoded byte length. All sums are exact
    # integers < 2^53 → IEEE-identical across engines.
    oracle="""
    WITH base AS (
      SELECT doc_id AS asset_id, CAST(doc_id % 3 AS INT) AS m,
             lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    ),
    img_pos AS (
      SELECT asset_id, nb, hx, unnest(generate_series(0, 191)) AS i
      FROM base WHERE m = 0 AND nb > 0
    ),
    img_bytes AS (
      SELECT asset_id,
             (strpos('0123456789abcdef', substr(hx, 2*(CASE WHEN nb >= 192 THEN i ELSE i % nb END)+1, 1)) - 1)*16
           + (strpos('0123456789abcdef', substr(hx, 2*(CASE WHEN nb >= 192 THEN i ELSE i % nb END)+2, 1)) - 1) AS b
      FROM img_pos
    ),
    img_stats AS (
      SELECT asset_id, CAST(sum(b) AS DOUBLE) / 192 AS mean_level
      FROM img_bytes GROUP BY asset_id
    ),
    aud_pos AS (
      SELECT asset_id, nb, hx, unnest(generate_series(0, nb - 1)) AS i
      FROM base WHERE m = 1 AND nb > 0
    ),
    aud_bytes AS (
      SELECT asset_id, nb,
             (strpos('0123456789abcdef', substr(hx, 2*i+1, 1)) - 1)*16
           + (strpos('0123456789abcdef', substr(hx, 2*i+2, 1)) - 1) AS b
      FROM aud_pos
    ),
    aud_stats AS (
      SELECT asset_id,
             sqrt(CAST(sum(CAST((b - 128)*256 AS BIGINT) * CAST((b - 128)*256 AS BIGINT)) AS DOUBLE) / nb) AS rms
      FROM aud_bytes GROUP BY asset_id, nb
    )
    SELECT b.asset_id,
           CASE b.m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           b.m <= 1 AS decoded,
           CAST(CASE WHEN b.m = 0 THEN 8 ELSE 0 END AS INT) AS width,
           CAST(CASE WHEN b.m = 0 THEN 8 ELSE 0 END AS INT) AS height,
           CAST(CASE b.m WHEN 0 THEN 192 WHEN 1 THEN greatest(b.nb, 1) ELSE b.nb END AS BIGINT) AS n_samples,
           floor((CASE b.m WHEN 0 THEN coalesce(i.mean_level, 0.0)
                           WHEN 1 THEN coalesce(a.rms, 0.0) ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS mean_level
    FROM base b
    LEFT JOIN img_stats i USING (asset_id)
    LEFT JOIN aud_stats a USING (asset_id)
    ORDER BY b.asset_id LIMIT 500
    """,
    doc="REAL decode→feature pipeline: text bytes are encoded into "
    "genuine media containers (P6 PPM images, PCM WAV audio — pure "
    "numpy codecs, no external libs), stored as binary payload columns, "
    "then DECODED back in an Arrow-batched mapInPandas pass that "
    "extracts per-modality features (dims + mean level for images, "
    "sample count + RMS for audio). Video stays the documented "
    "compressed-codec stub. Map-only plan: zero shuffles.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = media_asset_table(spark, sf_dir)
    out = assets.mapInPandas(
        _decode_features,
        schema=(
            "asset_id long, modality string, decoded boolean, width int, "
            "height int, n_samples long, mean_level double"
        ),
    )
    return out.orderBy("asset_id").limit(500)


@register(
    "multimodal_feature_extract",
    # The stub features are a deterministic 8-bin byte histogram, so a
    # full value oracle is possible: expand each payload's bytes via hex
    # digits and recompute the same histogram + rounding in SQL.
    oracle="""
    WITH assets AS (
      SELECT doc_id AS asset_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    positions AS (
      SELECT asset_id, hx, unnest(generate_series(1, n_bytes)) AS i FROM assets
    ),
    byte_vals AS (
      SELECT asset_id,
             ((strpos('0123456789abcdef', substr(hx, 2*i-1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)) // 32 AS bin
      FROM positions
    ),
    hist AS (
      SELECT asset_id, count(*) AS n,
             count(*) FILTER (WHERE bin = 0) AS c0,
             count(*) FILTER (WHERE bin = 1) AS c1,
             count(*) FILTER (WHERE bin = 2) AS c2,
             count(*) FILTER (WHERE bin = 3) AS c3,
             count(*) FILTER (WHERE bin = 4) AS c4,
             count(*) FILTER (WHERE bin = 5) AS c5,
             count(*) FILTER (WHERE bin = 6) AS c6,
             count(*) FILTER (WHERE bin = 7) AS c7
      FROM byte_vals GROUP BY asset_id
    )
    SELECT a.asset_id, a.modality, CAST(a.n_bytes AS BIGINT) AS n_bytes,
           coalesce(floor(c0 / n * 1e6 + 0.5) / 1e6, 0.0) AS f0,
           coalesce(floor(c1 / n * 1e6 + 0.5) / 1e6, 0.0) AS f1,
           coalesce(floor(c2 / n * 1e6 + 0.5) / 1e6, 0.0) AS f2,
           coalesce(floor(c3 / n * 1e6 + 0.5) / 1e6, 0.0) AS f3,
           coalesce(floor(c4 / n * 1e6 + 0.5) / 1e6, 0.0) AS f4,
           coalesce(floor(c5 / n * 1e6 + 0.5) / 1e6, 0.0) AS f5,
           coalesce(floor(c6 / n * 1e6 + 0.5) / 1e6, 0.0) AS f6,
           coalesce(floor(c7 / n * 1e6 + 0.5) / 1e6, 0.0) AS f7
    FROM assets a LEFT JOIN hist h USING (asset_id)
    ORDER BY asset_id LIMIT 500
    """,
    doc="Arrow-batched decode→feature pipeline over binary payloads via "
    "mapInPandas (map-only plan, no shuffle); decode itself is a "
    "documented deterministic stub (no codec libs in this container). "
    "Features land as scalar double columns f0..f7 (not array<double>) "
    "so downstream tools can sort/hash/prune them column-wise.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = asset_table(spark, sf_dir).select("asset_id", "modality", "payload")
    feat_cols = ", ".join(f"f{j} double" for j in range(N_FEATURES))
    out = assets.mapInPandas(
        _extract,
        schema=f"asset_id long, modality string, n_bytes long, {feat_cols}",
    )
    return out.orderBy("asset_id").limit(500)


# ------------------------------------------------- video frame sampling

FRAME_BYTES = 48  # stand-in fixed-size raw frame (no video codecs here)
FRAME_STEP = 4  # keep every 4th frame
_FRAME_HEX = FRAME_BYTES * 2


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id AS asset_id,
               hex(encode(text)) AS hx,
               CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS nf
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) > 0
    )
    SELECT asset_id,
           nf AS n_frames,
           CAST(len(generate_series(0, nf - 1, {FRAME_STEP})) AS INT) AS n_sampled,
           md5(array_to_string(
               list_transform(generate_series(0, nf - 1, {FRAME_STEP}),
                              i -> substring(hx, i * {_FRAME_HEX} + 1, {_FRAME_HEX})),
               '')) AS sample_digest
    FROM vids
    ORDER BY asset_id
    LIMIT 500
    """,
    doc="Video frame sampling (the decode-free plumbing of a real "
    "frame-sampler): video payloads are treated as sequences of "
    "fixed-size raw frames (48-byte blocks — no video codecs ship in "
    "this container, so the block layout stands in for decoded "
    "frames); every 4th frame is selected with pure built-in "
    "hex/substring arithmetic and digested. Map-only plan, zero "
    "shuffle, modality filter prunes non-video assets before any "
    "bytes are touched — exactly how a real frame-sample pass over "
    "100 TB of video would be shaped (codec decode slots into the "
    "mapInPandas kernel of multimodal_decode_features).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    vids = (
        asset_table(spark, sf_dir)
        .filter((F.col("modality") == "video") & (F.octet_length("payload") > 0))
        .select(
            "asset_id",
            F.hex("payload").alias("hx"),
            F.ceil(F.octet_length("payload") / F.lit(float(FRAME_BYTES)))
            .cast("bigint")
            .alias("nf"),
        )
    )
    sampled = F.expr(
        f"transform(sequence(0, nf - 1, {FRAME_STEP}), "
        f"i -> substring(hx, i * {_FRAME_HEX} + 1, {_FRAME_HEX}))"
    )
    return (
        vids.select(
            "asset_id",
            F.col("nf").alias("n_frames"),
            F.size(sampled).cast("int").alias("n_sampled"),
            F.md5(F.array_join(sampled, "")).alias("sample_digest"),
        )
        .orderBy("asset_id")
        .limit(500)
    )


# --------------------------------------------- audio signal features


def _audio_signal_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"asset_id": [], "n_samples": [], "zcr": [], "roughness": []}
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            samples, _rate = decode_wav(bytes(payload))
            s = samples.astype(np.int64)
            rows["asset_id"].append(int(asset_id))
            rows["n_samples"].append(len(s))
            if len(s) <= 1:
                rows["zcr"].append(0.0)
                rows["roughness"].append(0.0)
            else:
                nonneg = s >= 0
                crossings = int(np.sum(nonneg[1:] != nonneg[:-1]))
                rows["zcr"].append(crossings / (len(s) - 1))
                rows["roughness"].append(
                    float(np.sum(np.abs(np.diff(s)))) / (len(s) - 1)
                )
        out = pd.DataFrame(rows)
        for c in ("zcr", "roughness"):
            out[c] = np.floor(out[c] * 1e6 + 0.5) / 1e6
        yield out


@register(
    "multimodal_audio_zcr",
    oracle="""
    WITH base AS (
      SELECT doc_id AS asset_id,
             lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents WHERE doc_id % 3 = 1
    ),
    pos AS (
      SELECT asset_id, nb, hx, unnest(generate_series(0, nb - 1)) AS i
      FROM base WHERE nb > 0
    ),
    samples AS (
      SELECT asset_id, nb, i,
             ((strpos('0123456789abcdef', substr(hx, 2*i+1, 1)) - 1)*16
            + (strpos('0123456789abcdef', substr(hx, 2*i+2, 1)) - 1) - 128) * 256 AS s
      FROM pos
    ),
    lagged AS (
      SELECT asset_id, nb, s,
             lag(s) OVER (PARTITION BY asset_id ORDER BY i) AS prev_s
      FROM samples
    ),
    feats AS (
      SELECT asset_id, nb,
             sum(CASE WHEN prev_s IS NOT NULL
                       AND ((s >= 0) <> (prev_s >= 0)) THEN 1 ELSE 0 END) AS crossings,
             sum(CASE WHEN prev_s IS NULL THEN 0 ELSE abs(s - prev_s) END) AS absdiff
      FROM lagged GROUP BY asset_id, nb
    )
    SELECT b.asset_id,
           CAST(greatest(b.nb, 1) AS BIGINT) AS n_samples,
           CASE WHEN b.nb <= 1 THEN 0.0 ELSE
             coalesce(floor(CAST(f.crossings AS DOUBLE) / (b.nb - 1) * 1e6 + 0.5) / 1e6, 0.0) END AS zcr,
           CASE WHEN b.nb <= 1 THEN 0.0 ELSE
             coalesce(floor(CAST(f.absdiff AS DOUBLE) / (b.nb - 1) * 1e6 + 0.5) / 1e6, 0.0) END AS roughness
    FROM base b LEFT JOIN feats f USING (asset_id)
    ORDER BY b.asset_id
    """,
    doc="Audio signal features over REAL decoded WAV payloads: "
    "zero-crossing rate (sign flips between consecutive samples, "
    "s≥0 convention) and roughness (mean |Δsample|) per asset, "
    "computed in one Arrow-batched mapInPandas decode pass — "
    "map-only, modality-pruned to the audio third of the asset "
    "table. The PCM samples are a closed form of the source text "
    "bytes, so the oracle recomputes both features via hex "
    "expansion + a doc-bounded lag window: exact integer counts ⇒ "
    "hash-green DSP.",
)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = media_asset_table(spark, sf_dir).filter(F.col("modality") == "audio")
    out = assets.mapInPandas(
        _audio_signal_features,
        schema="asset_id long, n_samples long, zcr double, roughness double",
    )
    return out.orderBy("asset_id")
