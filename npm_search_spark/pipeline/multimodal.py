"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
Arrow-batched UDFs, batch shapes; the codec step is a clearly marked stub
(the container has no image/audio libs) with a deterministic fake so
pipelines are end-to-end runnable. Swap `_decode_*_real` for actual
decoders (PIL / soundfile / pyav) in production.

Media rows pattern the reference's file-list media spans (SURVEY.md §1.1):
each document's media spans become one media row per asset.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("size_bytes", T.LongType()),
                    T.StructField("content_hash", T.StringType()),
                ]
            ),
        ),
    ]
)

_EXT_TO_TYPE = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image", "svg": "image",
    "mp3": "audio", "wav": "audio", "ogg": "audio",
    "mp4": "video", "webm": "video", "mov": "video",
}


def media_rows_from_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one media row per media span; payload is
    a deterministic synthetic blob (hash-expanded from the ref) standing in
    for fetched bytes."""
    ext = F.lower(F.element_at(F.split(F.col("span.text"), r"\."), -1))
    type_map = F.create_map(*[F.lit(x) for kv in _EXT_TO_TYPE.items() for x in kv])
    rows = (
        documents.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.coalesce(type_map[ext], F.lit("image")).alias("media_type"),
            # synthetic payload: sha2 of the ref repeated — deterministic bytes
            F.to_binary(
                F.repeat(F.sha2(F.col("span.media_ref"), 256), 4), F.lit("hex")
            ).alias("payload"),
        )
        .withColumn(
            "meta",
            F.struct(
                F.length(F.col("payload")).cast("long").alias("size_bytes"),
                F.md5(F.col("payload").cast("string")).alias("content_hash"),
            ),
        )
    )
    return rows


def _decode_image_real(payload: bytes):
    raise NotImplementedError(
        "real image decode requires PIL/pillow, not present in this "
        "container — the deterministic fake below keeps the pipeline "
        "runnable and the plumbing tested"
    )


def _fake_decode(payload: bytes, media_type: str) -> dict:
    # deterministic fake keyed on the payload's hex form: md5(hex(payload))
    # is expressible in ANSI SQL (DuckDB md5 takes VARCHAR, not BLOB), so
    # the decode query carries a real oracle twin while the UDF still
    # consumes the binary column through Arrow
    h = hashlib.md5((payload or b"").hex().encode()).digest()
    if media_type == "image":
        return {"width": 64 + h[0], "height": 64 + h[1], "channels": 3, "n_frames": 1, "duration_s": 0.0}
    if media_type == "audio":
        return {"width": 0, "height": 0, "channels": 1 + h[0] % 2, "n_frames": 0, "duration_s": float(h[1]) / 4}
    return {"width": 320, "height": 240, "channels": 3, "n_frames": 24 + h[0], "duration_s": float(h[0]) / 2}


def decode_media(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract. Narrow map — partitioning of
    the input is preserved; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    out_schema = (
        "doc_id string, media_ref string, media_type string, "
        "width int, height int, channels int, n_frames int, duration_s double, "
        "feature array<float>"
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            metas, feats = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if use_real_codecs:
                    m = _decode_image_real(payload)  # pragma: no cover
                else:
                    m = _fake_decode(payload, mtype)
                metas.append(m)
                # deterministic 8-dim "feature": bytes of md5, scaled
                # (same hex-form basis as _fake_decode)
                h = hashlib.md5((payload or b"").hex().encode()).digest()
                feats.append((np.frombuffer(h[:8], dtype=np.uint8) / 255.0).astype("float32"))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "duration_s": [m["duration_s"] for m in metas],
                    "feature": feats,
                }
            )
            yield out

    return media.mapInPandas(run, schema=out_schema)


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index — pure
    column exprs (sequence + explode); the actual pixel fetch would live in
    a decode UDF keyed by (media_ref, frame_idx)."""
    return (
        decoded.where(F.col("media_type") == "video")
        .select(
            "doc_id",
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
