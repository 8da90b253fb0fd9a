"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample
operators.

The Spark-side plumbing is real and tested: schemas, Arrow batch
shapes, partitioning, binary handling, the media<->span join. The
pixel/sample DECODE itself is stubbed: this container has no
image/audio libraries, so ``decode_image``/``decode_audio`` raise
NotImplementedError unless PIL/soundfile import, and the feature
extractor uses a clearly-marked deterministic fake (md5 of the bytes)
so every downstream stage is exercised end-to-end and oracle-checkable
in DuckDB.

Scale shape: media bytes are the heavy column. Operators here keep
them out of shuffles — features are computed in the scan stage
(mapInArrow over the binary column), and only the small (media_ref,
feature) output ever moves. The media<->span join broadcasts the span
side when it is the probe of a media-heavy table (or bucket-joins on
media_ref at equal size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")
FEATURE_DIM = 16
FPS = 4  # frame-sampling rate for the video schedule


# ---------------------------------------------------------------------------
# deterministic media synthesis (sandbox stand-in for a real media table)
# ---------------------------------------------------------------------------


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a media table from the corpus's picture spans: one row
    per picture media_ref with deterministic fake bytes and typed
    metadata. Pure Spark exprs — reproducible in SQL."""
    from ocr_spark.sources.synth import synthesize_spans

    spans = synthesize_spans(docs, nested=False)
    pics = spans.where(F.col("kind") == "picture").select("doc_id", "media_ref")
    h = F.md5(F.col("media_ref"))
    return pics.select(
        "doc_id",
        "media_ref",
        F.lit("image").alias("kind"),
        F.to_binary(F.concat(h, h), F.lit("hex")).alias("data"),  # 32 fake bytes
        F.struct(
            (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") + 16).alias("width"),
            (F.conv(F.substring(h, 3, 2), 16, 10).cast("int") + 16).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.lit("image/fake").alias("mime"),
        ).alias("meta"),
    )


def synthesize_media_sql(table: str = "documents") -> str:
    from ocr_spark.sources.synth import synth_spans_sql

    return f"""
      WITH spans AS ({synth_spans_sql(table)})
      SELECT doc_id, media_ref, 'image' AS kind,
             CAST(('0x' || substr(md5(media_ref), 1, 2)) AS INT) + 16 AS width,
             CAST(('0x' || substr(md5(media_ref), 3, 2)) AS INT) + 16 AS height
      FROM spans WHERE kind = 'picture'
    """


# ---------------------------------------------------------------------------
# decode stubs (the only non-real parts, clearly marked)
# ---------------------------------------------------------------------------


def decode_image(data: bytes):  # pragma: no cover - stub
    """STUB: real pixel decode requires PIL, absent in this container."""
    try:
        import io

        from PIL import Image  # type: ignore

        return Image.open(io.BytesIO(data))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment"
        ) from e


def decode_audio(data: bytes):  # pragma: no cover - stub
    """STUB: real audio decode requires soundfile/librosa."""
    raise NotImplementedError("audio decode not available in this environment")


# ---------------------------------------------------------------------------
# feature extraction over binary (mapInArrow; fake-but-deterministic)
# ---------------------------------------------------------------------------


def image_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_ref, features array<double>[dim]): Arrow-batched feature
    extraction over the binary column.

    The featurizer is the DETERMINISTIC FAKE standing in for a real
    CNN/CLIP embed: feature[j] = byte j of the blob / 255 (0 beyond the
    blob's length). It is computed as a true BATCH operation — the
    whole batch's bytes come out of the Arrow value buffer and one
    vectorized numpy gather builds the (n, dim) matrix; no per-row
    Python runs, exactly like the real replacement (a batched ONNX/
    torch session invoked once per Arrow batch)."""

    def featurize(batches):
        for b in batches:
            refs = b.column("media_ref")
            data = b.column("data")
            if data.null_count:
                data = pa.compute.fill_null(data, b"")
            data = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
            n = b.num_rows
            # flat value buffer + offsets: the batch's bytes, zero-copy.
            # Offset width follows the arrow type — large_binary (e.g.
            # spark.sql.execution.arrow.useLargeVarTypes=true) ships
            # int64 offsets, and misreading them as int32 would compute
            # silently wrong gather indices.
            off_dtype = np.int64 if pa.types.is_large_binary(data.type) else np.int32
            offs = np.frombuffer(data.buffers()[1], dtype=off_dtype)[
                data.offset : data.offset + n + 1
            ].astype(np.int64)
            buf = np.frombuffer(data.buffers()[2] or b"", dtype=np.uint8)
            lens = np.diff(offs)
            cols = np.arange(dim, dtype=np.int64)
            # clamp the gather inside each blob; zero past its end.
            # The final clip guards zero-length blobs at the END of the
            # value buffer: their offset equals len(buf) (no padding
            # slack guaranteed), and np.where evaluates the gather
            # eagerly even where `valid` is False.
            idx = offs[:-1, None] + np.minimum(cols, np.maximum(lens[:, None] - 1, 0))
            idx = np.minimum(idx, max(len(buf) - 1, 0))
            valid = cols < lens[:, None]
            out = np.where(valid, buf[idx] if len(buf) else 0, 0) / 255.0
            flat = pa.array(out.reshape(-1))
            feats = pa.FixedSizeListArray.from_arrays(flat, dim).cast(
                pa.list_(pa.float64())
            )
            yield pa.RecordBatch.from_arrays(
                [refs.cast(pa.string()), feats], names=["media_ref", "features"]
            )

    return media.select("media_ref", "data").mapInArrow(
        featurize, schema="media_ref string, features array<double>"
    )


def image_features_flat(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Oracle-friendly flat shape: (media_ref, j, feature)."""
    f = image_features(media, dim)
    return f.select("media_ref", F.posexplode("features").alias("j", "feature"))


def image_features_flat_sql(table: str = "documents", dim: int = FEATURE_DIM) -> str:
    """DuckDB twin of the fake featurizer: the synthesized blob is
    unhex(md5(ref) || md5(ref)), so byte j (j < 16) is the j-th hex
    pair of md5(media_ref) — computable from media_ref alone."""
    from ocr_spark.sources.synth import synth_spans_sql

    return f"""
      WITH spans AS ({synth_spans_sql(table)}),
      media AS (
        SELECT media_ref, md5(media_ref) AS h
        FROM spans WHERE kind = 'picture'
      )
      SELECT media_ref, CAST(r.i AS INT) AS j,
             CAST(CAST(('0x' || substr(h, (r.i % 16) * 2 + 1, 2)) AS INT) AS DOUBLE)
               / 255.0 AS feature
      FROM media CROSS JOIN range(0, {dim}) r(i)
    """


# ---------------------------------------------------------------------------
# resize plan + video frame sampling (pure Spark)
# ---------------------------------------------------------------------------


def resize_plan(media: DataFrame, max_side: int = 64) -> DataFrame:
    """(media_ref, width, height, out_width, out_height, scale):
    aspect-preserving resize arithmetic (the real resize would apply
    this inside the decode UDF)."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return media.select(
        "media_ref",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.floor(w * scale).cast("int").alias("out_width"),
        F.floor(h * scale).cast("int").alias("out_height"),
        scale.alias("scale"),
    )


def frame_schedule(media: DataFrame, fps: int = FPS) -> DataFrame:
    """(media_ref, frame_idx, ts_ms): deterministic frame-sampling
    schedule for video rows — the explode is the Spark-side work, the
    per-frame decode happens in the (stubbed) binary UDF."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "n_frames",
            F.greatest(
                (F.col("meta.duration_ms") * fps / 1000).cast("int"), F.lit(1)
            ),
        )
        .select(
            "media_ref",
            F.posexplode(F.expr("sequence(0, n_frames - 1)")).alias("frame_idx", "_"),
        )
        .select(
            "media_ref",
            "frame_idx",
            (F.col("frame_idx") * (1000 / fps)).cast("int").alias("ts_ms"),
        )
    )
