"""Multimodal plumbing: media synthesis, Arrow-batched feature
extraction (vs DuckDB oracle), resize arithmetic, frame sampling,
decode stubs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def media(spark, docs):
    return mm.synthesize_media(docs).cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


def test_media_table_shape(media):
    rows = media.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.kind == "image"
        assert len(r.data) == 32
        assert r.meta.width >= 16 and r.meta.height >= 16
        assert r.media_ref.startswith("img-")


def test_media_matches_oracle(media, con):
    got = sorted(
        (r.media_ref, r.meta.width, r.meta.height) for r in media.collect()
    )
    want = sorted(
        (ref, w, h)
        for ref, w, h in con.execute(
            "SELECT media_ref, width, height FROM ("
            + mm.synthesize_media_sql()
            + ")"
        ).fetchall()
    )
    assert got == want


def test_image_features_match_oracle(media, con):
    got = sorted(map(tuple, mm.image_features_flat(media).collect()))
    want = sorted(map(tuple, con.execute(mm.image_features_flat_sql()).fetchall()))
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == pytest.approx(w[2], abs=1e-15)


def test_features_shape_and_range(media):
    rows = mm.image_features(media).collect()
    for r in rows[:20]:
        assert len(r.features) == mm.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r.features)


def test_features_pad_short_and_null_blobs(spark):
    # blobs shorter than dim (or NULL) zero-pad — the vectorized gather
    # must not read past a blob's end or crash on empty batches
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["a", "b", "c"],
                "data": [bytes(range(4)), b"", None],
            }
        )
    )
    rows = {r.media_ref: r.features for r in mm.image_features(df).collect()}
    assert rows["a"][:4] == [0.0, 1 / 255.0, 2 / 255.0, 3 / 255.0]
    assert rows["a"][4:] == [0.0] * (mm.FEATURE_DIM - 4)
    assert rows["b"] == [0.0] * mm.FEATURE_DIM
    assert rows["c"] == [0.0] * mm.FEATURE_DIM
    # a TRAILING empty blob whose offset == len(value buffer) (total
    # bytes a multiple of 8 -> no Arrow padding slack) must not read
    # out of bounds in the vectorized gather
    df2 = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["x", "y"], "data": [bytes(range(8)), b""]})
    ).coalesce(1)
    rows2 = {r.media_ref: r.features for r in mm.image_features(df2).collect()}
    assert rows2["x"][:8] == [i / 255.0 for i in range(8)]
    assert rows2["y"] == [0.0] * mm.FEATURE_DIM


def test_resize_plan(media):
    rows = mm.resize_plan(media, max_side=64).collect()
    for r in rows:
        assert max(r.out_width, r.out_height) <= 64
        assert r.out_width >= 1 and r.out_height >= 1
        if max(r.width, r.height) <= 64:
            assert (r.out_width, r.out_height) == (r.width, r.height)


def test_frame_schedule(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["v1", "v2"],
                "kind": ["video", "video"],
                "duration_ms": [2000, 100],
            }
        )
    ).select(
        "media_ref",
        "kind",
        F.struct(
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.col("duration_ms").alias("duration_ms"),
            F.lit("video/fake").alias("mime"),
        ).alias("meta"),
    )
    rows = mm.frame_schedule(media, fps=4).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append((r.frame_idx, r.ts_ms))
    assert len(by_ref["v1"]) == 8  # 2s @ 4fps
    assert by_ref["v1"][0] == (0, 0) and by_ref["v1"][7] == (7, 1750)
    assert len(by_ref["v2"]) == 1  # min 1 frame


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"xx")
