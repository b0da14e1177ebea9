"""Multimodal plumbing: schema/batch shapes through mapInPandas are real;
the decode is a deterministic sha-based stub (no media libs in container)."""

import pyspark.sql.functions as F

from gobblin_spark.operators.multimodal import (
    extract_features,
    resize_stub,
    sample_frames,
    synth_media,
)


def _docs(spark, sf_dir, n=50):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)


def test_synth_media_shape_and_determinism(spark, sf_dir):
    media = synth_media(_docs(spark, sf_dir)).cache()
    assert set(media.columns) == {
        "doc_id", "media_type", "width", "height", "duration_ms", "payload"
    }
    row = media.orderBy("doc_id").first()
    assert len(row["payload"]) == 256  # 512 hex chars → 256 bytes
    again = synth_media(_docs(spark, sf_dir)).orderBy("doc_id").first()
    assert row == again


def test_extract_features_dims_and_range(spark, sf_dir):
    feats = extract_features(synth_media(_docs(spark, sf_dir)), feat_dim=16)
    pdf = feats.toPandas()
    assert (pdf["feat_dim"] == 16).all()
    assert pdf["decode_ok"].all()
    assert pdf["features"].map(len).eq(16).all()
    assert pdf["features"].map(lambda v: all(0.0 <= x < 1.0 for x in v)).all()


def test_sample_frames_count_formula(spark, sf_dir):
    media = synth_media(_docs(spark, sf_dir, 200)).cache()
    frames = sample_frames(media, every_ms=1000, max_frames=16)
    per_doc = frames.groupBy("doc_id").count()
    joined = media.filter(F.col("media_type") == "video/mp4").join(
        per_doc, "doc_id")
    bad = joined.filter(
        F.col("count")
        != F.least((F.col("duration_ms") / 1000).cast("int") + 1, F.lit(16))
    )
    assert bad.count() == 0
    # non-video rows produce no frames
    assert frames.join(
        media.filter(F.col("media_type") != "video/mp4"), "doc_id"
    ).count() == 0


def test_resize_stub_preserves_schema(spark, sf_dir):
    media = synth_media(_docs(spark, sf_dir))
    out = resize_stub(media, 224, 224)
    # same columns and types (nullability flags differ through mapInPandas)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    pdf = out.limit(5).toPandas()
    assert (pdf["width"] == 224).all() and (pdf["height"] == 224).all()
    assert pdf["payload"].map(len).eq(64).all()  # sha256 x2 stub
