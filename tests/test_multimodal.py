"""Multimodal plumbing tests: binary payload schema, Arrow round trip,
stub gating, frame-sampling explosion shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.operators.multimodal import (
    attach_payloads,
    decode_features,
    sample_frames,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    return attach_payloads(load_table(spark, SF_SMALL, "documents"))


def test_payload_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["media"].startswith("struct<kind:string,width:int")


def test_fake_decode_roundtrip(spark, media):
    """Features computed through Arrow batches equal driver-side
    recomputation from the source text."""
    feats = {r.doc_id: r for r in decode_features(media).collect()}
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    for r in docs[:50]:
        b = r.text.encode("utf-8")
        assert feats[r.doc_id].n_bytes == len(b)
        assert feats[r.doc_id].first_byte == b[0]
        assert feats[r.doc_id].decode_backend == "fake"


def test_real_backend_is_gated(media):
    """The real-codec path is a clearly-marked stub in this container."""
    with pytest.raises(Exception) as ei:
        decode_features(media, backend="pil").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling_shape(spark, media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=3)
    pdf = frames.toPandas()
    # only video payloads explode into frames
    video_ids = set(
        r.doc_id
        for r in media.filter(F.col("media.kind") == "video").select("doc_id").collect()
    )
    assert set(pdf.doc_id) <= video_ids
    assert pdf.frame_no.max() <= 2
    assert (pdf.frame_bytes.str.len() <= 64).all()
    # every frame slice matches the source payload bytes
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in media.filter(F.col("media.kind") == "video").collect()
    }
    for _, row in pdf.head(20).iterrows():
        start = row.frame_no * 64
        assert bytes(row.frame_bytes) == payloads[row.doc_id][start : start + 64]


def test_resize_stub_shape(spark, media):
    from dataextractor_spark.operators.multimodal import resize_images

    out = resize_images(media, target_w=64, target_h=48).toPandas()
    image_ids = {
        r.doc_id
        for r in media.filter(F.col("media.kind") == "image").select("doc_id").collect()
    }
    assert set(out.doc_id) == image_ids
    assert (out.width == 64).all() and (out.height == 48).all()
    # area ratio 64*48 / 640*480 = 1/100 → payloads shrink
    full = {r.doc_id: len(r.payload) for r in media.collect()}
    assert all(len(p) <= max(1, full[d] // 50) for d, p in zip(out.doc_id, out.payload))
