"""Multimodal tests: binary payload schema, Arrow round trip, stub
gating, and the REAL pure-Python codecs (BMP raster roundtrip +
nearest-neighbor resize, WAV RIFF parse + PCM framing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.operators.multimodal import (
    BMP_H,
    BMP_W,
    _decode_bmp,
    _decode_wav,
    _encode_bmp,
    _encode_wav,
    _media_n_samples,
    attach_payloads,
    decode_features,
    encode_media,
    resize_images,
    sample_frames,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    return attach_payloads(load_table(spark, SF_SMALL, "documents"))


@pytest.fixture(scope="module")
def real_media(spark):
    return encode_media(load_table(spark, SF_SMALL, "documents"))


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


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="Pillow installed — gate n/a")
def test_real_backend_is_gated(media):
    """Without Pillow the pil backend must fail loudly up front, not
    silently fall back or die mid-scan."""
    with pytest.raises(Exception) as ei:
        decode_features(media, backend="pil").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_pil_backend_decodes_real_raster(real_media):
    """Where Pillow IS installed, backend='pil' really decodes: image
    features come from the decoded RGB raster (PIL's BMP decoder vs
    our pure-Python one must agree), non-image payloads fall back to
    raw-byte features. importorskip'd in containers without Pillow."""
    pytest.importorskip("PIL")
    feats = {
        r.doc_id: r
        for r in decode_features(real_media, backend="pil").collect()
    }
    for r in real_media.collect():
        f = feats[r.doc_id]
        assert f.decode_backend == "pil"
        if r.media.kind == "image":
            w, h, rows = _decode_bmp(bytes(r.payload))
            assert f.n_bytes == w * h * 3
            # PIL raster is RGB; BMP stores BGR → first raster byte is
            # the top-left pixel's red channel
            assert f.first_byte == rows[0][2]
        else:
            assert f.n_bytes == len(r.payload)


# --- pure-codec unit coverage (no Spark) ------------------------------


def test_bmp_codec_roundtrip():
    rows = [bytes((x + y) % 256 for x in range(7 * 3)) for y in range(5)]
    payload = _encode_bmp(rows, 7, 5)
    w, h, out = _decode_bmp(payload)
    assert (w, h) == (7, 5)
    assert out == rows
    # width 7 → 21 raster bytes padded to 24 per row
    assert len(payload) == 54 + 5 * 24


def test_wav_codec_roundtrip():
    samples = [(-1) ** i * (i * 321 % 32768) for i in range(300)]
    rate, data = _decode_wav(_encode_wav(samples, rate=8000))
    assert rate == 8000
    import struct

    assert list(struct.unpack("<300h", data)) == samples


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        _decode_bmp(b"PNG...")


def test_png_codec_roundtrip_all_filters():
    from dataextractor_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    # non-constant rows so Sub/Average/Paeth predictions are nontrivial
    rows = [
        bytes((x * 7 + y * 13) % 256 for x in range(11 * 3))
        for y in range(9)
    ]
    for ft in range(5):  # each single filter type end-to-end
        payload = _encode_png(rows, 11, 9, lambda y: ft)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert _decode_png(payload) == (11, 9, rows)
    # mixed filters (the query's cycling plan)
    assert _decode_png(_encode_png(rows, 11, 9)) == (11, 9, rows)


def test_png_decode_rejects_corruption():
    from dataextractor_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    rows = [bytes((x + y) % 256 for x in range(4 * 3)) for y in range(3)]
    payload = bytearray(_encode_png(rows, 4, 3))
    with pytest.raises(ValueError):
        _decode_png(b"not a png at all")
    # flip one IDAT byte → CRC check must catch it
    payload[len(payload) - 20] ^= 0xFF
    with pytest.raises(ValueError):
        _decode_png(bytes(payload))


# --- real media through Spark -----------------------------------------


def test_encode_media_payloads_parse(real_media):
    """Every synthesized payload is a well-formed container."""
    for r in real_media.collect()[:60]:
        p = bytes(r.payload)
        if r.media.kind == "image":
            w, h, rows = _decode_bmp(p)
            assert (w, h) == (BMP_W, BMP_H)
            assert rows[3] == bytes([(r.doc_id + 3) % 256]) * (BMP_W * 3)
        elif r.media.kind == "audio":
            rate, data = _decode_wav(p)
            assert rate == 8000
            assert len(data) == 2 * _media_n_samples(r.doc_id)


def test_resize_real_raster(real_media):
    """8×6 outputs are valid BMPs whose rasters equal the closed-form
    nearest-neighbor resample of the source pattern."""
    out = resize_images(real_media, target_w=8, target_h=6).collect()
    assert out, "no images resized"
    for r in out[:20]:
        w, h, rows = _decode_bmp(bytes(r.payload))
        assert (w, h) == (8, 6)
        for y in range(6):
            assert rows[y] == bytes([(r.doc_id + 2 * y) % 256]) * 24
        assert r.pixel_sum == sum(sum(row) for row in rows)


def test_frame_sampling_audio_real(real_media):
    """Audio frames are byte-exact slices of the decoded PCM stream."""
    frames = sample_frames(real_media).filter(F.col("kind") == "audio")
    pdf = frames.toPandas()
    assert len(pdf) > 0
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in real_media.filter(F.col("media.kind") == "audio").collect()
    }
    for _, row in pdf.head(30).iterrows():
        _, data = _decode_wav(payloads[row.doc_id])
        start = row.frame_no * 512
        chunk = data[start : start + 512]
        assert bytes(row.frame_bytes) == chunk
        assert row.frame_checksum == sum(chunk)
    # frame count per doc = ceil(n_samples / 256), capped at 4
    per_doc = pdf.groupby("doc_id").frame_no.max() + 1
    for doc_id, n_frames in per_doc.items():
        n = _media_n_samples(doc_id)
        assert n_frames == min(4, -(-n // 256))


def test_frame_sampling_video_stub(real_media):
    """Video tier stays byte-stride slices (honest stub: no H.264)."""
    frames = sample_frames(real_media, every_n_bytes=64, max_frames=3)
    pdf = frames.filter(F.col("kind") == "video").toPandas()
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in real_media.filter(F.col("media.kind") == "video").collect()
    }
    assert set(pdf.doc_id) <= set(payloads)
    assert pdf.frame_no.max() <= 2
    for _, row in pdf.head(20).iterrows():
        start = row.frame_no * 64
        assert bytes(row.frame_bytes) == payloads[row.doc_id][start : start + 64]


# --- perceptual-hash near-dup contract --------------------------------


def _ref_dhash(doc_id: int) -> int:
    """Independent reimplementation of the patterned-image dHash from
    the synthesis rule (md5 row bytes + one grid-aligned flip), NOT
    via the module's encode/decode helpers."""
    import hashlib

    from dataextractor_spark.operators.multimodal import (
        PHASH_GRID_H,
        PHASH_GRID_W,
        PHASH_GROUPS,
    )

    g = doc_id % PHASH_GROUPS
    px = ((doc_id // 3) % PHASH_GRID_W) * BMP_W // PHASH_GRID_W
    py = ((doc_id // 27) % PHASH_GRID_H) * BMP_H // PHASH_GRID_H
    img = []
    for y in range(BMP_H):
        vals = list(hashlib.md5(f"{g}:{y}".encode()).digest())
        if y == py:
            vals[px] = (vals[px] + 128) % 256
        img.append(vals)
    xs = [i * BMP_W // PHASH_GRID_W for i in range(PHASH_GRID_W)]
    ys = [j * BMP_H // PHASH_GRID_H for j in range(PHASH_GRID_H)]
    bits = 0
    for j in ys:
        lum = [3 * img[j][x] for x in xs]  # equal BGR channels
        for i in range(PHASH_GRID_W - 1):
            bits = (bits << 1) | (1 if lum[i + 1] > lum[i] else 0)
    return bits


def test_phash_neardup_matches_reference(spark):
    """The registered query's distance histogram equals a plain-Python
    brute force over independently recomputed hashes using the same
    band-candidate rule."""
    from dataextractor_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_HAM_T,
        multimodal_phash_neardup,
    )

    doc_ids = [
        r.doc_id
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .collect()
    ]
    hashes = {d: _ref_dhash(d) for d in doc_ids}

    def bands(h: int) -> list[tuple[int, int]]:
        return [(b, (h >> (16 * b)) & 0xFFFF) for b in range(PHASH_BANDS)]

    from collections import Counter, defaultdict

    expect: dict[int, set[tuple[int, int]]] = defaultdict(set)
    ids = sorted(doc_ids)
    for i, a in enumerate(ids):
        ba = set(bands(hashes[a]))
        for b_id in ids[i + 1 :]:
            if ba & set(bands(hashes[b_id])):
                d = bin(hashes[a] ^ hashes[b_id]).count("1")
                if d <= PHASH_HAM_T:
                    expect[d].add((a, b_id))
    want = sorted(
        (
            d,
            len(pairs),
            len({p[0] for p in pairs}),
            min(p[0] for p in pairs),
            min(p[1] for p in pairs),
        )
        for d, pairs in expect.items()
    )
    got = [tuple(r) for r in multimodal_phash_neardup(spark, SF_SMALL).collect()]
    assert got == want
    # the fixture plants real near-dups AND real non-trivial distances
    assert Counter(dict((d, n) for d, n, *_ in want))  # non-empty
    assert any(d > 0 for d, *_ in want)


def test_phash_spark_hashes_match_reference(spark):
    """Every Spark-side dHash equals the independent recomputation
    (byte-exact through encode→BMP→decode→hash)."""
    from dataextractor_spark.operators.multimodal import (
        dhash_images,
        encode_patterned_images,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    got = {
        r.doc_id: r.phash
        for r in dhash_images(encode_patterned_images(docs)).collect()
    }
    assert got  # fixture has image docs
    for doc_id, h in got.items():
        ref = _ref_dhash(doc_id)
        if ref >= 1 << 63:
            ref -= 1 << 64
        assert h == ref, doc_id
