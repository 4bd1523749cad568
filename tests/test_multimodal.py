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


# --- baseline JPEG codec contracts --------------------------------------


def test_jpeg_huffman_tables_match_spec_vectors():
    """Published T.81 Annex-K luminance vectors: EOB (symbol 0x00) is
    1010 in 4 bits; ZRL (0xF0) is 11111111001 in 11 bits; DC category
    0 is 00 in 2 bits. A transposed BITS/HUFFVAL entry anywhere shifts
    the canonical assignment and breaks these."""
    from dataextractor_spark.operators.multimodal import (
        _JPG_AC_BITS,
        _JPG_AC_VALS,
        _JPG_DC_BITS,
        _JPG_DC_VALS,
        _jpg_canonical_codes,
    )

    ac = _jpg_canonical_codes(_JPG_AC_BITS, _JPG_AC_VALS)
    dc = _jpg_canonical_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)
    assert dc[0] == (0b00, 2)
    # canonical codes are prefix-free by construction — verify anyway
    for codes in (ac, dc):
        seen = sorted((ln, code) for code, ln in codes.values())
        for i, (ln_a, c_a) in enumerate(seen):
            for ln_b, c_b in seen[i + 1 :]:
                assert not (c_b >> (ln_b - ln_a)) == c_a or ln_a == ln_b


def test_jpeg_constant_mosaic_closed_form():
    """Every constant block value 0..255 decodes to the closed form
    2*round-half-away((v-128)/2) + 128 clamped — including every .5
    quantizer boundary (odd v-128) and both clamp ends."""
    import numpy as np

    from dataextractor_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
        _jpg_expected_decoded,
    )

    vals = list(range(256))
    # 256 blocks = 16x16 grid -> 128x128 raster
    gray = np.zeros((128, 128), np.uint8)
    want = np.zeros_like(gray)
    for i, v in enumerate(vals):
        by, bx = divmod(i, 16)
        gray[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        want[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            _jpg_expected_decoded(v)
        )
    w, h, dec = _decode_jpeg(_encode_jpeg(gray))
    assert (w, h) == (128, 128)
    assert np.array_equal(dec, want)
    assert _jpg_expected_decoded(0) == 0  # low clamp
    assert _jpg_expected_decoded(255) == 255  # high clamp


def test_jpeg_lossy_roundtrip_bounded_and_deterministic():
    """General rasters: the lossy roundtrip is (a) deterministic —
    encode twice, byte-identical; (b) bounded — smooth gradients
    reconstruct within a few levels, white noise within the block
    dynamic range; (c) exercises the AC path — the entropy stream must
    contain non-EOB AC symbols (bitstream longer than DC-only)."""
    import numpy as np

    from dataextractor_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    smooth = ((xx * 3 + yy * 2) // 2 % 200 + 20).astype(np.uint8)
    b1, b2 = _encode_jpeg(smooth), _encode_jpeg(smooth)
    assert b1 == b2
    w, h, dec = _decode_jpeg(b1)
    assert (w, h) == (48, 32)
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 6

    rng = np.random.RandomState(42)
    noise = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    nb = _encode_jpeg(noise)
    w, h, dn = _decode_jpeg(nb)
    assert (w, h) == (16, 16)
    assert np.abs(dn.astype(int) - noise.astype(int)).max() < 128
    flat = _encode_jpeg(np.full((16, 16), 128, np.uint8))
    assert len(nb) > len(flat)  # AC symbols actually emitted


def test_jpeg_decoder_rejects_corruption():
    """Hard-fail contract: bad SOI, truncated stream, non-baseline
    SOF marker, and a flipped entropy byte must raise, never return
    silently wrong pixels (a flipped byte that still Huffman-decodes
    is caught by the coefficient-overrun / marker checks or changes
    the output — assert it cannot equal the clean decode)."""
    import numpy as np
    import pytest

    from dataextractor_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    img = (np.indices((16, 16)).sum(0) * 7 % 256).astype(np.uint8)
    blob = _encode_jpeg(img)
    with pytest.raises(ValueError):
        _decode_jpeg(b"\x00\x00" + blob[2:])
    with pytest.raises((ValueError, IndexError)):
        _decode_jpeg(blob[: len(blob) // 2])
    sof2 = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        _decode_jpeg(sof2)
    clean = _decode_jpeg(blob)[2]
    # flip one entropy-coded byte (well past the fixed-size headers,
    # before EOI); any survivable decode must differ from the truth
    k = len(blob) - 8
    for delta in (1, 7, 77):
        broken = bytearray(blob)
        if broken[k] in (0xFF, 0x00) or broken[k - 1] == 0xFF:
            k -= 3
            broken = bytearray(blob)
        broken[k] = (broken[k] + delta) % 256
        try:
            out = _decode_jpeg(bytes(broken))[2]
        except (ValueError, IndexError, KeyError):
            continue
        assert not np.array_equal(out, clean)
