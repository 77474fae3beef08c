"""Pure-Python PNG codec (functions/png.py) + the real multimodal
decode pipeline (VERDICT r03 item 3: multimodal_decode moves from
rows-only stub to an oracle-checked encode/decode round-trip)."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from simple_vector_spark.functions.png import (
    PNG_SIGNATURE,
    _paeth,
    decode_png,
    encode_png,
)


def test_roundtrip_random_rasters_all_filter_types():
    rng = random.Random(7)
    # heights >= 5 exercise every filter type (rows cycle y % 5)
    for w, h in [(1, 1), (1, 7), (16, 16), (31, 23), (5, 1), (2, 11)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        assert decode_png(encode_png(w, h, px)) == (w, h, px)


def test_roundtrip_adversarial_rasters():
    # constant, gradient, and alternating rasters stress each
    # predictor's edge cases (left/up/average truncation, Paeth ties)
    for w, h in [(8, 10), (3, 6)]:
        for px in (
            bytes([0] * (w * h)),
            bytes([255] * (w * h)),
            bytes((i % 256) for i in range(w * h)),
            bytes((255 * ((i // w + i % w) % 2)) for i in range(w * h)),
        ):
            assert decode_png(encode_png(w, h, px)) == (w, h, px)


def test_encoder_emits_spec_chunks():
    data = encode_png(4, 2, bytes(range(8)))
    assert data[:8] == PNG_SIGNATURE
    # IHDR directly after the signature, with spec field values
    (ln,) = struct.unpack(">I", data[8:12])
    assert data[12:16] == b"IHDR" and ln == 13
    w, h, depth, ctyp, comp, filt, inter = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    assert (w, h, depth, ctyp, comp, filt, inter) == (4, 2, 8, 0, 0, 0, 0)
    assert data.endswith(
        struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    )


def test_paeth_predictor_spec_cases():
    # PNG spec §6.6: p = a + b - c; pick the neighbor nearest p,
    # precedence left, up, up-left on ties
    assert _paeth(0, 0, 0) == 0
    assert _paeth(5, 100, 100) == 5    # p=5:  pa=0 -> left
    assert _paeth(100, 5, 100) == 5    # p=5:  pb=0 -> up
    assert _paeth(10, 20, 15) == 15    # p=15: pc=0 -> up-left
    assert _paeth(3, 4, 0) == 4        # p=7:  pb=3 < pa=4 < pc=7 -> up
    assert _paeth(100, 101, 255) == 100  # p=-54: pa smallest -> left


def test_decode_rejects_bad_signature_crc_truncation_and_variant():
    good = encode_png(4, 4, bytes(16))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" + good[1:])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:20])
    # 16-bit depth is outside the supported subset -> loud
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(PNG_SIGNATURE + chunk + good[8 + 25 :])


def test_raster_length_must_match_dims():
    with pytest.raises(ValueError, match="raster"):
        encode_png(4, 4, bytes(15))


def test_png_decode_stats_matches_closed_form(spark):
    """The Spark pipeline's decoded stats equal the closed-form raster
    formula — the same invariant the DuckDB oracle checks."""
    import numpy as np

    from simple_vector_spark.operators import multimodal as MM

    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    got = {r["doc_id"]: r for r in MM.png_decode_stats(docs).collect()}
    assert len(got) == 40
    for doc_id in range(40):
        w = 16 + doc_id % 16
        h = 16 + doc_id % 8
        x = np.arange(w)
        y = np.arange(h)
        px = (3 * x[None, :] + 7 * y[:, None] + doc_id) % 256
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == int(px.sum())
        assert r["px_first"] == int(px[0, 0])
        assert r["px_last"] == int(px[-1, -1])
