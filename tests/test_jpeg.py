"""Baseline-JPEG codec tests (operators/multimodal.py _decode_jpeg_rgb +
encode_jpeg_baseline).

No JPEG library exists in this environment, so the decoder is verified
three ways: (1) round-trip through the package's own baseline encoder —
with a unit quant step baseline JPEG is near-lossless (only DCT/IDCT
float rounding), so decoded pixels must match the source within a couple
of 8-bit steps; (2) a HAND-ASSEMBLED spec vector (a single-DC-coefficient
block whose pixel value follows from the DCT basis in closed form) that
is independent of both codec halves — a matched encoder/decoder bug pair
cannot cancel out there; (3) structural probes (truncation, progressive
SOF, non-MCU-aligned dims, restart markers).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nba_data_pipeline_spark.operators.multimodal import (
    _decode_jpeg_rgb,
    encode_jpeg_baseline,
)


def encode_jpeg(img: np.ndarray, **kw) -> bytes:
    """Test alias: the package encoder with the near-lossless unit
    quant step the round-trip pins assume."""
    kw.setdefault("quant", 1)
    return encode_jpeg_baseline(img, **kw)


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 200, h)
    r = np.tile(x, (h, 1))
    g = np.tile(y[:, None], (1, w))
    b = (r + g) / 2.0
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


# --------------------------------------------------------------------------
# Round-trip tests
# --------------------------------------------------------------------------

def test_jpeg_gray_roundtrip_near_lossless():
    img = np.tile(np.linspace(10, 245, 24), (24, 1)).astype(np.uint8)
    data = encode_jpeg(img)
    w, h, rgb = _decode_jpeg_rgb(data)
    assert (w, h) == (24, 24)
    assert rgb.shape == (24, 24, 3)
    got = rgb[..., 0] * 255.0
    assert np.abs(got - img).max() <= 2.0
    # grayscale replicates across channels
    assert np.array_equal(rgb[..., 0], rgb[..., 1])


def test_jpeg_color_444_roundtrip():
    img = _gradient_rgb(24, 32)
    data = encode_jpeg(img)
    w, h, rgb = _decode_jpeg_rgb(data)
    assert (w, h) == (32, 24)
    assert np.abs(rgb * 255.0 - img).max() <= 5.0


def test_jpeg_color_420_roundtrip():
    img = _gradient_rgb(32, 32)
    data = encode_jpeg(img, subsample=(2, 2))
    w, h, rgb = _decode_jpeg_rgb(data)
    assert (w, h) == (32, 32)
    # luma survives subsampling nearly intact; chroma is box-averaged,
    # so compare the luma projection tightly and RGB loosely
    got_luma = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ) * 255.0
    src_luma = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.float64)
    assert np.abs(got_luma - src_luma).max() <= 3.0
    assert np.abs(rgb * 255.0 - img).max() <= 16.0


def test_jpeg_non_mcu_aligned_dims():
    # 30x22 with 4:2:0 (16x16 MCUs) forces edge padding on both axes
    img = _gradient_rgb(22, 30)
    data = encode_jpeg(img, subsample=(2, 2))
    w, h, rgb = _decode_jpeg_rgb(data)
    assert (w, h) == (30, 22)
    assert rgb.shape == (22, 30, 3)


def test_jpeg_restart_markers_equal_plain():
    img = _gradient_rgb(32, 48)
    plain = _decode_jpeg_rgb(encode_jpeg(img))[2]
    rst = _decode_jpeg_rgb(encode_jpeg(img, restart_interval=2))[2]
    assert np.array_equal(plain, rst)


def test_jpeg_quantized_still_close():
    img = _gradient_rgb(24, 24)
    data = encode_jpeg(img, quant=8)
    _, _, rgb = _decode_jpeg_rgb(data)
    # q=8 loses precision but a smooth gradient stays within ~q
    assert np.abs(rgb * 255.0 - img).max() <= 12.0


def test_jpeg_progressive_raises():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF"):
        _decode_jpeg_rgb(bytes(data))


def test_jpeg_truncation_raises():
    img = _gradient_rgb(16, 16)
    data = encode_jpeg(img)
    with pytest.raises(ValueError):
        _decode_jpeg_rgb(data[:20])  # cut inside the DQT segment


def test_jpeg_dhash_matches_ppm():
    """Same pixels as PPM and as near-lossless JPEG must produce the
    SAME 64-bit dHash — the codec must not perturb perceptual identity
    (pinned for PNG/BMP in test_multimodal; this closes the JPEG leg)."""
    from nba_data_pipeline_spark.operators.multimodal import _dhash64

    img = _gradient_rgb(40, 56)
    ppm = b"P6\n56 40\n255\n" + img.tobytes()
    jpg = encode_jpeg(img)
    h_ppm = _dhash64(ppm, "real")
    h_jpg = _dhash64(jpg, "real")
    assert h_ppm is not None and h_ppm == h_jpg


def test_jpeg_spark_features_and_dhash_e2e(spark):
    """JPEG payloads flow through the Arrow-batched mapInPandas kernels
    exactly like PPM/BMP/PNG: extract_image_features(decode='real')
    yields true geometry + mean luma, and image_dhash groups the JPEG
    encode of an image with its PPM twin (hamming 0) for near-dup
    dedup across codecs."""
    from nba_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
        image_dhash,
    )

    img = _gradient_rgb(40, 56)
    ppm = b"P6\n56 40\n255\n" + img.tobytes()
    jpg = encode_jpeg(img)
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(jpg))], "doc_id long, payload binary"
    )
    feats = {r.doc_id: r for r in extract_image_features(
        df, "doc_id", "payload", decode="real"
    ).collect()}
    assert (feats[1].width, feats[1].height) == (56, 40)
    assert (feats[2].width, feats[2].height) == (56, 40)
    assert abs(feats[1].mean_luma - feats[2].mean_luma) < 0.01
    hashes = {r.doc_id: r.dhash for r in image_dhash(
        df, "doc_id", "payload", decode="real"
    ).collect()}
    assert hashes[1] == hashes[2] and hashes[1] is not None


def _hand_jpeg_dc_only(dc: int) -> bytes:
    """Hand-assemble (straight from the spec, no codec code) an 8x8
    grayscale baseline JPEG whose single block carries ONLY the DC
    coefficient ``dc`` with a unit quant table. With the orthonormal
    basis A (A[0, x] = 1/(2*sqrt(2))), spatial = dc * A[0]^T A[0] =
    dc/8 everywhere, so every decoded pixel is exactly 128 + dc/8."""
    out = bytearray(b"\xff\xd8")
    out += bytes([0xFF, 0xDB]) + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    out += bytes([0xFF, 0xC0]) + struct.pack(">H", 11) + bytes([8])
    out += struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    # canonical DHT: 12 DC symbols at length 4, 162 AC symbols at length 8
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    for tc, syms, ln in ((0, dc_syms, 4), (1, ac_syms, 8)):
        counts = [0] * 16
        counts[ln - 1] = len(syms)
        out += bytes([0xFF, 0xC4]) + struct.pack(">H", 19 + len(syms))
        out += bytes([tc << 4] + counts + syms)
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC category s (canonical code = s at 4 bits), then the s
    # magnitude bits of dc (positive: the value itself); then EOB
    # (AC symbol index 0 -> code 0 at 8 bits); pad with 1-bits
    s = dc.bit_length()
    bits = f"{s:04b}" + format(dc, f"0{s}b") + "0" * 8
    bits += "1" * ((8 - len(bits) % 8) % 8)
    entropy = bytearray(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    body = bytearray()
    for byte in entropy:  # 0xFF stuffing per spec
        body.append(byte)
        if byte == 0xFF:
            body.append(0x00)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_hand_assembled_spec_vector():
    """Decoder vs a from-the-spec byte vector: independent of the
    package encoder, so a matched encode/decode bug cannot cancel."""
    w, h, rgb = _decode_jpeg_rgb(_hand_jpeg_dc_only(80))
    assert (w, h) == (8, 8)
    # every pixel exactly 128 + 80/8 = 138
    assert np.allclose(rgb * 255.0, 138.0, atol=1e-9)


def test_jpeg_encoder_deterministic_bytes():
    img = _gradient_rgb(24, 24)
    assert encode_jpeg_baseline(img, quant=2) == encode_jpeg_baseline(img, quant=2)
    assert encode_jpeg_baseline(img, quant=2) != encode_jpeg_baseline(img, quant=3)


def test_jpeg_encoder_arg_validation():
    img = _gradient_rgb(8, 8)
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg_baseline(img, quant=0)
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg_baseline(img, subsample=(2, 1))
    with pytest.raises(ValueError, match="zero-pixel"):
        encode_jpeg_baseline(np.zeros((0, 8, 3), dtype=np.uint8))


def test_resize_to_jpeg_feeds_image_stack(spark):
    """resize_images(out_format='jpeg') emits a decodable baseline JPEG
    thumbnail that is SMALLER than the P6 twin and feeds straight back
    into extract_image_features."""
    from nba_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
    )

    img = _gradient_rgb(64, 64)
    df = spark.createDataFrame(
        [(1, bytearray(b"P6\n64 64\n255\n" + img.tobytes()))],
        "doc_id long, payload binary",
    )
    jt = resize_images(df, "doc_id", "payload", 16, 16, decode="real",
                       out_format="jpeg").collect()[0]
    pt = resize_images(df, "doc_id", "payload", 16, 16, decode="real").collect()[0]
    assert bytes(jt.payload).startswith(b"\xff\xd8")
    assert len(jt.payload) < len(pt.payload)
    feats = extract_image_features(
        spark.createDataFrame([(1, jt.payload)], "doc_id long, payload binary"),
        "doc_id", "payload", decode="real",
    ).collect()[0]
    assert (feats.width, feats.height) == (16, 16)


def test_jpeg_mean_luma_via_features_kernel():
    from nba_data_pipeline_spark.operators.multimodal import _real_image_decode

    img = _gradient_rgb(16, 16)
    w, h, luma = _real_image_decode(encode_jpeg(img))
    assert (w, h) == (16, 16)
    src_luma = (
        0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    ).mean() / 255.0
    assert abs(luma - src_luma) < 0.02
