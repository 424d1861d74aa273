"""Baseline-JPEG decoder tests (operators/multimodal.py _decode_jpeg_rgb).

No JPEG library exists in this environment, so the tests carry a minimal
baseline ENCODER (grayscale / 4:4:4 / 4:2:0 YCbCr, single-length canonical
huffman tables, optional restart markers) and verify the decoder by
round-trip: with all-ones quant tables baseline JPEG is near-lossless
(only DCT/IDCT float rounding), so decoded pixels must match the source
within a couple of 8-bit steps. The encoder is a test fixture, not
product code — the decoder is the product surface (reference parity:
media columns in a 100-TB corpus are overwhelmingly JPEG/PNG).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nba_data_pipeline_spark.operators.multimodal import (
    _JPEG_ZIGZAG,
    _decode_jpeg_rgb,
    _jpeg_idct_basis,
)

# --------------------------------------------------------------------------
# Minimal baseline encoder (test fixture)
# --------------------------------------------------------------------------

# canonical tables with every symbol at one code length: codes are just
# 0..n-1 at that length (and the all-ones code stays unused)
_DC_SYMS = list(range(12))           # categories 0..11 at length 4
_AC_SYMS = [0x00, 0xF0] + [          # EOB, ZRL, then (run, size) pairs
    (r << 4) | s for r in range(16) for s in range(1, 11)
]                                    # 162 symbols at length 8


def _dht_segment(tc: int, th: int, syms: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return bytes([0xFF, 0xC4]) + struct.pack(">H", 19 + len(syms)) + bytes(
        [(tc << 4) | th] + counts + syms
    )


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, pred: int) -> int:
    dc = int(coef_zz[0])
    s, bits = _mag_bits(dc - pred)
    bw.put(_DC_SYMS.index(s), 4)
    if s:
        bw.put(bits, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coef_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(_AC_SYMS.index(0xF0), 8)  # ZRL
            run -= 16
        s, bits = _mag_bits(v)
        bw.put(_AC_SYMS.index((run << 4) | s), 8)
        bw.put(bits, s)
        run = 0
    if last_nz < 63:
        bw.put(_AC_SYMS.index(0x00), 8)  # EOB
    return dc


def encode_jpeg(
    img: np.ndarray,
    quant: int = 1,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """img: uint8 (h, w) grayscale or (h, w, 3) RGB. quant: uniform
    quantization step (1 = near-lossless). subsample: luma sampling
    factors — (1, 1) is 4:4:4, (2, 2) is 4:2:0 (chroma box-averaged)."""
    basis = _jpeg_idct_basis()
    zz = np.array(_JPEG_ZIGZAG)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = subsample
        if (sh, sv) == (1, 1):
            planes, samp = [y, cb, cr], [(1, 1)] * 3
        else:
            # pad to even, then 2x2 box-average the chroma planes
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cbs = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            crs = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cbs, crs], [(sh, sv), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh_, sv_) in zip(planes, samp):
        th, tw = mcus_y * sv_ * 8, mcus_x * sh_ * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )
    qtab = np.full((8, 8), float(quant))

    bw = _BitWriter()
    chunks: list[bytes] = []
    preds = [0] * len(planes)
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            chunks.append(bw.flush())
            chunks.append(bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]))
            bw = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (p, (sh_, sv_)) in enumerate(zip(padded, samp)):
            for by in range(sv_):
                for bx in range(sh_):
                    y0 = (my * sv_ + by) * 8
                    x0 = (mx * sh_ + bx) * 8
                    block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = basis @ block @ basis.T
                    q = np.clip(np.round(coef / qtab), -1023, 1023)
                    preds[ci] = _encode_block(bw, q.reshape(64)[zz], preds[ci])
    chunks.append(bw.flush())
    entropy = b"".join(chunks)

    out = bytearray(b"\xff\xd8")  # SOI
    out += bytes([0xFF, 0xDB]) + struct.pack(">H", 67) + bytes([0x00])
    zz_q = np.empty(64)
    zz_q[:] = qtab.reshape(64)[zz]
    out += bytes(int(v) for v in zz_q)
    n_comp = len(planes)
    out += bytes([0xFF, 0xC0]) + struct.pack(">H", 8 + 3 * n_comp) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([n_comp])
    for ci in range(n_comp):
        sh_, sv_ = samp[ci]
        out += bytes([ci + 1, (sh_ << 4) | sv_, 0])
    out += _dht_segment(0, 0, _DC_SYMS, 4)
    out += _dht_segment(1, 0, _AC_SYMS, 8)
    if restart_interval:
        out += bytes([0xFF, 0xDD]) + struct.pack(">H", 4) + struct.pack(
            ">H", restart_interval
        )
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", 6 + 2 * n_comp) + bytes([n_comp])
    for ci in range(n_comp):
        out += bytes([ci + 1, 0x00])
    out += bytes([0, 63, 0])
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


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


def test_jpeg_mean_luma_via_features_kernel():
    from nba_data_pipeline_spark.operators.multimodal import _real_image_decode

    img = _gradient_rgb(16, 16)
    w, h, luma = _real_image_decode(encode_jpeg(img))
    assert (w, h) == (16, 16)
    src_luma = (
        0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    ).mean() / 255.0
    assert abs(luma - src_luma) < 0.02
