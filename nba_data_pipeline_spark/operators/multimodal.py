"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so payload bytes stream
through executors in columnar batches (never the driver).

Codec status per modality (compressed-codec libraries — PIL, ffmpeg,
torchaudio — are NOT in this environment):

- ``decode="real"`` for IMAGES decodes **PPM (P6)**, **BMP (24/32-bit
  uncompressed)**, **PNG (8-bit gray/palette/RGB(A), filters 0-4,
  non-interlaced — stdlib zlib inflate + unfilter)** and **baseline
  JPEG (SOF0/SOF1 huffman, 8-bit, gray or YCbCr with any sampling,
  restart markers — stdlib struct + numpy huffman/IDCT)** with no
  codec library; remaining variants (progressive JPEG, 12-bit, CMYK,
  16-bit/Adam7 PNG) raise NotImplementedError at the exact plug-point
  a PIL call occupies.
- ``decode="real"`` for AUDIO decodes **WAV PCM** (any sample width
  the stdlib ``wave`` module supports) — other containers raise at
  the torchaudio/ffmpeg plug-point.
- VIDEO remains a declared stub: every real container needs ffmpeg.
- ``decode="fake"`` everywhere yields deterministic pseudo-decodes
  (stable per payload hash) so the Spark-side plumbing — schema,
  partitioning, UDF signature, batch shape — is testable without any
  payload fixtures.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _spread_payload(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Input shaping shared by every media kernel (guide §4.1): project
    to exactly the two columns the kernel reads — mapInPandas is
    opaque, Spark would otherwise ship, and read from storage, every
    column.

    Deliberately NO repartition (r17, VERDICT r16 #2): the r16
    conditional spread fired on every media input (multi-MB blobs are
    still byte-small in Catalyst's estimate vs goal x 64 MB) and
    inserted a full exchange of the binary payloads before each
    kernel — measured SLOWER at both core counts (video_frame_overlap
    0.67 -> 1.13 s at 32c, 1.67 s at 8c: worse with fewer cores is the
    signature of added shuffle cost, not recovered parallelism; the
    kernels are cheap relative to moving their input). At scale the
    scan is already wide; locally the single-row-group parquet cannot
    split below the row group anyway, so parallelism bought by
    shuffling blobs never repays the move."""
    return df.select(id_col, payload_col)


MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str, media_type: str, fmt: str | None = None) -> DataFrame:
    """Typed metadata for a binary payload column — pure Column exprs
    (sha2 + length run JVM-side; no bytes cross to Python)."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.length(p).cast("long").alias("byte_len"),
            F.sha2(p, 256).alias("sha256"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder: derive (w, h, luma)
    from the payload digest so tests are stable. STUB — replace with a
    real codec (PIL.Image.open) when the library is available."""
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 241
    height = 16 + d[1] % 241
    mean_luma = round(d[2] / 255.0, 6)
    return width, height, mean_luma


# Rec. 601 luma weights — the standard grayscale projection.
_LUMA_R, _LUMA_G, _LUMA_B = 0.299, 0.587, 0.114


def _decode_ppm(data: bytes) -> tuple[int, int, float | None]:
    """Real decode of a binary PPM (P6): header tokens (with ``#``
    comments) then maxval-scaled raw RGB triplets. Pure stdlib+numpy.
    Returns (width, height, mean_luma in [0, 1]); a zero-pixel image
    (width or height 0 — valid per the format) has no defined mean, so
    mean_luma is explicitly None (the feature schema's nullable
    column), never NaN."""
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' starts a comment running to end-of-line
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        c = data[pos : pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(int(data[pos:end]))
            pos = end
    width, height, maxval = tokens
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval out of range: {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    n = width * height * 3
    if n == 0:
        return width, height, None
    px = np.frombuffer(data, dtype=dtype, count=n, offset=pos).astype(np.float64)
    px = px.reshape(-1, 3) / maxval
    luma = px[:, 0] * _LUMA_R + px[:, 1] * _LUMA_G + px[:, 2] * _LUMA_B
    return width, height, float(round(luma.mean(), 6))


def _decode_bmp(data: bytes) -> tuple[int, int, float | None]:
    """Real decode of an uncompressed 24/32-bit BMP: BITMAPFILEHEADER
    (14 bytes) + BITMAPINFOHEADER. Rows are 4-byte aligned, stored
    bottom-up when height > 0, pixels are BGR(A). Returns
    (width, height, mean_luma in [0, 1]); zero-pixel images get a
    None mean (see _decode_ppm)."""
    import numpy as np

    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    bpp, compression = struct.unpack_from("<HI", data, 28)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression}); plug PIL here for the rest"
        )
    abs_h = abs(height)
    bytes_pp = bpp // 8
    if width * abs_h == 0:
        return width, abs_h, None
    stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * abs_h, offset=pixel_offset
    ).reshape(abs_h, stride)
    px = rows[:, : width * bytes_pp].reshape(abs_h, width, bytes_pp).astype(np.float64)
    # BGR order; alpha (if present) ignored; row order is irrelevant to
    # the mean. Scale to [0, 1].
    luma = (px[..., 2] * _LUMA_R + px[..., 1] * _LUMA_G + px[..., 0] * _LUMA_B) / 255.0
    return width, abs_h, float(round(luma.mean(), 6))


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png_rgb(data: bytes):
    """Real decode of an 8-bit non-interlaced PNG — pure stdlib
    (zlib + struct) + numpy, no codec library:

    - chunk walk: IHDR (geometry/mode), PLTE (palette), IDAT
      (concatenated deflate stream), stop at IEND; CRCs skipped
      (corruption surfaces as a zlib/length error anyway);
    - ``zlib.decompress`` of the joined IDAT bodies;
    - per-scanline unfilter, types 0-4 (None/Sub/Up/Average/Paeth);
      Up vectorizes, the left-referencing filters walk the row (test
      images are small; a real 100-TB corpus plugs PIL here);
    - channel normalize to an RGB float64 matrix in [0, 1]: gray and
      gray+alpha replicate, palette indices expand through PLTE,
      alpha is dropped (same convention as 32-bit BMP).

    Returns (width, height, matrix | None) — None for zero-pixel
    images. Bit depth 16, Adam7 interlace, and exotic modes raise
    NotImplementedError at the PIL plug-point."""
    import numpy as np

    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # 4 length + 4 type + data + 4 crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} not supported; plug PIL here"
        )
    if width * height == 0:
        return width, height, None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = ((line.astype(np.int16) + prev.astype(np.int16)) & 0xFF).astype(
                np.uint8
            )
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = line
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = out.reshape(height, width)
        if int(idx.max()) >= len(palette):
            raise ValueError("PNG palette index out of range")
        rgb = palette[idx].astype(np.float64) / 255.0
    elif color_type in (0, 4):
        g = out.reshape(height, width, channels)[..., 0].astype(np.float64) / 255.0
        rgb = np.stack([g, g, g], axis=-1)
    elif color_type == 2:
        rgb = out.reshape(height, width, 3).astype(np.float64) / 255.0
    else:  # 6: RGBA
        rgb = (
            out.reshape(height, width, 4)[..., :3].astype(np.float64) / 255.0
        )
    return width, height, rgb


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_basis():
    """8x8 DCT-II basis matrix A with A[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
    (orthonormal: spatial = A.T @ coef @ A). Built lazily so numpy stays
    out of module import."""
    import math as _math

    import numpy as np

    a = np.empty((8, 8))
    for u in range(8):
        c = (0.5 / _math.sqrt(2.0)) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * _math.cos((2 * x + 1) * u * _math.pi / 16.0)
    return a


class _JpegBitReader:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing 0xFF00 already stripped by the caller's segment split)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bits = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.buf):
                # past-the-end pad with 1s (spec: fill bits are 1);
                # a truncated stream surfaces as a huffman miss below
                self.bits = (self.bits << 8) | 0xFF
            else:
                self.bits = (self.bits << 8) | self.buf[self.pos]
                self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_jpeg_rgb(data: bytes):
    """Real decode of a baseline JPEG (SOF0/SOF1, huffman, 8-bit,
    single scan) — pure stdlib ``struct`` + numpy, no codec library:

    - marker walk: DQT (zigzag quant tables), DHT (huffman tables),
      SOF0/1 (geometry + per-component sampling factors), DRI, SOS;
      APPn/COM skipped;
    - entropy decode per MCU: DC diff + AC run-length (EOB/ZRL),
      restart markers reset the bit reader and DC predictors;
    - dequantize, dezigzag, orthonormal-basis IDCT (two 8x8 matmuls
      per block), +128 level shift;
    - chroma planes upsample by pixel replication to the luma grid,
      JFIF YCbCr -> RGB (BT.601), clip; 1-component frames replicate.

    Returns (width, height, matrix | None) matching ``_decode_png_rgb``
    (float64 RGB in [0, 1]; None for zero-pixel frames). Progressive
    (SOF2), arithmetic coding, 12-bit precision, and CMYK raise
    NotImplementedError at the PIL plug-point."""
    import numpy as np

    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    pos = 2
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq == 0:
                    qtables[tq] = list(body[b : b + 64])
                    b += 64
                else:
                    qtables[tq] = [
                        struct.unpack_from(">H", body, b + 2 * i)[0] for i in range(64)
                    ]
                    b += 128
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                b += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = body[b]
                        b += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG precision {precision} not supported; plug PIL here"
                )
            height, width = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            if n_comp not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {n_comp} components (CMYK?) not supported; plug PIL here"
                )
            comps = [
                {
                    "id": body[6 + 3 * i],
                    "h": body[7 + 3 * i] >> 4,
                    "v": body[7 + 3 * i] & 0x0F,
                    "tq": body[8 + 3 * i],
                }
                for i in range(n_comp)
            ]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (progressive/arithmetic/"
                "lossless) not supported; plug PIL here"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                {"id": body[1 + 2 * i], "td": body[2 + 2 * i] >> 4, "ta": body[2 + 2 * i] & 0x0F}
                for i in range(ns)
            ]
            break  # entropy-coded data follows
        # APPn / COM / others: skipped
    if width is None or scan_comps is None:
        raise ValueError("JPEG missing SOF or SOS")
    if width * height == 0:
        return width, height, None

    # split the entropy stream at restart markers, stripping 0xFF00 stuffing
    segments: list[bytes] = []
    cur = bytearray()
    p = pos
    while p < len(data):
        byte = data[p]
        if byte == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or any other marker ends the scan
        cur.append(byte)
        p += 1
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    basis = _jpeg_idct_basis()
    zz = np.array(_JPEG_ZIGZAG)
    planes = []
    quant = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
        q64 = np.zeros(64)
        q64[zz] = qtables[c["tq"]]
        quant.append(q64.reshape(8, 8))
    scan_by_id = {s["id"]: s for s in scan_comps}

    seg_i = 0
    reader = _JpegBitReader(segments[0])
    preds = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG truncated at restart boundary")
            reader = _JpegBitReader(segments[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            sc = scan_by_id[c["id"]]
            dc_t, ac_t = huff[(0, sc["td"])], huff[(1, sc["ta"])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64)
                    s = _jpeg_huff_decode(reader, dc_t)
                    diff = _jpeg_extend(reader.read(s), s) if s else 0
                    preds[ci] += diff
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(reader, ac_t)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[k] = _jpeg_extend(reader.read(size), size)
                        k += 1
                    block = np.zeros((8, 8))
                    block.reshape(64)[zz] = coef
                    spatial = basis.T @ (block * quant[ci]) @ basis + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial

    full = []
    for ci, c in enumerate(comps):
        pl = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            pl = np.repeat(np.repeat(pl, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(pl[:height, :width])
    if len(comps) == 1:
        g = np.clip(full[0], 0.0, 255.0) / 255.0
        return width, height, np.stack([g, g, g], axis=-1)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0) / 255.0
    return width, height, rgb


# canonical huffman tables with every symbol at one code length: the
# canonical construction assigns codes 0..n-1 at that length and the
# all-ones code (the only illegal prefix) stays unused. Simpler than
# the Annex K defaults and exactly as decodable.
_JENC_DC_SYMS = list(range(12))            # DC categories 0..11, length 4
_JENC_AC_SYMS = [0x00, 0xF0] + [           # EOB, ZRL, then (run, size)
    (r << 4) | s for r in range(16) for s in range(1, 11)
]                                          # 162 symbols, length 8


class _JpegBitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing; final byte
    padded with 1-bits per the spec."""

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
                    self.out.append(0x00)
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


def _jenc_dht(tc: int, th: int, syms: list, length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return bytes([0xFF, 0xC4]) + struct.pack(">H", 19 + len(syms)) + bytes(
        [(tc << 4) | th] + counts + syms
    )


def _jenc_block(bw: _JpegBitWriter, coef_zz, pred: int) -> int:
    """Entropy-encode one zigzag coefficient block; returns the new DC
    predictor."""
    dc = int(coef_zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    bw.put(_JENC_DC_SYMS.index(s), 4)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last_nz = 0
    for k in range(1, 64):
        if coef_zz[k]:
            last_nz = k
    run = 0
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(_JENC_AC_SYMS.index(0xF0), 8)  # ZRL
            run -= 16
        s = abs(v).bit_length()
        bw.put(_JENC_AC_SYMS.index((run << 4) | s), 8)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.put(_JENC_AC_SYMS.index(0x00), 8)  # EOB
    return dc


def encode_jpeg_baseline(
    img,
    quant: int = 2,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 image — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JPEG (SOF0, huffman, single scan), pure stdlib + numpy:
    the write-side twin of ``_decode_jpeg_rgb``, so thumbnails and
    sampled frames can leave the pipeline in the format a real corpus
    stores (a P6 re-encode triples the bytes). ``quant`` is a uniform
    quantization step (1-2 = near-lossless for smooth content; 8-16 =
    web-ish); ``subsample=(1, 1)`` is 4:4:4, ``(2, 2)`` is 4:2:0 with
    2x2 box-averaged chroma; ``restart_interval`` > 0 emits RSTn every
    N MCUs (resync points for parallel/partial decode). Deterministic:
    same pixels + options -> same bytes, on any platform."""
    import numpy as np

    if quant < 1 or quant > 255:
        raise ValueError(f"quant must be in [1, 255]: {quant}")
    if subsample not in ((1, 1), (2, 2)):
        raise ValueError(f"subsample must be (1,1) or (2,2): {subsample}")
    img = np.asarray(img, dtype=np.uint8)
    basis = _jpeg_idct_basis()
    zz = np.array(_JPEG_ZIGZAG)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode a zero-pixel image")
    if gray:
        planes, samp = [img.astype(np.float64)], [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == (1, 1):
            planes, samp = [y, cb, cr], [(1, 1)] * 3
        else:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

            def _pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

            cbs = _pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            crs = _pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cbs, crs], [subsample, (1, 1), (1, 1)]
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

    bw = _JpegBitWriter()
    chunks: list[bytes] = []
    preds = [0] * len(planes)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            chunks.append(bw.flush())
            chunks.append(bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]))
            bw = _JpegBitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (p, (sh_, sv_)) in enumerate(zip(padded, samp)):
            for by in range(sv_):
                for bx in range(sh_):
                    y0 = (my * sv_ + by) * 8
                    x0 = (mx * sh_ + bx) * 8
                    block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = basis @ block @ basis.T
                    # baseline AC categories stop at 10 bits
                    q = np.clip(np.round(coef / qtab), -1023, 1023)
                    preds[ci] = _jenc_block(bw, q.reshape(64)[zz], preds[ci])
    chunks.append(bw.flush())

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
    out += _jenc_dht(0, 0, _JENC_DC_SYMS, 4)
    out += _jenc_dht(1, 0, _JENC_AC_SYMS, 8)
    if restart_interval:
        out += bytes([0xFF, 0xDD]) + struct.pack(">HH", 4, restart_interval)
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", 6 + 2 * n_comp) + bytes([n_comp])
    for ci in range(n_comp):
        out += bytes([ci + 1, 0x00])
    out += bytes([0, 63, 0])
    out += b"".join(chunks)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def wrap_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25,
    group_rec: bool = False,
) -> bytes:
    """Wrap pre-encoded JPEG frames in a minimal MJPEG AVI container
    (RIFF: hdrl with avih + one vids/MJPG stream, movi with one 00dc
    chunk per frame, idx1 stub) — the write-side twin of
    ``_avi_mjpeg_frames``. ``group_rec`` wraps each frame chunk in a
    LIST/'rec ' group (the layout interleaved writers emit), which the
    reader must treat identically. Deterministic bytes."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = chunk(
        b"avih",
        struct.pack(
            "<14I", 1_000_000 // max(fps, 1), 0, 0, 0x10, len(frames), 0, 1, 0,
            width, height, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height),
    )
    strf = chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    dc = [chunk(b"00dc", f) for f in frames]
    movi_body = (
        b"".join(lst(b"rec ", c) for c in dc) if group_rec else b"".join(dc)
    )
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", b"\x00" * 16)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _jpeg_luma(data: bytes):
    """(width, height, luma matrix | None) for a JPEG payload."""
    width, height, rgb = _decode_jpeg_rgb(data)
    if rgb is None:
        return width, height, None
    return width, height, (
        rgb[..., 0] * _LUMA_R + rgb[..., 1] * _LUMA_G + rgb[..., 2] * _LUMA_B
    )


def _png_luma(data: bytes):
    """(width, height, luma matrix | None) for a PNG payload."""
    width, height, rgb = _decode_png_rgb(data)
    if rgb is None:
        return width, height, None
    return width, height, (
        rgb[..., 0] * _LUMA_R + rgb[..., 1] * _LUMA_G + rgb[..., 2] * _LUMA_B
    )


def _real_image_decode(payload: bytes) -> tuple[int, int, float]:
    """Dispatch on magic bytes. PPM/BMP/PNG/baseline-JPEG decode with
    stdlib + numpy; remaining formats raise at the PIL plug-point."""
    if payload.startswith(b"P6"):
        return _decode_ppm(payload)
    if payload.startswith(b"BM"):
        return _decode_bmp(payload)
    if payload.startswith(_PNG_MAGIC):
        width, height, luma = _png_luma(payload)
        if luma is None:
            return width, height, None
        return width, height, float(round(luma.mean(), 6))
    if payload.startswith(b"\xff\xd8"):
        width, height, luma = _jpeg_luma(payload)
        if luma is None:
            return width, height, None
        return width, height, float(round(luma.mean(), 6))
    raise NotImplementedError(
        "image codec not available in this environment "
        f"(magic={payload[:4]!r}); plug PIL/torchvision here"
    )


def extract_image_features(
    df: DataFrame, id_col: str, payload_col: str, decode: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """Decode + featurize image payloads via ``mapInPandas``.

    Batches arrive as Arrow record batches; each is processed columnar
    and yielded back — the pattern a real decoder plugs into 1:1.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _real_image_decode if decode == "real" else _fake_decode
        for pdf in batches:
            decoded = [decoder(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pdf[payload_col].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def _avi_mjpeg_frames(data: bytes) -> list[bytes]:
    """Extract the compressed frame payloads from an AVI (RIFF)
    container — pure stdlib, no ffmpeg: walk the chunk tree, descend
    into LIST/movi (and nested LIST/'rec ' groups), collect every
    video-data chunk (fourcc ``##dc``/``##db``). For an MJPEG AVI each
    such chunk is a complete baseline JPEG the image stack decodes
    directly. Chunks are word-aligned per RIFF (odd sizes pad one
    byte). Audio chunks (``##wb``) and the index (``idx1``) are
    skipped. Raises ValueError for non-AVI RIFF files."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                subtype = data[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_end,
                    in_movi or subtype in (b"movi", b"rec "),
                )
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(data[body_start:body_end])
            pos = body_end + (size & 1)  # word alignment

    walk(12, len(data), False)
    return frames


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_n_bytes: int = 1024,
    decode: str = "fake",
    every_n_frames: int = 1,
) -> DataFrame:
    """Frame sampling for video payloads via the 1->N ``mapInPandas``
    fan-out. ``decode="real"`` handles **MJPEG-in-AVI** with the
    in-house RIFF walk + baseline-JPEG decoder: every
    ``every_n_frames``-th frame is DECODED and fingerprinted as the
    sha256 of its decoded RGB pixels — codec-repack-invariant (the
    same pixels re-wrapped in a different AVI hash identically), which
    is what ``frame_overlap_pairs`` wants for near-dup candidates.
    Other containers (MP4/MKV/...) raise at the ffmpeg plug-point.
    ``decode="fake"`` keeps the deterministic byte-stride stand-in
    (sha256 of each ``every_n_bytes`` chunk) for oracle-checkable
    plumbing tests."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha256", T.StringType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_ids, out_idx, out_sha = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if decode == "real":
                    if not data.startswith(b"RIFF"):
                        raise NotImplementedError(
                            "video container not supported "
                            f"(magic={data[:4]!r}); plug ffmpeg here"
                        )
                    for i, frame in enumerate(_avi_mjpeg_frames(data)):
                        if i % every_n_frames:
                            continue
                        _w, _h, rgb = _decode_jpeg_rgb(frame)
                        px = (
                            b""
                            if rgb is None
                            else np.round(rgb * 255.0).astype(np.uint8).tobytes()
                        )
                        out_ids.append(int(rid))
                        out_idx.append(i)
                        out_sha.append(hashlib.sha256(px).hexdigest())
                    continue
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    out_ids.append(int(rid))
                    out_idx.append(i)
                    out_sha.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_sha256": out_sha}
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(kernel, schema=schema)


def _wav_pcm(data: bytes):
    """Mono float64 PCM in [-1, 1] from a WAV payload (stdlib ``wave``;
    8/16/24/32-bit, channels averaged). The shared real-decode for
    audio features AND audio fingerprinting; non-WAV raises at the
    torchaudio/ffmpeg plug-point."""
    import numpy as np

    if not (data[:4] == b"RIFF" and data[8:12] == b"WAVE"):
        raise NotImplementedError(
            "only WAV PCM decodes without a codec library "
            f"(magic={data[:4]!r}); plug torchaudio/ffmpeg here"
        )
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:  # WAV 8-bit is UNSIGNED, midpoint 128
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:  # 24-bit packed little-endian signed
        b = np.frombuffer(frames, dtype=np.uint8)
        b = b[: b.size - b.size % 3].reshape(-1, 3).astype(np.int64)
        raw = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        signed = (raw ^ 0x800000) - 0x800000  # sign-extend bit 23
        samples = signed.astype(np.float64) / 8388608.0
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if n_ch > 1:  # interleaved -> mono mean per frame
        samples = samples[: samples.size - samples.size % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples


def _wav_rate(data: bytes) -> int:
    """Sample rate of a WAV payload (header-only read)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        return w.getframerate()


def _fourier_resample(samples, n_out: int):
    """Band-limited (Fourier-method) resample of a 1-D signal to
    ``n_out`` samples: rfft, truncate or zero-pad the spectrum, irfft,
    amplitude rescale. Exact for band-limited content and inherently
    anti-aliased on downsample (high bins are DROPPED, not folded) —
    the dependency-free middle ground between linear interpolation
    (which aliases) and a polyphase sinc bank."""
    import numpy as np

    n_in = samples.size
    if n_in == 0 or n_out == 0:
        return np.zeros(n_out)
    spec = np.fft.rfft(samples)
    want = n_out // 2 + 1
    if want < spec.size:
        spec = spec[:want].copy()
        if n_out % 2 == 0 and want > 1:
            spec[-1] = spec[-1].real  # new Nyquist bin must be real
    else:
        spec = np.concatenate([spec, np.zeros(want - spec.size, dtype=spec.dtype)])
    return np.fft.irfft(spec, n=n_out) * (n_out / n_in)


def _encode_wav_pcm16(samples, rate: int) -> bytes:
    """Mono 16-bit PCM WAV bytes from float64 samples in [-1, 1]."""
    import numpy as np

    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


RESAMPLED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("rate", T.IntegerType(), True),
    ]
)


def resample_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_rate: int = 16000,
    decode: str = "fake",
) -> DataFrame:
    """Batch audio resample via ``mapInPandas`` — the rate-normalize
    step every speech-pretraining pipeline runs (heterogeneous corpus
    in, one model rate out). Real path: ``_wav_pcm`` decode (any
    width/channels, downmixed mono), band-limited Fourier resample to
    ``round(n * target/src)`` samples, re-encode as mono 16-bit PCM
    WAV at ``target_rate`` — the output feeds straight back into
    ``extract_audio_windows`` / ``audio_ahash``. A no-op rate still
    normalizes width/channels. Fake path: deterministic pseudo-PCM
    from the payload hash, same re-encode, same schema. Empty audio
    yields an empty (but valid) WAV. Output: (doc_id, payload,
    n_samples, rate)."""
    import numpy as np

    rate = int(target_rate)
    if rate <= 0:
        raise ValueError(f"target_rate must be positive: {rate}")

    def one(payload) -> tuple[bytes | None, int | None, int | None]:
        data = bytes(payload)
        if decode == "real":
            samples = _wav_pcm(data)
            src_rate = _wav_rate(data)
        else:
            digest = hashlib.sha256(data).digest()
            seed = np.frombuffer(digest * 250, dtype=np.uint8)[:4000]
            samples = (seed.astype(np.float64) - 128.0) / 128.0
            src_rate = 8000
        n_out = int(round(samples.size * rate / src_rate))
        out = _fourier_resample(samples, n_out)
        return _encode_wav_pcm16(out, rate), n_out, rate

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [o[0] for o in out],
                    "n_samples": pd.array([o[1] for o in out], dtype="Int32"),
                    "rate": pd.array([o[2] for o in out], dtype="Int32"),
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(
        kernel, schema=RESAMPLED_AUDIO_SCHEMA
    )


def _mel_filterbank(n_bands: int, n_fft: int, rate: int):
    """Triangular mel-spaced filterbank (n_bands, n_fft//2 + 1): the
    standard perceptual frequency warp (mel = 2595 log10(1 + f/700)),
    filters overlapping 50% with unit peaks."""
    import numpy as np

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(0.0, to_mel(rate / 2.0), n_bands + 2)
    bin_pts = np.floor(from_mel(mel_pts) * n_fft / rate).astype(int)
    bin_pts = np.clip(bin_pts, 0, n_bins - 1)
    fb = np.zeros((n_bands, n_bins))
    for b in range(n_bands):
        lo, mid, hi = bin_pts[b], bin_pts[b + 1], bin_pts[b + 2]
        if mid > lo:
            fb[b, lo : mid + 1] = (np.arange(lo, mid + 1) - lo) / (mid - lo)
        else:
            fb[b, mid] = 1.0
        if hi > mid:
            fb[b, mid : hi + 1] = np.maximum(
                fb[b, mid : hi + 1], (hi - np.arange(mid, hi + 1)) / (hi - mid)
            )
    return fb


AUDIO_SPECTROGRAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("log_mel", T.ArrayType(T.DoubleType()), True),
    ]
)


def audio_spectrogram(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """Log-mel spectrogram features per audio payload via the 1->N
    ``mapInPandas`` fan-out — the canonical speech-pretraining feature
    extract (what a wav2vec/Whisper-style front end consumes). Real
    path: ``_wav_pcm`` decode, Hann-windowed frames every ``hop``
    samples, |rfft|^2 power, mel filterbank (``_mel_filterbank`` at
    the payload's own rate), log10(energy + 1e-10), each value rounded
    to 6 decimals so the rows are deterministic and cross-run
    comparable. A uniform gain change shifts every coefficient by a
    constant (log property) — downstream consumers normalize per
    utterance. Fake path: deterministic pseudo-coefficients from the
    payload hash, same schema/fan-out. Output: (doc_id, window_idx,
    log_mel array[n_bands])."""
    import numpy as np

    if n_fft <= 0 or hop <= 0 or n_bands <= 0:
        raise ValueError(f"n_fft/hop/n_bands must be positive: {n_fft}/{hop}/{n_bands}")

    def rows_for(payload):
        data = bytes(payload)
        if decode == "real":
            samples = _wav_pcm(data)
            rate = _wav_rate(data)
            if samples.size < n_fft:
                return []
            fb = _mel_filterbank(n_bands, n_fft, rate)
            window = np.hanning(n_fft)
            out = []
            for i, start in enumerate(range(0, samples.size - n_fft + 1, hop)):
                frame = samples[start : start + n_fft] * window
                power = np.abs(np.fft.rfft(frame)) ** 2
                mel = np.log10(fb @ power + 1e-10)
                out.append((i, [float(round(v, 6)) for v in mel]))
            return out
        digest = hashlib.sha256(data).digest()
        n_win = 1 + digest[0] % 4
        out = []
        for i in range(n_win):
            h = hashlib.sha256(digest + bytes([i])).digest()
            out.append(
                (i, [round(b / 255.0 - 0.5, 6) for b in h[:n_bands]])
            )
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mels = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, mel in rows_for(payload):
                    ids.append(int(rid))
                    idxs.append(i)
                    mels.append(mel)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "window_idx": pd.array(idxs, dtype="int32"),
                    # object dtype: an EMPTY float64 column won't cast
                    # to Arrow list<double>
                    "log_mel": pd.Series(mels, dtype=object),
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(
        kernel, schema=AUDIO_SPECTROGRAM_SCHEMA
    )


AUDIO_WINDOWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_windows(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    window_samples: int = 1024,
    decode: str = "fake",
) -> DataFrame:
    """Windowed audio features: 1->N fan-out of each payload into
    fixed-width sample windows with per-window RMS — the shape a
    torchaudio/ffmpeg feature extractor uses (decode to PCM, window,
    reduce).

    - ``decode='real'`` decodes **WAV PCM** with the stdlib ``wave``
      module (8/16/32-bit, any channel count — channels average to
      mono per frame; samples normalize to [-1, 1] so RMS is
      width-independent). Non-WAV payloads raise at the exact call
      site a torchaudio/ffmpeg codec would occupy.
    - ``decode='fake'`` interprets the raw payload bytes as signed
      8-bit PCM (deterministic, no codec, RMS in raw int8 units).

    Arrow-batched ``mapInPandas``; payload bytes never hit the driver."""
    import numpy as np

    real_pcm = _wav_pcm

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if decode == "real":
                    pcm = real_pcm(data)
                else:
                    pcm = np.frombuffer(data, dtype=np.int8).astype(np.float64)
                if pcm.size == 0:
                    continue
                for i in range(0, pcm.size, window_samples):
                    w = pcm[i : i + window_samples]
                    ids.append(int(rid))
                    idxs.append(i // window_samples)
                    ns.append(int(w.size))
                    rms.append(float(np.sqrt(np.mean(w * w))))
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": idxs, "n_samples": ns, "rms": rms}
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(kernel, schema=AUDIO_WINDOWS_SCHEMA)


def _luma_matrix(payload: bytes):
    """Grayscale pixel matrix (h, w) in [0, 1] for the real-decode
    formats (PPM P6 / uncompressed BMP); None for zero-pixel images.
    The matrix form of the mean-luma decoders above — shared by
    perceptual hashing, which needs spatial structure, not just the
    mean."""
    import numpy as np

    if payload.startswith(b"P6"):
        # reuse the header walk from _decode_ppm
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 3:
            if pos >= len(payload):
                raise ValueError("truncated PPM header")
            c = payload[pos : pos + 1]
            if c == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(payload) and not payload[end : end + 1].isspace():
                    end += 1
                tokens.append(int(payload[pos:end]))
                pos = end
        width, height, maxval = tokens
        pos += 1
        if width * height == 0:
            return None
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        px = np.frombuffer(
            payload, dtype=dtype, count=width * height * 3, offset=pos
        ).astype(np.float64).reshape(height, width, 3) / maxval
        return px[..., 0] * _LUMA_R + px[..., 1] * _LUMA_G + px[..., 2] * _LUMA_B
    if payload.startswith(b"BM"):
        pixel_offset = struct.unpack_from("<I", payload, 10)[0]
        _, width, height = struct.unpack_from("<Iii", payload, 14)
        bpp, compression = struct.unpack_from("<HI", payload, 28)
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError("only uncompressed 24/32-bit BMP supported")
        abs_h = abs(height)
        if width * abs_h == 0:
            return None
        bytes_pp = bpp // 8
        stride = (width * bytes_pp + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * abs_h, offset=pixel_offset
        ).reshape(abs_h, stride)
        px = rows[:, : width * bytes_pp].reshape(abs_h, width, bytes_pp).astype(np.float64)
        luma = (px[..., 2] * _LUMA_R + px[..., 1] * _LUMA_G + px[..., 0] * _LUMA_B) / 255.0
        # BMP rows are bottom-up for height > 0 — flip so the matrix is
        # top-down like PPM (the mean never cared; dHash DOES)
        return luma[::-1] if height > 0 else luma
    if payload.startswith(_PNG_MAGIC):
        return _png_luma(payload)[2]
    if payload.startswith(b"\xff\xd8"):
        return _jpeg_luma(payload)[2]
    raise NotImplementedError(
        f"image codec not available (magic={payload[:4]!r}); plug PIL here"
    )


AUGMENTED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

_AUGMENT_OPS = ("identity", "flip_h", "flip_v", "rot90", "rot180", "rot270")


def augment_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    ops: tuple = ("flip_h",),
    crop: tuple | None = None,
    decode: str = "fake",
    out_format: str = "ppm",
    jpeg_quant: int = 2,
) -> DataFrame:
    """Deterministic image augmentation via the 1->N ``mapInPandas``
    fan-out — one output row per (image, op), the standard
    vision-pretraining expansion. ``ops`` from {identity, flip_h,
    flip_v, rot90, rot180, rot270} (rotations counter-clockwise, numpy
    convention); ``crop=(w, h)`` center-crops AFTER the op (images
    smaller than the crop pass through uncropped rather than pad).
    Pixel-exact transforms: flips/rotations are permutations, so
    channel sums are invariant and flip/rot-by-inverse round-trips are
    byte-identical — the invariants ``augment_gate`` checks. Output
    re-encodes per ``out_format`` ("ppm" P6 or "jpeg" baseline 4:4:4)
    and feeds the rest of the image stack. Zero-pixel images yield
    NULL payloads."""
    import numpy as np

    bad = [o for o in ops if o not in _AUGMENT_OPS]
    if bad:
        raise ValueError(f"unknown ops {bad}; choose from {_AUGMENT_OPS}")
    if out_format not in ("ppm", "jpeg"):
        raise ValueError(f"out_format must be 'ppm' or 'jpeg': {out_format!r}")
    if crop is not None and (int(crop[0]) <= 0 or int(crop[1]) <= 0):
        raise ValueError(f"crop dims must be positive: {crop}")

    def transform(rgb, op):
        if op == "identity":
            return rgb
        if op == "flip_h":
            return rgb[:, ::-1]
        if op == "flip_v":
            return rgb[::-1]
        if op == "rot90":
            return np.rot90(rgb, 1)
        if op == "rot180":
            return np.rot90(rgb, 2)
        return np.rot90(rgb, 3)  # rot270

    def one(payload, op):
        data = bytes(payload)
        if decode == "real":
            rgb = _rgb_matrix(data)
            if rgb is None:
                return None, None, None
        else:
            digest = hashlib.sha256(data + op.encode()).digest()
            reps = (16 * 16 * 3 + len(digest) - 1) // len(digest)
            rgb = (
                np.frombuffer(digest * reps, dtype=np.uint8)[: 16 * 16 * 3]
                .astype(np.float64)
                .reshape(16, 16, 3)
                / 255.0
            )
        out = transform(rgb, op)
        if crop is not None:
            cw, ch = int(crop[0]), int(crop[1])
            h, w = out.shape[0], out.shape[1]
            if w >= cw and h >= ch:
                x0, y0 = (w - cw) // 2, (h - ch) // 2
                out = out[y0 : y0 + ch, x0 : x0 + cw]
        h, w = out.shape[0], out.shape[1]
        raster = np.clip(np.rint(np.ascontiguousarray(out) * 255.0), 0, 255).astype(
            np.uint8
        )
        if out_format == "jpeg":
            return encode_jpeg_baseline(raster, quant=jpeg_quant), w, h
        return f"P6\n{w} {h}\n255\n".encode() + raster.tobytes(), w, h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, opnames, pays, ws, hs = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                for op in ops:
                    p, w, h = one(payload, op)
                    ids.append(int(rid))
                    opnames.append(op)
                    pays.append(p)
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "op": opnames,
                    "payload": pays,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(
        kernel, schema=AUGMENTED_IMAGE_SCHEMA
    )


IMAGE_CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("sumsq_r", T.LongType(), True),
        T.StructField("sumsq_g", T.LongType(), True),
        T.StructField("sumsq_b", T.LongType(), True),
    ]
)


def image_channel_stats(
    df: DataFrame, id_col: str, payload_col: str, decode: str = "fake"
) -> DataFrame:
    """Per-image channel statistics as EXACT integers — the mergeable
    building block for corpus normalization constants (the per-channel
    mean/std every vision-pretraining pipeline bakes into its
    transform). Each image yields (n_pixels, sum, sum-of-squares per
    RGB channel) over the 0-255 integer pixel values, so the corpus
    rollup is one hash aggregate of BIGINTs: sums merge associatively
    across images, partitions, and ingest batches with no FP-order
    sensitivity — mean = sum/n, var = sumsq/n - mean^2 computed once
    at the end. Real path decodes PPM/BMP/PNG/baseline-JPEG via
    ``_rgb_matrix``; fake path derives deterministic pseudo-pixels
    from the payload hash. Zero-pixel images yield NULL stats."""
    import numpy as np

    def one(payload):
        data = bytes(payload)
        if decode == "real":
            rgb = _rgb_matrix(data)
            if rgb is None:
                return (None,) * 7
            px = np.rint(rgb * 255.0).astype(np.int64)
        else:
            digest = hashlib.sha256(data).digest()
            reps = (16 * 16 * 3 + len(digest) - 1) // len(digest)
            px = (
                np.frombuffer(digest * reps, dtype=np.uint8)[: 16 * 16 * 3]
                .astype(np.int64)
                .reshape(16, 16, 3)
            )
        n = int(px.shape[0] * px.shape[1])
        s = px.sum(axis=(0, 1))
        sq = (px * px).sum(axis=(0, 1))
        return (n, int(s[0]), int(s[1]), int(s[2]), int(sq[0]), int(sq[1]), int(sq[2]))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["n_pixels", "sum_r", "sum_g", "sum_b", "sumsq_r", "sumsq_g", "sumsq_b"]
        for pdf in batches:
            out = [one(p) for p in pdf[payload_col]]
            frame = {"doc_id": pdf[id_col].astype("int64")}
            for i, c in enumerate(cols):
                frame[c] = pd.array([o[i] for o in out], dtype="Int64")
            yield pd.DataFrame(frame)

    return _spread_payload(df, id_col, payload_col).mapInPandas(
        kernel, schema=IMAGE_CHANNEL_STATS_SCHEMA
    )


def _dhash64(payload: bytes, decode: str) -> int | None:
    """64-bit difference hash (dHash): grayscale -> area-mean downsample
    to a 8x9 grid -> bit r*8+c set iff grid[r, c+1] > grid[r, c].
    Deterministic, robust to resizing/re-encoding/small edits — the
    classic near-dup key for image corpora. None for zero-pixel
    images. The fake path derives a deterministic pseudo-grid from the
    payload hash (identical payloads collide, as the plumbing tests
    need)."""
    import numpy as np

    if decode == "real":
        luma = _luma_matrix(bytes(payload))
        if luma is None:
            return None
        # area-mean resample via block split (uneven splits fine)
        grid = np.array(
            [
                [blk.mean() for blk in np.array_split(row_band, 9, axis=1)]
                for row_band in np.array_split(luma, 8, axis=0)
            ]
        )
    else:
        digest = hashlib.sha256(bytes(payload)).digest()
        seed = np.frombuffer(digest * 3, dtype=np.uint8)[: 8 * 9].astype(np.float64)
        grid = (seed / 255.0).reshape(8, 9)
    bits = 0
    for r in range(8):
        for c in range(8):
            if grid[r, c + 1] > grid[r, c]:
                bits |= 1 << (r * 8 + c)
    # keep the value in signed-long range for the Spark LongType column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def image_dhash(
    df: DataFrame, id_col: str, payload_col: str, decode: str = "fake"
) -> DataFrame:
    """Perceptual dHash per image payload via ``mapInPandas`` —
    the hashing half of image near-dup dedup. Output: (doc_id, dhash);
    dhash is NULL for zero-pixel images."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "dhash": pd.array(
                        [_dhash64(p, decode) for p in pdf[payload_col]],
                        dtype="Int64",
                    ),
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(kernel, schema=DHASH_SCHEMA)


def dhash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    band_bits: int = 16,
    max_bucket_width: int | None = 1000,
) -> DataFrame:
    """Image near-dup pairs from a persisted (doc_id, dhash) table:
    exactly the SimHash banded-Hamming machinery (16-bit bands,
    pigeonhole: a pair within Hamming 64/band_bits - 1 must agree on
    one band; bit_count(xor) exact verify on candidates) — dedup for
    the image modality composes from the text-side plan, no new join
    shape. ``max_hamming`` must stay below 64/band_bits for the
    banding to be lossless; raise band granularity otherwise."""
    from .dedup import _bucket_pairs, _simhash_bands

    nbands = 64 // band_bits
    if max_hamming > nbands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee of "
            f"{nbands} bands ({nbands - 1}); use smaller band_bits"
        )
    fps = hashes.filter(F.col("dhash").isNotNull()).select(
        "doc_id", F.col("dhash").alias("sh")
    ).localCheckpoint(eager=False)
    bands = _simhash_bands(fps, band_bits)
    cand = _bucket_pairs(bands, max_bucket_width, eager_probe=False)
    fp = fps.withColumnRenamed("sh", "_fp")
    cand = (
        cand.join(fp.select(F.col("doc_id").alias("id_a"), F.col("_fp").alias("sh_a")), "id_a")
        .join(fp.select(F.col("doc_id").alias("id_b"), F.col("_fp").alias("sh_b")), "id_b")
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def audio_ahash(
    df: DataFrame, id_col: str, payload_col: str, decode: str = "fake"
) -> DataFrame:
    """64-bit amplitude-envelope difference hash per audio payload —
    the audio analogue of ``image_dhash``: mono PCM -> |amplitude| ->
    area-mean downsample to 65 segments -> bit i set iff
    env[i+1] > env[i]. Comparing ADJACENT segments makes the hash
    volume-invariant (uniform gain preserves segment order), the same
    trick that makes dHash brightness-robust. Output: (doc_id, dhash)
    — the exact frame ``dhash_near_pairs`` consumes, so audio near-dup
    reuses the banded-Hamming join unchanged.

    ``decode='real'`` decodes WAV PCM (``_wav_pcm``); ``decode='fake'``
    interprets raw bytes as signed 8-bit PCM (same convention as
    ``extract_audio_windows``). Payloads shorter than 65 samples
    hash to NULL (too short to fingerprint)."""
    import numpy as np

    def one(payload, dec: str) -> int | None:
        data = bytes(payload)
        pcm = _wav_pcm(data) if dec == "real" else np.frombuffer(
            data, dtype=np.int8
        ).astype(np.float64)
        if pcm.size < 65:
            return None
        env = np.array([seg.mean() for seg in np.array_split(np.abs(pcm), 65)])
        bits = 0
        for i in range(64):
            if env[i + 1] > env[i]:
                bits |= 1 << i
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "dhash": pd.array(
                        [one(p, decode) for p in pdf[payload_col]], dtype="Int64"
                    ),
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(kernel, schema=DHASH_SCHEMA)


def frame_overlap_pairs(
    frames: DataFrame, min_shared: int = 2, max_df: int | None = 1000
) -> DataFrame:
    """Video near-dup candidate pairs from a sampled-frame table
    (``sample_frames`` output: doc_id, frame_idx, frame_sha256): two
    videos are candidates when they share >= ``min_shared`` distinct
    frame hashes — re-encodes, trims, and re-uploads share most
    frames; unrelated footage shares none. The inverted-index postings
    join of winnowing/ngram-Jaccard applied to the frame modality:
    pairs form ONLY where a frame hash co-occurs, never all-pairs.
    Frame hashes appearing in more than ``max_df`` docs (intro cards,
    black frames — the boilerplate of video) are pruned before the
    join, the same stop-shingle guard as the text side. Output:
    (id_a, id_b, shared_frames)."""
    # materialize the distinct frame table ONCE: it feeds 3-4 plan
    # branches (hot-frame agg, anti-join, both join sides) and Catalyst
    # does not dedupe common subplans — without this the upstream
    # decode kernel re-runs per branch (4 Python nodes observed in the
    # plan audit; same fix as minhash_lsh_pairs' shared explode)
    f = frames.select("doc_id", "frame_sha256").distinct().localCheckpoint(eager=False)
    if max_df is not None:
        hot = (
            f.groupBy("frame_sha256")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > int(max_df))
            .select("frame_sha256")
        )
        f = f.join(F.broadcast(hot), "frame_sha256", "left_anti")
    a = f.select(F.col("doc_id").alias("id_a"), "frame_sha256")
    b = f.select(F.col("doc_id").alias("id_b"), "frame_sha256")
    return (
        a.join(b, "frame_sha256")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared_frames"))
        .filter(F.col("shared_frames") >= int(min_shared))
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _rgb_matrix(payload: bytes):
    """RGB pixel matrix (h, w, 3) in [0, 1] for PPM P6 / uncompressed
    BMP payloads; None for zero-pixel images. The color sibling of
    ``_luma_matrix`` (resizing must preserve channels, not just
    luminance)."""
    import numpy as np

    if payload.startswith(b"P6"):
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 3:
            if pos >= len(payload):
                raise ValueError("truncated PPM header")
            c = payload[pos : pos + 1]
            if c == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(payload) and not payload[end : end + 1].isspace():
                    end += 1
                tokens.append(int(payload[pos:end]))
                pos = end
        width, height, maxval = tokens
        pos += 1
        if width * height == 0:
            return None
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        return np.frombuffer(
            payload, dtype=dtype, count=width * height * 3, offset=pos
        ).astype(np.float64).reshape(height, width, 3) / maxval
    if payload.startswith(b"BM"):
        pixel_offset = struct.unpack_from("<I", payload, 10)[0]
        _, width, height = struct.unpack_from("<Iii", payload, 14)
        bpp, compression = struct.unpack_from("<HI", payload, 28)
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError("only uncompressed 24/32-bit BMP supported")
        abs_h = abs(height)
        if width * abs_h == 0:
            return None
        bytes_pp = bpp // 8
        stride = (width * bytes_pp + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * abs_h, offset=pixel_offset
        ).reshape(abs_h, stride)
        px = rows[:, : width * bytes_pp].reshape(abs_h, width, bytes_pp).astype(np.float64)
        rgb = px[..., [2, 1, 0]] / 255.0  # BGR(A) -> RGB, alpha dropped
        return rgb[::-1] if height > 0 else rgb  # bottom-up -> top-down
    if payload.startswith(_PNG_MAGIC):
        return _decode_png_rgb(payload)[2]
    if payload.startswith(b"\xff\xd8"):
        return _decode_jpeg_rgb(payload)[2]
    raise NotImplementedError(
        f"image codec not available (magic={payload[:4]!r}); plug PIL here"
    )


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    out_width: int,
    out_height: int,
    decode: str = "fake",
    out_format: str = "ppm",
    jpeg_quant: int = 2,
) -> DataFrame:
    """Batch image resize (area-mean / box downsample) via
    ``mapInPandas`` — the thumbnailing step of a vision-pretraining
    pipeline. Real path: decode PPM/BMP/PNG/JPEG to RGB, average each
    output cell's source block per channel (``np.array_split`` both
    axes — exact for integer ratios, area-weighted-ish otherwise),
    re-encode per ``out_format``: ``"ppm"`` (maxval-255 binary P6) or
    ``"jpeg"`` (baseline 4:4:4 at ``jpeg_quant`` via
    ``encode_jpeg_baseline`` — what a real corpus stores; a P6
    thumbnail triples the bytes). Either output feeds straight back
    into ``extract_image_features`` / ``image_dhash``. Fake path:
    deterministic pseudo-RGB grid from the payload hash, same
    re-encode — the plumbing (schema, 1:1 batch shape, byte sizes) is
    identical. Zero-pixel inputs yield NULL payloads. Output:
    (doc_id, payload, width, height)."""
    import numpy as np

    ow, oh = int(out_width), int(out_height)
    if ow <= 0 or oh <= 0:
        raise ValueError(f"output size must be positive: {ow}x{oh}")
    if out_format not in ("ppm", "jpeg"):
        raise ValueError(f"out_format must be 'ppm' or 'jpeg': {out_format!r}")

    def one(payload) -> tuple[bytes | None, int | None, int | None]:
        data = bytes(payload)
        if decode == "real":
            rgb = _rgb_matrix(data)
            if rgb is None:
                return None, None, None
        else:
            digest = hashlib.sha256(data).digest()
            reps = (oh * ow * 3 + len(digest) - 1) // len(digest)
            seed = np.frombuffer(digest * reps, dtype=np.uint8)[: oh * ow * 3]
            rgb = seed.astype(np.float64).reshape(oh, ow, 3) / 255.0
        # explicit block bounds: cell (y, x) averages source rows
        # [y*h//oh, max((y+1)*h//oh, +1)) — guarantees >= 1 source pixel
        # per cell, so UPSAMPLING (src dim < target) degrades to
        # nearest-row/col instead of producing empty blocks (empty
        # array_split blocks mean() to NaN — found by the verify drive
        # on 5-40px inputs)
        h, w = rgb.shape[0], rgb.shape[1]
        ys = [((y * h) // oh, max(((y + 1) * h) // oh, (y * h) // oh + 1))
              for y in range(oh)]
        xs = [((x * w) // ow, max(((x + 1) * w) // ow, (x * w) // ow + 1))
              for x in range(ow)]
        small = np.array(
            [
                [rgb[y0:y1, x0:x1].mean(axis=(0, 1)) for (x0, x1) in xs]
                for (y0, y1) in ys
            ]
        )
        raster = np.clip(np.rint(small * 255.0), 0, 255).astype(np.uint8)
        if out_format == "jpeg":
            return encode_jpeg_baseline(raster, quant=jpeg_quant), ow, oh
        head = f"P6\n{ow} {oh}\n255\n".encode()
        return head + raster.tobytes(), ow, oh

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [o[0] for o in out],
                    "width": pd.array([o[1] for o in out], dtype="Int32"),
                    "height": pd.array([o[2] for o in out], dtype="Int32"),
                }
            )

    return _spread_payload(df, id_col, payload_col).mapInPandas(kernel, schema=RESIZED_IMAGE_SCHEMA)
