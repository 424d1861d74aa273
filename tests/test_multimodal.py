import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.multimodal import (
    attach_media_meta,
    extract_image_features,
    sample_frames,
)


def _media(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "a" * 3000)], "doc_id long, text string")
    return df.withColumn("payload", F.encode("text", "utf-8")).drop("text")


def test_attach_media_meta(spark):
    out = attach_media_meta(_media(spark), "payload", "image", "png")
    rows = {r.doc_id: r.media_meta for r in out.collect()}
    assert rows[1].byte_len == 3 and rows[1].media_type == "image"
    assert rows[1].sha256 == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"


def test_extract_image_features_fake_decode_deterministic(spark):
    out1 = extract_image_features(_media(spark), "doc_id", "payload").collect()
    out2 = extract_image_features(_media(spark), "doc_id", "payload").collect()
    assert sorted((r.doc_id, r.width, r.height) for r in out1) == sorted(
        (r.doc_id, r.width, r.height) for r in out2
    )
    assert all(16 <= r.width <= 256 and 0 <= r.mean_luma <= 1 for r in out1)


def test_extract_image_features_real_decode_rejects_compressed(spark):
    # utf-8 text payloads are not PPM/BMP: the real path must raise at
    # the PIL plug-point, not silently fake-decode
    with pytest.raises(Exception):
        extract_image_features(_media(spark), "doc_id", "payload", decode="real").collect()


def _ppm_bytes(width, height, pixels, maxval=255):
    """pixels: list of (r, g, b) length width*height."""
    head = f"P6\n# test comment\n{width} {height}\n{maxval}\n".encode()
    raster = bytes(v for px in pixels for v in px)
    return head + raster


def _bmp_bytes(width, height, rows_bgr):
    """rows_bgr: height rows, each width (b, g, r) tuples; bottom-up
    24bpp uncompressed with 4-byte row padding, as real writers emit."""
    import struct as st

    stride = (width * 3 + 3) & ~3
    raster = b""
    for row in reversed(rows_bgr):  # bottom-up storage
        line = bytes(v for px in row for v in px)
        raster += line + b"\x00" * (stride - len(line))
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(raster)
    file_hdr = b"BM" + st.pack("<IHHI", file_size, 0, 0, pixel_offset)
    info_hdr = st.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + raster


def test_real_ppm_decode_end_to_end(spark):
    # 2x2: white, black, pure red, pure green
    pixels = [(255, 255, 255), (0, 0, 0), (255, 0, 0), (0, 255, 0)]
    payload = _ppm_bytes(2, 2, pixels)
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    r = extract_image_features(df, "doc_id", "payload", decode="real").collect()[0]
    assert (r.width, r.height) == (2, 2)
    expect = (1.0 + 0.0 + 0.299 + 0.587) / 4
    assert abs(r.mean_luma - expect) < 1e-5
    assert r.byte_len == len(payload)


def test_real_bmp_decode_end_to_end(spark):
    # 3x2 BMP (stride padding exercised: 3*3=9 -> stride 12), all gray 128
    rows = [[(128, 128, 128)] * 3 for _ in range(2)]
    payload = _bmp_bytes(3, 2, rows)
    df = spark.createDataFrame([(8, bytearray(payload))], "doc_id long, payload binary")
    r = extract_image_features(df, "doc_id", "payload", decode="real").collect()[0]
    assert (r.width, r.height) == (3, 2)
    assert abs(r.mean_luma - 128 / 255) < 1e-5


def test_real_wav_decode_end_to_end(spark):
    import io as _io
    import math
    import struct as st
    import wave as _wave

    from nba_data_pipeline_spark.operators.multimodal import extract_audio_windows

    # 16-bit mono WAV: a constant half-scale square wave -> RMS 0.5
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        samples = [16384 if i % 2 == 0 else -16384 for i in range(1000)]
        w.writeframes(st.pack(f"<{len(samples)}h", *samples))
    payload = buf.getvalue()
    df = spark.createDataFrame([(9, bytearray(payload))], "doc_id long, payload binary")
    out = extract_audio_windows(df, "doc_id", "payload", window_samples=512, decode="real").collect()
    rows = sorted((r.window_idx, r.n_samples) for r in out)
    assert rows == [(0, 512), (1, 488)]  # 1000 frames -> 512 + 488
    for r in out:
        assert abs(r.rms - 0.5) < 1e-9  # |sample| == 16384/32768 everywhere
    # stereo 8-bit: channels average to mono; 8-bit is unsigned midpoint 128
    buf2 = _io.BytesIO()
    with _wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(8000)
        # L=192 (=+0.5), R=64 (=-0.5) -> mono mean 0.0 every frame
        w.writeframes(bytes([192, 64] * 300))
    df2 = spark.createDataFrame([(10, bytearray(buf2.getvalue()))], "doc_id long, payload binary")
    out2 = extract_audio_windows(df2, "doc_id", "payload", window_samples=256, decode="real").collect()
    assert sorted((r.window_idx, r.n_samples) for r in out2) == [(0, 256), (1, 44)]
    assert all(abs(r.rms) < 1e-9 for r in out2)
    # non-WAV payload still raises at the codec plug-point
    bad = spark.createDataFrame([(11, bytearray(b"OggS" + b"\x00" * 64))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="codec|WAV"):
        extract_audio_windows(bad, "doc_id", "payload", decode="real").collect()


def test_sample_frames_fan_out(spark):
    out = sample_frames(_media(spark), "doc_id", "payload", every_n_bytes=1024).collect()
    per_doc = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert per_doc == {1: 1, 2: 3}  # 3000 bytes -> 3 chunks of 1024


def test_extract_audio_windows_fake_decode(spark):
    import math

    from nba_data_pipeline_spark.operators.multimodal import extract_audio_windows
    from pyspark.sql import functions as F

    payload = bytes(range(256)) * 5  # 1280 "samples"
    df = spark.createDataFrame([(1, bytearray(payload)), (2, bytearray(b""))],
                               "doc_id long, payload binary")
    out = extract_audio_windows(df, "doc_id", "payload", window_samples=512).collect()
    rows = sorted((r.doc_id, r.window_idx, r.n_samples) for r in out)
    # doc 1: 1280 samples -> windows of 512, 512, 256; doc 2 empty -> none
    assert rows == [(1, 0, 512), (1, 1, 512), (1, 2, 256)]
    # RMS deterministic: recompute window 0 in pure python (int8 view)
    pcm = [b if b < 128 else b - 256 for b in payload[:512]]
    expect = math.sqrt(sum(x * x for x in pcm) / len(pcm))
    got = [r.rms for r in out if r.window_idx == 0][0]
    assert abs(got - expect) < 1e-9

    import pytest
    with pytest.raises(Exception, match="codec"):
        extract_audio_windows(df, "doc_id", "payload", decode="real").collect()


def test_real_wav_24bit_decode(spark):
    import io as _io
    import struct as st
    import wave as _wave

    from nba_data_pipeline_spark.operators.multimodal import extract_audio_windows

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        # alternate +/- quarter scale: 0x200000 = 2^21 -> 0.25
        frames = b""
        for i in range(300):
            v = 0x200000 if i % 2 == 0 else -0x200000
            frames += st.pack("<i", v)[:3]  # low 3 bytes little-endian
        w.writeframes(frames)
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, payload binary")
    out = extract_audio_windows(df, "doc_id", "payload", window_samples=300, decode="real").collect()
    assert len(out) == 1 and out[0].n_samples == 300
    assert abs(out[0].rms - 0.25) < 1e-9


def test_real_zero_pixel_images_yield_null_luma(spark):
    from nba_data_pipeline_spark.operators.multimodal import extract_image_features

    ppm = b"P6\n0 0\n255\n"
    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, payload binary")
    r = extract_image_features(df, "doc_id", "payload", decode="real").collect()[0]
    assert (r.width, r.height) == (0, 0) and r.mean_luma is None


def _rand_pixels(rng, w, h):
    return [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w * h)]


def test_image_dhash_near_pairs_real_decode(spark):
    """dHash image near-dup over real PPM payloads: an exact copy pairs
    at hamming 0, a one-pixel tweak pairs within the radius, a distinct
    random image stays out, and a zero-pixel image yields NULL (and is
    excluded from pairing)."""
    import random

    from nba_data_pipeline_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash,
    )

    rng = random.Random(1234)
    w, h = 18, 16
    base = _rand_pixels(rng, w, h)
    tweak = list(base)
    tweak[0] = (255 - tweak[0][0], tweak[0][1], tweak[0][2])  # one pixel
    other = _rand_pixels(rng, w, h)
    rows = [
        (1, bytearray(_ppm_bytes(w, h, base))),
        (2, bytearray(_ppm_bytes(w, h, tweak))),
        (3, bytearray(_ppm_bytes(w, h, other))),
        (4, bytearray(_ppm_bytes(w, h, base))),      # exact copy of 1
        (5, bytearray(_ppm_bytes(0, 0, []))),        # zero-pixel
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_dhash(df, "doc_id", "payload", decode="real")
    got = {r.doc_id: r.dhash for r in hashes.collect()}
    assert got[5] is None
    assert got[1] == got[4]
    pairs = dhash_near_pairs(hashes, max_hamming=7, band_bits=8)
    pm = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert pm[(1, 4)] == 0
    assert (1, 2) in pm and pm[(1, 2)] <= 7
    assert (1, 3) not in pm and (3, 4) not in pm


def test_image_dhash_cross_format_invariance(spark):
    """The SAME pixel content as PPM and as 24-bit BMP must produce the
    IDENTICAL dhash — the hash keys on decoded luma, not container
    bytes (BMP stores rows bottom-up in BGR; a flip/channel bug would
    break this)."""
    import random

    from nba_data_pipeline_spark.operators.multimodal import image_dhash

    rng = random.Random(99)
    w, h = 9, 8
    pixels = _rand_pixels(rng, w, h)
    rows_bgr = [
        [(b, g, r) for (r, g, b) in pixels[y * w : (y + 1) * w]] for y in range(h)
    ]
    df = spark.createDataFrame(
        [
            (1, bytearray(_ppm_bytes(w, h, pixels))),
            (2, bytearray(_bmp_bytes(w, h, rows_bgr))),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.dhash for r in image_dhash(df, "doc_id", "payload", decode="real").collect()}
    assert got[1] == got[2]


def test_dhash_near_pairs_rejects_lossy_banding(spark):
    import pytest as _pytest

    from nba_data_pipeline_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash,
    )

    df = spark.createDataFrame([(1, bytearray(b"xx"))], "doc_id long, payload binary")
    hashes = image_dhash(df, "doc_id", "payload", decode="fake")
    with _pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_pairs(hashes, max_hamming=4, band_bits=16)


def _wav16(samples_float):
    """16-bit mono WAV from floats in [-1, 1]."""
    import io as _io
    import struct as _st
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                _st.pack("<h", max(-32768, min(32767, int(s * 32767))))
                for s in samples_float
            )
        )
    return buf.getvalue()


def test_audio_ahash_volume_invariance_and_near_pairs(spark):
    """Envelope difference hash: an exact copy AND a half-volume copy
    hash identically (adjacent-segment comparison is gain-invariant);
    unrelated noise stays outside the Hamming radius; too-short
    payloads hash NULL."""
    import math
    import random

    from nba_data_pipeline_spark.operators.multimodal import (
        audio_ahash,
        dhash_near_pairs,
    )

    rng = random.Random(5)
    n = 4000
    # amplitude-modulated tone: distinctive envelope
    base = [
        math.sin(i * 0.3) * (0.2 + 0.8 * abs(math.sin(i / 400)))
        for i in range(n)
    ]
    half = [s * 0.5 for s in base]
    noise = [rng.uniform(-1, 1) for _ in range(n)]
    rows = [
        (1, bytearray(_wav16(base))),
        (2, bytearray(_wav16(half))),
        (3, bytearray(_wav16(noise))),
        (4, bytearray(_wav16(base[:30]))),  # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = audio_ahash(df, "doc_id", "payload", decode="real")
    got = {r.doc_id: r.dhash for r in hashes.collect()}
    assert got[4] is None
    # gain invariance: half-volume copy == original (quantization of
    # 16-bit samples preserves segment ORDER at these amplitudes)
    assert got[1] == got[2]
    pairs = dhash_near_pairs(hashes, max_hamming=3)
    pm = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert pm[(1, 2)] == 0
    assert (1, 3) not in pm and (2, 3) not in pm


def test_frame_overlap_pairs_finds_shared_footage(spark):
    """Two 'videos' sharing a byte-chunk prefix (same opening footage)
    pair with the right shared-frame count; unrelated payloads do not;
    a boilerplate chunk present in EVERY video is pruned by max_df and
    creates no all-pairs blowup."""
    from nba_data_pipeline_spark.operators.multimodal import (
        frame_overlap_pairs,
        sample_frames,
    )

    boiler = b"INTRO-CARD".ljust(64, b"\0")
    # 4 DISTINCT chunks of shared footage (identical chunks would
    # collapse to one hash under the per-doc distinct)
    shared = b"".join(bytes([i]) * 64 for i in range(4))
    a = boiler + shared + b"A-tail".ljust(64, b"\1")
    b = boiler + shared + b"B-tail".ljust(64, b"\2")
    c = boiler + bytes(reversed(range(64))) * 5
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(c))],
        "doc_id long, payload binary",
    )
    frames = sample_frames(df, "doc_id", "payload", every_n_bytes=64)
    pairs = frame_overlap_pairs(frames, min_shared=2, max_df=2)
    got = {(r.id_a, r.id_b): r.shared_frames for r in pairs.collect()}
    # boilerplate chunk (in all 3) pruned at max_df=2 -> only the
    # genuinely shared 4 footage chunks count
    assert got == {(1, 2): 4}


def test_incremental_hamming_works_on_image_hash_tables(spark):
    """The continuous-ingest path for image/audio dedup is the EXISTING
    incremental_simhash_pairs — dHash/aHash tables share the
    (doc_id, sh) fingerprint contract, so a new image batch dedups
    against a persisted corpus hash table with no new operator."""
    import random

    from nba_data_pipeline_spark.operators.dedup import incremental_simhash_pairs
    from nba_data_pipeline_spark.operators.multimodal import image_dhash

    rng = random.Random(3)
    w, h = 18, 16
    base = _rand_pixels(rng, w, h)
    other = _rand_pixels(rng, w, h)
    corpus = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(w, h, base))), (2, bytearray(_ppm_bytes(w, h, other)))],
        "doc_id long, payload binary",
    )
    # new batch: an exact re-upload of corpus image 1 + a fresh image
    batch = spark.createDataFrame(
        [(10, bytearray(_ppm_bytes(w, h, base))),
         (11, bytearray(_ppm_bytes(w, h, _rand_pixels(rng, w, h))))],
        "doc_id long, payload binary",
    )
    to_fp = lambda df: image_dhash(df, "doc_id", "payload", decode="real").select(  # noqa: E731
        "doc_id", F.col("dhash").alias("sh")
    )
    pairs = incremental_simhash_pairs(to_fp(batch), to_fp(corpus), max_hamming=3)
    got = {(r.id_new, r.id_other): r.hamming for r in pairs.collect()}
    assert got.get((10, 1)) == 0
    assert not any(11 in p for p in got)


def test_resize_images_real_block_means_and_composability(spark):
    """8x8 quadrant image -> 2x2 resize: each output pixel is its
    quadrant's exact color; output payload is a valid P6 that feeds
    straight back into extract_image_features and image_dhash; BMP
    input resizes to the same pixels as the equivalent PPM."""
    from nba_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
        image_dhash,
        resize_images,
    )

    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    pixels = []
    for y in range(8):
        for x in range(8):
            pixels.append(q[(y // 4) * 2 + (x // 4)])
    rows_bgr = [
        [(b, g, r) for (r, g, b) in pixels[y * 8 : (y + 1) * 8]] for y in range(8)
    ]
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(8, 8, pixels))),
         (2, bytearray(_bmp_bytes(8, 8, rows_bgr))),
         (3, bytearray(_ppm_bytes(0, 0, [])))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in resize_images(df, "doc_id", "payload", 2, 2, decode="real").collect()}
    assert out[3].payload is None
    assert (out[1].width, out[1].height) == (2, 2)
    # exact quadrant colors survive the box downsample
    want = b"P6\n2 2\n255\n" + bytes(v for px in q for v in px)
    assert bytes(out[1].payload) == want
    # BMP input -> identical resized payload (channel order + row flip right)
    assert bytes(out[2].payload) == bytes(out[1].payload)
    # composability: resized payload flows through features + dhash
    small = spark.createDataFrame(
        [(1, bytearray(out[1].payload))], "doc_id long, payload binary"
    )
    feats = extract_image_features(small, "doc_id", "payload", decode="real").collect()[0]
    assert (feats.width, feats.height) == (2, 2)
    assert image_dhash(small, "doc_id", "payload", decode="real").collect()[0].dhash is not None


def test_resize_images_upsamples_without_nan(spark):
    """Source smaller than target (3x2 -> 8x8): every output cell maps
    to >= 1 source pixel (nearest-block), no NaN/garbage bytes — the
    empty-array_split trap the verify drive caught."""
    from nba_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
    )

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
          (10, 10, 10), (200, 200, 200), (90, 90, 90)]
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(3, 2, px)))], "doc_id long, payload binary"
    )
    out = resize_images(df, "doc_id", "payload", 8, 8, decode="real").collect()[0]
    assert (out.width, out.height) == (8, 8)
    assert len(bytes(out.payload)) == len(b"P6\n8 8\n255\n") + 8 * 8 * 3
    # corners of the upsampled image are the corner source pixels
    raster = bytes(out.payload)[len(b"P6\n8 8\n255\n"):]
    assert raster[0:3] == bytes((255, 0, 0))          # top-left
    assert raster[(8 * 8 - 1) * 3:] == bytes((90, 90, 90))  # bottom-right
    # re-decodes cleanly with a sane mean
    f = extract_image_features(
        spark.createDataFrame([(1, bytearray(out.payload))], "doc_id long, payload binary"),
        "doc_id", "payload", decode="real",
    ).collect()[0]
    assert 0.0 <= f.mean_luma <= 1.0


def _png_bytes(width, height, pixels, color_type=2, filters=(0,), bit_depth=8,
               palette=None):
    """Real PNG bytes built from scratch: per-row forward FILTERING
    (cycling through ``filters`` — exercises the decoder's unfilter
    paths 0-4), zlib-compressed IDAT, correct chunk CRCs. ``pixels``
    are per-pixel tuples (or ints for 1-channel modes)."""
    import struct as st
    import zlib as zl

    def chunk(ctype, body):
        return (
            st.pack(">I", len(body)) + ctype + body
            + st.pack(">I", zl.crc32(ctype + body) & 0xFFFFFFFF)
        )

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = channels

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(width * channels)
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        line = bytes(
            v for px in row for v in (px if isinstance(px, tuple) else (px,))
        )
        ft = filters[y % len(filters)]
        if ft == 0:
            f = bytearray(line)
        elif ft == 1:
            f = bytearray(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(line))
            )
        elif ft == 2:
            f = bytearray((line[i] - prev[i]) & 0xFF for i in range(len(line)))
        elif ft == 3:
            f = bytearray(
                (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(len(line))
            )
        else:
            f = bytearray(
                (line[i] - paeth(line[i - bpp] if i >= bpp else 0, prev[i],
                                 prev[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(line))
            )
        raw += bytes([ft]) + bytes(f)
        prev = line
    ihdr = st.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    body = zl.compress(bytes(raw))
    # split IDAT in two to exercise concatenated-chunk reassembly
    mid = len(body) // 2
    out += chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
    return out + chunk(b"IEND", b"")


def test_real_png_decode_end_to_end(spark):
    pixels = [(255, 255, 255), (0, 0, 0), (255, 0, 0), (0, 255, 0)]
    payload = _png_bytes(2, 2, pixels, filters=(0, 2))
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    r = extract_image_features(df, "doc_id", "payload", decode="real").collect()[0]
    assert (r.width, r.height) == (2, 2)
    expect = (1.0 + 0.0 + 0.299 + 0.587) / 4
    assert abs(r.mean_luma - expect) < 1e-5
    assert r.byte_len == len(payload)


def test_png_all_modes_and_filters_match_ppm(spark):
    """PPM==PNG hash invariance pinned like the BMP case (VERDICT r8
    task #4): the same pixel content through every supported PNG color
    mode (RGB / RGBA / gray / gray+alpha / palette) and all five row
    filters must dhash identically to the PPM encoding — the hash keys
    on decoded luma, not container bytes."""
    import random

    from nba_data_pipeline_spark.operators.multimodal import image_dhash

    rng = random.Random(424)
    w, h = 9, 8
    pixels = _rand_pixels(rng, w, h)
    gray = [((30 * r + 59 * g + 11 * b) // 100) for (r, g, b) in pixels]
    gray_rgb = [(v, v, v) for v in gray]
    # palette mode: index the distinct colors
    pal = sorted(set(pixels))
    pal_idx = [pal.index(px) for px in pixels]
    rows = [
        (1, _ppm_bytes(w, h, pixels)),
        (2, _png_bytes(w, h, pixels, color_type=2, filters=(0, 1, 2, 3, 4))),
        (3, _png_bytes(w, h, [px + (200,) for px in pixels], color_type=6,
                       filters=(4, 3, 2, 1, 0))),
        (4, _png_bytes(w, h, pal_idx, color_type=3, filters=(1, 4),
                       palette=pal)),
        # gray pair: PPM of replicated-gray pixels vs gray PNG
        (5, _ppm_bytes(w, h, gray_rgb)),
        (6, _png_bytes(w, h, gray, color_type=0, filters=(3, 4, 1))),
        (7, _png_bytes(w, h, [(v, 99) for v in gray], color_type=4,
                       filters=(2, 4))),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: r.dhash
        for r in image_dhash(df, "doc_id", "payload", decode="real").collect()
    }
    assert got[1] == got[2] == got[3] == got[4], "RGB-content PNG modes diverge"
    assert got[5] == got[6] == got[7], "gray-content PNG modes diverge"


def test_png_resize_matches_ppm_and_unsupported_raise(spark):
    import pytest as _pytest

    from nba_data_pipeline_spark.operators.multimodal import (
        _decode_png_rgb,
        resize_images,
    )

    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    pixels = [q[(y // 4) * 2 + (x // 4)] for y in range(8) for x in range(8)]
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(8, 8, pixels))),
         (2, bytearray(_png_bytes(8, 8, pixels, filters=(0, 1, 2, 3, 4))))],
        "doc_id long, payload binary",
    )
    out = {
        r.doc_id: bytes(r.payload)
        for r in resize_images(df, "doc_id", "payload", 2, 2, decode="real").collect()
    }
    assert out[1] == out[2]
    # 16-bit depth and interlace stay declared plug-points
    deep = bytearray(_png_bytes(2, 2, [(1, 1, 1)] * 4))
    deep[8 + 8 + 8] = 16  # IHDR bit_depth byte
    with _pytest.raises(NotImplementedError, match="plug PIL"):
        _decode_png_rgb(bytes(deep))
    with _pytest.raises(ValueError, match="not a PNG"):
        _decode_png_rgb(b"JFIF....")


def test_image_channel_stats_exact_and_mergeable(spark):
    """Per-image channel sums are EXACT integers recoverable from the
    source bytes (PPM raster == payload bytes), identical for the
    near-lossless JPEG twin's decoded pixels, and the corpus rollup is
    a plain BIGINT aggregate."""
    import numpy as np
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.multimodal import image_channel_stats

    raw = bytes(range(256)) * 3  # 768 bytes -> 16x16x3
    px = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16, 3).astype(np.int64)
    ppm = b"P6\n16 16\n255\n" + raw
    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, payload binary")
    r = image_channel_stats(df, "doc_id", "payload", decode="real").collect()[0]
    assert r.n_pixels == 256
    for ci, (s_col, q_col) in enumerate(
        [("sum_r", "sumsq_r"), ("sum_g", "sumsq_g"), ("sum_b", "sumsq_b")]
    ):
        assert getattr(r, s_col) == int(px[..., ci].sum())
        assert getattr(r, q_col) == int((px[..., ci].astype(np.int64) ** 2).sum())
    # corpus rollup: one aggregate, mean reconstructable
    agg = (
        image_channel_stats(df, "doc_id", "payload", decode="real")
        .agg(
            F.sum("sum_r").alias("sr"), F.sum("n_pixels").alias("n")
        )
        .collect()[0]
    )
    assert abs(agg.sr / agg.n - px[..., 0].mean()) < 1e-9
    # zero-pixel image -> NULL stats, not a crash
    z = spark.createDataFrame(
        [(2, bytearray(b"P6\n0 0\n255\n"))], "doc_id long, payload binary"
    )
    rz = image_channel_stats(z, "doc_id", "payload", decode="real").collect()[0]
    assert rz.n_pixels is None and rz.sum_r is None


def test_augment_images_roundtrips_and_crop(spark):
    """flip twice == identity byte-for-byte; rot90 x4 == identity;
    center crop keeps the exact middle pixels; unknown op rejected."""
    import numpy as np
    import pytest as _pytest

    from nba_data_pipeline_spark.operators.multimodal import augment_images

    raw = bytes((i * 7) % 256 for i in range(24 * 16 * 3))
    ppm = b"P6\n24 16\n255\n" + raw
    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, payload binary")

    def run(frame, ops, **kw):
        return {
            r.op: (bytes(r.payload), r.width, r.height)
            for r in augment_images(frame, "doc_id", "payload", ops=ops,
                                    decode="real", **kw).collect()
        }

    out = run(df, ("identity", "flip_h", "rot90"))
    assert out["identity"][0] == ppm
    assert out["rot90"][1:] == (16, 24)
    # flip twice: feed the flipped payload back through flip_h
    flipped = spark.createDataFrame(
        [(1, bytearray(out["flip_h"][0]))], "doc_id long, payload binary"
    )
    assert run(flipped, ("flip_h",))["flip_h"][0] == ppm
    # rot90 four times
    cur = ppm
    for _ in range(4):
        frame = spark.createDataFrame([(1, bytearray(cur))], "doc_id long, payload binary")
        cur = run(frame, ("rot90",))["rot90"][0]
    assert cur == ppm
    # center crop 8x8 of identity == middle block of the source
    c = run(df, ("identity",), crop=(8, 8))["identity"]
    px = np.frombuffer(raw, dtype=np.uint8).reshape(16, 24, 3)
    assert c[1:] == (8, 8)
    assert c[0] == b"P6\n8 8\n255\n" + px[4:12, 8:16].tobytes()
    # jpeg output decodes through the stack
    j = run(df, ("flip_v",), out_format="jpeg")["flip_v"]
    assert j[0].startswith(b"\xff\xd8") and j[1:] == (24, 16)
    with _pytest.raises(ValueError, match="unknown ops"):
        augment_images(df, "doc_id", "payload", ops=("sepia",))


def test_media_pipeline_mixed_codec_end_to_end(spark):
    """Composed vision curation (plans/media_pipeline.py): the same
    picture as PPM and as near-lossless JPEG collapses to ONE
    component with one canonical; a constant image is filtered
    degenerate with no thumbnail; thumbnails exist iff canonical."""
    import numpy as np

    from nba_data_pipeline_spark.plans.media_pipeline import media_pipeline

    from nba_data_pipeline_spark.operators.multimodal import encode_jpeg_baseline

    x = np.linspace(0, 255, 32)
    img = np.stack([np.tile(x, (32, 1))] * 3, axis=-1).astype(np.uint8)
    const = np.full((32, 32, 3), 77, dtype=np.uint8)
    rows = [
        (1, bytearray(b"P6\n32 32\n255\n" + img.tobytes())),
        (2, bytearray(encode_jpeg_baseline(img, quant=1))),
        (3, bytearray(b"P6\n32 32\n255\n" + const.tobytes())),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    m = {r.doc_id: r for r in media_pipeline(df, thumb=(8, 8)).collect()}
    assert m[1].is_canonical and not m[2].is_canonical
    assert m[1].component_id == m[2].component_id == 1
    assert m[3].is_degenerate and m[3].thumb is None and not m[3].is_canonical
    assert bytes(m[1].thumb).startswith(b"\xff\xd8") and m[2].thumb is None
