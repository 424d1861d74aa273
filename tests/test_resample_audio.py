"""Audio resampling tests (operators/multimodal.py resample_audio +
_fourier_resample): rate-normalization for a heterogeneous speech
corpus, band-limited so downsampling drops high bins instead of
folding them (no aliasing)."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from nba_data_pipeline_spark.operators.multimodal import (
    _fourier_resample,
    _wav_pcm,
    _wav_rate,
    resample_audio,
)


def _wav_bytes(samples: np.ndarray, rate: int, width: int = 2, n_ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
        else:
            pcm = np.clip(np.rint(samples * 127.0) + 128, 0, 255).astype(np.uint8)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _sine(freq: float, rate: int, seconds: float = 0.5, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def _dominant_freq(samples: np.ndarray, rate: int) -> float:
    spec = np.abs(np.fft.rfft(samples))
    return float(np.argmax(spec) * rate / samples.size)


def test_fourier_resample_preserves_tone_upsample():
    src = _sine(440, 8000)
    out = _fourier_resample(src, src.size * 2)
    assert out.size == src.size * 2
    assert abs(_dominant_freq(out, 16000) - 440) < 4
    # amplitude preserved
    assert abs(out.std() - src.std()) < 0.01


def test_fourier_resample_downsample_drops_high_bins():
    # 440 Hz survives a 16k -> 8k downsample; 7 kHz (above the new
    # 4 kHz Nyquist) must VANISH, not alias into band
    rate = 16000
    src = _sine(440, rate) + _sine(7000, rate, amp=0.4)
    out = _fourier_resample(src, src.size // 2)
    assert abs(_dominant_freq(out, 8000) - 440) < 4
    spec = np.abs(np.fft.rfft(out))
    freqs = np.arange(spec.size) * 8000 / out.size
    # energy near the alias image of 7 kHz (8k - 7k = 1 kHz) stays tiny
    near_1k = spec[(freqs > 950) & (freqs < 1050)].max()
    near_440 = spec[(freqs > 400) & (freqs < 480)].max()
    assert near_1k < near_440 * 0.01


def test_fourier_resample_empty_and_identity():
    assert _fourier_resample(np.array([]), 0).size == 0
    src = _sine(100, 8000)
    same = _fourier_resample(src, src.size)
    assert np.allclose(same, src, atol=1e-9)


def test_resample_audio_spark_real(spark):
    """8 kHz and 44.1 kHz inputs (one stereo 8-bit) all leave at mono
    16-bit 16 kHz, decodable by _wav_pcm, tone preserved."""
    rows = [
        (1, bytearray(_wav_bytes(_sine(440, 8000), 8000))),
        (2, bytearray(_wav_bytes(_sine(440, 44100), 44100))),
        (3, bytearray(_wav_bytes(
            np.stack([_sine(300, 8000), _sine(300, 8000)], axis=1).reshape(-1),
            8000, width=1, n_ch=2,
        ))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in resample_audio(
        df, "doc_id", "payload", target_rate=16000, decode="real"
    ).collect()}
    for rid, freq in ((1, 440), (2, 440), (3, 300)):
        data = bytes(out[rid].payload)
        assert out[rid].rate == 16000 and _wav_rate(data) == 16000
        got = _wav_pcm(data)
        assert got.size == out[rid].n_samples
        assert abs(_dominant_freq(got, 16000) - freq) < 8, rid


def test_resample_audio_feeds_audio_stack(spark):
    """Resampled output goes straight back into audio_ahash; the
    envelope hash survives the rate change (hamming small)."""
    from nba_data_pipeline_spark.operators.multimodal import audio_ahash

    rng = np.random.default_rng(7)
    env = np.repeat(rng.uniform(0.1, 0.9, 40), 200)  # 8000 samples @ 8k
    src = env * _sine(200, 8000, seconds=1.0, amp=1.0)[: env.size]
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(src, 8000)))], "doc_id long, payload binary"
    )
    res = resample_audio(df, "doc_id", "payload", target_rate=16000, decode="real")
    h_src = audio_ahash(df, "doc_id", "payload", decode="real").collect()[0].dhash
    h_res = audio_ahash(
        res.select("doc_id", "payload"), "doc_id", "payload", decode="real"
    ).collect()[0].dhash
    assert bin(h_src ^ h_res).count("1") <= 6


def test_resample_audio_fake_path_deterministic(spark):
    df = spark.createDataFrame([(1, bytearray(b"xyz"))], "doc_id long, payload binary")
    a = resample_audio(df, "doc_id", "payload").collect()[0]
    b = resample_audio(df, "doc_id", "payload").collect()[0]
    assert bytes(a.payload) == bytes(b.payload) and a.rate == 16000


def test_resample_audio_arg_validation(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="target_rate"):
        resample_audio(df, "doc_id", "payload", target_rate=0)


def test_resample_audio_empty_wav(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(np.array([]), 8000)))], "doc_id long, payload binary"
    )
    r = resample_audio(df, "doc_id", "payload", decode="real").collect()[0]
    assert r.n_samples == 0 and _wav_pcm(bytes(r.payload)).size == 0


# --------------------------------------------------------------------------
# Log-mel spectrogram
# --------------------------------------------------------------------------

def test_spectrogram_tone_lands_in_expected_band(spark):
    """A pure tone's energy concentrates in the mel band containing
    its frequency; a higher tone lands in a strictly higher band."""
    from nba_data_pipeline_spark.operators.multimodal import audio_spectrogram

    rate = 8000
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(_sine(300, rate, seconds=0.2), rate))),
            (2, bytearray(_wav_bytes(_sine(2500, rate, seconds=0.2), rate))),
        ],
        "doc_id long, payload binary",
    )
    rows = audio_spectrogram(
        df, "doc_id", "payload", n_fft=256, hop=128, n_bands=16, decode="real"
    ).collect()
    peak_band = {}
    for r in rows:
        b = int(np.argmax(r.log_mel))
        peak_band.setdefault(r.doc_id, []).append(b)
    # every window of a steady tone peaks in the same band
    assert len(set(peak_band[1])) == 1 and len(set(peak_band[2])) == 1
    assert peak_band[2][0] > peak_band[1][0]


def test_spectrogram_window_count_and_gain_shift(spark):
    from nba_data_pipeline_spark.operators.multimodal import audio_spectrogram

    rate = 8000
    src = _sine(440, rate, seconds=0.2, amp=0.4)
    n_fft, hop = 256, 128
    expect_windows = 1 + (src.size - n_fft) // hop
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(src, rate))),
            (2, bytearray(_wav_bytes(src * 0.5, rate))),  # -6 dB copy
        ],
        "doc_id long, payload binary",
    )
    rows = audio_spectrogram(
        df, "doc_id", "payload", n_fft=n_fft, hop=hop, decode="real"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.window_idx] = np.array(r.log_mel)
    assert len(by_doc[1]) == expect_windows
    # gain scaling shifts every coefficient by ~log10(0.25) (power)
    shift = by_doc[1][0] - by_doc[2][0]
    strong = by_doc[1][0] > -6  # bands with real energy, not the eps floor
    assert strong.any()
    assert np.allclose(shift[strong], -np.log10(0.25), atol=0.05)


def test_spectrogram_short_audio_yields_no_windows(spark):
    from nba_data_pipeline_spark.operators.multimodal import audio_spectrogram

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(_sine(440, 8000, seconds=0.01), 8000)))],
        "doc_id long, payload binary",
    )
    # 80 samples < n_fft=256 -> zero rows, not an error
    assert audio_spectrogram(df, "doc_id", "payload", decode="real").count() == 0


def test_spectrogram_fake_path_deterministic(spark):
    from nba_data_pipeline_spark.operators.multimodal import audio_spectrogram

    df = spark.createDataFrame([(1, bytearray(b"abc"))], "doc_id long, payload binary")
    a = sorted((r.window_idx, tuple(r.log_mel)) for r in audio_spectrogram(
        df, "doc_id", "payload").collect())
    b = sorted((r.window_idx, tuple(r.log_mel)) for r in audio_spectrogram(
        df, "doc_id", "payload").collect())
    assert a == b and len(a) >= 1
