"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so payload bytes stream
through executors in columnar batches (never the driver).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this
environment, so the decode kernels are STUBS: ``decode=fake`` yields
deterministic pseudo-decodes (stable per payload hash) to make the
Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — real and testable; ``decode=real`` raises NotImplementedError
at the exact point a codec library would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def extract_image_features(
    df: DataFrame, id_col: str, payload_col: str, decode: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """Decode + featurize image payloads via ``mapInPandas``.

    Batches arrive as Arrow record batches; each is processed columnar
    and yielded back — the pattern a real decoder plugs into 1:1.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "plug PIL/torchvision here"
                )
            decoded = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pdf[payload_col].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 1024, decode: str = "fake"
) -> DataFrame:
    """Frame sampling for video payloads (stub): emit one row per
    sampled "frame" (every_n_bytes stride stands in for a timestamp
    stride). Shows the 1->N mapInPandas fan-out shape a real
    ffmpeg-based sampler uses."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha256", T.StringType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("video codec not available; plug ffmpeg here")
            out_ids, out_idx, out_sha = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    out_ids.append(int(rid))
                    out_idx.append(i)
                    out_sha.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_sha256": out_sha}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


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
    """Windowed audio features (stub decode): 1->N fan-out of each
    payload into fixed-width sample windows with per-window RMS — the
    shape a torchaudio/ffmpeg feature extractor uses (decode to PCM,
    window, reduce). ``decode='fake'`` interprets payload bytes as
    signed 8-bit PCM (deterministic, no codec); ``decode='real'``
    raises at the exact call site a codec would occupy. Arrow-batched
    ``mapInPandas``; payload bytes never hit the driver."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "audio codec not available; plug torchaudio/ffmpeg here"
                )
            ids, idxs, ns, rms = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                pcm = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float64)
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

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=AUDIO_WINDOWS_SCHEMA)
