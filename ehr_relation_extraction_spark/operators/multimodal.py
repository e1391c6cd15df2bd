"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed in Arrow batches.

The Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested; the actual codec work is STUBBED
because the image/audio libraries are not in this container:

- ``decode_features`` uses a deterministic fake featurizer (md5-derived
  doubles) so the distributed plumbing has an exact oracle;
- ``decode_image`` / ``resample_audio`` / ``sample_frames`` run the
  full mapInPandas plumbing (fixed-shape thumbnails, per-chunk audio
  explode, per-frame video explode) with an injectable ``codec``:
  ``codec=None`` uses the REAL library when it imports (PIL /
  soundfile / av) and raises ``NotImplementedError`` otherwise; the
  ``fake_*_codec`` stand-ins are pure functions of the payload so the
  plumbing is exactly testable without the libs.

At scale, payloads stay in the executor (never collected); feature
vectors are ~100x smaller than payloads, so the expensive binary
column is dropped as early as possible (column pruning keeps the scan
narrow when only features are consumed downstream).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("url", StringType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(DoubleType())),
])

N_FEATURES = 8


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in featurizer: 8 doubles in [0, 1) from the
    md5 of the payload (4 hex chars -> one scaled double each)."""
    h = hashlib.md5(payload or b"").hexdigest()
    return [int(h[i * 4:(i + 1) * 4], 16) / 65536.0 for i in range(N_FEATURES)]


def decode_features(media: DataFrame) -> DataFrame:
    """(media_id, media_type, payload binary) -> feature rows.

    One ``mapInPandas`` hop; Arrow ships payload bytes zero-copy to the
    Python worker; only the small feature rows come back.
    """
    src = media.select("media_id", "media_type", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (mid, mtype, len(p or b""), _fake_features(p))
                for mid, mtype, p in zip(pdf["media_id"], pdf["media_type"],
                                         pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "n_bytes", "features"])

    return src.mapInPandas(gen, FEATURE_SCHEMA)


U16_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("feat_idx", LongType()),
    StructField("feat_u16", LongType()),
])


def media_u16_features(media: DataFrame) -> DataFrame:
    """Integer twin of ``decode_features`` for the driver contract:
    one row per (media, feature index) with the raw u16 feature value
    (4 md5 hex chars), so the binary-column Arrow path has an EXACT
    DuckDB oracle (no floats anywhere)."""
    src = media.select("media_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.md5(p or b"").hexdigest()
                rows.extend(
                    (mid, len(p or b""), i, int(h[i * 4:(i + 1) * 4], 16))
                    for i in range(N_FEATURES))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "feat_idx", "feat_u16"])

    return src.mapInPandas(gen, U16_FEATURE_SCHEMA)


def _require(modname: str):
    try:
        return __import__(modname)
    except ImportError as exc:  # pragma: no cover - libs absent here
        raise NotImplementedError(
            f"{modname} is not installed in this environment; "
            f"pass an explicit codec= to run the (real, tested) Spark "
            f"plumbing with a stand-in decoder.") from exc


# ---------------------------------------------------------------------------
# Deterministic stand-in codecs (STUBS for the real decoders, which
# need PIL / soundfile / av — absent in this container).  Each is a
# pure function of the payload bytes so every test and re-run agrees.
# ---------------------------------------------------------------------------

def fake_image_codec(payload: bytes, size: tuple[int, int]) -> bytes:
    """Stand-in decode+resize: w*h*3 RGB bytes stretched from the md5
    of the payload (same output shape as a real thumbnail)."""
    w, h = size
    need = w * h * 3
    d = hashlib.md5(payload or b"").digest()
    return (d * (need // len(d) + 1))[:need]


def fake_audio_codec(payload: bytes) -> tuple[int, bytes]:
    """Stand-in audio decode: pretend the payload IS 44.1 kHz 8-bit
    PCM — (orig_rate, sample_bytes)."""
    return 44100, payload or b""


def fake_video_codec(payload: bytes) -> list[bytes]:
    """Stand-in demux+decode: one 16-byte md5 'frame' per 100 payload
    bytes (same contract as the real codec: payload -> frame bytes
    list)."""
    p = payload or b""
    return [hashlib.md5(p + i.to_bytes(4, "big")).digest()
            for i in range(len(p) // 100)]


IMAGE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_channels", LongType()),
    StructField("pixels", BinaryType()),
])


def decode_image(media: DataFrame, size: tuple[int, int] = (224, 224),
                 codec=None) -> DataFrame:
    """Decode + resize images to fixed w x h x 3 thumbnails, one
    ``mapInPandas`` hop (payloads never leave the executor; the output
    row is exactly w*h*3 bytes regardless of input size, so downstream
    stages see a fixed batch shape).  ``codec=None`` decodes with PIL
    when installed (and raises NotImplementedError when not);
    ``fake_image_codec`` drives the same plumbing deterministically."""
    if codec is None:
        _require("PIL")  # pragma: no cover - lib absent here

        def codec(payload: bytes, sz: tuple[int, int]) -> bytes:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload or b"")).convert("RGB")
            return img.resize(sz).tobytes()
    fn = codec
    src = media.select("media_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = size
        for pdf in batches:
            rows = [(mid, w, h, 3, fn(p, size))
                    for mid, p in zip(pdf["media_id"], pdf["payload"])]
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height",
                               "n_channels", "pixels"])

    return src.mapInPandas(gen, IMAGE_SCHEMA)


AUDIO_CHUNK_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("chunk_idx", LongType()),
    StructField("rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("energy_x1000", LongType()),
])


def resample_audio(media: DataFrame, rate: int = 16000,
                   chunk_s: int = 1, codec=None) -> DataFrame:
    """Decode, resample to ``rate`` and chunk into ``chunk_s``-second
    windows — one output ROW PER CHUNK (the explode that lets a 3-hour
    recording parallelize downstream instead of riding in one row).
    Integer energy per chunk so the plumbing has an exact expectation.
    ``codec=None`` decodes with soundfile when installed (mono-mixed,
    u8-quantized) and raises NotImplementedError when not;
    ``fake_audio_codec`` is the deterministic stand-in."""
    if codec is None:
        _require("soundfile")  # pragma: no cover - lib absent here

        def codec(payload: bytes) -> tuple[int, bytes]:
            import io

            import numpy as _np
            import soundfile as _sf

            data, orig_rate = _sf.read(io.BytesIO(payload or b""),
                                       dtype="float32", always_2d=True)
            mono = data.mean(axis=1)
            samples = ((_np.clip(mono, -1.0, 1.0) + 1.0)
                       * 127.5).astype("uint8").tobytes()
            return int(orig_rate), samples
    fn = codec
    src = media.select("media_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = rate * chunk_s
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                orig_rate, samples = fn(p)
                # nearest-sample decimation to the target rate
                n_out = (len(samples) * rate) // orig_rate
                res = bytes(samples[(i * orig_rate) // rate]
                            for i in range(n_out))
                for ci in range(0, max(n_out, 1), win):
                    chunk = res[ci:ci + win]
                    energy = (sum(b * b for b in chunk) * 1000
                              // max(len(chunk), 1))
                    rows.append((mid, ci // win, rate, len(chunk), energy))
            yield pd.DataFrame(
                rows, columns=["media_id", "chunk_idx", "rate",
                               "n_samples", "energy_x1000"])

    return src.mapInPandas(gen, AUDIO_CHUNK_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("ts_ms", LongType()),
    StructField("frame", BinaryType()),
])


def sample_frames(media: DataFrame, every_n: int = 30, fps: int = 30,
                  codec=None) -> DataFrame:
    """Demux + sample every ``every_n``-th frame — one output row per
    SAMPLED frame with its timestamp (the video analogue of the audio
    chunk explode).  ``codec`` maps payload -> list of raw frame
    bytes; ``codec=None`` demuxes+decodes with av when installed (RGB24
    frames) and raises NotImplementedError when not; ``fake_video_codec``
    stands in (16-byte md5 frames)."""
    if codec is None:
        _require("av")  # pragma: no cover - lib absent here

        def codec(payload: bytes) -> list[bytes]:
            import io

            import av as _av

            out = []
            with _av.open(io.BytesIO(payload or b"")) as container:
                for frame in container.decode(video=0):
                    out.append(frame.to_ndarray(format="rgb24").tobytes())
            return out
    fn = codec
    src = media.select("media_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = fn(p)
                for fi in range(0, len(frames), every_n):
                    rows.append((mid, fi, fi * 1000 // fps, frames[fi]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return src.mapInPandas(gen, FRAME_SCHEMA)
