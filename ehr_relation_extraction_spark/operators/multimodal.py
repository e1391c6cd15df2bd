"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed in Arrow batches.

The Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested; the actual codec work is STUBBED
because the image/audio libraries are not in this container:

- ``decode_features`` uses a deterministic fake featurizer (md5-derived
  doubles) so the distributed plumbing has an exact oracle;
- ``decode_image`` / ``resample_audio`` / ``sample_frames`` raise
  ``NotImplementedError`` unless the optional lib imports succeed
  (import-try gate), with the batch contract documented.

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


def _require(modname: str):
    try:
        return __import__(modname)
    except ImportError as exc:  # pragma: no cover - libs absent here
        raise NotImplementedError(
            f"{modname} is not installed in this environment; "
            f"this operator defines the Spark-side contract only. "
            f"Batch contract: mapInPandas over (media_id, payload), "
            f"one decoded record per input row.") from exc


def decode_image(media: DataFrame, size: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB: real image decode+resize (PIL) behind an import gate."""
    _require("PIL")
    raise NotImplementedError("unreachable in this container")


def resample_audio(media: DataFrame, rate: int = 16000) -> DataFrame:
    """STUB: audio resample (soundfile/librosa) behind an import gate."""
    _require("soundfile")
    raise NotImplementedError("unreachable in this container")


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling (av/ffmpeg) behind an import gate."""
    _require("av")
    raise NotImplementedError("unreachable in this container")
