"""Multimodal column operators (SURVEY.md §2.11 north star).

Images/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The codec libraries (Pillow/ffmpeg/…)
are NOT installed in this container, so the decode kernels are STUBBED —
clearly marked below — behind deterministic fakes; everything Spark-side
(schema, batch iteration, partitioning, UDF signatures) is real and tested
in tests/test_multimodal.py.

Scale posture: mapInPandas streams Arrow batches — peak memory is one batch,
not one partition; binary payloads never pass through a Python row loop. At
100 TB the payload column stays in parquet (no shuffle of blobs: derive
features first, shuffle only the features).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", StringType()),
        StructField("feat_width", IntegerType()),
        StructField("feat_height", IntegerType()),
    ]
)


def _decode_image(payload: bytes) -> tuple[int, int]:
    """STUB: real implementation would be ``PIL.Image.open(BytesIO(payload))``.

    The image codec is unavailable in this container; this deterministic fake
    derives a plausible (width, height) from the payload so the pipeline
    stays testable end-to-end. Replace body with the PIL call in production.
    """
    if not payload:
        raise NotImplementedError("empty payload; real decoder not bundled")
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    return w, h


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode+featurize media rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                w, h = _decode_image(payload)
                out.append(
                    (
                        r.media_id,
                        r.kind,
                        len(payload),
                        hashlib.md5(payload).hexdigest(),
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_off", IntegerType()),
        StructField("frame_sig", StringType()),
    ]
)


def frame_sample(media: DataFrame, k: int = 3) -> DataFrame:
    """Evenly-spaced frame sampling via Arrow-batched mapInPandas — the 1→k
    row-expansion shape of a video pipeline.

    STUB decode: "duration" is the payload byte length and a "frame" is the
    16-byte window at the sample offset (ffmpeg absent in this container; in
    production the window read becomes a container-aware seek+decode). The
    expansion itself — k output rows per input row, emitted batch-wise, blobs
    never shuffled — is the real Spark plumbing being certified.

    Input: (media_id int, payload binary). Output: FRAME_SCHEMA rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                dur = len(payload)
                for i in range(k):
                    ts = i * dur // k
                    sig = hashlib.md5(payload[ts : ts + 16]).hexdigest()
                    out.append((r.media_id, i, ts, sig))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_window_rms(media: DataFrame, window: int = 256) -> DataFrame:
    """Windowed RMS energy over audio payloads via Arrow-batched mapInPandas.

    STUB decode: the payload is treated as raw unsigned 8-bit PCM (ffmpeg /
    soundfile absent in this container; in production the np.frombuffer line
    becomes a codec call). Each payload is cut into fixed ``window``-byte
    windows and reduced to per-window RMS — vectorized per batch, blobs
    never shuffled, only the tiny (media_id, window, rms) rows move.

    Determinism note: the sum of squares is accumulated as an EXACT integer
    (uint8² ≤ 65025, window-bounded — no float rounding), so
    ``sqrt(ss / n)`` is a single IEEE operation on identical operands in any
    engine — results are bit-identical to a SQL oracle computing
    ``sqrt(SUM(v*v)/COUNT(*))`` over the same integers.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                for w in range(0, max(len(samples), 1), window):
                    chunk = samples[w : w + window]
                    n = len(chunk)
                    ss = int(np.sum(chunk * chunk)) if n else 0
                    rms = math.sqrt(ss / n) if n else 0.0
                    out.append((r.media_id, w // window, n, rms))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema=AUDIO_SCHEMA)


def resize_plan(media: DataFrame, max_dim: int) -> DataFrame:
    """Pure-plan resize bookkeeping: target dims from metadata (no decode) —
    the cheap pre-pass that decides which payloads need the expensive stage."""
    scale = F.when(
        F.greatest("meta.width", "meta.height") > max_dim,
        max_dim / F.greatest("meta.width", "meta.height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        (F.col("meta.width") * scale).cast("int").alias("target_w"),
        (F.col("meta.height") * scale).cast("int").alias("target_h"),
        (scale < 1.0).alias("needs_resize"),
    )
