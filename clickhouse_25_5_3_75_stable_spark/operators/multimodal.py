"""Multimodal (image/audio/video) column plumbing for LLM-data
pipelines (BASELINE.json north-star).

Model: media are opaque `binary` columns plus a typed metadata struct —
exactly how a 100 TB corpus stores them (parquet binary + stats). The
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, frame-explode partitioning) is real and tested; only the
actual codec call is stubbed, because no image/audio library ships in
this container:

- `decode_media(..., codec="fake")` computes deterministic numpy
  features straight from the bytes (the test/oracle path);
- any other codec raises NotImplementedError at the exact call site
  where PIL/librosa/pyav would decode the payload. Swapping the stub
  for a real decoder changes nothing about the distributed plan.

At scale: mapInPandas streams Arrow record batches through one Python
worker per core — no per-row pickling; frame_sample explodes AFTER the
per-partition decode so the binary payload is read once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# payload + metadata (pure expressions)
# --------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def media_metadata(payload: Column) -> dict[str, Column]:
    """Typed metadata computed JVM-side (no decode needed)."""
    return {
        "n_bytes": F.octet_length(payload).cast("bigint"),
        "checksum": F.sha2(payload, 256),
    }


def attach_payload(df: DataFrame, id_col: str, text_col: str, media_type: str) -> DataFrame:
    """Synthesizes a binary payload column from text (UTF-8 bytes) —
    the test stand-in for reading real media blobs; everything
    downstream treats it as opaque bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = media_metadata(payload)
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        meta["n_bytes"].alias("n_bytes"),
        meta["checksum"].alias("checksum"),
    )


# --------------------------------------------------------------------------
# decode / feature-extract (mapInPandas; codec stubbed)
# --------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-blob feature extraction over Arrow batches.

    codec="fake": deterministic byte statistics via numpy — stands in
    for decode+feature-extract and keeps the whole path testable.
    Any real codec raises NotImplementedError AT the decode call —
    plug PIL/librosa/pyav in `_decode_one` and nothing else changes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = _decode_one(bytes(payload), codec)
                arr = np.frombuffer(raw, dtype=np.uint8)
                feats.append(
                    (
                        mid,
                        int(arr.size),
                        int(arr.sum()),
                        float(arr.sum()) / arr.size if arr.size else 0.0,
                        int(arr.max()) if arr.size else 0,
                    )
                )
            yield pd.DataFrame(
                feats, columns=["media_id", "n_bytes", "byte_sum", "byte_mean", "byte_max"]
            )

    return df.select("media_id", "payload").mapInPandas(extract, schema=DECODE_SCHEMA)


def _decode_one(payload: bytes, codec: str) -> bytes:
    if codec == "fake":
        return payload  # deterministic passthrough "decode"
    # Real decoders would go here, e.g.:
    #   image: PIL.Image.open(io.BytesIO(payload)) -> np.asarray(...)
    #   audio: librosa.load(io.BytesIO(payload))
    #   video: av.open(io.BytesIO(payload)) frame iterator
    raise NotImplementedError(
        f"codec {codec!r}: media decoding libraries are not available in "
        "this environment; only the deterministic 'fake' codec is wired"
    )


# --------------------------------------------------------------------------
# frame sampling (video-style): split payload into n deterministic slices
# --------------------------------------------------------------------------


def frame_sample(df: DataFrame, n_frames: int) -> DataFrame:
    """Explodes each payload into `n_frames` contiguous byte slices with
    per-frame checksums — the frame-sampling plumbing (rate-based
    sampling of a real container would replace the slicing only).
    Pure expressions: substring on binary stays JVM-side."""
    total = F.octet_length("payload")
    frame_len = F.greatest((total / n_frames).cast("int"), F.lit(1))
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no")
    out = df.select("media_id", "payload", total.alias("n_bytes"), frame_len.alias("flen"), idx)
    frame_bytes = F.expr("substring(payload, frame_no * flen + 1, flen)")
    return (
        out.filter(F.col("frame_no") * F.col("flen") < F.col("n_bytes"))
        .select(
            "media_id",
            "frame_no",
            F.octet_length(frame_bytes).cast("bigint").alias("frame_bytes"),
            F.md5(frame_bytes).alias("frame_md5"),
        )
    )


# --------------------------------------------------------------------------
# resize (image-style) and resample (audio-style): the remaining two
# pipeline verbs. Same contract as decode_media — Arrow-batched numpy
# plumbing is real, only the codec interpretation of the bytes is the
# deterministic 'fake' stand-in.
# --------------------------------------------------------------------------

RESIZE_SCHEMA = "media_id long, out_w int, out_h int, grid_md5 string, grid_mean double"


def resize_media(df: DataFrame, out_w: int, out_h: int, codec: str = "fake") -> DataFrame:
    """Nearest-neighbor resize of each payload interpreted as a square
    byte image: index-map the source bytes onto an (out_h, out_w) grid
    in one numpy gather per blob. Swapping in a real image decode
    changes `_decode_one` only — the batch shape, schema, and the
    gather math are what a PIL-backed resize would also use."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(_decode_one(bytes(payload), codec), dtype=np.uint8)
                side = max(int(np.sqrt(raw.size)), 1)
                img = raw[: side * side].reshape(side, side)
                yi = (np.arange(out_h) * side // out_h).clip(0, side - 1)
                xi = (np.arange(out_w) * side // out_w).clip(0, side - 1)
                grid = img[np.ix_(yi, xi)]
                rows.append(
                    (
                        mid,
                        out_w,
                        out_h,
                        hashlib.md5(grid.tobytes()).hexdigest(),
                        float(grid.mean()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "out_w", "out_h", "grid_md5", "grid_mean"]
            )

    return df.select("media_id", "payload").mapInPandas(do_resize, schema=RESIZE_SCHEMA)


RESAMPLE_SCHEMA = "media_id long, rate int, n_samples int, wave_md5 string, rms double"


def audio_resample(df: DataFrame, target_rate: int, codec: str = "fake") -> DataFrame:
    """Resample each payload interpreted as a 1-D waveform of bytes:
    window-mean down to `target_rate` samples per blob (librosa-style
    rate conversion shape — vectorized reshape+mean per blob)."""

    def do_resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(_decode_one(bytes(payload), codec), dtype=np.uint8)
                n = max(min(target_rate, raw.size), 1)
                win = max(raw.size // n, 1)
                trimmed = raw[: n * win].reshape(n, win).astype(np.float64)
                wave = trimmed.mean(axis=1)
                q = np.floor(wave + 0.5).astype(np.int64)
                rows.append(
                    (
                        mid,
                        target_rate,
                        int(wave.size),
                        hashlib.md5(q.tobytes()).hexdigest(),
                        float(np.sqrt((wave**2).mean())) if wave.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "rate", "n_samples", "wave_md5", "rms"]
            )

    return df.select("media_id", "payload").mapInPandas(do_resample, schema=RESAMPLE_SCHEMA)
